"""Hardware parallel-scaling ceiling probe (no Spark involved).

Measures how pure-numpy work — the same kind of vectorized kernel the
pipeline's decode/STFT stage runs — scales across OS processes on THIS VM.
Perfectly parallel workloads cannot beat this ceiling, so it bounds what any
engine can achieve at a given process-count pair; the published engine
scaling efficiency should be read against it.

Each worker repeatedly computes an STFT-shaped workload (frame, window,
rfft, power) over its own random PCM buffer — no shared state, no IPC in the
timed region. Throughput = total iterations / wall time with P processes.

Usage: python scripts/hw_ceiling_probe.py [--pairs 2:8,8:32] [--secs 4]
Prints one JSON line: per-process-count throughput + per-pair efficiency.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _worker(stop_at: float, out):
    import numpy as np

    rng = np.random.default_rng(0)
    pcm = rng.standard_normal(160_000)
    win = np.hanning(512)
    n = 0
    while time.time() < stop_at:
        frames = np.lib.stride_tricks.sliding_window_view(pcm, 512)[::256]
        spec = np.abs(np.fft.rfft(frames * win, axis=1)) ** 2
        n += 1 + int(spec[0, 0] * 0)  # keep the result live
    out.put(n)


def measure(procs: int, secs: float) -> float:
    q = mp.Queue()
    stop_at = time.time() + secs + 0.5  # small margin for spawn skew
    ps = [mp.Process(target=_worker, args=(stop_at, q)) for _ in range(procs)]
    t0 = time.time()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    elapsed = time.time() - t0
    total = sum(q.get() for _ in ps)
    return total / elapsed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", default="2:8,8:32")
    ap.add_argument("--secs", type=float, default=4.0)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    pairs = [tuple(int(x) for x in p.split(":")) for p in args.pairs.split(",")]
    counts = sorted({c for p in pairs for c in p})
    tput = {}
    for c in counts:
        tput[c] = max(measure(c, args.secs) for _ in range(args.repeat))
    result = {
        "metric": "hw_ceiling",
        "throughput_iters_per_sec": {str(c): round(tput[c], 1) for c in counts},
        "pairs": {
            f"{lo}->{hi}": round((tput[hi] / tput[lo]) / (hi / lo), 3)
            for lo, hi in pairs
        },
        "kernel": "numpy frame+hann+rfft+power (STFT-shaped), process-parallel",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Deterministic synthetic audio-clip + transcript table generator.

Mirrors the reference's synthetic source, re-targeted at the graft payload:

- ``TransactionEventSimulator.java:63-79`` generates sha256 ``tid``, uniform
  ``cc_num`` ∈ [1,1000], uniform ``amount`` and wall-clock ``datetime``. Here:
  sha256 ``clip_id``, **Zipf-skewed** ``speaker_id`` over 1000 keys (skew added
  deliberately to exercise salting, SURVEY.md §7 / FIXTURES.md F1), seeded
  audio payload, and a *deterministic* event-time column (monotone base +
  seeded jitter up to ±60 s, probing the watermark boundary of
  ``TransactionFraudExample.java:36``).

All randomness is a seeded ``numpy.random.Generator`` — no wall clock, no
global RNG — so every scale regenerates byte-identically.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

from engine.audio import encode_ulaw, encode_wav_pcm16

EPOCH_BASE_MS = 1704067200000  # 2024-01-01T00:00:00Z, fixed (never wall clock)

_WORDS = [
    "the", "a", "and", "of", "to", "in", "is", "it", "that", "was",
    "audio", "clip", "speaker", "said", "hello", "world", "stream", "window",
    "feature", "store", "spark", "state", "join", "batch", "event", "time",
    "water", "mark", "count", "mean", "value", "table", "row", "column",
    "query", "group", "key", "skew", "salt", "merge", "commit", "ledger",
]


def _transcripts(rng: np.random.Generator, n: int) -> list[str]:
    lengths = rng.integers(3, 24, size=n)
    flat = rng.integers(0, len(_WORDS), size=int(lengths.sum()))
    out, pos = [], 0
    for ln in lengths:
        out.append(" ".join(_WORDS[i] for i in flat[pos : pos + ln]))
        pos += ln
    return out


def make_clips_pdf(
    n_clips: int,
    seed: int = 42,
    n_speakers: int = 1000,
    zipf_a: float = 1.3,
    mean_gap_ms: int = 1000,
    jitter_ms: int = 60_000,
    ulaw_frac: float = 0.05,
    flac_frac: float = 0.0,
    max_dur_ms: int = 1000,
    start_index: int = 0,
) -> pd.DataFrame:
    """Generate the clip table as a pandas DataFrame (FIXTURES.md F1 schema).

    Columns: clip_id, bytes, sr_hz, dur_ms, codec, transcript  (input_hint)
    plus event_ts (timestamp) and speaker_id (long) for streaming semantics.

    ``start_index`` makes generation shardable: shard k of a large table is
    ``make_clips_pdf(chunk, seed, start_index=k*chunk)`` — clip ids and event
    times continue the global sequence, and the rng is derived from
    ``(seed, start_index)`` so shards are independent and deterministic.
    """
    rng = (
        np.random.default_rng(seed)
        if start_index == 0
        else np.random.default_rng([seed, start_index])
    )

    clip_ids = [
        hashlib.sha256(f"clip{i}".encode()).hexdigest()
        for i in range(start_index, start_index + n_clips)
    ]

    # Zipf-skewed speaker keys clipped to [1, n_speakers]
    speakers = np.minimum(rng.zipf(zipf_a, size=n_clips), n_speakers).astype(np.int64)

    sr_choices = np.array([8000, 16000, 44100], dtype=np.int32)
    sr_hz = sr_choices[rng.integers(0, 3, size=n_clips)]
    dur_ms = rng.integers(200, max_dur_ms + 1, size=n_clips).astype(np.int32)

    # one draw decides the codec: [0, ulaw_frac) → ulaw,
    # [ulaw_frac, ulaw_frac+flac_frac) → flac, rest pcm — so flac_frac=0
    # (the default) keeps every existing fixture byte-identical
    u = rng.random(n_clips)
    codecs = np.where(
        u < ulaw_frac, "ulaw",
        np.where(u < ulaw_frac + flac_frac, "flac", "pcm_s16le"),
    )

    # Event time: monotone base + jitter up to ±jitter_ms (out-of-orderness the
    # 60 s watermark must tolerate / drop at the boundary).
    base = (
        EPOCH_BASE_MS
        + (start_index + np.arange(n_clips, dtype=np.int64)) * mean_gap_ms
    )
    ts_ms = base + rng.integers(-jitter_ms, jitter_ms + 1, size=n_clips)

    freqs = rng.uniform(80.0, 2000.0, size=n_clips)
    amps = rng.uniform(0.2, 0.9, size=n_clips)
    noise_amp = 0.01  # keeps quantization SNR well above 30 dB but nonzero

    payloads: list[bytes] = []
    for i in range(n_clips):
        n_samp = int(sr_hz[i] * dur_ms[i] / 1000)
        t = np.arange(n_samp, dtype=np.float64) / sr_hz[i]
        sig = amps[i] * np.sin(2 * np.pi * freqs[i] * t)
        sig += noise_amp * rng.standard_normal(n_samp)
        sig = np.clip(sig, -1.0, 1.0)
        if codecs[i] == "ulaw":
            payloads.append(encode_ulaw(sig))
        elif codecs[i] == "flac":
            from engine.flac import encode_flac_float

            payloads.append(encode_flac_float(sig, int(sr_hz[i])))
        else:
            payloads.append(encode_wav_pcm16(sig, int(sr_hz[i])))

    return pd.DataFrame(
        {
            "clip_id": clip_ids,
            "bytes": payloads,
            "sr_hz": sr_hz,
            "dur_ms": dur_ms,
            "codec": codecs,
            "transcript": _transcripts(rng, n_clips),
            "event_ts": pd.to_datetime(ts_ms, unit="ms"),
            "speaker_id": speakers,
        }
    )


def write_clips_parquet(
    path: str, n_clips: int, seed: int = 42, row_group_size: int = 2048, **kw
) -> str:
    """Materialize the clip table to parquet (the batch 'producer job').

    Analogue of ``SimProducer.java:24-47`` — but instead of a standing Kafka
    producer, we materialize once deterministically; pacing is re-created at
    read time by the rate-controlled stream (engine.streams). Small row groups
    keep maxFilesPerTrigger/maxBytesPerTrigger batching meaningful.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = make_clips_pdf(n_clips, seed=seed, **kw)
    schema = pa.schema(
        [
            ("clip_id", pa.string()),
            ("bytes", pa.binary()),
            ("sr_hz", pa.int32()),
            ("dur_ms", pa.int32()),
            ("codec", pa.string()),
            ("transcript", pa.string()),
            ("event_ts", pa.timestamp("us")),
            ("speaker_id", pa.int64()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(table, path, row_group_size=row_group_size)
    return path


def make_transactions_pdf(n: int = 5000, seed: int = 7, n_keys: int = 1000) -> pd.DataFrame:
    """Reference-exact input fixture (FIXTURES.md F2, ``transaction.avsc:5-17``):
    tid:string, datetime:long (epoch ms), cc_num:long, amount:double."""
    rng = np.random.default_rng(seed)
    tids = [hashlib.sha256(f"t{int(i)}".encode()).hexdigest() for i in rng.integers(0, 10_000, n)]
    dt = EPOCH_BASE_MS + np.sort(rng.integers(0, 3 * 3600 * 1000, size=n))
    jitter = rng.integers(-60_000, 60_001, size=n)
    return pd.DataFrame(
        {
            "tid": tids,
            "datetime": (dt + jitter).astype(np.int64),
            "cc_num": rng.integers(1, n_keys + 1, size=n).astype(np.int64),
            "amount": rng.random(n),
        }
    )

"""Driver-local literal oracles for the deterministic media contract entries.

The audio/image/video entries run over *synthesized* binary inputs that
DuckDB cannot decode, so a plain SQL oracle is impossible. But the inputs
are seeded and the kernels deterministic, so the expected output rows can be
generated at oracle-build time by running the SAME numpy kernels
single-process on the driver and emitting them as a literal ``VALUES``
SELECT (the technique the ``random_projection`` entry established: a
generated-literal DuckDB twin).

What this checks: the DISTRIBUTED execution path — Arrow batch transfer,
mapInPandas schema mapping, shuffle/join plumbing, partitioning — produces
exactly the rows a local single-process run produces. What it does NOT
check: the kernel math itself, which is verified independently by the
physics pytests (997 Hz −3.01 LKFS BS.1770 reference tone, resampler
tone-SNR ≥ 40 dB, codec spec check-vectors, PSNR round-trips in
tests/test_audio*.py).

Rounding: ``round_half_up`` mirrors Spark's ``F.round`` on doubles
(BigDecimal-of-shortest-repr, HALF_UP), so a literal equals the Spark-side
rounded double bit-for-bit.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal
from functools import lru_cache

import numpy as np
import pandas as pd

__all__ = [
    "round_half_up",
    "values_sql",
    "audio_features_sql",
    "speech_features_sql",
    "audio_loudness_sql",
    "audio_normalize_sql",
    "audio_resample_sql",
    "fingerprint_corpus_pdf",
    "fingerprint_pairs_sql",
    "clip_window_sql",
    "image_pdf",
    "image_features_sql",
    "video_pdf",
    "video_features_sql",
]

_CLIP_SEED = 42
_FLAC_FRAC = 0.1


def round_half_up(x: float | None, nd: int) -> float | None:
    """Spark ``F.round`` twin for doubles: HALF_UP on the shortest decimal
    repr (Java ``BigDecimal.valueOf(double)`` == ``Decimal(repr(x))`` —
    both shortest-round-trip)."""
    if x is None:
        return None
    x = float(x)
    if math.isnan(x) or math.isinf(x):
        return x
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


_DUCK_TYPES = {
    "int": "BIGINT",
    "float": "DOUBLE",
    "str": "VARCHAR",
    "ts": "TIMESTAMP",
}


def _lit(v, kind: str) -> str:
    if v is None or (kind == "float" and isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if kind == "str":
        s = str(v).replace("'", "''")
        return f"'{s}'"
    if kind == "ts":
        return f"TIMESTAMP '{pd.Timestamp(v).strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    if kind == "int":
        return str(int(v))
    return repr(float(v))


def values_sql(rows: list[tuple], columns: list[tuple[str, str]]) -> str:
    """Render rows as a DuckDB literal SELECT.

    ``columns`` is ``[(name, kind)]`` with kind in int/float/str/ts. Every
    value in the first row is CAST so column types are pinned even when the
    leading values are NULL.
    """
    if not rows:
        cols = ", ".join(
            f"CAST(NULL AS {_DUCK_TYPES[k]}) AS {n}" for n, k in columns
        )
        return f"SELECT {cols} WHERE 1 = 0"
    rendered = []
    for i, row in enumerate(rows):
        vals = []
        for v, (_, kind) in zip(row, columns):
            lit = _lit(v, kind)
            if i == 0:
                lit = f"CAST({lit} AS {_DUCK_TYPES[kind]})"
            vals.append(lit)
        rendered.append("(" + ", ".join(vals) + ")")
    names = ", ".join(n for n, _ in columns)
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rendered)
        + f") AS t({names})"
    )


@lru_cache(maxsize=8)
def _clips_pdf(n: int) -> pd.DataFrame:
    from engine.synth import make_clips_pdf

    return make_clips_pdf(n, seed=_CLIP_SEED, flac_frac=_FLAC_FRAC)


def _decode(row) -> np.ndarray:
    from engine.audio import decode_payload

    return decode_payload(row["bytes"], row["codec"], int(row["sr_hz"]))


@lru_cache(maxsize=2)
def audio_features_sql(n: int = 400) -> str:
    """Literal twin of the per-clip decode + acoustic-stats entry
    (engine/audio.py extract_audio_features)."""
    from engine.audio import _basic_feats

    rows = []
    for _, r in _clips_pdf(n).iterrows():
        x = _decode(r)
        ns, rms, peak, zcr, dur, clipped = _basic_feats(x, int(r["sr_hz"]))
        rows.append((
            r["clip_id"], int(r["speaker_id"]), ns,
            round_half_up(rms, 5), round_half_up(peak, 5),
            round_half_up(zcr, 6), round_half_up(dur, 3),
            round_half_up(clipped, 6),
        ))
    return values_sql(rows, [
        ("clip_id", "str"), ("speaker_id", "int"), ("n_samples", "int"),
        ("rms", "float"), ("peak", "float"), ("zcr", "float"),
        ("decoded_dur_ms", "float"), ("clipped_frac", "float"),
    ])


@lru_cache(maxsize=2)
def speech_features_sql(n: int = 400) -> str:
    """Literal twin of the log-mel/MFCC/pitch entry
    (engine/audio.py extract_speech_features)."""
    from engine.audio import _speech_one

    rows = []
    for _, r in _clips_pdf(n).iterrows():
        x = _decode(r)
        _, mfcc_mean, _, f0, voiced, silence = _speech_one(x, int(r["sr_hz"]))
        rows.append((
            r["clip_id"], round_half_up(f0, 3), round_half_up(voiced, 6),
            round_half_up(silence, 6), round_half_up(mfcc_mean[0], 4),
        ))
    return values_sql(rows, [
        ("clip_id", "str"), ("f0_hz", "float"), ("voiced_frac", "float"),
        ("silence_frac", "float"), ("mfcc0", "float"),
    ])


@lru_cache(maxsize=2)
def audio_loudness_sql(n: int = 200) -> str:
    """Literal twin of the BS.1770 loudness + VAD entry
    (engine/audio_ops.py with_loudness / segment_clips)."""
    from engine.audio_ops import loudness_lufs, vad_segments

    rows = []
    for _, r in _clips_pdf(n).iterrows():
        sr = int(r["sr_hz"])
        x = _decode(r)
        lufs = loudness_lufs(x, sr)
        lufs_v = None if math.isinf(lufs) else round_half_up(lufs, 5)
        segs = vad_segments(x, sr)
        if segs:
            total_ms = 1000.0 * x.size / sr
            ratio = sum(e - s for s, e in segs) / max(total_ms, 1e-9)
            n_segs, ratio_v = len(segs), round_half_up(ratio, 6)
        else:
            n_segs, ratio_v = None, None
        rows.append((
            r["clip_id"], int(r["speaker_id"]), lufs_v, n_segs, ratio_v,
        ))
    return values_sql(rows, [
        ("clip_id", "str"), ("speaker_id", "int"), ("lufs", "float"),
        ("n_segments", "int"), ("speech_ratio", "float"),
    ])


@lru_cache(maxsize=2)
def audio_normalize_sql(n: int = 200, target_lufs: float = -23.0,
                        max_gain_db: float = 40.0) -> str:
    """Literal twin of loudness normalization + post-gain re-measurement
    (engine/audio_ops.py normalize_loudness then with_loudness)."""
    from engine.audio import decode_wav_pcm16, encode_wav_pcm16
    from engine.audio_ops import loudness_lufs

    rows = []
    for _, r in _clips_pdf(n).iterrows():
        sr = int(r["sr_hz"])
        x = _decode(r)
        lufs = loudness_lufs(x, sr)
        if math.isinf(lufs):
            g_db = 0.0
        else:
            g_db = float(np.clip(target_lufs - lufs, -max_gain_db, max_gain_db))
        y = x * (10.0 ** (g_db / 20.0))
        clipped = float((np.abs(y) > 1.0).mean()) if y.size else 0.0
        y2, _ = decode_wav_pcm16(encode_wav_pcm16(y, sr))
        after = loudness_lufs(y2, sr)
        rows.append((
            r["clip_id"], round_half_up(g_db, 5), round_half_up(clipped, 6),
            None if math.isinf(after) else round_half_up(after, 4),
        ))
    return values_sql(rows, [
        ("clip_id", "str"), ("gain_db", "float"), ("clipped_frac", "float"),
        ("lufs_after", "float"),
    ])


@lru_cache(maxsize=2)
def audio_resample_sql(n: int = 200, target_sr: int = 8000) -> str:
    """Literal twin of corpus sample-rate normalization + feature audit
    (engine/audio_ops.py resample_clips → engine/audio.py
    extract_audio_features)."""
    from engine.audio import _basic_feats, decode_wav_pcm16, encode_wav_pcm16
    from engine.audio_ops import resample_poly

    rows = []
    for _, r in _clips_pdf(n).iterrows():
        sr = int(r["sr_hz"])
        x = _decode(r)
        y = np.clip(resample_poly(x, sr, target_sr), -1.0, 1.0)
        dur = int(round(1000.0 * y.size / target_sr))
        y2, _ = decode_wav_pcm16(encode_wav_pcm16(y, target_sr))
        ns, rms, _, zcr, _, _ = _basic_feats(y2, target_sr)
        rows.append((
            r["clip_id"], target_sr, dur, ns,
            round_half_up(rms, 5), round_half_up(zcr, 6),
        ))
    return values_sql(rows, [
        ("clip_id", "str"), ("sr_hz", "int"), ("dur_ms", "int"),
        ("n_samples", "int"), ("rms", "float"), ("zcr", "float"),
    ])


@lru_cache(maxsize=2)
def fingerprint_corpus_pdf(n: int = 64) -> pd.DataFrame:
    """The fingerprint-dedup corpus: ``n`` seeded clips plus every 8th clip
    re-emitted gain-scaled (0.7x) and shifted by two hop frames — the
    planted near-duplicates the entry must recover."""
    from engine.audio import decode_payload, encode_wav_pcm16
    from engine.synth import make_clips_pdf

    pdf = make_clips_pdf(n, seed=_CLIP_SEED)
    dups = []
    for i in range(0, len(pdf), 8):
        r = pdf.iloc[i]
        x = decode_payload(r["bytes"], r["codec"], int(r["sr_hz"]))
        shifted = np.concatenate([np.zeros(2 * 512), 0.7 * x])
        dups.append({
            "clip_id": "dup_" + r["clip_id"][:16],
            "bytes": encode_wav_pcm16(shifted, int(r["sr_hz"])),
            "sr_hz": r["sr_hz"],
            "dur_ms": int(r["dur_ms"]) + int(2 * 512 * 1000 / r["sr_hz"]),
            "codec": "pcm_s16le",
            "transcript": r["transcript"],
            "event_ts": r["event_ts"],
            "speaker_id": r["speaker_id"],
        })
    return pd.concat([pdf, pd.DataFrame(dups)], ignore_index=True)


@lru_cache(maxsize=2)
def fingerprint_pairs_sql(min_matches: int = 40,
                          max_hash_clips: int = 50) -> str:
    """Literal twin of constellation-hash near-dup voting
    (engine/audio_ops.py fingerprint_dedup): same peaks → hashes →
    frequent-hash cap → offset-alignment vote, run in pandas."""
    from engine.audio import decode_payload
    from engine.audio_ops import _constellation_hashes, _spectral_peaks

    corpus = fingerprint_corpus_pdf()
    parts = []
    for _, r in corpus.iterrows():
        x = decode_payload(r["bytes"], r["codec"], int(r["sr_hz"]))
        pt, pf = _spectral_peaks(x, int(r["sr_hz"]))
        h, ta = _constellation_hashes(pt, pf)
        parts.append(pd.DataFrame({
            "id": r["clip_id"], "fp_hash": h, "fp_t": ta,
        }).drop_duplicates())
    fps = pd.concat(parts, ignore_index=True)
    nc = fps.groupby("fp_hash")["id"].nunique()
    fps = fps[fps["fp_hash"].isin(nc[nc <= max_hash_clips].index)]
    m = fps.merge(fps, on="fp_hash", suffixes=("_a", "_b"))
    m = m[m["id_a"] < m["id_b"]]
    m = m.assign(dt=m["fp_t_b"] - m["fp_t_a"])
    al = (
        m.groupby(["id_a", "id_b", "dt"])["fp_hash"].nunique()
        .reset_index(name="m")
    )
    best = (
        al.groupby(["id_a", "id_b"])["m"].max()
        .reset_index(name="aligned_matches")
    )
    best = best[best["aligned_matches"] >= min_matches]
    rows = [
        (r.id_a, r.id_b, int(r.aligned_matches))
        for r in best.itertuples(index=False)
    ]
    return values_sql(rows, [
        ("id_a", "str"), ("id_b", "str"), ("aligned_matches", "int"),
    ])


@lru_cache(maxsize=2)
def clip_window_sql(n: int = 400, width_ms: int = 600_000) -> str:
    """Literal twin of the graft flagship tumbling window over clips,
    generated by the independent pandas window oracle
    (engine/oracle.py tumbling_oracle)."""
    from engine.oracle import tumbling_oracle

    pdf = _clips_pdf(n)
    base = pd.DataFrame({
        "ts_ms": pdf["event_ts"].astype("int64") // 10**6,
        "speaker_id": pdf["speaker_id"].astype(np.int64),
        "v": pdf["dur_ms"].astype(np.float64),
    })
    out = tumbling_oracle(base, "ts_ms", "speaker_id", "v", width_ms, "10m")
    rows = []
    for r in out.itertuples(index=False):
        sd = float(r.stdev_amt_per_10m)
        rows.append((
            pd.Timestamp(int(r.window_start_ms), unit="ms"),
            pd.Timestamp(int(r.window_end_ms), unit="ms"),
            int(r.speaker_id),
            int(r.num_trans_per_10m),
            round_half_up(float(r.avg_amt_per_10m), 6),
            None if math.isnan(sd) else round_half_up(sd, 6),
            round_half_up(float(r.min_amt_per_10m), 6),
            round_half_up(float(r.max_amt_per_10m), 6),
        ))
    return values_sql(rows, [
        ("window_start", "ts"), ("window_end", "ts"), ("speaker_id", "int"),
        ("num_trans_per_10m", "int"), ("avg_amt_per_10m", "float"),
        ("stdev_amt_per_10m", "float"), ("min_amt_per_10m", "float"),
        ("max_amt_per_10m", "float"),
    ])


@lru_cache(maxsize=2)
def image_pdf(n: int = 64) -> pd.DataFrame:
    """Deterministic mixed BMP/PNG image table (the image entry's input)."""
    from engine.multimodal import encode_bmp, encode_png

    rng = np.random.default_rng(17)
    return pd.DataFrame({
        "img_id": range(n),
        "group_id": [i % 8 for i in range(n)],
        "bytes": [
            (encode_png if i % 2 else encode_bmp)(
                rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
            )
            for i in range(n)
        ],
    })


@lru_cache(maxsize=2)
def image_features_sql(n: int = 64) -> str:
    """Literal twin of the lib-free BMP/PNG decode + feature entry
    (engine/multimodal.py decode_image / extract_image_features)."""
    from engine.multimodal import decode_image

    rows = []
    for r in image_pdf(n).itertuples(index=False):
        img = decode_image(bytes(r.bytes))
        h, w = img.shape[:2]
        ch = 1 if img.ndim == 2 else img.shape[2]
        rows.append((
            int(r.img_id), int(r.group_id), w, h, ch,
            round_half_up(float(img.mean()), 5),
        ))
    return values_sql(rows, [
        ("img_id", "int"), ("group_id", "int"), ("width", "int"),
        ("height", "int"), ("n_channels", "int"), ("mean_lum", "float"),
    ])


@lru_cache(maxsize=2)
def video_pdf(n: int = 24) -> pd.DataFrame:
    """Deterministic Y4M video table (the video entry's input)."""
    from engine.multimodal import encode_y4m

    rng = np.random.default_rng(19)
    return pd.DataFrame({
        "vid_id": range(n),
        "group_id": [i % 4 for i in range(n)],
        "bytes": [
            encode_y4m(rng.integers(0, 256, (12, 16, 16), dtype=np.uint8), 6, 1)
            for _ in range(n)
        ],
    })


@lru_cache(maxsize=2)
def video_features_sql(n: int = 24, every_ms: int = 500) -> str:
    """Literal twin of the Y4M decode + frame-sampling + motion entry
    (engine/multimodal.py extract_video_features)."""
    from engine.multimodal import decode_y4m, sample_video_frames

    rows = []
    for r in video_pdf(n).itertuples(index=False):
        buf = bytes(r.bytes)
        frames, fps = decode_y4m(buf)
        sampled = sample_video_frames(buf, every_ms)
        stack = np.stack(sampled) if sampled else frames
        motion = (
            float(np.mean(np.abs(np.diff(stack.astype(np.int16), axis=0))))
            if stack.shape[0] > 1
            else 0.0
        )
        rows.append((
            int(r.vid_id), int(r.group_id), int(frames.shape[0]), float(fps),
            round_half_up(float(stack.mean()), 5),
            round_half_up(float(stack.std()), 5),
            round_half_up(motion, 6),
        ))
    return values_sql(rows, [
        ("vid_id", "int"), ("group_id", "int"), ("n_frames", "int"),
        ("fps", "float"), ("luma_mean", "float"), ("luma_std", "float"),
        ("motion", "float"),
    ])

"""Audio training-data-pipeline operators: resampling, loudness, VAD, dedup.

Beyond the reference's windowed feature aggregates
(``flink/FeatureGroupAggregation.java``), a 100 TB audio corpus pipeline
needs corpus-conditioning operators the reference delegates to offline
tooling: sample-rate normalization, loudness measurement (ITU-R BS.1770),
voice-activity segmentation, and near-duplicate audio detection. Everything
here is pure numpy inside Arrow-batched ``mapInPandas`` — no per-row Python
at the Spark boundary, no external DSP libraries.

Scale notes
-----------
- All per-clip DSP is embarrassingly parallel: one ``mapInPandas`` stage,
  no shuffle, column-pruned input (only payload + codec + sr are read).
- ``fingerprint_dedup`` is the audio analogue of MinHash dedup: per clip a
  bounded set of constellation hashes (Wang 2003, the public Shazam paper
  shape), a hash-bucket self-join with a frequent-hash cap (default ON,
  mirroring engine/dedup.py's shingle cap), then an aligned-offset vote.
  Shuffle volume is O(hashes), never O(clips²).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from engine.audio import decode_payload, encode_wav_pcm16

__all__ = [
    "resample_poly",
    "resample_clips",
    "k_weighting_coeffs",
    "loudness_lufs",
    "with_loudness",
    "normalize_loudness",
    "vad_segments",
    "segment_clips",
    "clip_fingerprints",
    "fingerprint_dedup",
]


# ---------------------------------------------------------------------------
# polyphase resampling (windowed-sinc, rational L/M)
# ---------------------------------------------------------------------------


def _lowpass(cutoff: float, half: int, beta: float = 8.555) -> np.ndarray:
    """Kaiser-windowed sinc lowpass, odd length ``2*half+1``, unity DC gain.
    ``cutoff`` in cycles/sample (0, 0.5]."""
    n = np.arange(-half, half + 1, dtype=np.float64)
    h = 2.0 * cutoff * np.sinc(2.0 * cutoff * n)
    h *= np.kaiser(2 * half + 1, beta)
    return h / h.sum()


def resample_poly(
    x: np.ndarray, sr_in: int, sr_out: int, half_taps_per_phase: int = 10
) -> np.ndarray:
    """Rational-ratio resampling via a polyphase windowed-sinc filter.

    Upsample by ``L = sr_out/g``, lowpass at the tighter Nyquist, downsample
    by ``M = sr_in/g`` — but only output samples are ever computed: the
    filter is decomposed into L phases and each output is one short dot
    product (classic polyphase identity; cost O(n_out * taps_per_phase)).
    Output length is ``ceil(n * L / M)``; filter half-length is
    ``half_taps_per_phase * max(L, M)`` taps, so cost grows with the
    rational complexity of the ratio (44.1k→16k is ~28× the work of
    16k→8k — normalize corpora through simple ratios where possible).
    """
    x = np.asarray(x, dtype=np.float64)
    if sr_in <= 0 or sr_out <= 0:
        raise ValueError("sample rates must be positive")
    if sr_in == sr_out or x.size == 0:
        return x.copy()
    g = math.gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    half = half_taps_per_phase * max(L, M)
    h = _lowpass(0.5 / max(L, M), half) * L  # gain L restores amplitude

    n_out = -((-x.size * L) // M)  # ceil
    js = np.arange(n_out, dtype=np.int64)
    q = js * M
    ks = q // L
    rs = (q % L).astype(np.int64)
    out = np.empty(n_out, dtype=np.float64)
    # y[q] = sum_m h[half + r + m*L] * x[k - m]  (r = q mod L, k = q div L)
    for r in range(L):
        sel = np.flatnonzero(rs == r)
        if sel.size == 0:
            continue
        m_lo = -((half + r) // L)
        sub = h[half + r + np.arange(m_lo, (half - r) // L + 1) * L]
        conv = np.convolve(x, sub)  # conv[n] = sum_j sub[j] x[n-j], j=m-m_lo
        idx = ks[sel] - m_lo
        valid = idx < conv.size
        out[sel[valid]] = conv[idx[valid]]
        out[sel[~valid]] = 0.0
    return out


def resample_clips(
    df: DataFrame,
    target_sr: int,
    payload_col: str = "bytes",
    half_taps_per_phase: int = 10,
) -> DataFrame:
    """Normalize a mixed-sample-rate clip table to ``target_sr``.

    Decodes each payload (any codec in :func:`engine.audio.decode_payload`),
    resamples, re-encodes as PCM16 WAV, and rewrites ``sr_hz`` / ``codec`` /
    ``dur_ms``. One Arrow-batched ``mapInPandas`` stage, no shuffle.
    """
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    cols = list(df.columns)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, durs = [], []
            for b, c, s in zip(pdf[payload_col], pdf["codec"], pdf["sr_hz"]):
                x = decode_payload(b, c, int(s))
                y = resample_poly(x, int(s), target_sr, half_taps_per_phase)
                y = np.clip(y, -1.0, 1.0)
                payloads.append(encode_wav_pcm16(y, target_sr))
                durs.append(int(round(1000.0 * y.size / target_sr)))
            pdf = pdf.copy()
            pdf[payload_col] = payloads
            pdf["sr_hz"] = np.int32(target_sr)
            pdf["codec"] = "pcm_s16le"
            if "dur_ms" in pdf.columns:
                pdf["dur_ms"] = np.asarray(durs, dtype=np.int32)
            yield pdf[cols]

    return df.mapInPandas(op, schema=out_schema)


# ---------------------------------------------------------------------------
# ITU-R BS.1770 loudness (K-weighting + gated mean square)
# ---------------------------------------------------------------------------

# Analog prototype constants from the BS.1770 K-weighting derivation
# (public: ITU-R BS.1770-4 Annex 1; same parametrization pyloudnorm uses).
_SHELF_FC, _SHELF_GAIN_DB, _SHELF_Q = 1681.974450955533, 3.999843853973347, 0.7071752369554196
_HP_FC, _HP_Q = 38.13547087602444, 0.5003270373238773


# The BS.1770 pre-filter shelf is NOT an RBJ cookbook shelf: its band gain
# follows Vh**0.4996667741545416 (de Man, "Evaluation of implementations of
# the ITU-R BS.1770 loudness algorithm", AES 2014 — the public re-derivation
# that reproduces the spec's printed 48 kHz table at any sample rate).
_SHELF_VB_EXP = 0.4996667741545416


def k_weighting_coeffs(sr: int) -> list[tuple[np.ndarray, np.ndarray]]:
    """The two K-weighting biquads ``[(b, a), (b, a)]`` for sample rate
    ``sr``, derived from the analog prototype via the bilinear transform so
    any rate works; at 48 kHz this reproduces the coefficient table printed
    in BS.1770 itself (spec-vector-tested)."""
    out = []
    # stage 1: high shelf
    K = math.tan(math.pi * _SHELF_FC / sr)
    Vh = 10.0 ** (_SHELF_GAIN_DB / 20.0)
    Vb = Vh**_SHELF_VB_EXP
    a0 = 1.0 + K / _SHELF_Q + K * K
    b = np.array([
        (Vh + Vb * K / _SHELF_Q + K * K) / a0,
        2.0 * (K * K - Vh) / a0,
        (Vh - Vb * K / _SHELF_Q + K * K) / a0,
    ])
    a = np.array([1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / _SHELF_Q + K * K) / a0])
    out.append((b, a))
    # stage 2: high pass (spec keeps b un-normalized at [1, -2, 1])
    K = math.tan(math.pi * _HP_FC / sr)
    a0 = 1.0 + K / _HP_Q + K * K
    b = np.array([1.0, -2.0, 1.0])
    a = np.array([1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / _HP_Q + K * K) / a0])
    out.append((b, a))
    return out


def _lin_rec2(v: np.ndarray, c1: float, c2: float) -> np.ndarray:
    """Exact ``y[n] = v[n] + c1*y[n-1] + c2*y[n-2]`` without a Python loop.

    The order-2 recurrence is an affine map on the state ``s[n] = (y[n],
    y[n-1])``; a Hillis–Steele scan over 2×2 matrix/vector pairs computes
    all prefixes in ``log2(n)`` vectorized passes (exact, not an FFT
    approximation — circular convolution would corrupt IIR tails)."""
    n = v.size
    if n == 0:
        return v.astype(np.float64)
    Ms = np.broadcast_to(
        np.array([[c1, c2], [1.0, 0.0]]), (n, 2, 2)
    ).copy()
    ts = np.zeros((n, 2))
    ts[:, 0] = v
    ofs = 1
    while ofs < n:
        ts[ofs:] = np.einsum("nij,nj->ni", Ms[ofs:], ts[:-ofs]) + ts[ofs:]
        Ms[ofs:] = np.einsum("nij,njk->nik", Ms[ofs:], Ms[:-ofs])
        ofs *= 2
    return ts[:, 0]


def _biquad(x: np.ndarray, b: np.ndarray, a: np.ndarray) -> np.ndarray:
    v = b[0] * x
    if x.size > 1:
        v[1:] += b[1] * x[:-1]
    if x.size > 2:
        v[2:] += b[2] * x[:-2]
    return _lin_rec2(v, -a[1], -a[2])


def loudness_lufs(x: np.ndarray, sr: int) -> float:
    """Integrated loudness of a mono signal per ITU-R BS.1770 (K-weighting,
    400 ms blocks at 75% overlap, −70 LUFS absolute gate then −10 LU
    relative gate). Returns ``-inf`` for signals shorter than one block or
    entirely below the absolute gate."""
    x = np.asarray(x, dtype=np.float64)
    for b, a in k_weighting_coeffs(sr):
        x = _biquad(x, b, a)
    block = int(round(0.4 * sr))
    if x.size < block:
        return float("-inf")
    hop = block // 4
    frames = np.lib.stride_tricks.sliding_window_view(x, block)[::hop]
    z = (frames**2).mean(axis=1)
    lb = -0.691 + 10.0 * np.log10(z + 1e-30)
    gated = z[lb > -70.0]
    if gated.size == 0:
        return float("-inf")
    gamma_r = -0.691 + 10.0 * np.log10(gated.mean()) - 10.0
    final = z[(lb > -70.0) & (lb > gamma_r)]
    if final.size == 0:
        return float("-inf")
    return float(-0.691 + 10.0 * np.log10(final.mean()))


def with_loudness(df: DataFrame, payload_col: str = "bytes") -> DataFrame:
    """Append a ``loudness_lufs`` column (double; −inf → null) per clip."""
    passthrough = [c for c in df.columns if c != payload_col]
    out_schema = (
        ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name != payload_col
        )
        + ", loudness_lufs double"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for b, c, s in zip(pdf[payload_col], pdf["codec"], pdf["sr_hz"]):
                lufs = loudness_lufs(decode_payload(b, c, int(s)), int(s))
                vals.append(None if math.isinf(lufs) else lufs)
            out = pdf[passthrough].copy()
            # nullable Float64 so None survives to a SQL null (plain float64
            # would coerce None to NaN, which Arrow ships as NaN, not null)
            out["loudness_lufs"] = pd.array(vals, dtype="Float64")
            yield out

    return df.mapInPandas(op, schema=out_schema)


# ---------------------------------------------------------------------------
# energy VAD + speech segmentation
# ---------------------------------------------------------------------------


def _runs(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of True runs; ends exclusive."""
    d = np.diff(np.concatenate(([0], mask.astype(np.int8), [0])))
    return np.flatnonzero(d == 1), np.flatnonzero(d == -1)


def vad_segments(
    x: np.ndarray,
    sr: int,
    frame_ms: int = 25,
    hop_ms: int = 10,
    margin_db: float = 9.0,
    floor_pct: float = 10.0,
    abs_db: float = -40.0,
    min_speech_ms: int = 120,
    min_gap_ms: int = 150,
) -> list[tuple[float, float]]:
    """Energy-based voice-activity segments as ``[(start_ms, end_ms)]``.

    A frame is active when its energy exceeds ``min(noise_floor + margin_db,
    abs_db)`` — the ``min`` keeps all-speech clips (where the floor estimate
    IS speech) detectable via the absolute threshold, while quiet recordings
    still get the adaptive floor. Gaps shorter than ``min_gap_ms`` are
    bridged, then speech runs shorter than ``min_speech_ms`` dropped.
    """
    x = np.asarray(x, dtype=np.float64)
    frame = max(1, int(sr * frame_ms / 1000))
    hop = max(1, int(sr * hop_ms / 1000))
    if x.size < frame:
        x = np.pad(x, (0, frame - x.size))
    frames = np.lib.stride_tricks.sliding_window_view(x, frame)[::hop]
    e = 10.0 * np.log10((frames**2).mean(axis=1) + 1e-12)
    thr = min(float(np.percentile(e, floor_pct)) + margin_db, abs_db)
    active = e > thr
    if not active.any():
        return []
    # bridge short gaps
    s, t = _runs(~active)
    for i, j in zip(s, t):
        if 0 < i and j < active.size and (j - i) * hop_ms < min_gap_ms:
            active[i:j] = True
    # drop short speech runs
    s, t = _runs(active)
    out = []
    dur_ms = 1000.0 * x.size / sr
    for i, j in zip(s, t):
        start = 1000.0 * i * hop / sr
        end = min(1000.0 * ((j - 1) * hop + frame) / sr, dur_ms)
        if end - start >= min_speech_ms:
            out.append((start, end))
    return out


def segment_clips(
    df: DataFrame,
    payload_col: str = "bytes",
    emit_bytes: bool = True,
    **vad_kw,
) -> DataFrame:
    """Explode each clip into one row per VAD speech segment.

    Output: all non-payload columns pass through, plus ``seg_idx``,
    ``seg_start_ms``, ``seg_end_ms``, ``speech_ratio`` (total speech / clip
    duration, repeated per row) and — when ``emit_bytes`` — ``seg_bytes``
    (the segment slice re-encoded PCM16 WAV). Clips with no detected speech
    produce no rows (filter-style semantics, like the reference's keyed
    filters). One ``mapInPandas`` stage; no shuffle.
    """
    passthrough = [c for c in df.columns if c != payload_col]
    out_schema = (
        ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name != payload_col
        )
        + ", seg_idx int, seg_start_ms double, seg_end_ms double,"
        " speech_ratio double"
        + (", seg_bytes binary" if emit_bytes else "")
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pos in range(len(pdf)):
                rec = pdf.iloc[pos]
                sr = int(rec["sr_hz"])
                x = decode_payload(rec[payload_col], rec["codec"], sr)
                segs = vad_segments(x, sr, **vad_kw)
                if not segs:
                    continue
                total_ms = 1000.0 * x.size / sr
                speech = sum(e - s for s, e in segs) / max(total_ms, 1e-9)
                for si, (s_ms, e_ms) in enumerate(segs):
                    base = {c: rec[c] for c in passthrough}
                    base.update(
                        seg_idx=si, seg_start_ms=s_ms, seg_end_ms=e_ms,
                        speech_ratio=speech,
                    )
                    if emit_bytes:
                        lo = int(s_ms * sr / 1000)
                        hi = int(e_ms * sr / 1000)
                        base["seg_bytes"] = encode_wav_pcm16(x[lo:hi], sr)
                    rows.append(base)
            cols = passthrough + [
                "seg_idx", "seg_start_ms", "seg_end_ms", "speech_ratio",
            ] + (["seg_bytes"] if emit_bytes else [])
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(op, schema=out_schema)


# ---------------------------------------------------------------------------
# acoustic fingerprinting (constellation hashes) + near-duplicate detection
# ---------------------------------------------------------------------------


def _spectral_peaks(
    x: np.ndarray, sr: int, n_fft: int = 1024, hop: int = 512,
    n_bands: int = 16, margin_db: float = 6.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Salient (frame, bin) spectral peaks: per frame, the argmax of each of
    ``n_bands`` frequency bands, kept when it clears the band median by
    ``margin_db`` — the robust-to-gain peak picking of the constellation
    method (Wang 2003)."""
    if x.size < n_fft:
        x = np.pad(x, (0, n_fft - x.size))
    w = np.hanning(n_fft)
    frames = np.lib.stride_tricks.sliding_window_view(x, n_fft)[::hop] * w
    logmag = 20.0 * np.log10(np.abs(np.fft.rfft(frames, axis=1)) + 1e-10)
    ts, fs = [], []
    for idx in np.array_split(np.arange(1, logmag.shape[1]), n_bands):
        sub = logmag[:, idx]
        j = np.argmax(sub, axis=1)
        v = sub[np.arange(sub.shape[0]), j]
        keep = v > np.median(sub, axis=1) + margin_db
        ts.append(np.flatnonzero(keep))
        fs.append(idx[j[keep]])
    t = np.concatenate(ts)
    f = np.concatenate(fs)
    order = np.lexsort((f, t))
    return t[order].astype(np.int64), f[order].astype(np.int64)


def _constellation_hashes(
    t: np.ndarray, f: np.ndarray, fanout: int = 8,
    dt_min: int = 1, dt_max: int = 32,
) -> tuple[np.ndarray, np.ndarray]:
    """Pair each anchor peak with its next ``fanout`` peaks within
    ``(dt_min, dt_max]`` frames: hash packs (f1, f2, dt) into one int64,
    returned with the anchor frame time (for offset-alignment voting)."""
    hs, ta = [], []
    for k in range(1, fanout + 1):
        if t.size <= k:
            break
        dt = t[k:] - t[:-k]
        m = (dt >= dt_min) & (dt <= dt_max)
        h = (f[:-k][m] << 24) | (f[k:][m] << 11) | dt[m]
        hs.append(h)
        ta.append(t[:-k][m])
    if not hs:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(hs), np.concatenate(ta)


def clip_fingerprints(
    df: DataFrame, payload_col: str = "bytes", id_col: str = "clip_id",
    n_fft: int = 1024, hop: int = 512, fanout: int = 8, dt_max: int = 32,
) -> DataFrame:
    """Long-form fingerprint table ``(id, fp_hash, fp_t)`` — one bounded set
    of constellation hashes per clip, deduplicated per (id, hash, t)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ts = [], [], []
            for i, b, c, s in zip(
                pdf[id_col], pdf[payload_col], pdf["codec"], pdf["sr_hz"]
            ):
                x = decode_payload(b, c, int(s))
                pt, pf = _spectral_peaks(x, int(s), n_fft=n_fft, hop=hop)
                h, ta = _constellation_hashes(pt, pf, fanout=fanout, dt_max=dt_max)
                ids.append(np.full(h.size, i, dtype=object))
                hs.append(h)
                ts.append(ta)
            out = pd.DataFrame({
                id_col: np.concatenate(ids) if ids else np.empty(0, object),
                "fp_hash": np.concatenate(hs) if hs else np.empty(0, np.int64),
                "fp_t": np.concatenate(ts) if ts else np.empty(0, np.int64),
            }).drop_duplicates()
            yield out

    return df.mapInPandas(op, schema=f"`{id_col}` string, fp_hash long, fp_t long")


def fingerprint_dedup(
    df: DataFrame,
    payload_col: str = "bytes",
    id_col: str = "clip_id",
    min_matches: int = 8,
    max_hash_clips: int | None = 50,
    **fp_kw,
) -> DataFrame:
    """Near-duplicate audio pairs via constellation-hash voting.

    Plan (the MinHash-dedup shape, applied to audio): fingerprint each clip
    (map-only), drop hashes shared by more than ``max_hash_clips`` clips
    (the frequent-shingle cap — default ON, engine/dedup.py precedent: a
    degenerate hash — e.g. mains hum — would otherwise create a quadratic
    bucket), self-join on ``fp_hash``, then vote: a pair is a near-dup when
    ``>= min_matches`` DISTINCT hashes agree on one time offset ``dt``
    (time-alignment voting makes gain changes, re-encodes, and
    silence-padding shifts all collapse onto a single dt spike, while
    unrelated clips scatter). Returns ``(id_a, id_b, aligned_matches)``.
    Shuffle volume is O(total hashes); never all-pairs.
    """
    fps = clip_fingerprints(df, payload_col=payload_col, id_col=id_col, **fp_kw)
    if max_hash_clips is not None:
        rare = (
            fps.groupBy("fp_hash")
            .agg(F.countDistinct(id_col).alias("_nc"))
            .where(F.col("_nc") <= max_hash_clips)
            .select("fp_hash")
        )
        fps = fps.join(rare, "fp_hash")
    a = fps.select(
        F.col(id_col).alias("id_a"), "fp_hash", F.col("fp_t").alias("t_a")
    )
    b = fps.select(
        F.col(id_col).alias("id_b"), "fp_hash", F.col("fp_t").alias("t_b")
    )
    pairs = (
        a.join(b, "fp_hash")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dt", F.col("t_b") - F.col("t_a"))
    )
    aligned = pairs.groupBy("id_a", "id_b", "dt").agg(
        F.countDistinct("fp_hash").alias("m")
    )
    return (
        aligned.groupBy("id_a", "id_b")
        .agg(F.max("m").alias("aligned_matches"))
        .where(F.col("aligned_matches") >= min_matches)
    )


# ---------------------------------------------------------------------------
# loudness normalization
# ---------------------------------------------------------------------------


def normalize_loudness(
    df: DataFrame,
    target_lufs: float = -23.0,
    max_gain_db: float = 40.0,
    payload_col: str = "bytes",
) -> DataFrame:
    """Normalize each clip to a target integrated loudness (BS.1770 gating).

    The standard TTS/ASR corpus-conditioning step after loudness
    measurement: gain = ``target - measured`` LU (clamped to
    ``±max_gain_db`` so near-silence is not blown up), samples scaled
    linearly, hard-clipped at full scale, re-encoded PCM16. Clips whose
    loudness is ungateable (shorter than one 400 ms block, or entirely
    below the −70 LUFS absolute gate) pass through unchanged with
    ``gain_db = 0``. Output replaces ``payload_col`` (codec becomes
    ``pcm_s16le``) and appends ``gain_db`` and ``clipped_frac``.

    Scale notes: same shape as every decode stage here — one Arrow-batched
    ``mapInPandas``, no shuffle; measurement and gain share the single
    decode.
    """
    passthrough = [c for c in df.columns if c not in (payload_col, "codec")]
    out_schema = (
        ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name not in (payload_col, "codec")
        )
        + f", `{payload_col}` binary, codec string, gain_db double, clipped_frac double"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, gains, clipped = [], [], []
            for b, c, s in zip(pdf[payload_col], pdf["codec"], pdf["sr_hz"]):
                sr = int(s)
                x = decode_payload(b, c, sr)
                lufs = loudness_lufs(x, sr)
                if math.isinf(lufs):
                    g_db = 0.0
                else:
                    g_db = float(np.clip(target_lufs - lufs, -max_gain_db, max_gain_db))
                y = x * (10.0 ** (g_db / 20.0))
                clip_mask = np.abs(y) > 1.0
                payloads.append(encode_wav_pcm16(y, sr))
                gains.append(g_db)
                clipped.append(float(clip_mask.mean()) if y.size else 0.0)
            out = pdf[passthrough].copy()
            out[payload_col] = payloads
            out["codec"] = "pcm_s16le"
            out["gain_db"] = gains
            out["clipped_frac"] = clipped
            yield out

    return df.mapInPandas(op, schema=out_schema)

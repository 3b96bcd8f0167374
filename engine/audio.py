"""Vectorized audio payload codec + feature extraction (Arrow/pandas UDFs).

The reference stores complex feature payloads Avro-binary-encoded as ``bytes``
and decodes them lazily at read time (``base/engine/FeatureGroupUtils.java:191-200``,
``base/engine/VectorServer.java:403-420``). Our graft's payload is an audio clip
as an opaque ``binary`` column (BASELINE.json ``input_hint``): a PCM16
little-endian WAV (or µ-law) body that must round-trip with SNR ≥ 30 dB.

All decode paths are numpy-vectorized inside Arrow-batched pandas UDFs — never
per-row Python loops over samples (``np.frombuffer`` on each buffer, numpy math
on the whole batch). At 100 TB the binary column is only ever read when a query
projects it: parquet column pruning keeps ``bytes`` unscanned otherwise, so
audio feature extraction is the *only* stage that pays the decode cost.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# WAV PCM16 codec (RIFF container, 44-byte canonical header)
# ---------------------------------------------------------------------------

_WAV_HEADER_LEN = 44


def encode_wav_pcm16(samples: np.ndarray, sr_hz: int) -> bytes:
    """float samples in [-1, 1] → mono PCM16-LE WAV bytes."""
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = np.round(x * 32767.0).astype("<i2")
    data = pcm.tobytes()
    n = len(data)
    u32 = lambda v: np.array(v, dtype="<u4").tobytes()
    u16 = lambda v: np.array(v, dtype="<u2").tobytes()
    header = (
        b"RIFF"
        + u32(36 + n)
        + b"WAVE"
        + b"fmt "
        + u32(16)
        + u16(1)  # PCM
        + u16(1)  # mono
        + u32(sr_hz)
        + u32(sr_hz * 2)  # byte rate
        + u16(2)  # block align
        + u16(16)  # bits per sample
        + b"data"
        + u32(n)
    )
    return header + data


def decode_wav_pcm16(buf: bytes) -> tuple[np.ndarray, int]:
    """mono PCM16-LE WAV bytes → (float64 samples in [-1, 1], sr_hz)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    sr = int(np.frombuffer(buf[24:28], dtype="<u4")[0])
    n = int(np.frombuffer(buf[40:44], dtype="<u4")[0])
    pcm = np.frombuffer(buf, dtype="<i2", offset=_WAV_HEADER_LEN, count=n // 2)
    return pcm.astype(np.float64) / 32767.0, sr


# ---------------------------------------------------------------------------
# µ-law (G.711) codec — exercises codec dispatch on the `codec` column
# ---------------------------------------------------------------------------

_MU = 255.0


def encode_ulaw(samples: np.ndarray) -> bytes:
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    return np.round((y + 1.0) * 127.5).astype(np.uint8).tobytes()


def decode_ulaw(buf: bytes) -> np.ndarray:
    y = np.frombuffer(buf, dtype=np.uint8).astype(np.float64) / 127.5 - 1.0
    return np.sign(y) * (np.power(1.0 + _MU, np.abs(y)) - 1.0) / _MU


# ---------------------------------------------------------------------------
# A-law (G.711) — the European companding twin of µ-law, fully vectorized
# ---------------------------------------------------------------------------

_ALAW_A = 87.6


def encode_alaw(samples: np.ndarray) -> bytes:
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    ax = np.abs(x)
    y = np.where(
        ax < 1.0 / _ALAW_A,
        _ALAW_A * ax / (1.0 + np.log(_ALAW_A)),
        (1.0 + np.log(_ALAW_A * np.maximum(ax, 1.0 / _ALAW_A)))
        / (1.0 + np.log(_ALAW_A)),
    )
    return np.round((np.sign(x) * y + 1.0) * 127.5).astype(np.uint8).tobytes()


def decode_alaw(buf: bytes) -> np.ndarray:
    y = np.frombuffer(buf, dtype=np.uint8).astype(np.float64) / 127.5 - 1.0
    ay = np.abs(y)
    la = 1.0 + np.log(_ALAW_A)
    x = np.where(
        ay < 1.0 / la,
        ay * la / _ALAW_A,
        np.exp(ay * la - 1.0) / _ALAW_A,
    )
    return np.sign(y) * x


# ---------------------------------------------------------------------------
# IMA ADPCM (DVI4) — 4 bits/sample adaptive differential PCM; the classic
# public step-size/index tables. Decode is inherently sequential (predictor
# feedback), so it loops per sample in Python — fine at clip granularity
# (~10 ms per 32k-sample clip inside the Arrow batch), and honest about it.
# ---------------------------------------------------------------------------

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def encode_ima_adpcm(samples: np.ndarray) -> bytes:
    """float [-1,1] → IMA ADPCM nibbles (2 samples/byte, low nibble first),
    prefixed by a 4-byte LE sample count — the nibble stream alone cannot
    represent an odd length (WAV stores the same fact in its ``fact``
    chunk), and without it decode(encode(x)) would grow by one phantom
    sample for odd inputs."""
    import struct as _struct

    pcm = np.round(
        np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0) * 32767.0
    ).astype(np.int64)
    pred, idx = 0, 0
    nibbles = []
    for s in pcm:
        step = int(_IMA_STEPS[idx])
        diff = int(s) - pred
        code = 0
        if diff < 0:
            code = 8
            diff = -diff
        if diff >= step:
            code |= 4
            diff -= step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            code |= 1
        # reconstruct exactly as the decoder will
        delta = (step >> 3) + ((code & 1) * (step >> 2)) + (
            ((code >> 1) & 1) * (step >> 1)) + (((code >> 2) & 1) * step)
        pred += -delta if code & 8 else delta
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX_ADJ[code & 7])))
        nibbles.append(code)
    if len(nibbles) % 2:
        nibbles.append(0)
    arr = np.asarray(nibbles, dtype=np.uint8)
    return _struct.pack("<I", len(pcm)) + ((arr[1::2] << 4) | arr[0::2]).tobytes()


def decode_ima_adpcm(buf: bytes) -> np.ndarray:
    import struct as _struct

    (n_samples,) = _struct.unpack_from("<I", buf, 0)
    b = np.frombuffer(buf, dtype=np.uint8, offset=4)
    codes = np.empty(len(b) * 2, dtype=np.int64)
    codes[0::2] = b & 0x0F
    codes[1::2] = b >> 4
    pred, idx = 0, 0
    out = np.empty(len(codes), dtype=np.float64)
    for i, code in enumerate(codes):
        step = int(_IMA_STEPS[idx])
        delta = (step >> 3) + ((code & 1) * (step >> 2)) + (
            ((code >> 1) & 1) * (step >> 1)) + (((code >> 2) & 1) * step)
        pred += -delta if code & 8 else delta
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX_ADJ[code & 7])))
        out[i] = pred / 32767.0
    return out[:n_samples]


def decode_payload(buf: bytes, codec: str, sr_hz: int) -> np.ndarray:
    """Dispatch on the codec column. Unknown codecs raise (stub boundary —
    perceptual codecs like opus/mp3/flac need external libs absent here)."""
    if codec == "pcm_s16le":
        samples, _sr = decode_wav_pcm16(buf)
        return samples
    if codec == "ulaw":
        return decode_ulaw(buf)
    if codec == "alaw":
        return decode_alaw(buf)
    if codec in ("ima_adpcm", "adpcm"):
        return decode_ima_adpcm(buf)
    if codec == "flac":
        from engine.flac import decode_flac_float

        return decode_flac_float(buf)[0]
    raise NotImplementedError(f"codec '{codec}' requires external decoder (stub)")


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """Signal-to-noise ratio of a codec round trip, in dB."""
    reference = np.asarray(reference, dtype=np.float64)
    decoded = np.asarray(decoded, dtype=np.float64)
    noise = reference - decoded
    p_sig = float(np.mean(reference**2))
    p_noise = float(np.mean(noise**2))
    if p_noise == 0.0:
        return float("inf")
    return 10.0 * np.log10(p_sig / p_noise)


# ---------------------------------------------------------------------------
# Spark-side vectorized feature extraction
# ---------------------------------------------------------------------------

AUDIO_FEATURE_FIELDS = (
    "n_samples bigint, rms double, peak double, zcr double, "
    "decoded_dur_ms double, clipped_frac double"
)


def _basic_feats(x: np.ndarray, sr_hz: int) -> tuple:
    """(n_samples, rms, peak, zcr, decoded_dur_ms, clipped_frac) — the single
    definition shared by both extraction paths."""
    n = x.size
    if n == 0:
        return 0, 0.0, 0.0, 0.0, 0.0, 0.0
    rms = float(np.sqrt(np.mean(x**2)))
    peak = float(np.max(np.abs(x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    dur_ms = 1000.0 * n / sr_hz
    clipped = float(np.mean(np.abs(x) >= (32766.0 / 32767.0)))
    return n, rms, peak, zcr, dur_ms, clipped


SPECTRAL_FEATURE_FIELDS = (
    "centroid_mean double, centroid_std double, bandwidth_mean double, "
    "rolloff_mean double, flatness_mean double, energy_std double, "
    "band_energies array<double>"
)

_HANN_CACHE: dict = {}
N_BANDS = 8


def _spectral_one(x: np.ndarray, sr: int) -> tuple:
    """STFT-based clip descriptors: spectral centroid/bandwidth/rolloff/
    flatness stats + log band energies — the standard speech-feature set
    (25 ms window, 10 ms hop)."""
    win = max(64, int(0.025 * sr))
    hop = max(32, int(0.010 * sr))
    if x.size < win:
        x = np.pad(x, (0, win - x.size))
    w = _HANN_CACHE.get(win)
    if w is None:
        w = _HANN_CACHE[win] = np.hanning(win)
    frames = np.lib.stride_tricks.sliding_window_view(x, win)[::hop] * w
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    freqs = np.fft.rfftfreq(win, 1.0 / sr)
    total = spec.sum(axis=1) + 1e-12
    centroid = (spec * freqs).sum(axis=1) / total
    bw = np.sqrt(((freqs[None, :] - centroid[:, None]) ** 2 * spec).sum(axis=1) / total)
    roll = freqs[np.argmax(np.cumsum(spec, axis=1) >= 0.85 * total[:, None], axis=1)]
    flat = np.exp(np.mean(np.log(spec + 1e-12), axis=1)) / (spec.mean(axis=1) + 1e-12)
    bands = [
        float(np.log10(b.mean() + 1e-12))
        for b in np.array_split(spec, N_BANDS, axis=1)
    ]
    return (
        float(centroid.mean()), float(centroid.std()), float(bw.mean()),
        float(roll.mean()), float(flat.mean()), float(total.std()), bands,
    )


def extract_audio_features(
    df: DataFrame, payload_col: str = "bytes", spectral: bool = False
) -> DataFrame:
    """Append per-clip acoustic features, decoded batch-at-a-time.

    This is the graft analogue of the reference's per-record Avro decode map
    (``OnlineFeatureGroupGenericRecordWriter.java:49-73``) — but batched via
    ``mapInPandas`` so Python touches Arrow record batches, not rows. Columns
    other than the payload pass through untouched; parquet scans that feed this
    operator project only the needed columns (pushdown-friendly).
    """
    passthrough = [c for c in df.columns if c != payload_col]
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields if f.name != payload_col)
        + ", "
        + AUDIO_FEATURE_FIELDS
        + (", " + SPECTRAL_FEATURE_FIELDS if spectral else "")
    )
    base_cols = ["n_samples", "rms", "peak", "zcr", "decoded_dur_ms", "clipped_frac"]
    spec_cols = [
        "centroid_mean", "centroid_std", "bandwidth_mean", "rolloff_mean",
        "flatness_mean", "energy_std", "band_energies",
    ]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, specs = [], []
            for b, c, s in zip(pdf[payload_col], pdf["codec"], pdf["sr_hz"]):
                x = decode_payload(b, c, s)
                feats.append(_basic_feats(x, int(s)))
                if spectral:
                    specs.append(_spectral_one(x, int(s)))
            fcols = pd.DataFrame(feats, columns=base_cols, index=pdf.index)
            if spectral:
                scols = pd.DataFrame(specs, columns=spec_cols, index=pdf.index)
                fcols = pd.concat([fcols, scols], axis=1)
            yield pd.concat([pdf[passthrough], fcols], axis=1)

    return df.mapInPandas(op, schema=out_schema)


def extract_audio_features_direct(
    df: DataFrame,
    spectral: bool = False,
    payload_col: str = "bytes",
    id_col: str = "clip_id",
) -> DataFrame:
    """Payload-direct feature extraction: bytes never cross the JVM.

    For payload-heavy tables the JVM→Python Arrow transfer of the ``bytes``
    column is the throughput ceiling (measured ~750 MB/s aggregate on this
    box, flat in cores — it caps the whole pipeline while CPUs idle).  The
    scale-correct plan is: let Catalyst scan only the *metadata* columns
    (parquet column pruning keeps the payload on disk), and have the
    vectorized Python stage read the payload column straight from the backing
    parquet file (disk → Arrow → numpy, no JVM hop), keyed by
    ``_metadata.file_path``.  At 100 TB this is the difference between moving
    the corpus through the scan twice and once.

    ``df`` must be a parquet-backed DataFrame (batch or streaming).  All
    non-payload columns pass through; output schema matches
    :func:`extract_audio_features`.
    """
    from pyspark.sql import functions as F  # noqa: F811 (local for clarity)

    meta_cols = [c for c in df.columns
                 if c not in (payload_col, "__file_path")]
    if "__file_path" in df.columns:
        # source already carries the backing-file path (the snapshot-tail
        # source's include_file_path option) — no _metadata column needed,
        # and the payload column never even enters the plan
        pruned = df.select(*meta_cols, "__file_path")
    else:
        pruned = df.select(
            *meta_cols, F.col("_metadata.file_path").alias("__file_path"))

    out_schema = (
        ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name not in (payload_col, "__file_path")
        )
        + ", "
        + AUDIO_FEATURE_FIELDS
        + (", " + SPECTRAL_FEATURE_FIELDS if spectral else "")
    )
    base_cols = ["n_samples", "rms", "peak", "zcr", "decoded_dur_ms", "clipped_frac"]
    spec_cols = [
        "centroid_mean", "centroid_std", "bandwidth_mean", "rolloff_mean",
        "flatness_mean", "energy_std", "band_energies",
    ]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        payload_cache: dict[str, dict] = {}

        def payloads_for(path: str) -> dict:
            got = payload_cache.get(path)
            if got is None:
                local = path[7:] if path.startswith("file://") else path
                tbl = pq.read_table(local, columns=[id_col, payload_col])
                got = dict(
                    zip(tbl.column(id_col).to_pylist(), tbl.column(payload_col).to_pylist())
                )
                payload_cache.clear()  # one file resident at a time per worker
                payload_cache[path] = got
            return got

        for pdf in batches:
            feats, specs = [], []
            for cid, fp, c, s in zip(
                pdf[id_col], pdf["__file_path"], pdf["codec"], pdf["sr_hz"]
            ):
                b = payloads_for(fp)[cid]
                x = decode_payload(b, c, s)
                feats.append(_basic_feats(x, int(s)))
                if spectral:
                    specs.append(_spectral_one(x, int(s)))
            fcols = pd.DataFrame(feats, columns=base_cols, index=pdf.index)
            if spectral:
                scols = pd.DataFrame(specs, columns=spec_cols, index=pdf.index)
                fcols = pd.concat([fcols, scols], axis=1)
            yield pd.concat([pdf[meta_cols], fcols], axis=1)

    return pruned.mapInPandas(op, schema=out_schema)


def with_payload_size(df: DataFrame, payload_col: str = "bytes") -> DataFrame:
    """Cheap JVM-side metadata: payload byte length without any Python."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col)))


# ---------------------------------------------------------------------------
# Speech features: log-mel filterbank, MFCC, f0 — pure numpy, Arrow-batched
# ---------------------------------------------------------------------------

SPEECH_FEATURE_FIELDS = (
    "logmel_mean array<double>, mfcc_mean array<double>, "
    "mfcc_std array<double>, f0_hz double, voiced_frac double, "
    "silence_frac double"
)

_MEL_CACHE: dict = {}
_DCT_CACHE: dict = {}


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def _mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """(n_mels, n_fft//2+1) triangular filterbank, HTK mel scale."""
    key = (sr, n_fft, n_mels)
    fb = _MEL_CACHE.get(key)
    if fb is not None:
        return fb
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2))
    fb = np.zeros((n_mels, freqs.size))
    for i in range(n_mels):
        lo, mid, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (freqs - lo) / max(mid - lo, 1e-9)
        down = (hi - freqs) / max(hi - mid, 1e-9)
        fb[i] = np.clip(np.minimum(up, down), 0.0, None)
    _MEL_CACHE[key] = fb
    return fb


def _dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the MFCC projection)."""
    key = (n_mfcc, n_mels)
    m = _DCT_CACHE.get(key)
    if m is None:
        k = np.arange(n_mfcc)[:, None]
        n = np.arange(n_mels)[None, :]
        m = np.cos(np.pi * k * (2 * n + 1) / (2.0 * n_mels)) * np.sqrt(2.0 / n_mels)
        m[0] /= np.sqrt(2.0)
        _DCT_CACHE[key] = m
    return m


def _speech_one(
    x: np.ndarray, sr: int, n_mels: int = 26, n_mfcc: int = 13,
    fmin: float = 50.0, fmax: float = 500.0,
) -> tuple:
    """Per-clip speech descriptors: mean log-mel energies, MFCC mean/std
    across frames, autocorrelation pitch (median over voiced frames),
    voiced/silence fractions. 25 ms window / 10 ms hop like _spectral_one."""
    win = max(64, int(0.025 * sr))
    hop = max(32, int(0.010 * sr))
    if x.size < win:
        x = np.pad(x, (0, win - x.size))
    w = _HANN_CACHE.get(win)
    if w is None:
        w = _HANN_CACHE[win] = np.hanning(win)
    frames = np.lib.stride_tricks.sliding_window_view(x, win)[::hop]
    spec = np.abs(np.fft.rfft(frames * w, axis=1)) ** 2
    fb = _mel_filterbank(sr, win, n_mels)
    logmel = np.log10(spec @ fb.T + 1e-10)          # (frames, n_mels)
    mfcc = logmel @ _dct_matrix(n_mfcc, n_mels).T   # (frames, n_mfcc)

    # frame-energy silence gate at -40 dB relative to the clip's peak frame
    energy = frames.std(axis=1) + 1e-12
    silence = energy < energy.max() * 10 ** (-40 / 20)

    # pitch: frame autocorrelation peak within [fmin, fmax] lags
    lag_lo = max(2, int(sr / fmax))
    lag_hi = min(win - 2, int(sr / fmin))
    f0s = []
    step = max(1, frames.shape[0] // 50)  # cap pitch work at ~50 frames/clip
    for i in range(0, frames.shape[0], step):
        if silence[i]:
            continue
        fr = frames[i] - frames[i].mean()
        ac = np.correlate(fr, fr, mode="full")[fr.size - 1:]
        if ac[0] <= 0:
            continue
        seg = ac[lag_lo:lag_hi]
        if not seg.size:
            continue
        lag = lag_lo + int(np.argmax(seg))
        # voiced when the autocorrelation peak is strong
        if ac[lag] / ac[0] > 0.5:
            f0s.append(sr / lag)
    n_checked = max(1, len(range(0, frames.shape[0], step)))
    return (
        [float(v) for v in logmel.mean(axis=0)],
        [float(v) for v in mfcc.mean(axis=0)],
        [float(v) for v in mfcc.std(axis=0)],
        float(np.median(f0s)) if f0s else 0.0,
        float(len(f0s) / n_checked),
        float(np.mean(silence)),
    )


def extract_speech_features(
    df: DataFrame, payload_col: str = "bytes", n_mels: int = 26, n_mfcc: int = 13
) -> DataFrame:
    """Log-mel / MFCC / pitch features per clip — the training-data
    featurization a speech pipeline runs at 100 TB. Same Arrow-batched
    ``mapInPandas`` shape as :func:`extract_audio_features`: payload bytes
    decode inside the Python stage, passthrough columns stay JVM-side, and
    the parquet scan projects only what is used."""
    passthrough = [c for c in df.columns if c != payload_col]
    out_schema = (
        ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name != payload_col
        )
        + ", "
        + SPEECH_FEATURE_FIELDS
    )
    cols = ["logmel_mean", "mfcc_mean", "mfcc_std", "f0_hz", "voiced_frac",
            "silence_frac"]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _speech_one(decode_payload(b, c, s), int(s), n_mels, n_mfcc)
                for b, c, s in zip(pdf[payload_col], pdf["codec"], pdf["sr_hz"])
            ]
            fcols = pd.DataFrame(feats, columns=cols, index=pdf.index)
            yield pd.concat([pdf[passthrough], fcols], axis=1)

    return df.mapInPandas(op, schema=out_schema)

"""Audio codec round-trip invariants (BASELINE.json input_hint):
decoded-PCM allclose with SNR >= 30 dB + transcript byte equality."""

import numpy as np
import pytest

from engine.audio import (
    decode_payload,
    decode_ulaw,
    decode_wav_pcm16,
    encode_ulaw,
    encode_wav_pcm16,
    extract_audio_features,
    snr_db,
)
from engine.synth import make_clips_pdf


def _sine(sr=16000, dur_s=0.25, f=440.0, amp=0.5, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur_s)) / sr
    return amp * np.sin(2 * np.pi * f * t) + 0.005 * rng.standard_normal(t.size)


def test_wav_roundtrip_snr():
    sig = _sine()
    buf = encode_wav_pcm16(sig, 16000)
    dec, sr = decode_wav_pcm16(buf)
    assert sr == 16000
    assert dec.shape == sig.shape
    assert snr_db(sig, dec) >= 30.0
    # PCM16 quantization is tiny: allclose at 1e-3 absolute
    assert np.allclose(sig, dec, atol=2e-4)


def test_ulaw_roundtrip_snr():
    sig = _sine(amp=0.4)
    dec = decode_ulaw(encode_ulaw(sig))
    assert snr_db(sig, dec) >= 30.0


def test_unknown_codec_raises():
    with pytest.raises(NotImplementedError):
        decode_payload(b"xxxx", "opus", 16000)


def test_synth_clips_deterministic_and_decodable():
    a = make_clips_pdf(50, seed=42)
    b = make_clips_pdf(50, seed=42)
    assert a["clip_id"].tolist() == b["clip_id"].tolist()
    assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))
    assert a["transcript"].tolist() == b["transcript"].tolist()
    for _, row in a.head(10).iterrows():
        dec = decode_payload(row["bytes"], row["codec"], row["sr_hz"])
        n_expected = int(row["sr_hz"] * row["dur_ms"] / 1000)
        assert dec.size == n_expected
        assert np.max(np.abs(dec)) <= 1.0


def test_extract_audio_features_spark(spark, clips_df):
    feats = extract_audio_features(clips_df.limit(64)).toPandas()
    assert set(
        ["n_samples", "rms", "peak", "zcr", "decoded_dur_ms", "clipped_frac"]
    ) <= set(feats.columns)
    # transcript passes through byte-identical
    src = clips_df.limit(64).select("clip_id", "transcript").toPandas()
    merged = src.merge(feats[["clip_id", "transcript"]], on="clip_id", suffixes=("_a", "_b"))
    assert (merged["transcript_a"] == merged["transcript_b"]).all()
    assert (feats["rms"] > 0).all()
    np.testing.assert_allclose(
        feats["decoded_dur_ms"], feats["n_samples"] * 1000.0 / feats["sr_hz"], rtol=1e-9
    )

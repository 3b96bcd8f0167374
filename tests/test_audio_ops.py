"""Audio training-data-pipeline operators (engine/audio_ops.py):
polyphase resampling, BS.1770 loudness, energy VAD, constellation
fingerprint dedup. Each numeric operator gets a physics / spec-vector
check; each Spark operator gets a plan-shape + semantics check."""

import math

import numpy as np
import pytest

from engine.audio import decode_payload, encode_wav_pcm16, snr_db
from engine.audio_ops import (
    clip_fingerprints,
    fingerprint_dedup,
    k_weighting_coeffs,
    loudness_lufs,
    resample_clips,
    resample_poly,
    segment_clips,
    vad_segments,
    with_loudness,
    _lin_rec2,
)


def _sine(sr, dur_s, f, amp=0.5, seed=None):
    t = np.arange(int(sr * dur_s)) / sr
    x = amp * np.sin(2 * np.pi * f * t)
    if seed is not None:
        x = x + 0.003 * np.random.default_rng(seed).standard_normal(t.size)
    return x


# ---------------------------------------------------------------------------
# resampling
# ---------------------------------------------------------------------------


def test_resample_identity_and_length():
    x = _sine(16000, 0.25, 440.0)
    assert np.array_equal(resample_poly(x, 16000, 16000), x)
    for sr_out in (8000, 22050, 44100, 11025):
        y = resample_poly(x, 16000, sr_out)
        g = math.gcd(16000, sr_out)
        L, M = sr_out // g, 16000 // g
        assert y.size == -((-x.size * L) // M)


@pytest.mark.parametrize("sr_in,sr_out", [(16000, 8000), (8000, 16000), (44100, 16000)])
def test_resample_sine_snr(sr_in, sr_out):
    # A pure tone below both Nyquists must survive resampling almost exactly
    f = 440.0
    x = _sine(sr_in, 0.5, f)
    y = resample_poly(x, sr_in, sr_out)
    t = np.arange(y.size) / sr_out
    ideal = 0.5 * np.sin(2 * np.pi * f * t)
    # trim filter edge transients before comparing
    k = int(0.02 * sr_out)
    assert snr_db(ideal[k:-k], y[k:-k]) >= 40.0


def test_resample_rejects_above_nyquist():
    # 7 kHz tone downsampled to 8 kHz (Nyquist 4 kHz) must be attenuated,
    # not aliased back at full amplitude
    x = _sine(16000, 0.5, 7000.0)
    y = resample_poly(x, 16000, 8000)
    k = 200
    assert np.sqrt(np.mean(y[k:-k] ** 2)) < 0.05 * np.sqrt(np.mean(x**2))


# ---------------------------------------------------------------------------
# loudness
# ---------------------------------------------------------------------------


def test_k_weighting_spec_vectors_48k():
    # ITU-R BS.1770-4 Table 1/2 prints the 48 kHz coefficients; our analog
    # re-derivation must reproduce them to ~1e-4
    (b1, a1), (b2, a2) = k_weighting_coeffs(48000)
    assert np.allclose(b1, [1.53512485958697, -2.69169618940638, 1.19839281085285], atol=2e-4)
    assert np.allclose(a1, [1.0, -1.69065929318241, 0.73248077421585], atol=2e-4)
    assert np.allclose(b2, [1.0, -2.0, 1.0], atol=2e-4)
    assert np.allclose(a2, [1.0, -1.99004745483398, 0.99007225036621], atol=2e-4)


def test_lin_rec2_matches_naive_loop():
    rng = np.random.default_rng(7)
    v = rng.standard_normal(257)
    c1, c2 = 1.69, -0.73
    ref = np.empty_like(v)
    for n in range(v.size):
        ref[n] = v[n]
        if n >= 1:
            ref[n] += c1 * ref[n - 1]
        if n >= 2:
            ref[n] += c2 * ref[n - 2]
    assert np.allclose(_lin_rec2(v, c1, c2), ref, rtol=1e-9, atol=1e-9)


def test_loudness_997hz_reference_tone():
    # BS.1770: a 997 Hz 0 dBFS sine reads -3.01 LKFS
    x = np.sin(2 * np.pi * 997.0 * np.arange(48000 * 2) / 48000.0)
    assert abs(loudness_lufs(x, 48000) - (-3.01)) < 0.1
    # gain linearity: -20 dB signal reads 20 LU lower
    assert abs(loudness_lufs(0.1 * x, 48000) - (-23.01)) < 0.1
    # rate independence of the analog-prototype derivation
    x16 = np.sin(2 * np.pi * 997.0 * np.arange(16000 * 2) / 16000.0)
    assert abs(loudness_lufs(x16, 16000) - (-3.01)) < 0.15


def test_loudness_gates():
    assert loudness_lufs(np.zeros(48000), 48000) == float("-inf")
    assert loudness_lufs(np.ones(100), 48000) == float("-inf")  # < 1 block


# ---------------------------------------------------------------------------
# VAD
# ---------------------------------------------------------------------------


def test_vad_two_segments():
    sr = 16000
    speech = _sine(sr, 0.5, 300.0, amp=0.4, seed=0)
    silence = 1e-4 * np.random.default_rng(1).standard_normal(int(0.5 * sr))
    x = np.concatenate([speech, silence, speech])
    segs = vad_segments(x, sr)
    assert len(segs) == 2
    (s0, e0), (s1, e1) = segs
    assert s0 < 60 and abs(e0 - 500) < 80
    assert abs(s1 - 1000) < 80 and e1 > 1400


def test_vad_silence_and_gap_bridging():
    sr = 16000
    assert vad_segments(1e-5 * np.ones(sr), sr) == []
    speech = _sine(sr, 0.3, 300.0, amp=0.4, seed=0)
    gap = 1e-4 * np.ones(int(0.08 * sr))  # 80 ms < min_gap_ms=150 → bridged
    x = np.concatenate([speech, gap, speech])
    assert len(vad_segments(x, sr)) == 1


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def test_resample_clips_spark(spark, clips_df):
    sub = clips_df.limit(30)
    out = resample_clips(sub, 8000).toPandas()
    assert len(out) == 30
    assert (out["sr_hz"] == 8000).all()
    assert (out["codec"] == "pcm_s16le").all()
    src = sub.toPandas().set_index("clip_id")
    for _, r in out.head(5).iterrows():
        y = decode_payload(r["bytes"], r["codec"], 8000)
        orig = src.loc[r["clip_id"]]
        # duration preserved to within a millisecond-class rounding
        assert abs(r["dur_ms"] - orig["dur_ms"]) <= 2
        assert y.size == int(round(8000 * r["dur_ms"] / 1000))


def test_with_loudness_spark(spark, clips_df):
    out = with_loudness(clips_df.limit(40)).toPandas()
    assert "loudness_lufs" in out.columns and "bytes" not in out.columns
    vals = out["loudness_lufs"].dropna()
    assert len(vals) > 0
    assert ((vals > -70) & (vals < 0)).all()


def test_with_loudness_silence_is_null(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "clip_id": ["silent", "tone"],
            "bytes": [
                encode_wav_pcm16(np.zeros(16000), 16000),
                encode_wav_pcm16(_sine(16000, 1.0, 440.0), 16000),
            ],
            "sr_hz": np.int32([16000, 16000]),
            "codec": ["pcm_s16le"] * 2,
        }
    )
    out = with_loudness(spark.createDataFrame(pdf))
    assert out.where("loudness_lufs IS NULL").count() == 1
    assert out.where("clip_id = 'silent' AND loudness_lufs IS NULL").count() == 1


def test_segment_clips_spark(spark, clips_df):
    out = segment_clips(clips_df.limit(30)).toPandas()
    assert len(out) > 0
    assert (out["seg_end_ms"] > out["seg_start_ms"]).all()
    assert (out["seg_start_ms"] >= 0).all()
    assert ((out["speech_ratio"] > 0) & (out["speech_ratio"] <= 1.0)).all()
    r = out.iloc[0]
    seg = decode_payload(r["seg_bytes"], "pcm_s16le", int(r["sr_hz"]))
    n_exp = int((r["seg_end_ms"] - r["seg_start_ms"]) * r["sr_hz"] / 1000)
    assert abs(seg.size - n_exp) <= 2


def _dup_corpus(spark):
    """8 independent noise clips (rich, uncorrelated constellations) + one
    gain-scaled copy of clip 0 shifted by an integer number of STFT hops
    (4 x 512 samples) — the canonical near-dup pair."""
    import pandas as pd

    sr = 16000
    rows = []
    rng = np.random.default_rng(11)
    base = None
    for i in range(8):
        x = 0.3 * rng.standard_normal(int(1.5 * sr))
        if i == 0:
            base = x
        rows.append(("clip%02d" % i, encode_wav_pcm16(x, sr), sr, 1500, "pcm_s16le"))
    dup = np.concatenate([np.zeros(4 * 512), 0.6 * base])
    rows.append(("clip99", encode_wav_pcm16(dup, sr), sr, 1628, "pcm_s16le"))
    pdf = pd.DataFrame(rows, columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec"])
    return spark.createDataFrame(pdf)


def test_fingerprint_dedup_finds_shifted_gain_copy(spark):
    df = _dup_corpus(spark)
    pairs = fingerprint_dedup(df, min_matches=8).toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert ("clip00", "clip99") in found
    # no false positives among the 8 unrelated clips
    assert all(p == ("clip00", "clip99") for p in found)


def test_fingerprint_plan_no_cartesian(spark):
    df = _dup_corpus(spark)
    plan = fingerprint_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_clip_fingerprints_deterministic(spark, clips_df):
    sub = clips_df.limit(10)
    a = clip_fingerprints(sub).toPandas().sort_values(["clip_id", "fp_hash", "fp_t"])
    b = clip_fingerprints(sub).toPandas().sort_values(["clip_id", "fp_hash", "fp_t"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert (a.groupby("clip_id").size() > 0).all()


def test_map_stages_no_shuffle(spark, clips_df):
    """resample/loudness/segment are single map stages: no Exchange in the
    plan before any caller-added aggregation."""
    from engine.audio_ops import resample_clips, segment_clips, with_loudness

    for df in (
        resample_clips(clips_df, 8000),
        with_loudness(clips_df),
        segment_clips(clips_df, emit_bytes=False),
    ):
        plan = df._jdf.queryExecution().executedPlan().treeString()
        assert "Exchange" not in plan
        assert "MapInPandas" in plan


def test_normalize_loudness_hits_target(spark):
    import numpy as np

    from engine.audio import encode_wav_pcm16
    from engine.audio_ops import loudness_lufs, normalize_loudness
    from engine.audio import decode_payload

    sr = 8000
    t = np.arange(sr) / sr  # 1 s
    rows = []
    for i, amp in enumerate([0.05, 0.2, 0.6]):
        x = amp * np.sin(2 * np.pi * 440.0 * t)
        rows.append((f"c{i}", encode_wav_pcm16(x, sr), sr, "pcm_s16le"))
    # plus a too-short clip (ungateable -> passthrough, gain 0)
    rows.append(("short", encode_wav_pcm16(np.zeros(100), sr), sr, "pcm_s16le"))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, codec string"
    )
    out = {r.clip_id: r for r in normalize_loudness(df, target_lufs=-23.0).collect()}
    for i in range(3):
        r = out[f"c{i}"]
        got = loudness_lufs(decode_payload(bytes(r.bytes), r.codec, sr), sr)
        assert abs(got - (-23.0)) < 0.3, (r.clip_id, got, r.gain_db)
        assert r.clipped_frac < 0.01
    # quiet clip boosted, loud clip attenuated
    assert out["c0"].gain_db > 0 > out["c2"].gain_db
    assert out["short"].gain_db == 0.0


def test_normalize_loudness_gain_cap(spark):
    import numpy as np

    from engine.audio import encode_wav_pcm16
    from engine.audio_ops import normalize_loudness

    sr = 8000
    # ~-54 LUFS whisper: reaching -16 would need ~+38 dB, cap at 30
    x = 3e-3 * np.sin(2 * np.pi * 300.0 * np.arange(sr) / sr)
    df = spark.createDataFrame(
        [("w", encode_wav_pcm16(x, sr), sr, "pcm_s16le")],
        "clip_id string, bytes binary, sr_hz int, codec string",
    )
    r = normalize_loudness(df, target_lufs=-16.0, max_gain_db=30.0).collect()[0]
    assert r.gain_db == 30.0


def test_round_half_up_matches_spark_round(spark):
    """engine/oracle_media.round_half_up must mirror Spark F.round
    (BigDecimal-of-shortest-repr, HALF_UP) on doubles — including the
    banker's-rounding divergence cases where Python round() differs."""
    from pyspark.sql import functions as F

    from engine.oracle_media import round_half_up

    vals = [0.5, 1.5, 2.5, 0.125, 0.135, -0.5, -2.5, 1.0000005,
            3.141592653589793, 2.675, -2.675, 0.0, 123456.789012349]
    for nd in (0, 2, 5, 6):
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        got = [r[0] for r in df.select(F.round("v", nd)).collect()]
        want = [round_half_up(v, nd) for v in vals]
        assert got == want, (nd, list(zip(vals, got, want)))


def test_values_sql_duckdb_round_trip():
    """values_sql literals must come back from DuckDB exactly — floats
    bit-for-bit, NULLs typed, strings with quotes escaped, timestamps µs."""
    import duckdb
    import pandas as pd

    from engine.oracle_media import values_sql

    rows = [
        ("a'b", 1, 0.1 + 0.2, None, pd.Timestamp("2024-01-02 03:04:05.123456")),
        ("c", None, None, -2.5, pd.Timestamp("2024-06-30 23:59:59")),
    ]
    cols = [("s", "str"), ("i", "int"), ("x", "float"), ("y", "float"),
            ("t", "ts")]
    out = duckdb.sql(values_sql(rows, cols)).df()
    assert out["s"].tolist() == ["a'b", "c"]
    assert out["i"].tolist()[0] == 1 and pd.isna(out["i"].tolist()[1])
    assert out["x"].iloc[0] == 0.1 + 0.2  # exact repr round-trip
    assert pd.isna(out["x"].iloc[1]) and out["y"].iloc[1] == -2.5
    assert out["t"].iloc[0] == pd.Timestamp("2024-01-02 03:04:05.123456")
    # empty row set still pins the schema
    empty = duckdb.sql(values_sql([], cols)).df()
    assert list(empty.columns) == ["s", "i", "x", "y", "t"] and len(empty) == 0

"""Property-based tests (SURVEY.md §5.2 item 5) over the pandas golden oracle
— the independent reference every Spark plan is checked against.  Pure-pandas,
so hypothesis can run hundreds of examples without Spark in the loop."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.oracle import session_oracle, sliding_oracle, tumbling_oracle

WIDTH = 600_000  # 10 minutes
SLIDE = 300_000


def events(min_size=1, max_size=80):
    row = st.tuples(
        st.integers(min_value=0, max_value=5_000_000),   # ts_ms
        st.integers(min_value=1, max_value=5),           # key
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
    )
    return st.lists(row, min_size=min_size, max_size=max_size)


def _pdf(rows):
    return pd.DataFrame(rows, columns=["ts", "k", "v"])


def _norm(out, label="x"):
    cols = sorted(out.columns)
    return (
        out[cols]
        .sort_values(["window_start_ms", "k"], ignore_index=True)
        .round(9)
    )


@settings(max_examples=200, deadline=None)
@given(events(), st.randoms())
def test_tumbling_permutation_invariant(rows, rnd):
    """Batch window aggregation is invariant to arrival order."""
    pdf = _pdf(rows)
    shuffled = pdf.sample(frac=1.0, random_state=rnd.randrange(1 << 30))
    a = _norm(tumbling_oracle(pdf, "ts", "k", "v", WIDTH, "x"))
    b = _norm(tumbling_oracle(shuffled, "ts", "k", "v", WIDTH, "x"))
    pd.testing.assert_frame_equal(a, b, check_exact=False, rtol=1e-9)


@settings(max_examples=200, deadline=None)
@given(events(min_size=2), st.integers(min_value=1, max_value=79))
def test_tumbling_merge_associative(rows, cut):
    """Partial aggregation over any split merges to the full result —
    the reference accumulator's add/merge law (TransactionCountAggregate)."""
    pdf = _pdf(rows)
    cut = cut % max(len(pdf) - 1, 1) + 1
    full = tumbling_oracle(pdf, "ts", "k", "v", WIDTH, "x")

    def partial(p):
        w = (p["ts"].to_numpy() // WIDTH) * WIDTH
        g = p.assign(w=w).groupby(["w", "k"])["v"]
        return pd.DataFrame({
            "n": g.count(), "s": g.sum(), "mn": g.min(), "mx": g.max()
        }).reset_index()

    merged = (
        pd.concat([partial(pdf.iloc[:cut]), partial(pdf.iloc[cut:])])
        .groupby(["w", "k"], as_index=False)
        .agg(n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max"))
    )
    chk = full.merge(merged, left_on=["window_start_ms", "k"], right_on=["w", "k"])
    assert len(chk) == len(full) == len(merged)
    assert (chk["num_trans_per_x"] == chk["n"]).all()
    # atol scales with summand magnitude: different summation orders cancel
    # to different ulp-scale residues (e.g. [0, a, -a, tiny] -> tiny vs 0.0),
    # so exact-zero sums carry error at ~n*ulp(max|v|), not at 1e-300
    atol = max(pdf["v"].abs().max(), 1e-300) * len(pdf) * 1e-12
    np.testing.assert_allclose(
        chk["avg_amt_per_x"] * chk["n"], chk["s"], rtol=1e-9, atol=atol
    )
    np.testing.assert_allclose(chk["min_amt_per_x"], chk["mn"], rtol=1e-12)
    np.testing.assert_allclose(chk["max_amt_per_x"], chk["mx"], rtol=1e-12)


@settings(max_examples=200, deadline=None)
@given(events())
def test_sliding_covers_each_row_exactly_width_over_slide(rows):
    """Every event lands in exactly width/slide sliding windows, and total
    sliding count mass = rows x (width/slide)."""
    pdf = _pdf(rows)
    out = sliding_oracle(pdf, "ts", "k", "v", WIDTH, SLIDE, "x")
    assert out["num_trans_per_x"].sum() == len(pdf) * (WIDTH // SLIDE)
    # window starts are slide-aligned and cover their rows
    assert (out["window_start_ms"] % SLIDE == 0).all()


@settings(max_examples=200, deadline=None)
@given(events(), st.integers(min_value=1_000, max_value=600_000))
def test_session_islands_disjoint_and_gap_respected(rows, gap):
    """Per key: sessions are disjoint, ordered, separated by >= gap, and
    account for every event exactly once."""
    pdf = _pdf(rows)
    out = session_oracle(pdf, "ts", "k", "v", gap, "x")
    assert out["num_trans_per_x"].sum() == len(pdf)
    for k, grp in out.groupby("k"):
        g = grp.sort_values("window_start_ms")
        starts = g["window_start_ms"].to_numpy()
        ends = g["window_end_ms"].to_numpy()
        assert (ends - gap >= starts).all()  # end = last_ts + gap >= start + gap
        if len(g) > 1:
            assert (starts[1:] >= ends[:-1]).all()  # disjoint, gap-separated


@settings(max_examples=150, deadline=None)
@given(events(min_size=1, max_size=60))
def test_session_equals_interval_union(rows):
    """Independent formulation: session windows == union of per-event
    intervals [ts, ts+gap) — same islands either way."""
    gap = 120_000
    pdf = _pdf(rows)
    out = session_oracle(pdf, "ts", "k", "v", gap, "x")
    for k, grp in pdf.groupby("k"):
        ts = np.sort(grp["ts"].to_numpy())
        s, e = ts, ts + gap
        cummax = np.maximum.accumulate(e)
        islands = 1 + int((s[1:] >= cummax[:-1]).sum())
        assert islands == (out["k"] == k).sum()


# --------------------------------------------------------------------------- Avro binary codec properties (engine/complexio.py)
_avro_primitive = st.sampled_from(["long", "int", "double", "float", "boolean",
                                   "string", "bytes"])


def _value_for(t):
    return {
        "long": st.integers(min_value=-(2**62), max_value=2**62),
        "int": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "double": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "float": st.floats(allow_nan=False, allow_infinity=False, width=32),
        "boolean": st.booleans(),
        "string": st.text(max_size=40),
        "bytes": st.binary(max_size=40),
    }[t]


@st.composite
def _record_and_schema(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    fields, rec = [], {}
    for i in range(n):
        t = draw(_avro_primitive)
        shape = draw(st.sampled_from(["plain", "nullable", "array", "map"]))
        if shape == "plain":
            ftype = t
            val = draw(_value_for(t))
        elif shape == "nullable":
            ftype = ["null", t]
            val = draw(st.none() | _value_for(t))
        elif shape == "array":
            ftype = {"type": "array", "items": t}
            val = draw(st.lists(_value_for(t), max_size=8))
        else:
            ftype = {"type": "map", "values": t}
            val = draw(st.dictionaries(st.text(max_size=10), _value_for(t),
                                       max_size=6))
        fields.append({"name": f"f{i}", "type": ftype})
        rec[f"f{i}"] = val
    return rec, {"type": "record", "name": "r", "fields": fields}


@settings(max_examples=300, deadline=None)
@given(_record_and_schema())
def test_avro_roundtrip_property(rs):
    """encode∘decode = id for any record over primitives, nullable unions,
    arrays, and maps — and float32 fields round through IEEE-754 single."""
    rec, schema = rs
    from engine.complexio import avro_decode_datum, avro_encode_datum

    got = avro_decode_datum(avro_encode_datum(rec, schema), schema)
    for f in schema["fields"]:
        want, have = rec[f["name"]], got[f["name"]]
        t = f["type"]
        base = t[1] if isinstance(t, list) else (
            t.get("items") or t.get("values") if isinstance(t, dict) else t
        )
        if base == "float":
            if isinstance(have, list):
                assert np.allclose(have, np.asarray(want, np.float32))
            elif isinstance(have, dict):
                assert set(have) == set(want)
                for k in have:
                    assert np.float32(want[k]) == np.float32(have[k])
            elif want is None:
                assert have is None
            else:
                assert np.float32(want) == np.float32(have)
        else:
            assert have == want, (f, want, have)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_avro_zigzag_roundtrip_full_range(n):
    from engine.complexio import avro_decode_datum, avro_encode_datum

    assert avro_decode_datum(avro_encode_datum(n, {"type": "long"}),
                             {"type": "long"}) == n


# --------------------------------------------------------------------------- BMP / Y4M codec properties (engine/multimodal.py)
@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_bmp_roundtrip_property(h, w, gray, seed):
    """decode∘encode = id for any image shape, both 8-bit gray and 24-bit
    RGB, including widths that need row padding."""
    from engine.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w) if gray else (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=12),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_y4m_roundtrip_property(n, h2, w2, fps, seed):
    """decode∘encode = id for any frame stack (even dims) and fps."""
    from engine.multimodal import decode_y4m, encode_y4m

    h, w = h2 * 2, w2 * 2  # C420 needs even dimensions
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
    dec, got_fps = decode_y4m(encode_y4m(frames, fps, 1))
    assert got_fps == float(fps)
    assert dec.shape == (n, h, w)
    if n:
        assert np.array_equal(dec, frames)


# --------------------------------------------------------------------------- PNG codec properties (r3, engine/multimodal.py)
@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=1, max_value=32),
    st.integers(min_value=1, max_value=32),
    st.sampled_from([1, 2, 3, 4]),  # gray, gray+alpha, RGB, RGBA
    st.sampled_from([0, 1, 2, 3, 4]),  # all five scanline filters
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip_property(h, w, ch, filt, seed):
    """decode∘encode = id for every channel count and every PNG scanline
    filter (None/Sub/Up/Average/Paeth)."""
    from engine.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img, filter_type=filt)), img)


def test_png_known_vectors_and_palette():
    """Hand-checkable vectors: a 2x2 RGB gradient, a grayscale ramp, and a
    hand-built palette (color type 3) image resolving through PLTE."""
    import struct
    import zlib

    from engine.multimodal import _PNG_SIG, _png_chunk, decode_png, encode_png

    rgb = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    gray = np.arange(16, dtype=np.uint8).reshape(4, 4) * 17
    assert np.array_equal(decode_png(encode_png(gray)), gray)

    # palette image: indices 0..3 → 4 RGB colors
    pal = np.array([[9, 8, 7], [1, 2, 3], [100, 110, 120], [250, 240, 230]],
                   dtype=np.uint8)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    lines = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    buf = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", pal.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(lines))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(buf), pal[idx])

    # unsupported shapes fail loudly, not silently
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_png(b"not a png")
    bad_depth = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError):
        decode_png(bad_depth)


# ---------------------------------------------------------------------------
# baseline JPEG (engine/jpeg.py)
# ---------------------------------------------------------------------------


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse) if mse else float("inf")


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("quality", [95, 75])
def test_jpeg_roundtrip_psnr(subsampling, quality):
    """Lossy codec sanity: smooth content survives encode→decode with high
    PSNR at both chroma samplings, odd dimensions included."""
    from engine.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:45, 0:57]
    img = np.clip(
        np.stack([
            128 + 90 * np.sin(2 * np.pi * xx / 40),
            128 + 70 * np.cos(2 * np.pi * yy / 30),
            (xx + yy) * 255 / 102,
        ], axis=-1), 0, 255,
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=subsampling))
    assert dec.shape == img.shape
    floor = 30.0 if subsampling == "444" else 26.0
    if quality == 95:
        floor += 4.0
    assert _psnr(img, dec) >= floor


def test_jpeg_grayscale_flat_and_restart():
    from engine.jpeg import decode_jpeg, encode_jpeg

    g = np.clip(
        128 + 90 * np.sin(2 * np.pi * np.add.outer(np.arange(40), np.arange(48)) / 32),
        0, 255,
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.ndim == 2 and dec.shape == g.shape
    assert _psnr(g, dec) >= 34.0

    # flat color decodes exactly (single DC coefficient survives quantization)
    flat = np.full((24, 24, 3), 77, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, quality=90)), flat)

    # restart markers: DC predictors reset per interval, same pixels out
    img = np.clip(
        np.stack([g, g[::-1], g[:, ::-1]], axis=-1), 0, 255
    ).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    with_rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=2))
    assert np.array_equal(plain, with_rst)


def test_jpeg_dispatch_and_unsupported():
    from engine.jpeg import decode_jpeg, encode_jpeg
    from engine.multimodal import decode_image

    img = np.full((16, 16, 3), 200, dtype=np.uint8)
    assert decode_image(encode_jpeg(img)).shape == img.shape
    # progressive SOF2 rejected loudly, not mis-decoded
    buf = bytearray(encode_jpeg(img))
    sof = buf.find(b"\xFF\xC0")
    buf[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(buf))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01notajpeg")


# ---------------------------------------------------------------------------
# deterministic sampling / packing / chunking spec properties (round 3)
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_sample_thresholds_are_monotone_so_samples_nest(f1, f2):
    """thr is monotone in the fraction -> sample(f1) ⊆ sample(f2) for
    f1 <= f2 (nested samples: growing a sample never churns membership)."""
    from engine.sampling import fraction_to_hex_threshold

    lo, hi = sorted((f1, f2))
    assert fraction_to_hex_threshold(lo) <= fraction_to_hex_threshold(hi)


@settings(max_examples=300, deadline=None)
@given(st.floats(min_value=0.0, max_value=0.9999999, allow_nan=False))
def test_sample_threshold_tracks_fraction(f):
    from engine.sampling import fraction_to_hex_threshold

    got = int(fraction_to_hex_threshold(f), 16) / 16**8
    assert abs(got - f) < 2**-31


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=1000),
)
def test_packing_layout_spec(tokens, budget):
    """The concat-then-chunk layout spec: bins are contiguous from 0, every
    doc starts inside its bin, and token mass is conserved."""
    cum = 0
    last_bin = 0
    prev_t = 0
    for t in tokens:
        b = cum // budget
        assert b * budget <= cum < (b + 1) * budget
        assert b >= last_bin  # bins never go backwards in pack order
        # the jump is bounded by how far the PREVIOUS doc ran past its bin
        assert b - last_bin <= prev_t // budget + 1
        last_bin = b
        prev_t = t
        cum += t
    assert cum == sum(tokens)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=400),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=0, max_value=63),
)
def test_chunking_covers_exactly_once_per_overlap_class(n, chunk, overlap):
    """Chunk windows [s, s+chunk) for s in 1, 1+step, ... cover [1, n]
    completely; each token is in at most ceil(chunk/step) chunks."""
    if overlap >= chunk:
        return
    step = chunk - overlap
    starts = list(range(1, n + 1, step))
    covered = {}
    for s in starts:
        for t in range(s, min(s + chunk, n + 1)):
            covered[t] = covered.get(t, 0) + 1
    assert set(covered) == set(range(1, n + 1))
    max_membership = -(-chunk // step)  # ceil
    assert max(covered.values()) <= max_membership


@settings(max_examples=300, deadline=None)
@given(st.datetimes(min_value=pd.Timestamp("1970-01-01").to_pydatetime(),
                    max_value=pd.Timestamp("2100-01-01").to_pydatetime()))
def test_time_transform_ordinals_consistent(ts):
    """year/month/day/hour ordinals (Iceberg spec §Partition Transforms)
    are mutually consistent for any timestamp: hour floors to day*24+h,
    day re-derives the calendar date, month = 12*year + (month-1), and
    every ordinal is monotone in the timestamp (order preservation is
    what makes range pruning on time transforms sound)."""
    import datetime as dt

    from engine.iceberg import _to_time_ordinal

    y = _to_time_ordinal(ts, "year")
    m = _to_time_ordinal(ts, "month")
    d = _to_time_ordinal(ts, "day")
    h = _to_time_ordinal(ts, "hour")
    assert y == ts.year - 1970
    assert m == 12 * y + (ts.month - 1)
    assert d == (ts.date() - dt.date(1970, 1, 1)).days
    assert h == d * 24 + ts.hour
    # numpy (the producer path) agrees with the scalar filter path
    ts64 = np.datetime64(ts.replace(microsecond=0), "us")
    assert ts64.astype("datetime64[Y]").astype("int64") == y
    assert ts64.astype("datetime64[M]").astype("int64") == m
    assert ts64.astype("datetime64[D]").astype("int64") == d
    assert ts64.astype("datetime64[h]").astype("int64") == h
    # monotone: one hour later never decreases any ordinal
    later = ts + dt.timedelta(hours=1)
    assert _to_time_ordinal(later, "hour") == h + 1
    for unit, cur in (("year", y), ("month", m), ("day", d)):
        assert _to_time_ordinal(later, unit) >= cur


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-(2**40), max_value=2**40),
       st.integers(min_value=-(2**40), max_value=2**40),
       st.integers(min_value=1, max_value=1_000_000))
def test_truncate_transform_floor_and_monotone(a, b, w):
    """truncate[W] on ints (Iceberg spec): result is the W-multiple floor
    (covers negatives via floor-mod), idempotent, and MONOTONE — the
    property that makes range pruning on truncate partitions sound."""
    from engine.iceberg import truncate_value

    ta = truncate_value(a, "long", w)
    assert ta % w == 0 and ta <= a < ta + w
    assert truncate_value(ta, "long", w) == ta  # idempotent
    if a <= b:
        assert ta <= truncate_value(b, "long", w)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=40), st.integers(min_value=1, max_value=16))
def test_truncate_transform_string_prefix(s, w):
    """truncate[W] on strings keeps the first W CHARACTERS (not bytes)
    and preserves lexicographic order."""
    from engine.iceberg import truncate_value

    t = truncate_value(s, "string", w)
    assert t == s[:w] and len(t) <= w and s.startswith(t)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-(2**62), max_value=2**62),
       st.integers(min_value=1, max_value=4096))
def test_bucket_transform_range_and_type_widening(v, n):
    """bucket[N] ordinals are in [0, N); int and long sources hash
    identically (the spec hashes both as 8-byte longs, so widening a
    column's type never reshuffles the layout); datetimes hash as their
    epoch-microsecond long."""
    import datetime as dt

    from engine.iceberg import bucket_value

    b = bucket_value(v, "long", n)
    assert 0 <= b < n
    if -(2**31) <= v < 2**31:
        assert bucket_value(v, "int", n) == b
    # any datetime-representable epoch-microsecond (datetime caps at
    # year 9999 ≈ 2.5e17 µs); this found a real bug — the engine used
    # float total_seconds(), off by ~17 µs far from the epoch
    us = abs(v) % (2 * 10**17)
    ts = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us)
    assert bucket_value(ts, "timestamp", n) == bucket_value(us, "long", n)


@settings(max_examples=400, deadline=None)
@given(st.data())
def test_stats_match_never_false_skips(data):
    """Soundness of manifest metrics skipping (_stats_match, spec
    Appendix D bounds): a file that CONTAINS a row satisfying the
    condition is never skipped, for every type and condition form.
    (Skipping files that cannot match is a performance property; never
    skipping one that can is the correctness property — a false skip
    silently drops data.)"""
    from engine.iceberg import _stats_match, bound_to_bytes

    t = data.draw(st.sampled_from(["int", "long", "double", "string"]))
    if t == "int":
        vs = st.integers(min_value=-(2**31), max_value=2**31 - 1)
    elif t == "long":
        vs = st.integers(min_value=-(2**62), max_value=2**62)
    elif t == "double":
        vs = st.floats(allow_nan=False, allow_infinity=False)
    else:
        vs = st.text(max_size=8)
    vals = data.draw(st.lists(vs, min_size=1, max_size=8))
    v = data.draw(st.sampled_from(vals))  # a row value the file holds
    form = data.draw(st.sampled_from(["eq", "in", "range"]))
    if form == "eq":
        cond = v
    elif form == "in":
        cond = [v, *data.draw(st.lists(vs, max_size=3))]
    else:
        a = data.draw(vs)
        cond = (a, v) if a <= v else (v, a)
    lower = {7: bound_to_bytes(min(vals), t)}
    upper = {7: bound_to_bytes(max(vals), t)}
    assert _stats_match(lower, upper, {7: (t, cond)})

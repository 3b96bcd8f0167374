"""transformWithState window backend (engine.state_tws) vs its oracles.

Two layers of evidence, because this sandbox lacks the protobuf runtime the
transformWithState state-server protocol needs (engine.state_tws docstring):

1. **Simulation harness (always runs)**: drives :class:`TwsWindowProcessor`
   — the exact class the live operator ships to executors — through a
   Spark-faithful micro-batch loop: per-key invocations, a fake state
   server, per-key event-time timers fired when the eviction watermark
   passes their expiry, watermark advanced at batch boundaries from the max
   event time of PRIOR batches, and a trailing no-data batch (what
   ``processAllAvailable`` runs after the last file).  Emitted rows are
   checked against the built-in ``window()`` aggregate executed in batch
   mode and against emission-timing / frontier / cleanup invariants.
2. **Live-stream parity (auto-skips without protobuf)**: the same
   three-way row parity the applyInPandasWithState backend is held to in
   tests/test_state.py — runs as-is on any real cluster.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql.streaming.stateful_processor import ExpiredTimerInfo, TimerValues

from engine.state import _ts_ms, stateful_session_agg, stateful_window_agg
from engine.state_tws import (
    TwsSessionProcessor,
    TwsWindowProcessor,
    stateful_session_agg_tws,
    stateful_window_agg_tws,
    tws_runtime_available,
)
from engine.streams import read_clip_stream, write_clips_stream_dir
from engine.windows import session_agg, sliding_agg, tumbling_agg

_MIN = 60_000


# ---------------------------------------------------------------------------
# simulation harness
# ---------------------------------------------------------------------------


class FakeValueState:
    def __init__(self, handle, name):
        self._h, self._name = handle, name

    def exists(self):
        return (self._name, self._h.cur) in self._h.states

    def get(self):
        return self._h.states.get((self._name, self._h.cur))

    def update(self, v):
        self._h.states[(self._name, self._h.cur)] = v

    def clear(self):
        self._h.states.pop((self._name, self._h.cur), None)


class FakeHandle:
    """StatefulProcessorHandle double: keyed value-state + keyed timers."""

    def __init__(self):
        self.cur = None
        self.states = {}
        self.timers = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return FakeValueState(self, name)

    def registerTimer(self, ms):
        self.timers.setdefault(self.cur, set()).add(int(ms))

    def deleteTimer(self, ms):
        self.timers.get(self.cur, set()).discard(int(ms))

    def listTimers(self):
        return iter(sorted(self.timers.get(self.cur, ())))


def simulate(proc, batches, delay_ms, key_col, ts_col, late_filter=True):
    """Replay pandas micro-batches through the processor, Spark-style.

    Faithful to TransformWithStateInPySparkExec in event-time mode:

    - input rows older than the LATE-events watermark (the watermark of the
      batch before last — SPARK-38320 semantics) are dropped before the
      processor sees them (`applyRemovingRowsOlderThanWatermark`, verified
      in the shipped spark-sql 4.1.2 bytecode); ``late_filter=False``
      disables this to exercise the processor's own frontier defense;
    - event-time timers fire when the EVICTION watermark (through the
      previous batch) passes their expiry, after input processing;
    - the watermark advances at batch boundaries from max event time;
    - a trailing no-data batch runs last (what ``processAllAvailable``
      triggers after the final file when the watermark changed).

    Returns (emissions, handle, eviction_wm_by_batch) where emissions is a
    list of (batch_idx, pdf).
    """
    h = FakeHandle()
    proc.init(h)
    wm, late_wm, max_ts = 0, 0, 0
    out, wm_by_batch = [], []
    for i, pdf in enumerate(list(batches) + [None]):
        wm_by_batch.append(wm)
        tv = TimerValues(-1, wm)
        if pdf is not None and len(pdf):
            if late_filter:
                pdf = pdf[_ts_ms(pdf[ts_col]) >= late_wm]
            for k, g in pdf.groupby(key_col, sort=True):
                h.cur = k
                for o in proc.handleInputRows(
                    (k,), iter([g.reset_index(drop=True)]), tv
                ):
                    if len(o):
                        out.append((i, o))
        # event-time timers fire once the eviction watermark passes them
        for k in list(h.timers):
            h.cur = k
            for t in sorted(h.timers.get(k, set())):
                if t <= wm:
                    h.timers[k].discard(t)
                    for o in proc.handleExpiredTimer((k,), tv, ExpiredTimerInfo(t)):
                        if len(o):
                            out.append((i, o))
        late_wm = wm
        if pdf is not None and len(pdf):
            max_ts = max(max_ts, int(_ts_ms(pdf[ts_col]).max()))
            wm = max(wm, max_ts - delay_ms)
    return out, h, wm_by_batch


def _proc(width_ms=10 * _MIN, slide_ms=None, retention_ms=60 * _MIN, shift_ms=0):
    return TwsWindowProcessor(
        ts_col="ts", key_col="k", value_col="v", width_ms=width_ms,
        slide_ms=slide_ms or width_ms, label="10m",
        bug_compatible_stdev=False, retention_ms=retention_ms,
        shift_ms=shift_ms, key_sql="bigint", key_pd="int64",
    )


def _mk_batch(rows):
    """rows: (key, ts_ms, value)"""
    return pd.DataFrame(
        {"k": np.array([r[0] for r in rows], dtype="int64"),
         "ts": pd.to_datetime([r[1] for r in rows], unit="ms"),
         "v": np.array([r[2] for r in rows], dtype="float64")}
    )


def _rand_batches(seed, n_batches=6, rows_per=40, n_keys=5, jitter_ms=30_000):
    rng = np.random.default_rng(seed)
    t0 = 1_700_000_000_000
    batches = []
    for b in range(n_batches):
        base = t0 + b * 5 * _MIN
        rows = [
            (int(rng.integers(0, n_keys)),
             int(base + rng.integers(0, 5 * _MIN) - rng.integers(0, jitter_ms)),
             float(rng.normal(100, 20)))
            for _ in range(rows_per)
        ]
        batches.append(_mk_batch(rows))
    return batches


def _sim_vs_builtin(spark, batches, width="10 minutes", slide=None,
                    delay_ms=_MIN, **proc_kw):
    proc = _proc(width_ms=(int(width.split()[0]) * _MIN),
                 slide_ms=(int(slide.split()[0]) * _MIN) if slide else None,
                 **proc_kw)
    out, h, wms = simulate(proc, batches, delay_ms, "k", "ts")
    got = pd.concat([o for _, o in out], ignore_index=True) if out else pd.DataFrame()

    allp = pd.concat(batches, ignore_index=True)
    final_wm = int(_ts_ms(allp["ts"]).max()) - delay_ms
    sdf = spark.createDataFrame(allp)
    agg = (tumbling_agg(sdf, "ts", "k", "v", width, label="10m") if slide is None
           else sliding_agg(sdf, "ts", "k", "v", width, slide, label="10m"))
    want = agg.toPandas()
    want = want[_ts_ms(want["window_end"]) <= final_wm].reset_index(drop=True)

    keys = ["window_start", "k"]
    got = got.sort_values(keys, ignore_index=True)[sorted(want.columns)]
    want = want.sort_values(keys, ignore_index=True)[sorted(want.columns)]
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-9,
                                  check_dtype=False)
    return out, wms


def test_sim_tumbling_matches_builtin(spark):
    """Row parity vs the built-in window() aggregate (disorder < delay)."""
    _sim_vs_builtin(spark, _rand_batches(7))


def test_sim_sliding_matches_builtin(spark):
    _sim_vs_builtin(spark, _rand_batches(13), width="10 minutes",
                    slide="5 minutes")


def test_sim_emission_timing_matches_builtin(spark):
    """Each window row must emit in the FIRST batch whose watermark passes
    its end — built-in append-mode timing, whether the key had input in
    that batch (handleInputRows) or not (handleExpiredTimer)."""
    out, wms = _sim_vs_builtin(spark, _rand_batches(21))
    for batch_idx, pdf in out:
        ends = _ts_ms(pdf["window_end"])
        for e in ends:
            fire = next(i for i, w in enumerate(wms) if w >= e)
            assert fire == batch_idx, (e, fire, batch_idx)


def test_sim_timer_only_key_still_emits(spark):
    """A key silent after batch 0 must emit via its event-time timer when
    OTHER keys advance the watermark — the pure Flink-timer path."""
    t0 = 1_700_000_000_000
    batches = [
        _mk_batch([(1, t0 + 10_000, 5.0), (1, t0 + 20_000, 7.0)]),
        _mk_batch([(2, t0 + 15 * _MIN, 1.0)]),
        _mk_batch([(2, t0 + 30 * _MIN, 2.0)]),
    ]
    proc = _proc()
    out, h, wms = simulate(proc, batches, _MIN, "k", "ts")
    key1 = pd.concat([o for _, o in out], ignore_index=True).query("k == 1")
    assert len(key1) == 1
    assert key1.iloc[0]["num_trans_per_10m"] == 2
    assert key1.iloc[0]["avg_amt_per_10m"] == pytest.approx(6.0)


def test_sim_same_batch_straggler_included_like_builtin(spark):
    """A late-ish row arriving in the SAME batch its window fires must be
    included (the built-in adds to state before evicting), not dropped."""
    t0 = 1_700_000_000_000
    batches = [
        _mk_batch([(1, t0 + 10_000, 5.0)]),
        _mk_batch([(2, t0 + 15 * _MIN, 1.0)]),
        # wm now past key 1's window end; this row passes the late filter
        # (ts >= late_wm) and lands in the batch that fires the window
        _mk_batch([(1, t0 + 20_000, 99.0)]),
    ]
    out, h, wms = simulate(_proc(), batches, _MIN, "k", "ts")
    key1 = pd.concat([o for _, o in out], ignore_index=True).query("k == 1")
    assert len(key1) == 1 and key1.iloc[0]["num_trans_per_10m"] == 2
    assert key1.iloc[0]["max_amt_per_10m"] == pytest.approx(99.0)


def test_sim_frontier_blocks_stragglers_and_retention_cleans_up(spark):
    """A straggler for an ALREADY-FIRED window must not re-emit or
    double-count even if it evades the exec-level late filter (mechanism 2
    — the replay/restart defense), and the frontier tombstone must clear
    after late_retention of event time with no new activity (mechanism 3)."""
    t0 = 1_700_000_000_000
    retention = 30 * _MIN
    batches = [
        _mk_batch([(1, t0 + 10_000, 5.0)]),
        _mk_batch([(2, t0 + 15 * _MIN, 1.0)]),
        _mk_batch([]),                            # timer fires key 1's window
        _mk_batch([(1, t0 + 20_000, 99.0)]),      # straggler, window finalized
        _mk_batch([(2, t0 + 70 * _MIN, 2.0)]),    # wm passes thru + retention
    ]
    proc = _proc(retention_ms=retention)
    out, h, wms = simulate(proc, batches, _MIN, "k", "ts", late_filter=False)
    allo = pd.concat([o for _, o in out], ignore_index=True)
    key1 = allo.query("k == 1")
    assert len(key1) == 1 and key1.iloc[0]["num_trans_per_10m"] == 1
    assert key1.iloc[0]["max_amt_per_10m"] == pytest.approx(5.0)
    # retention fired: key 1 left no state and no timers
    assert not any(k == 1 for (_, k) in h.states)
    assert not h.timers.get(1)


def _sess_proc(gap_min=2, retention_min=60, shift_us=0):
    return TwsSessionProcessor(
        ts_col="ts", key_col="k", value_col="v",
        gap_us=gap_min * _MIN * 1000, label="session",
        bug_compatible_stdev=False, retention_us=retention_min * _MIN * 1000,
        shift_us=shift_us, key_sql="bigint", key_pd="int64",
    )


def test_sim_session_matches_builtin(spark):
    """Session processor row parity vs the built-in session_window
    aggregate (disorder < delay, batch spacing > gap + disorder so no
    mid-stream session splits are possible)."""
    batches = _rand_batches(31)
    out, h, wms = simulate(_sess_proc(), batches, _MIN, "k", "ts")
    got = pd.concat([o for _, o in out], ignore_index=True)

    allp = pd.concat(batches, ignore_index=True)
    final_wm = int(_ts_ms(allp["ts"]).max()) - _MIN
    want = session_agg(spark.createDataFrame(allp), "ts", "k", "v",
                       "2 minutes").toPandas()
    want = want[_ts_ms(want["window_end"]) <= final_wm].reset_index(drop=True)

    keys = ["window_start", "k"]
    got = got.sort_values(keys, ignore_index=True)[sorted(want.columns)]
    want = want.sort_values(keys, ignore_index=True)[sorted(want.columns)]
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-9,
                                  check_dtype=False)


def test_sim_session_timer_only_key_emits_and_extends(spark):
    """A session extended across two batches must emit ONCE (merged) via the
    per-key timer, re-armed at the extended end, once other keys advance the
    watermark past it."""
    t0 = 1_700_000_000_000
    batches = [
        _mk_batch([(1, t0, 4.0)]),
        _mk_batch([(1, t0 + 90_000, 8.0)]),   # inside gap → extends session
        _mk_batch([(2, t0 + 10 * _MIN, 1.0)]),
        _mk_batch([(2, t0 + 20 * _MIN, 2.0)]),
    ]
    out, h, wms = simulate(_sess_proc(), batches, _MIN, "k", "ts")
    key1 = pd.concat([o for _, o in out], ignore_index=True).query("k == 1")
    assert len(key1) == 1
    assert key1.iloc[0]["num_trans_per_session"] == 2
    assert _ts_ms(key1["window_end"]).item() == t0 + 90_000 + 2 * _MIN
    assert key1.iloc[0]["avg_amt_per_session"] == pytest.approx(6.0)


def test_sim_single_timer_per_key_invariant(spark):
    """The processor keeps exactly one registered timer per live key."""
    proc = _proc()
    out, h, wms = simulate(proc, _rand_batches(5), _MIN, "k", "ts")
    for k, ts in h.timers.items():
        assert len(ts) <= 1, (k, ts)


def test_live_requires_runtime_or_raises(spark, tmp_path):
    """Without protobuf the public API must fail fast with a clear message,
    not crash the stream at schema-validation time."""
    if tws_runtime_available():
        pytest.skip("protobuf present; live path covered by parity tests")
    d = str(tmp_path / "clips")
    write_clips_stream_dir(d, n_clips=50, n_files=1, seed=3, jitter_ms=1000)
    src = read_clip_stream(spark, d, max_files_per_trigger=1)
    with pytest.raises(RuntimeError, match="protobuf"):
        stateful_window_agg_tws(src, "event_ts", "speaker_id", "dur_ms",
                                "10 minutes")


# ---------------------------------------------------------------------------
# live-stream parity — auto-skips where the protobuf runtime is absent
# ---------------------------------------------------------------------------

needs_tws = pytest.mark.skipif(
    not tws_runtime_available(),
    reason="transformWithState needs google.protobuf (absent in sandbox)",
)

_MEMQ = [0]


@pytest.fixture(scope="module")
def clips_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tws_stream") / "clips")
    write_clips_stream_dir(d, n_clips=1500, n_files=8, seed=11, jitter_ms=30_000)
    return d


def _run_stream(spark, df):
    _MEMQ[0] += 1
    name = f"tws_mem_{_MEMQ[0]}"
    q = df.writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"select * from {name}").toPandas()


def _cmp(got: pd.DataFrame, want: pd.DataFrame, keys):
    got = got.sort_values(keys, ignore_index=True)[sorted(got.columns)]
    want = want.sort_values(keys, ignore_index=True)[sorted(want.columns)]
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-9,
                                  check_dtype=False)


@needs_tws
def test_tws_tumbling_matches_builtin(spark, clips_dir):
    src = read_clip_stream(spark, clips_dir, max_files_per_trigger=2)
    got = _run_stream(
        spark,
        stateful_window_agg_tws(src, "event_ts", "speaker_id", "dur_ms",
                                "10 minutes"),
    )
    src2 = read_clip_stream(spark, clips_dir, max_files_per_trigger=2)
    want = _run_stream(
        spark, tumbling_agg(src2, "event_ts", "speaker_id", "dur_ms", "10 minutes")
    )
    _cmp(got, want, ["window_start", "speaker_id"])


@needs_tws
def test_tws_sliding_matches_builtin(spark, clips_dir):
    src = read_clip_stream(spark, clips_dir, max_files_per_trigger=2)
    got = _run_stream(
        spark,
        stateful_window_agg_tws(src, "event_ts", "speaker_id", "dur_ms",
                                "10 minutes", slide="5 minutes"),
    )
    src2 = read_clip_stream(spark, clips_dir, max_files_per_trigger=2)
    want = _run_stream(
        spark,
        sliding_agg(src2, "event_ts", "speaker_id", "dur_ms", "10 minutes",
                    "5 minutes"),
    )
    _cmp(got, want, ["window_start", "speaker_id"])


@needs_tws
def test_tws_matches_applyinpandaswithstate_backend(spark, clips_dir):
    """The two custom-state backends are drop-in twins: identical rows."""
    src = read_clip_stream(spark, clips_dir, max_files_per_trigger=2)
    got = _run_stream(
        spark,
        stateful_window_agg_tws(src, "event_ts", "speaker_id", "dur_ms",
                                "10 minutes"),
    )
    src2 = read_clip_stream(spark, clips_dir, max_files_per_trigger=2)
    want = _run_stream(
        spark,
        stateful_window_agg(src2, "event_ts", "speaker_id", "dur_ms",
                            "10 minutes"),
    )
    _cmp(got, want, ["window_start", "speaker_id"])


@needs_tws
def test_tws_session_matches_builtin_and_twin(spark, clips_dir):
    src = read_clip_stream(spark, clips_dir, max_files_per_trigger=2)
    got = _run_stream(
        spark,
        stateful_session_agg_tws(src, "event_ts", "speaker_id", "dur_ms",
                                 "2 minutes"),
    )
    src2 = read_clip_stream(spark, clips_dir, max_files_per_trigger=2)
    want = _run_stream(
        spark, session_agg(src2, "event_ts", "speaker_id", "dur_ms", "2 minutes")
    )
    _cmp(got, want, ["window_start", "speaker_id"])
    src3 = read_clip_stream(spark, clips_dir, max_files_per_trigger=2)
    twin = _run_stream(
        spark,
        stateful_session_agg(src3, "event_ts", "speaker_id", "dur_ms",
                             "2 minutes"),
    )
    _cmp(got, twin, ["window_start", "speaker_id"])


@needs_tws
def test_tws_late_drop_matches_builtin(spark, tmp_path_factory):
    """Disorder (120 s) beyond the watermark (60 s) forces real late drops —
    the TWS backend must drop exactly the rows the built-in drops."""
    d = str(tmp_path_factory.mktemp("tws_late") / "clips")
    write_clips_stream_dir(d, n_clips=1200, n_files=8, seed=23, jitter_ms=120_000)

    src = read_clip_stream(spark, d, max_files_per_trigger=1, watermark=None)
    got = _run_stream(
        spark,
        stateful_window_agg_tws(src, "event_ts", "speaker_id", "dur_ms",
                                "10 minutes", watermark="60 seconds"),
    )
    src2 = read_clip_stream(spark, d, max_files_per_trigger=1)
    want = _run_stream(
        spark, tumbling_agg(src2, "event_ts", "speaker_id", "dur_ms", "10 minutes")
    )
    _cmp(got, want, ["window_start", "speaker_id"])


@needs_tws
def test_tws_bucketed_matches_builtin(spark, clips_dir):
    src = read_clip_stream(spark, clips_dir, max_files_per_trigger=2)
    got = _run_stream(
        spark,
        stateful_window_agg_tws(src, "event_ts", "speaker_id", "dur_ms",
                                "10 minutes", n_buckets=16),
    )
    src2 = read_clip_stream(spark, clips_dir, max_files_per_trigger=2)
    want = _run_stream(
        spark, tumbling_agg(src2, "event_ts", "speaker_id", "dur_ms", "10 minutes")
    )
    _cmp(got, want, ["window_start", "speaker_id"])


# ---------------------------------------------------------------------------
# stream-stream join processor
# ---------------------------------------------------------------------------


def _join_spec(spark, ttl="1 hour"):
    from engine.state_join import JoinSpec

    ldf = spark.createDataFrame([], "k long, ts timestamp, l_v double")
    rdf = spark.createDataFrame([], "k long, ts timestamp, r_v double")
    return JoinSpec(ldf, rdf, "k", "ts", ttl, "left_ts", "right_ts")


def _mk_join_batch(rows):
    """rows: (key, ts_ms, side, value) — tagged-union shape."""
    return pd.DataFrame(
        {"k": np.array([r[0] for r in rows], dtype="int64"),
         "ts": pd.to_datetime([r[1] for r in rows], unit="ms"),
         "__side": np.array([r[2] for r in rows], dtype="int32"),
         "l_v": np.array([r[3] if r[2] == 0 else 0.0 for r in rows]),
         "r_v": np.array([r[3] if r[2] == 1 else 0.0 for r in rows])}
    )


def test_sim_join_emits_every_pair_exactly_once(spark):
    """All left x right pairs per key emit exactly once, whichever side
    arrives first and across any batch split (disorder < delay, TTL wide)."""
    from engine.state_tws import TwsJoinProcessor

    t0 = 1_700_000_000_000
    batches = [
        _mk_join_batch([(1, t0 + 1000, 0, 10.0), (2, t0 + 2000, 1, 20.0)]),
        _mk_join_batch([(1, t0 + 60_000, 1, 11.0), (2, t0 + 61_000, 0, 21.0)]),
        _mk_join_batch([(1, t0 + 120_000, 0, 12.0),       # second left for k1
                        (2, t0 + 121_000, 1, 22.0)]),      # second right for k2
        _mk_join_batch([(3, t0 + 300_000, 0, 30.0)]),      # left-only key
    ]
    proc = TwsJoinProcessor(_join_spec(spark))
    out, h, wms = simulate(proc, batches, _MIN, "k", "ts")
    got = pd.concat([o for _, o in out], ignore_index=True)

    # oracle: full per-key cross join of the two sides
    allp = pd.concat(batches, ignore_index=True)
    lft = allp[allp["__side"] == 0][["k", "ts", "l_v"]].rename(
        columns={"ts": "left_ts"})
    rgt = allp[allp["__side"] == 1][["k", "ts", "r_v"]].rename(
        columns={"ts": "right_ts"})
    want = lft.merge(rgt, on="k")[["k", "left_ts", "right_ts", "l_v", "r_v"]]

    keys = ["k", "left_ts", "right_ts"]
    got = got.sort_values(keys, ignore_index=True)[sorted(want.columns)]
    want = want.sort_values(keys, ignore_index=True)[sorted(want.columns)]
    assert len(got) == len(want) > 0        # exactly once: no dups, none missing
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # single-timer invariant holds for the join state too
    for k, ts in h.timers.items():
        assert len(ts) <= 1, (k, ts)


def test_sim_join_ttl_evicts_before_late_match(spark):
    """A buffered left row must be evicted by its TTL timer on watermark
    progress (no input for its key); a right row arriving after that finds
    an empty buffer — no pair."""
    from engine.state_tws import TwsJoinProcessor

    t0 = 1_700_000_000_000
    batches = [
        _mk_join_batch([(1, t0, 0, 10.0)]),                 # L buffered
        _mk_join_batch([(9, t0 + 180_000, 0, 1.0)]),        # wm → t0+2min
        _mk_join_batch([(9, t0 + 181_000, 0, 1.0)]),        # k1 TTL timer fires
        _mk_join_batch([(1, t0 + 180_000, 1, 11.0)]),       # R too late: no L
    ]
    proc = TwsJoinProcessor(_join_spec(spark, ttl="1 minute"))
    out, h, wms = simulate(proc, batches, _MIN, "k", "ts")
    pairs = pd.concat([o for _, o in out], ignore_index=True) if out else pd.DataFrame()
    assert len(pairs) == 0
    # the TTL timer dropped the left buffer; only the late right row remains
    st = h.states.get(("buf", 1))
    assert st is not None and st[1] == [] and len(st[4]) == 1


@needs_tws
def test_tws_join_matches_apply_backend(spark, tmp_path):
    """Live parity: the transformWithState join emits the identical pair set
    as the applyInPandasWithState join on the same dual file streams."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.state_join import stateful_stream_join
    from engine.state_tws import stateful_stream_join_tws

    rng = np.random.default_rng(17)
    t0 = 1_700_000_000_000

    def _mk_dir(name, payload_col):
        d = str(tmp_path / name)
        os.makedirs(d)
        for i in range(4):
            n = 50
            pdf = pd.DataFrame({
                "k": rng.integers(0, 20, n),
                "ts": pd.to_datetime(
                    t0 + i * 5 * _MIN + rng.integers(0, 5 * _MIN, n), unit="ms"),
                payload_col: rng.normal(0, 1, n),
            })
            t = pa.Table.from_pandas(pdf, schema=pa.schema(
                [("k", pa.int64()), ("ts", pa.timestamp("us")),
                 (payload_col, pa.float64())]), preserve_index=False)
            pq.write_table(t, f"{d}/p{i:03d}.parquet")
            os.utime(f"{d}/p{i:03d}.parquet", (1_000_000 + i, 1_000_000 + i))
        return d

    ld, rd = _mk_dir("jl", "l_v"), _mk_dir("jr", "r_v")

    def _src(d, payload_col):
        return (spark.readStream.schema(f"k long, ts timestamp, {payload_col} double")
                .option("maxFilesPerTrigger", 1).parquet(d)
                .withWatermark("ts", "60 seconds"))

    got = _run_stream(spark, stateful_stream_join_tws(
        _src(ld, "l_v"), _src(rd, "r_v"), "k", "ts", ttl="10 minutes"))
    want = _run_stream(spark, stateful_stream_join(
        _src(ld, "l_v"), _src(rd, "r_v"), "k", "ts", ttl="10 minutes"))
    _cmp(got, want, ["k", "left_ts", "right_ts"])


def test_sim_join_clear_deletes_registered_timer(spark):
    """ADVICE r4: when TTL eviction drains both buffers, the registered
    timer must be deleted WITH the state — an orphan timer would later fire
    handleExpiredTimer against empty state (one-timer-in-state invariant)."""
    from engine.state_tws import TwsJoinProcessor

    t0 = 1_700_000_000_000
    proc = TwsJoinProcessor(_join_spec(spark, ttl="1 minute"))
    h = FakeHandle()
    proc.init(h)
    h.cur = 1

    # buffer one left row: state + one registered timer
    tv0 = TimerValues(-1, 0)
    list(proc.handleInputRows((1,), iter([_mk_join_batch(
        [(1, t0, 0, 10.0)])]), tv0))
    assert h.states.get(("buf", 1)) is not None
    assert len(h.timers.get(1, ())) == 1

    # watermark far past TTL; the key's input this batch is itself stale
    # (fold drops it), so both buffers drain inside handleInputRows —
    # state clears and the timer must go with it, BEFORE any timer firing
    wm_ms = t0 + 8 * 60_000
    tv1 = TimerValues(-1, wm_ms)
    out = list(proc.handleInputRows((1,), iter([_mk_join_batch(
        [(1, t0 + 60_000, 0, 11.0)])]), tv1))
    assert not any(len(o) for o in out)
    assert h.states.get(("buf", 1)) is None
    assert not h.timers.get(1), "orphan timer left after state clear"

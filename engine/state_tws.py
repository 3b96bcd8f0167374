"""Keyed window state on Spark 4's ``transformWithState`` API (T5 twin).

The reference's actual runtime model is Flink keyed state plus event-time
timers: ``TransactionFraudExample.java:69-71`` keyBy → window →
``TransactionCountAggregate.java:10-40`` keeps per-key accumulators in
RocksDB-backed keyed state and the watermark FIRES the window.  Spark 4's
arbitrary-state API v2 (``transformWithStateInPandas``, SPARK-49564) is the
first Spark surface with exactly that shape — named state variables plus
per-key event-time timers — so this module re-implements
:func:`engine.state.stateful_window_agg` on it:

- **state**: one ``ValueState`` per key/bucket holding the emitted frontier
  and the open-window accumulators as parallel arrays
  ``(k, start, cnt, nn, sum, sumsq, mn, mx)`` — the reference accumulator
  ``Tuple4`` widened with min/max/sumsq, identical to ``engine.state``.
- **timers**: a single event-time timer per key at the earliest open window
  end (Flink's ``registerEventTimeTimer(window.maxTimestamp())``).  Windows
  whose end the watermark has passed emit from ``handleInputRows`` when the
  key has input in the firing batch, else from ``handleExpiredTimer`` — the
  same batch either way, matching built-in append-mode emission timing.
- **cleanup**: drained keys keep a frontier tombstone guarded by a retention
  timer; when it fires with nothing pending the state is dropped (bounded
  state, straggler-safe exactly-once emission — mechanism 3 of the
  ``engine.state`` docstring).

Late-data semantics mirror ``engine.state`` exactly (same three mechanisms):
pass ``watermark`` with an UN-watermarked input and the declared delay is
widened by the window width while the exposed watermark and every timer
timestamp are shifted back inside the processor; or pre-apply
``withWatermark`` and leave ``watermark=None`` for the frontier-only policy.

Differences from the ``applyInPandasWithState`` backend worth knowing:

- ``GroupStateTimeout.EventTimeTimeout`` is one implicit timeout per key;
  here timers are first-class (many per key possible — we keep exactly one,
  tracked in state, because one earliest-deadline timer is sufficient for
  monotone window ends).
- ``GroupState`` hands the function its state on every invocation;
  ``transformWithState`` state variables are lazily fetched per access
  against the state server, so the processor does exactly one ``get`` and
  one ``update`` per key per invocation.

Scale posture is unchanged from ``engine.state``: state partitioned by the
groupBy shuffle, O(open windows) per key, ``n_buckets`` key-coarsening for
high-cardinality keys, RocksDB state store (engine.session) behind the
state server.

**Runtime gate**: the transformWithState state-server protocol is
protobuf-based and this sandbox has no ``google.protobuf`` (and installs are
off-limits), so the live-stream path raises a clear error here and the
parity tests auto-skip; on any real cluster (protobuf ships with standard
PySpark installs) it runs as-is.  The processor's logic is still fully
verified in-sandbox: tests/test_state_tws.py drives
:class:`TwsWindowProcessor` through a Spark-faithful simulation harness
(fake state server + per-key timers + per-batch watermark progression) and
checks emitted rows and emission timing against computable oracles.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from engine.state import (
    _ACC_COLS,
    _SESS_COLS,
    _THRU_NEG,
    _acc_dtype,
    _grouped,
    _key_meta,
    _merge_session_islands,
    _out_ddl,
    _result_pdf,
    _ts_ms,
    _ts_us,
    _us_ts,
    dur_ms,
)

__all__ = [
    "stateful_window_agg_tws",
    "stateful_session_agg_tws",
    "stateful_stream_join_tws",
    "TwsWindowProcessor",
    "TwsSessionProcessor",
    "TwsJoinProcessor",
    "tws_runtime_available",
]


def tws_runtime_available() -> bool:
    """True iff the transformWithState state-server protocol can run here
    (it speaks protobuf between the JVM and the Python processor)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class TwsWindowProcessor(StatefulProcessor):
    """Tumbling/sliding event-time window aggregate as a StatefulProcessor.

    Instances are pickled to executors; everything configured in
    ``__init__`` must stay plain data.  ``init`` runs worker-side with the
    state handle.
    """

    def __init__(
        self,
        ts_col: str,
        key_col: str,
        value_col: str,
        width_ms: int,
        slide_ms: int,
        label: str,
        bug_compatible_stdev: bool,
        retention_ms: int,
        shift_ms: int,
        key_sql: str,
        key_pd: str | None,
    ) -> None:
        self.ts_col = ts_col
        self.key_col = key_col
        self.value_col = value_col
        self.width_ms = width_ms
        self.slide_ms = slide_ms
        self.n_wins = width_ms // slide_ms
        self.label = label
        self.bug_compatible_stdev = bug_compatible_stdev
        self.retention_ms = retention_ms
        self.shift_ms = shift_ms
        self.key_sql = key_sql
        self.key_pd = key_pd

    # -- state plumbing ----------------------------------------------------

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.acc_state = handle.getValueState(
            "acc",
            f"thru long, tmr long, k array<{self.key_sql}>, "
            "start array<long>, cnt array<long>, nn array<long>, "
            "sum array<double>, sumsq array<double>, mn array<double>, "
            "mx array<double>",
        )

    def _load(self) -> tuple[int, int, pd.DataFrame]:
        """→ (emitted-frontier thru, registered timer ms or 0, acc frame);
        one state-server round trip (get doubles as the existence probe)."""
        v = self.acc_state.get()
        if v is None:
            thru, tmr, arrays = _THRU_NEG, 0, [[] for _ in _ACC_COLS]
        else:
            thru, tmr, arrays = v[0], v[1], v[2:]
        out = {}
        for c, vals in zip(_ACC_COLS, arrays):
            dt = _acc_dtype(c, self.key_pd)
            out[c] = pd.Series(vals) if dt is None else np.asarray(vals, dtype=dt)
        return int(thru), int(tmr), pd.DataFrame(out)

    def _store(self, thru: int, tmr_old: int, acc: pd.DataFrame, wm_raw: int) -> None:
        """Persist state and keep exactly one timer at the next deadline.

        Deadlines are in TRUE event time; registered timestamps are shifted
        back by ``shift_ms`` so they fire when the (widened-delay) raw
        watermark implies the true watermark crossed the deadline — the
        same arithmetic as ``engine.state``'s ``setTimeoutTimestamp``.
        """
        if len(acc):
            deadline = int(acc["start"].min()) + self.width_ms
        else:
            deadline = thru + self.retention_ms
        want = max(deadline - self.shift_ms, wm_raw + 1, 1)
        if tmr_old != want:
            if tmr_old:
                # no-op if that timer already fired or was never registered
                self.handle.deleteTimer(tmr_old)
            self.handle.registerTimer(want)
        vals = []
        for c in _ACC_COLS:
            dt = _acc_dtype(c, self.key_pd)
            vals.append(acc[c].tolist() if dt is None else acc[c].astype(dt).tolist())
        self.acc_state.update((int(thru), int(want)) + tuple(vals))

    # -- emission ----------------------------------------------------------

    def _emit_and_store(
        self, thru: int, tmr: int, acc: pd.DataFrame, wm_raw: int, may_clear: bool
    ) -> list[pd.DataFrame]:
        wm = wm_raw + self.shift_ms if wm_raw > 0 else wm_raw
        mature = acc["start"] + self.width_ms <= wm
        outs: list[pd.DataFrame] = []
        if bool(mature.any()):
            outs.append(
                _result_pdf(
                    acc[mature], self.width_ms, self.label,
                    self.bug_compatible_stdev, self.key_col,
                )
            )
        rest = acc[~mature]
        if may_clear and not len(rest) and not outs:
            # retention deadline fired with nothing pending and no fresh
            # activity: drop the tombstone (the fired timer is already gone)
            self.acc_state.clear()
        else:
            # any invocation with input or emission refreshes the frontier
            # tombstone and its retention deadline
            self._store(max(thru, wm), tmr, rest, wm_raw)
        return outs

    # -- StatefulProcessor interface ----------------------------------------

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        thru, tmr, acc = self._load()
        contribs = [acc]
        for pdf in rows:
            if len(pdf) == 0:
                continue
            ts = _ts_ms(pdf[self.ts_col])
            v = pdf[self.value_col].to_numpy(dtype="float64")
            kv = pdf[self.key_col].reset_index(drop=True)
            base = (ts // self.slide_ms) * self.slide_ms
            for off in range(self.n_wins):
                start = base - off * self.slide_ms
                live = start + self.width_ms > thru  # skip finalized windows
                if not live.any():
                    continue
                s, vv = start[live], v[live]
                contribs.append(
                    pd.DataFrame(
                        {"k": kv[live].reset_index(drop=True), "start": s,
                         "cnt": 1, "nn": (~np.isnan(vv)).astype("int64"),
                         "sum": vv, "sumsq": vv * vv, "mn": vv, "mx": vv}
                    )
                )
        if len(contribs) > 1:
            allc = pd.concat(contribs, ignore_index=True)
            acc = (
                allc.groupby(["k", "start"], as_index=False, sort=True)
                .agg(cnt=("cnt", "sum"), nn=("nn", "sum"), sum=("sum", "sum"),
                     sumsq=("sumsq", "sum"), mn=("mn", "min"), mx=("mx", "max"))
            )
        outs = self._emit_and_store(
            thru, tmr, acc, timerValues.getCurrentWatermarkInMs(), may_clear=False
        )
        return iter(outs)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # The fired timer is consumed by the framework; _store re-registers
        # the next deadline (always strictly later than the fired one).
        thru, tmr, acc = self._load()
        outs = self._emit_and_store(
            thru, tmr, acc, timerValues.getCurrentWatermarkInMs(), may_clear=True
        )
        return iter(outs)

    def close(self) -> None:
        pass


class TwsSessionProcessor(StatefulProcessor):
    """Session windows (static gap) as a StatefulProcessor — the timer-based
    Flink session pattern: every event extends its session's ``[ts, ts+gap)``
    interval, overlapping intervals merge (``engine.state``'s vectorized
    gaps-and-islands rule), and the per-key timer sits at the earliest open
    session end so the session fires the batch the watermark proves it can
    no longer be extended.  All interval arithmetic in µs, matching
    :func:`engine.state.stateful_session_agg`.
    """

    def __init__(
        self,
        ts_col: str,
        key_col: str,
        value_col: str,
        gap_us: int,
        label: str,
        bug_compatible_stdev: bool,
        retention_us: int,
        shift_us: int,
        key_sql: str,
        key_pd: str | None,
    ) -> None:
        self.ts_col = ts_col
        self.key_col = key_col
        self.value_col = value_col
        self.gap_us = gap_us
        self.label = label
        self.bug_compatible_stdev = bug_compatible_stdev
        self.retention_us = retention_us
        self.shift_us = shift_us
        self.key_sql = key_sql
        self.key_pd = key_pd

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.acc_state = handle.getValueState(
            "sess",
            f"thru long, tmr long, k array<{self.key_sql}>, "
            "start array<long>, end array<long>, cnt array<long>, "
            "nn array<long>, sum array<double>, sumsq array<double>, "
            "mn array<double>, mx array<double>",
        )

    def _load(self) -> tuple[int, int, pd.DataFrame]:
        v = self.acc_state.get()
        if v is None:
            thru, tmr, arrays = _THRU_NEG, 0, [[] for _ in _SESS_COLS]
        else:
            thru, tmr, arrays = v[0], v[1], v[2:]
        out = {}
        for c, vals in zip(_SESS_COLS, arrays):
            dt = _acc_dtype(c, self.key_pd)
            out[c] = pd.Series(vals) if dt is None else np.asarray(vals, dtype=dt)
        return int(thru), int(tmr), pd.DataFrame(out)

    def _store(self, thru: int, tmr_old: int, acc: pd.DataFrame, wm_raw_ms: int) -> None:
        # deadlines in µs TRUE event time; registered timers in ms, shifted
        if len(acc):
            deadline_us = int(acc["end"].min())
        else:
            deadline_us = thru + self.retention_us
        want = max((deadline_us - self.shift_us) // 1000 + 1, wm_raw_ms + 1, 1)
        if tmr_old != want:
            if tmr_old:
                self.handle.deleteTimer(tmr_old)
            self.handle.registerTimer(want)
        vals = []
        for c in _SESS_COLS:
            dt = _acc_dtype(c, self.key_pd)
            vals.append(acc[c].tolist() if dt is None else acc[c].astype(dt).tolist())
        self.acc_state.update((int(thru), int(want)) + tuple(vals))

    def _emit_and_store(
        self, thru: int, tmr: int, acc: pd.DataFrame, wm_raw_ms: int, may_clear: bool
    ) -> list[pd.DataFrame]:
        wm = wm_raw_ms * 1000 + self.shift_us if wm_raw_ms > 0 else wm_raw_ms * 1000
        mature = acc["end"] <= wm
        outs: list[pd.DataFrame] = []
        if bool(mature.any()):
            outs.append(
                _result_pdf(acc[mature], None, self.label,
                            self.bug_compatible_stdev, self.key_col,
                            to_ts=_us_ts)
            )
        rest = acc[~mature]
        if may_clear and not len(rest) and not outs:
            self.acc_state.clear()
        else:
            self._store(max(thru, wm), tmr, rest, wm_raw_ms)
        return outs

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        thru, tmr, acc = self._load()
        contribs = [acc]
        folded = False
        for pdf in rows:
            if len(pdf) == 0:
                continue
            ts = _ts_us(pdf[self.ts_col])
            v = pdf[self.value_col].to_numpy(dtype="float64")
            live = ts + self.gap_us > thru  # drop rows for finalized sessions
            if not live.any():
                continue
            folded = True
            kv = pdf[self.key_col].reset_index(drop=True)[live]
            tsl, vl = ts[live], v[live]
            contribs.append(
                pd.DataFrame(
                    {"k": kv.reset_index(drop=True), "start": tsl,
                     "end": tsl + self.gap_us, "cnt": 1,
                     "nn": (~np.isnan(vl)).astype("int64"), "sum": vl,
                     "sumsq": vl * vl, "mn": vl, "mx": vl}
                )
            )
        if folded:
            allc = pd.concat(contribs, ignore_index=True)
            acc = _merge_session_islands(allc) if len(allc) else allc
        outs = self._emit_and_store(
            thru, tmr, acc, timerValues.getCurrentWatermarkInMs(), may_clear=False
        )
        return iter(outs)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        thru, tmr, acc = self._load()
        outs = self._emit_and_store(
            thru, tmr, acc, timerValues.getCurrentWatermarkInMs(), may_clear=True
        )
        return iter(outs)

    def close(self) -> None:
        pass


def stateful_window_agg_tws(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    width: str = "10 minutes",
    slide: str | None = None,
    label: str | None = None,
    bug_compatible_stdev: bool = False,
    late_retention: str = "1 hour",
    watermark: str | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Tumbling/sliding keyed window aggregate with state + event-time timers
    on ``transformWithStateInPandas`` — output schema and rows identical to
    :func:`engine.state.stateful_window_agg` and the built-in
    :func:`engine.windows.tumbling_agg` / ``sliding_agg`` in append mode
    (parity pinned in tests/test_state_tws.py).

    Same knobs as the ``applyInPandasWithState`` backend: ``watermark`` for
    exact built-in late-data parity on an un-watermarked input,
    ``n_buckets`` for key-coarsened state on high-cardinality keys.
    Requires the RocksDB state store provider (pinned in engine.session).
    """
    from engine.windows import width_label
    from pyspark.sql import functions as F

    if not tws_runtime_available():
        raise RuntimeError(
            "transformWithState needs the protobuf runtime (google.protobuf) "
            "for its JVM<->Python state-server protocol; it is absent here. "
            "Use engine.state.stateful_window_agg (applyInPandasWithState) "
            "in this environment, or run on a cluster with a standard "
            "PySpark install."
        )
    width_ms = dur_ms(width)
    slide_ms = dur_ms(slide) if slide else width_ms
    if width_ms % slide_ms != 0:
        raise ValueError("width must be a multiple of slide")
    label = label or width_label(width)
    retention_ms = dur_ms(late_retention)
    # hand column pruning: transformWithState ships every child column over
    # the shuffle + Arrow boundary, same as applyInPandasWithState
    needed = {ts_col, key_col, value_col}
    df = df.select(*[c for c in df.columns if c in needed])
    shift_ms = 0
    if watermark is not None:
        shift_ms = width_ms
        df = df.withWatermark(ts_col, f"{dur_ms(watermark) + shift_ms} milliseconds")
    # null keys excluded, null timestamps still advance the event clock —
    # see engine.state.stateful_window_agg for the predicate-shape rationale
    df = df.where(F.col(key_col).isNotNull() | F.col(ts_col).isNull())
    key_sql, key_pd = _key_meta(df, key_col)
    proc = TwsWindowProcessor(
        ts_col, key_col, value_col, width_ms, slide_ms, label,
        bug_compatible_stdev, retention_ms, shift_ms, key_sql, key_pd,
    )
    return _grouped(df, key_col, n_buckets).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=_out_ddl(key_col, key_sql, label),
        outputMode="append",
        timeMode="eventTime",
    )


def stateful_session_agg_tws(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    gap: str = "30 seconds",
    label: str = "session",
    bug_compatible_stdev: bool = False,
    late_retention: str = "1 hour",
    watermark: str | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Session windows (static gap) with state + event-time timers on
    ``transformWithStateInPandas`` — output schema and rows identical to
    :func:`engine.state.stateful_session_agg` and the built-in
    ``F.session_window`` aggregate in append mode.  Same knobs and runtime
    gate as :func:`stateful_window_agg_tws`.
    """
    from pyspark.sql import functions as F

    if not tws_runtime_available():
        raise RuntimeError(
            "transformWithState needs the protobuf runtime (google.protobuf) "
            "for its JVM<->Python state-server protocol; it is absent here. "
            "Use engine.state.stateful_session_agg (applyInPandasWithState) "
            "in this environment, or run on a cluster with a standard "
            "PySpark install."
        )
    gap_us = dur_ms(gap) * 1000
    retention_us = dur_ms(late_retention) * 1000
    df = df.select(*[c for c in df.columns if c in {ts_col, key_col, value_col}])
    shift_us = 0
    if watermark is not None:
        shift_us = gap_us
        df = df.withWatermark(
            ts_col, f"{dur_ms(watermark) + dur_ms(gap)} milliseconds"
        )
    df = df.where(F.col(key_col).isNotNull() | F.col(ts_col).isNull())
    key_sql, key_pd = _key_meta(df, key_col)
    proc = TwsSessionProcessor(
        ts_col, key_col, value_col, gap_us, label, bug_compatible_stdev,
        retention_us, shift_us, key_sql, key_pd,
    )
    return _grouped(df, key_col, n_buckets).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=_out_ddl(key_col, key_sql, label),
        outputMode="append",
        timeMode="eventTime",
    )


class TwsJoinProcessor(StatefulProcessor):
    """Symmetric hash stream-stream inner join as a StatefulProcessor — the
    Flink ``connect``/``CoProcessFunction`` shape on arbitrary state v2:
    the two streams arrive pre-tagged and unioned
    (:func:`engine.state_join.tag_union`), per-key buffers of unmatched rows
    from both sides live in one ``ValueState``, each batch emits
    new-left x all-seen-right plus new-right x previously-buffered-left
    (no double counting), and the per-key event-time timer sits at the
    earliest buffered row's TTL deadline so eviction happens on watermark
    progress even for keys receiving no further input.  All join semantics
    (TTL, null keys, exact int64 payload preservation through nullable
    Int64) come from the shared :class:`engine.state_join.JoinSpec`.
    """

    def __init__(self, spec) -> None:
        self.spec = spec

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.buf_state = handle.getValueState(
            "buf", f"tmr long, {self.spec.state_ddl}"
        )

    def _load(self):
        v = self.buf_state.get()
        if v is None:
            tmr, vals = 0, None
        else:
            tmr, vals = v[0], v[1:]
        old_l, old_r = self.spec.bufs_from_vals(vals)
        return int(tmr), old_l, old_r

    def _store_or_clear(self, tmr_old: int, all_l, all_r, wm_ms: int) -> None:
        if len(all_l) == 0 and len(all_r) == 0:
            # drop the registered timer WITH the state — leaving it would
            # orphan a timer that later fires handleExpiredTimer against
            # empty state (one-timer-tracked-in-state invariant)
            if tmr_old:
                self.handle.deleteTimer(tmr_old)
            if self.buf_state.get() is not None:
                self.buf_state.clear()
            return
        lo = min(
            ([int(all_l["__ts"].min())] if len(all_l) else [])
            + ([int(all_r["__ts"].min())] if len(all_r) else [])
        )
        # timer in ms, strictly past the watermark
        want = max((lo + self.spec.ttl_us) // 1000 + 1, wm_ms + 1, 1)
        if tmr_old != want:
            if tmr_old:
                self.handle.deleteTimer(tmr_old)
            self.handle.registerTimer(want)
        self.buf_state.update((int(want),) + self.spec.vals_from_bufs(all_l, all_r))

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        spec = self.spec
        wm_ms = timerValues.getCurrentWatermarkInMs()
        wm = wm_ms * 1000  # µs
        tmr, old_l, old_r = self._load()
        new_l, new_r = spec.fold(rows, wm)
        new_l = spec.coerce(new_l, spec.l_ct) if new_l is not None else old_l.iloc[0:0]
        new_r = spec.coerce(new_r, spec.r_ct) if new_r is not None else old_r.iloc[0:0]
        all_r = spec.concat2(old_r, new_r)
        outs = []
        if len(new_l) and len(all_r):
            outs.append(spec.emit(new_l, all_r))
        if len(new_r) and len(old_l):
            outs.append(spec.emit(old_l, new_r))
        out_frames = []
        if outs:
            out = pd.concat(outs, ignore_index=True)
            if len(out):
                out_frames.append(out[spec.out_cols])
        all_l = spec.concat2(old_l, new_l)
        all_l = spec.coerce(all_l[all_l["__ts"] + spec.ttl_us > wm], spec.l_ct)
        all_r = spec.coerce(all_r[all_r["__ts"] + spec.ttl_us > wm], spec.r_ct)
        self._store_or_clear(tmr, all_l, all_r, wm_ms)
        return iter(out_frames)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        spec = self.spec
        wm_ms = timerValues.getCurrentWatermarkInMs()
        wm = wm_ms * 1000
        tmr, old_l, old_r = self._load()
        all_l = spec.coerce(old_l[old_l["__ts"] + spec.ttl_us > wm], spec.l_ct)
        all_r = spec.coerce(old_r[old_r["__ts"] + spec.ttl_us > wm], spec.r_ct)
        self._store_or_clear(tmr, all_l, all_r, wm_ms)
        return iter([])

    def close(self) -> None:
        pass


def stateful_stream_join_tws(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str = "event_ts",
    ttl: str = "10 minutes",
    left_ts_name: str = "left_ts",
    right_ts_name: str = "right_ts",
    n_buckets: int | None = None,
) -> DataFrame:
    """Stateful inner stream-stream equi-join on ``transformWithStateInPandas``
    — identical semantics, options, and output schema to
    :func:`engine.state_join.stateful_stream_join` (J6), including the
    key-coarsened ``n_buckets`` layout.  Same runtime gate as the rest of
    this module.
    """
    from engine.state_join import JoinSpec, tag_union

    if not tws_runtime_available():
        raise RuntimeError(
            "transformWithState needs the protobuf runtime (google.protobuf) "
            "for its JVM<->Python state-server protocol; it is absent here. "
            "Use engine.state_join.stateful_stream_join "
            "(applyInPandasWithState) in this environment, or run on a "
            "cluster with a standard PySpark install."
        )
    spec = JoinSpec(left, right, key_col, ts_col, ttl,
                    left_ts_name, right_ts_name)
    both, group_col = tag_union(left, right, spec, n_buckets)
    return both.groupBy(group_col).transformWithStateInPandas(
        statefulProcessor=TwsJoinProcessor(spec),
        outputStructType=spec.out_ddl,
        outputMode="append",
        timeMode="eventTime",
    )

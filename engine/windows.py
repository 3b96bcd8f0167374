"""Tumbling / sliding / session windowed aggregates — the heart of the pipeline.

Reference semantics (SURVEY.md §2.4-2.5):

- ``TransactionFraudExample.java:60-71``: event time from the ``datetime``
  column, 60 s bounded out-of-orderness watermark, ``keyBy(cc_num)``,
  epoch-aligned tumbling 10-minute event-time window, incremental aggregate.
- ``TransactionCountAggregate.java:10-40``: accumulator ``(key, count, sum, 0.0)``;
  result ``{cc_num, num_trans_per_10m, avg_amt_per_10m, stdev_amt_per_10m}``.
  **The reference's stdev is the literal constant 0.0** (``add`` writes 0.0 at
  :21, ``merge`` sums zeros at :37-38). ``bug_compatible_stdev=True`` preserves
  that row-for-row; the corrected mode emits a real ``stddev_samp``.

Spark expression: ``groupBy(window(ts, width), key).agg(...)`` — Catalyst's
HashAggregateExec performs the same partial(add)/final(merge) split as Flink's
incremental window aggregate, and ``window()`` uses the same epoch alignment
and ``[start, end)`` bounds as ``TumblingEventTimeWindows``. Late handling in
streaming: rows later than watermark past window end are dropped on both
engines (no allowedLateness in the reference).

Scale note: these are pure built-in aggregations — partial aggregation happens
map-side before the shuffle, so the shuffle volume is O(keys × windows), not
O(rows). For skewed keys see :mod:`engine.skew`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: window-width label used in reference feature-group names (10m/1h/12h)
WIDTH_LABELS = {"10 minutes": "10m", "1 hour": "1h", "12 hours": "12h"}


def width_label(width: str) -> str:
    return WIDTH_LABELS.get(width, width.replace(" ", ""))


def _agg_exprs(
    value_col: str,
    label: str,
    bug_compatible_stdev: bool,
    include_minmax: bool,
) -> list[Column]:
    """The reference aggregate (count / avg / stdev) + north-rule min/max."""
    exprs = [
        F.count(F.lit(1)).alias(f"num_trans_per_{label}"),
        F.avg(value_col).alias(f"avg_amt_per_{label}"),
        (
            # Bug-compatible: reference emits literal 0.0
            # (TransactionCountAggregate.java:21,30,37-38).
            F.lit(0.0) if bug_compatible_stdev else F.stddev_samp(value_col)
        ).alias(f"stdev_amt_per_{label}"),
    ]
    if include_minmax:
        exprs += [
            F.min(value_col).alias(f"min_amt_per_{label}"),
            F.max(value_col).alias(f"max_amt_per_{label}"),
        ]
    return exprs


def _finish(df: DataFrame, win_struct: str = "window") -> DataFrame:
    rest = [c for c in df.columns if c != win_struct]
    return df.select(
        F.col(f"{win_struct}.start").alias("window_start"),
        F.col(f"{win_struct}.end").alias("window_end"),
        *rest,
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    width: str = "10 minutes",
    bug_compatible_stdev: bool = False,
    include_minmax: bool = True,
    label: str | None = None,
) -> DataFrame:
    """Epoch-aligned tumbling event-time window aggregate.

    Batch and streaming share this plan; streaming callers apply
    ``df.withWatermark(ts_col, ...)`` first (see :func:`with_event_time`).
    Output columns: window_start, window_end, <key>, num_trans_per_<label>,
    avg_amt_per_<label>, stdev_amt_per_<label>[, min_/max_amt_per_<label>].
    """
    label = label or width_label(width)
    agg = df.groupBy(F.window(ts_col, width), key_col).agg(
        *_agg_exprs(value_col, label, bug_compatible_stdev, include_minmax)
    )
    return _finish(agg, "window")


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    bug_compatible_stdev: bool = False,
    include_minmax: bool = True,
    label: str | None = None,
) -> DataFrame:
    """Sliding event-time window (north rule W5). Each row lands in
    width/slide overlapping windows; Spark expands the assignment before the
    partial aggregation, same as Flink's ``SlidingEventTimeWindows``."""
    label = label or width_label(width)
    agg = df.groupBy(F.window(ts_col, width, slide), key_col).agg(
        *_agg_exprs(value_col, label, bug_compatible_stdev, include_minmax)
    )
    return _finish(agg, "window")


def session_agg(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    gap: str = "30 seconds",
    bug_compatible_stdev: bool = False,
    include_minmax: bool = True,
    label: str = "session",
) -> DataFrame:
    """Session window with a static gap (north rule W6): per-key sessions close
    after ``gap`` of event-time silence. ``session_window`` merges overlapping
    per-row intervals — the same merge semantics as Flink session windows."""
    agg = df.groupBy(F.session_window(ts_col, gap), key_col).agg(
        *_agg_exprs(value_col, label, bug_compatible_stdev, include_minmax)
    )
    return _finish(agg, "session_window")


def session_agg_dynamic(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    gap_expr: Column,
    bug_compatible_stdev: bool = False,
    include_minmax: bool = True,
    label: str = "session",
) -> DataFrame:
    """Session window with a per-row dynamic gap (W6's "dynamic gap"):
    ``gap_expr`` is a duration-string Column evaluated per event, e.g.
    ``F.when(F.col("event_type") == "click", F.lit("2 hours"))
    .otherwise(F.lit("6 hours"))`` (``session_window`` requires
    CalendarIntervalType or duration strings — ANSI ``INTERVAL`` literals
    produce DayTimeIntervalType and are rejected).  Each event contributes
    ``[ts, ts+gap)``; overlapping intervals merge, the window is
    ``[min ts, max(ts+gap))``."""
    agg = df.groupBy(F.session_window(ts_col, gap_expr), key_col).agg(
        *_agg_exprs(value_col, label, bug_compatible_stdev, include_minmax)
    )
    return _finish(agg, "session_window")


def with_event_time(
    df: DataFrame,
    epoch_ms_col: str | None = None,
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """W1+W2: assign event time (epoch-millis long → timestamp, as the
    reference's ``event.getDatetime()``) and, for streams, a bounded
    out-of-orderness watermark (``forBoundedOutOfOrderness(60 s)``,
    ``TransactionFraudExample.java:36,60-62``)."""
    if epoch_ms_col is not None:
        df = df.withColumn(ts_col, F.timestamp_millis(F.col(epoch_ms_col)))
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return df


def multi_width_aggs(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    widths: tuple[str, ...] = ("10 minutes", "1 hour", "12 hours"),
    **kw,
) -> dict[str, DataFrame]:
    """W4: the three parallel feature groups (10m/1h/12h) sharing one source,
    as created by the reference setup notebook (cells 4, 10-13)."""
    return {
        width_label(w): tumbling_agg(df, ts_col, key_col, value_col, width=w, **kw)
        for w in widths
    }


def keyed_percentiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-key percentiles, exact by default (p50/p90/p99-style).

    Extends the A1-A4 incremental-stats family (count/avg/stdev/min/max —
    ``TransactionCountAggregate.java:21-38``) with the latency/amount
    quantiles every monitoring pipeline adds next. Uses Spark's exact
    ``percentile`` aggregate (same linear interpolation as ANSI
    ``percentile_cont`` / DuckDB ``quantile_cont``), rounded to 6 dp so the
    cross-engine oracle hash-matches bit-for-bit.

    ``approx=True`` swaps in ``percentile_approx`` (Greenwald-Khanna
    sketch, rank error <= group_size / accuracy): same call site, same
    output columns, bounded memory per group — the 100 TB mode when a few
    groups hold most of the rows. The rank-error bound is property-tested.

    Scale notes (exact mode): one hash-partial + one final aggregate on the
    key shuffle — exact percentiles buffer per-group values, so memory
    stays bounded only while groups are numerous/small (true for per-user
    stats); for few huge groups use ``approx=True``.
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    for p in probs:
        # name from the integer percent so labels are unambiguous SQL
        # identifiers (p50/p90/p99, p=1.0 -> p100); reject probs the scheme
        # cannot name rather than emit malformed/ambiguous columns
        if not 0.0 < p <= 1.0:
            raise ValueError(f"prob must be in (0, 1], got {p}")
        pct = p * 100.0
        if abs(pct - round(pct)) > 1e-9:
            raise ValueError(
                f"prob {p} is not a whole percent; the pNN label scheme "
                f"cannot name it unambiguously — use a whole-percent prob"
            )
        label = f"p{int(round(pct)):02d}"
        if approx:
            expr = F.percentile_approx(value_col, F.lit(p), F.lit(accuracy))
        else:
            expr = F.percentile(value_col, F.lit(p))
        aggs.append(F.round(expr, 6).alias(label))
    return df.groupBy(key_col).agg(*aggs)

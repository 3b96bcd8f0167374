"""Complex-event-processing (CEP) sequence detection — batch + streaming.

The north rule frames this engine as a "structured-streaming / CEP engine";
the reference's Flink runtime ships FlinkCEP-style pattern matching
(``begin → followedBy → within``) as a first-class neighbor of its windowed
aggregates.  This module provides the Spark-native equivalent:

- :func:`detect_sequence` — batch funnel/sequence detection.  A pattern is an
  ordered list of named predicates (``[("view", c1), ("click", c2),
  ("purchase", c3)]``); the operator emits one row per event completing the
  final step whose chain of predecessors satisfies
  ``t_last - t_first <= within`` (FlinkCEP ``followedBy`` relaxed contiguity
  + ``within``, emit-per-final-match selection).
- :func:`stateful_pattern_detect` — the same semantics as a streaming
  operator over ``applyInPandasWithState``: a vectorized NFA whose per-key
  state is the greedy-latest partial chain per step plus the not-yet-mature
  event buffer.  Matches emit when the event-time watermark passes the final
  step's timestamp; state is pruned the moment a partial chain can no longer
  complete inside ``within`` — bounded state at 10^12-event scale.

Match-selection semantics (both paths, deterministic): each step chains to
the **most recent** event completing the previous step strictly before it
(ties broken by ``order_col``).  Greedy-latest maximizes the chain's start
time, so it minimizes the span — a final event emits a match **iff any**
valid chain satisfies ``within``, and the emitted chain is the unique
latest-predecessor one.

Scale posture (batch): the k-step cascade is k ``last(..., ignorenulls)``
window passes over ONE partitioning ``(key, ordered by ts)`` — a single
shuffle + sort, every pass whole-stage-codegen, no join, no state blowup.
Shuffle volume is O(events matching >= 1 predicate) because rows matching no
step are filtered before the exchange.  Streaming: state per key is
O(k^2) timestamps + O(in-flight rows inside the watermark delay).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from engine.state import _ts_us, _us_ts, dur_ms


def _steps_list(steps) -> list[tuple[str, Column]]:
    out = list(steps.items()) if isinstance(steps, dict) else list(steps)
    if len(out) < 2:
        raise ValueError("a sequence pattern needs at least 2 steps")
    names = [n for n, _ in out]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate step names: {names}")
    return out


def detect_sequence(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    steps: Sequence[tuple[str, Column]],
    within: str,
    order_col: str | None = None,
) -> DataFrame:
    """Batch CEP sequence (funnel) detection.

    Emits ``(key, <name>_ts ...)`` — one row per event completing the final
    step, with the greedy latest-predecessor chain, subject to
    ``last - first <= within``.  ``order_col`` breaks equal-timestamp ties
    deterministically (required for a stable oracle); rows with a null key
    never participate (SQL join semantics, same rule as the window store).
    """
    steps = _steps_list(steps)
    k = len(steps)
    within_us = dur_ms(within) * 1000

    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    # Ship only matching rows through the exchange: predicate evaluation is
    # JVM-side codegen BEFORE the shuffle, and non-matching rows are dropped.
    any_step = steps[0][1]
    for _, cond in steps[1:]:
        any_step = any_step | cond
    pruned = df.where(F.col(key_col).isNotNull() & any_step).select(
        key_col, ts_col, *([order_col] if order_col else []),
        *[cond.alias(f"_m{i}") for i, (_, cond) in enumerate(steps)],
    )

    # k chained window passes over the SAME (partition, order) spec — Catalyst
    # plans one Exchange + one Sort, then k Window nodes reusing the order.
    cur = pruned.withColumn(
        "_c0",
        F.when(F.col("_m0"), F.struct(F.col(ts_col).alias("t0"))),
    )
    for i in range(1, k):
        # materialize the window pass once per step so the plan carries
        # exactly one last(..., ignorenulls) per step (k Window functions,
        # one Exchange+Sort total)
        cur = cur.withColumn(
            f"_p{i}", F.last(F.col(f"_c{i-1}"), ignorenulls=True).over(w)
        )
        prev = F.col(f"_p{i}")
        cur = cur.withColumn(
            f"_c{i}",
            F.when(
                F.col(f"_m{i}") & prev.isNotNull(),
                F.struct(
                    *[prev[f"t{j}"].alias(f"t{j}") for j in range(i)],
                    F.col(ts_col).alias(f"t{i}"),
                ),
            ),
        )
    last = F.col(f"_c{k-1}")
    return (
        cur.where(
            last.isNotNull()
            & (
                # cast: the driver parquet stores TIMESTAMP_NTZ, which
                # unix_micros rejects; session tz is pinned UTC so the cast
                # is value-preserving
                F.unix_micros(last[f"t{k-1}"].cast("timestamp"))
                - F.unix_micros(last["t0"].cast("timestamp"))
                <= F.lit(within_us)
            )
        )
        .select(
            key_col,
            *[last[f"t{i}"].alias(f"{name}_ts") for i, (name, _) in enumerate(steps)],
        )
    )


def detect_sequence_sql(
    key_col: str,
    ts_col: str,
    step_names: Sequence[str],
    step_preds: Sequence[str],
    within_sql: str,
    table: str,
    order_col: str,
) -> str:
    """ANSI-SQL twin of :func:`detect_sequence` (the DuckDB oracle): the same
    latest-predecessor cascade via ``last_value(... IGNORE NULLS)`` window
    functions over ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``."""
    k = len(step_names)
    assert k == len(step_preds) and k >= 2
    over = (
        f"OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {order_col} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    sql = (
        f"WITH s0 AS (SELECT {key_col}, {ts_col}, {order_col}, "
        + ", ".join(f"({p}) AS m{i}" for i, p in enumerate(step_preds))
        + f" FROM {table} WHERE {key_col} IS NOT NULL AND ("
        + " OR ".join(f"({p})" for p in step_preds)
        + ")), c0 AS (SELECT *, CASE WHEN m0 THEN "
        + f"struct_pack(t0 := {ts_col}) END AS ch0 FROM s0)"
    )
    for i in range(1, k):
        fields = ", ".join([f"t{j} := p{i}.t{j}" for j in range(i)]
                           + [f"t{i} := {ts_col}"])
        sql += (
            f", c{i} AS (SELECT *, CASE WHEN m{i} AND p{i} IS NOT NULL THEN "
            f"struct_pack({fields}) END AS ch{i} FROM (SELECT *, "
            f"last_value(ch{i-1} IGNORE NULLS) {over} AS p{i} FROM c{i-1}))"
        )
    outs = ", ".join(
        f"ch{k-1}.t{i} AS {n}_ts" for i, n in enumerate(step_names)
    )
    sql += (
        f" SELECT {key_col}, {outs} FROM c{k-1} WHERE ch{k-1} IS NOT NULL "
        f"AND ch{k-1}.t{k-1} - ch{k-1}.t0 <= {within_sql}"
    )
    return sql


# ---------------------------------------------------------------------------
# streaming twin
# ---------------------------------------------------------------------------


def _cascade(
    ts: np.ndarray,
    masks: np.ndarray,
    carry: list[np.ndarray | None],
    k: int,
    within_us: int,
):
    """Run the latest-predecessor NFA over one key's mature rows.

    ``ts`` sorted ascending (µs), ``masks`` int64 step bitmasks, ``carry``
    the per-step partial chains from prior batches (``carry[i]`` =
    timestamps ``t0..ti`` of the latest completed step-i chain, or None).
    Vectorized: per step one masked running-argmax; Python only per emitted
    match / carried chain (O(k) each).  Returns (matches, new_carry).
    """
    # Materialize carried chains as pseudo-rows completing their step, sorted
    # before all real rows (their completion time <= previous watermark).
    pseudo = [(int(c[-1]), i, c) for i, c in enumerate(carry) if c is not None]
    pseudo.sort(key=lambda p: p[0])
    np_ = len(pseudo)
    n = len(ts)
    all_ts = np.concatenate(
        [np.array([p[0] for p in pseudo], dtype="int64"), ts]
    )
    N = np_ + n
    idxs = np.arange(N)
    comp = np.zeros((k, N), dtype=bool)
    preds = np.full((k, N), -1, dtype="int64")
    for pj, (_, step_i, _) in enumerate(pseudo):
        comp[step_i, pj] = True
    m_real = [((masks >> i) & 1).astype(bool) for i in range(k)]
    for i in range(k):
        if i == 0:
            comp[0, np_:] |= m_real[0]
        else:
            comp[i, np_:] |= m_real[i] & (preds[i - 1, np_:] >= 0)
        run = np.maximum.accumulate(np.where(comp[i], idxs, -1))
        if i < k - 1:
            preds[i, 1:] = run[:-1]

    def chain_of(step_i: int, row: int) -> list[int] | None:
        """Backtrack the greedy-latest chain ending at ``row`` (step_i)."""
        out = [int(all_ts[row])]
        cur, i = row, step_i
        while i > 0:
            if cur < np_:  # pseudo-row: full chain is known
                return list(map(int, pseudo[cur][2][:i + 1])) + out[1:]
            p = preds[i - 1, cur]
            if p < 0:
                return None
            out.insert(0, int(all_ts[p]))
            cur, i = p, i - 1
        if cur < np_:
            return list(map(int, pseudo[cur][2][:1])) + out[1:]
        return out

    matches = []
    final = comp[k - 1].copy()
    final[:np_] = False  # pseudo-rows never re-emit
    for row in np.flatnonzero(final):
        ch = chain_of(k - 1, row)
        if ch is not None and ch[-1] - ch[0] <= within_us:
            matches.append(ch)

    new_carry: list[np.ndarray | None] = [None] * k
    for i in range(k - 1):  # final-step chains are never predecessors
        run_last = -1
        hits = np.flatnonzero(comp[i])
        if len(hits):
            run_last = int(hits[-1])
        if run_last >= 0:
            ch = chain_of(i, run_last)
            if ch is not None:
                new_carry[i] = np.array(ch, dtype="int64")
    return matches, new_carry


def stateful_pattern_detect(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    steps: Sequence[tuple[str, Column]],
    within: str,
    watermark: str | None = None,
    late_retention: str = "1 hour",
) -> DataFrame:
    """Streaming CEP over the custom ``applyInPandasWithState`` store.

    Same match semantics as :func:`detect_sequence`; a match emits when the
    watermark passes its final event's timestamp (append-mode determinism —
    output is independent of micro-batch boundaries for distinct
    timestamps).  State per key: the step-i partial chains (pruned as soon
    as ``t0 + within`` falls behind the watermark — they can no longer
    complete) plus events newer than the watermark.  Late rows (ts at or
    before the processed frontier) are dropped, matching built-in
    late-data semantics.
    """
    steps = _steps_list(steps)
    k = len(steps)
    within_us = dur_ms(within) * 1000
    retention_us = dur_ms(late_retention) * 1000
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)

    any_step = steps[0][1]
    for _, cond in steps[1:]:
        any_step = any_step | cond
    mask = F.lit(0).cast("long")
    for i, (_, cond) in enumerate(steps):
        mask = mask + F.when(cond, F.lit(1 << i)).otherwise(F.lit(0))
    src = df.where(F.col(key_col).isNotNull() & any_step).select(
        key_col, F.col(ts_col).alias("_ts"), mask.alias("_m")
    )
    key_sql = df.schema[key_col].dataType.simpleString()
    # fn must close over plain picklable data only (no pyspark Columns)
    step_names = [name for name, _ in steps]
    out_ddl = f"{key_col} {key_sql}, " + ", ".join(
        f"{name}_ts timestamp" for name in step_names
    )
    state_ddl = (
        "thru long, chains array<array<long>>, "
        "bts array<long>, bm array<long>"
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        wm_ms = state.getCurrentWatermarkMs()
        wm = wm_ms * 1000
        clamp = lambda t: max(t, wm_ms + 1, 1)
        if state.exists:
            thru, chains_raw, bts, bm = state.get
            carry = [
                np.array(c, dtype="int64") if c is not None and len(c) else None
                for c in chains_raw
            ]
            buf_ts = np.array(bts, dtype="int64")
            buf_m = np.array(bm, dtype="int64")
        else:
            thru = 0
            carry = [None] * k
            buf_ts = np.empty(0, dtype="int64")
            buf_m = np.empty(0, dtype="int64")
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts = _ts_us(pdf["_ts"])
            live = ts > thru
            if live.any():
                buf_ts = np.concatenate([buf_ts, ts[live]])
                buf_m = np.concatenate(
                    [buf_m, pdf["_m"].to_numpy(dtype="int64")[live]]
                )
        mature = buf_ts <= wm
        if mature.any():
            order = np.argsort(buf_ts[mature], kind="stable")
            matches, carry = _cascade(
                buf_ts[mature][order], buf_m[mature][order], carry, k,
                within_us,
            )
            thru = max(thru, wm)
            if matches:
                arr = np.array(matches, dtype="int64")
                out = {key_col: pd.Series([key[0]] * len(arr))}
                for i, name in enumerate(step_names):
                    out[f"{name}_ts"] = _us_ts(arr[:, i])
                yield pd.DataFrame(out)
            buf_ts, buf_m = buf_ts[~mature], buf_m[~mature]
        # prune chains that can no longer complete inside `within`
        carry = [
            c if c is not None and c[0] + within_us > wm else None
            for c in carry
        ]
        has_state = len(buf_ts) > 0 or any(c is not None for c in carry)
        if has_state:
            nxt = (
                int(buf_ts.min()) // 1000 + 1
                if len(buf_ts)
                else (min(int(c[0]) for c in carry if c is not None)
                      + within_us) // 1000 + 1
            )
            state.update((
                thru,
                [c.tolist() if c is not None else [] for c in carry],
                buf_ts.tolist(), buf_m.tolist(),
            ))
            state.setTimeoutTimestamp(clamp(nxt))
        elif state.exists:
            state.remove()
        else:
            # first sight of this key produced nothing durable; keep a short
            # tombstone so the group isn't re-created per batch needlessly
            state.update((thru, [[] for _ in range(k)], [], []))
            state.setTimeoutTimestamp(clamp((wm + retention_us) // 1000 + 1))

    return src.groupBy(key_col).applyInPandasWithState(
        fn, out_ddl, state_ddl, "append", GroupStateTimeout.EventTimeTimeout
    )

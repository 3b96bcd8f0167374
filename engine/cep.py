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

Quantifier coverage: ``times(n)``, ``times(m, n)`` ranges, ``optional`` —
all by parse-time expansion, so neither engine grows new state shapes.
FlinkCEP's unbounded ``oneOrMore`` is deliberately NOT offered: an unbounded
greedy loop needs unbounded per-key chain state; express the bounded intent
as ``times(1, N)`` (emits ``N`` columns, skipped tail nulled), which is what
a 10^12-event deployment should run anyway.

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

# state-serialization sentinel for a skipped optional step's timestamp
# (far outside any representable event time)
_SKIP = -(1 << 62)


def _parse_pattern(steps):
    """Normalize a pattern into positive steps with link attributes.

    Each element is ``(name, cond)`` or ``(name, cond, kind)`` with kind in
    ``{"followedBy", "next", "notFollowedBy"}`` (FlinkCEP's contiguity
    vocabulary; the first element is always the ``begin`` step), or
    ``(name, cond, kind, times)`` where ``times >= 1`` is FlinkCEP's
    ``times(n)`` looping quantifier: the step must match ``n`` events.
    A quantified step expands into ``n`` replicas named ``{name}_1 ..
    {name}_n`` BEFORE the cascade/NFA ever sees it — the first replica
    keeps the incoming link ``kind``, and each subsequent replica links
    with that same ``kind`` too, so ``("fail", c, "next", 3)`` is
    FlinkCEP ``next().times(3).consecutive()`` (three adjacent rows) while
    ``("fail", c, "followedBy", 3)`` is the default relaxed internal
    contiguity. ``times`` may also be a range ``(m, n)`` — FlinkCEP
    ``times(m, n)``: ``m`` required replicas + ``n - m`` optional ones.
    ``(name, cond, "optional")`` is FlinkCEP ``.optional()`` (the step may
    be skipped; restrictions: not first, not last, not adjacent to a
    notFollowedBy). Returns ``[(name, cond, kind, neg_cond, opt)]`` for the
    positive steps, where ``kind`` governs the link FROM the previous
    positive step, ``neg_cond`` is the ``notFollowedBy`` predicate guarding
    that link (no event matching it may fall strictly between the two
    matched timestamps), and ``opt`` marks an optional step."""
    raw0 = list(steps.items()) if isinstance(steps, dict) else list(steps)
    raw = []
    for item in raw0:
        if len(item) == 4:
            name, cond, kind, times = item
            if kind == "notFollowedBy":
                raise ValueError("notFollowedBy cannot carry a times "
                                 "quantifier")
            if isinstance(times, tuple):
                # FlinkCEP times(m, n): m required + (n-m) optional replicas
                m, n_hi = times
                if not (isinstance(m, int) and isinstance(n_hi, int)
                        and 1 <= m <= n_hi):
                    raise ValueError(f"times range must be ints "
                                     f"1 <= m <= n, got {times!r}")
                if m == n_hi == 1:
                    raw.append((name, cond, kind))
                    continue
                raw.extend(
                    (f"{name}_{j + 1}", cond, kind) for j in range(m)
                )
                raw.extend(
                    (f"{name}_{j + 1}", cond, "optional")
                    for j in range(m, n_hi)
                )
                continue
            if not isinstance(times, int) or times < 1:
                raise ValueError(f"times quantifier must be an int >= 1 or "
                                 f"an (m, n) range, got {times!r}")
            if times == 1:
                raw.append((name, cond, kind))
            else:
                raw.extend(
                    (f"{name}_{j + 1}", cond, kind) for j in range(times)
                )
        else:
            raw.append(item)
    pos: list[tuple[str, Column, str, Column | None, bool]] = []
    pending_neg: Column | None = None
    names = []
    for j, item in enumerate(raw):
        name, cond, kind = (*item, "followedBy") if len(item) == 2 else item
        if kind not in ("followedBy", "next", "notFollowedBy", "optional"):
            raise ValueError(f"unknown step kind {kind!r}")
        opt = kind == "optional"
        if opt:
            if not pos:
                raise ValueError("pattern cannot begin with an optional "
                                 "step (a match needs a real anchor)")
            kind = "followedBy"
        if kind == "notFollowedBy":
            if j == 0:
                raise ValueError("pattern cannot begin with notFollowedBy")
            if j == len(raw) - 1:
                raise ValueError(
                    "pattern cannot end with notFollowedBy (no following "
                    "step to bound the negation)"
                )
            if pending_neg is not None:
                raise ValueError("consecutive notFollowedBy steps")
            if pos and pos[-1][4]:
                raise ValueError("notFollowedBy after an optional step is "
                                 "unsupported (the guarded link's left "
                                 "endpoint is ambiguous when the step is "
                                 "skipped)")
            pending_neg = cond
            continue
        names.append(name)
        if kind == "next" and pending_neg is not None:
            raise ValueError("notFollowedBy directly before next is "
                             "contradictory (strict contiguity admits no "
                             "intervening event at all)")
        if opt and pending_neg is not None:
            raise ValueError("notFollowedBy before an optional step is "
                             "unsupported (the guarded link vanishes when "
                             "the step is skipped)")
        pos.append((name, cond, "begin" if not pos else kind, pending_neg,
                    opt))
        pending_neg = None
    if len(pos) < 2:
        raise ValueError("a sequence pattern needs at least 2 positive steps")
    if pos[-1][4]:
        raise ValueError("pattern cannot end with an optional step (the "
                         "final step anchors emission and `within`)")
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate step names: {names}")
    return pos


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

    Steps may carry a FlinkCEP contiguity kind: ``(name, cond)`` /
    ``(name, cond, "followedBy")`` is relaxed contiguity; ``(name, cond,
    "next")`` is strict contiguity (the matched event must be the key's
    IMMEDIATELY following input row — so with any ``next`` step the operator
    cannot pre-prune non-matching rows and ships the key's full stream
    through the exchange); ``(name, cond, "notFollowedBy")`` is negation —
    no event matching ``cond`` may fall strictly between the surrounding
    matched timestamps. Boundary semantics: a negated event at exactly the
    LOWER boundary (the predecessor's timestamp) never invalidates
    (timestamp-granular: the ``n <= t_prev`` guard passes); the UPPER
    boundary is order-granular — a negated event sharing the current
    step's timestamp invalidates iff it sorts before the current row under
    ``(ts, order_col)``, because it then falls inside the ROWS-preceding
    window. The SQL oracle and streaming twin share this rule, so parity
    holds; ``(name, cond,
    "optional")`` is FlinkCEP ``.optional()`` — the step may be skipped, in
    which case its emitted ``{name}_ts`` is null. Greedy selection treats a
    skip as a pass-through chain anchored at the event completing the
    previous step, so each link still picks the most recent chain among
    {matched step, skipped step}. A ``times`` range ``(m, n)`` expands to
    ``m`` required + ``n - m`` optional replicas.
    """
    pos = _parse_pattern(steps)
    k = len(pos)
    within_us = dur_ms(within) * 1000
    has_next = any(kind == "next" for _, _, kind, _, _ in pos)
    ts_type = df.schema[ts_col].dataType

    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w_order = Window.partitionBy(key_col).orderBy(*order)
    w = w_order.rowsBetween(Window.unboundedPreceding, -1)

    # Ship only pattern-relevant rows through the exchange: predicate
    # evaluation is JVM-side codegen BEFORE the shuffle, and rows matching
    # no positive/negated step are dropped. A "next" step defines adjacency
    # over the key's FULL stream, so pruning is disabled then.
    relevant = pos[0][1]
    for _, cond, _, neg, _ in pos[1:]:
        relevant = relevant | cond
        if neg is not None:
            relevant = relevant | neg
    keep = F.col(key_col).isNotNull()
    if not has_next:
        keep = keep & relevant
    pruned = df.where(keep).select(
        key_col, ts_col, *([order_col] if order_col else []),
        *[cond.alias(f"_m{i}") for i, (_, cond, _, _, _) in enumerate(pos)],
        *[F.when(neg, F.col(ts_col)).alias(f"_g{i}")
          for i, (_, _, _, neg, _) in enumerate(pos) if neg is not None],
    )

    # k chained window passes over the SAME (partition, order) spec — Catalyst
    # plans one Exchange + one Sort, then k Window nodes reusing the order.
    cur = pruned.withColumn(
        "_c0",
        F.when(F.col("_m0"), F.struct(F.col(ts_col).alias("t0"))),
    )
    for i in range(1, k):
        _, _, kind, neg, opt = pos[i]
        # materialize the window pass once per step so the plan carries
        # exactly one window function per step (one Exchange+Sort total)
        if kind == "next":
            cur = cur.withColumn(
                f"_p{i}", F.lag(F.col(f"_c{i-1}"), 1).over(w_order)
            )
        else:
            cur = cur.withColumn(
                f"_p{i}", F.last(F.col(f"_c{i-1}"), ignorenulls=True).over(w)
            )
        prev = F.col(f"_p{i}")
        ok = F.col(f"_m{i}") & prev.isNotNull()
        if neg is not None:
            # latest negated-event ts strictly before this row; the link is
            # valid unless it lands strictly after the predecessor's ts
            # (t{i-1} is never null here: parse rejects neg next to optional)
            cur = cur.withColumn(
                f"_n{i}", F.last(F.col(f"_g{i}"), ignorenulls=True).over(w)
            )
            n = F.col(f"_n{i}")
            ok = ok & (n.isNull() | (n <= prev[f"t{i-1}"]))
        match_struct = F.struct(
            *[prev[f"t{j}"].alias(f"t{j}") for j in range(i)],
            F.col(ts_col).alias(f"t{i}"),
        )
        if opt:
            # pass-through: a row completing step i-1 also completes step i
            # with a null t{i} — last(_c{i}) then greedily picks the most
            # recent of {matched, skipped} chains for the next link
            this = F.col(f"_c{i-1}")
            skip_struct = F.struct(
                *[this[f"t{j}"].alias(f"t{j}") for j in range(i)],
                F.lit(None).cast(ts_type).alias(f"t{i}"),
            )
            cur = cur.withColumn(
                f"_c{i}",
                F.when(ok, match_struct).otherwise(
                    F.when(this.isNotNull(), skip_struct)
                ),
            )
        else:
            cur = cur.withColumn(f"_c{i}", F.when(ok, match_struct))
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
            *[last[f"t{i}"].alias(f"{name}_ts")
              for i, (name, _, _, _, _) in enumerate(pos)],
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
    step_kinds: Sequence[str] | None = None,
    neg_preds: Sequence[str | None] | None = None,
    opt_steps: Sequence[bool] | None = None,
) -> str:
    """ANSI-SQL twin of :func:`detect_sequence` (the DuckDB oracle): the same
    latest-predecessor cascade via ``last_value(... IGNORE NULLS)`` window
    functions over ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``.

    ``step_kinds[i]`` ("followedBy" | "next") governs the link into positive
    step ``i`` (``lag(ch, 1)`` instead of ``last_value`` for strict
    contiguity); ``neg_preds[i]`` is the ``notFollowedBy`` predicate guarding
    that link (latest negated ts must not land strictly after the
    predecessor's ts); ``opt_steps[i]`` marks an optional step (same-row
    pass-through of the step ``i-1`` chain with a null ``t{i}``)."""
    k = len(step_names)
    assert k == len(step_preds) and k >= 2
    kinds = list(step_kinds) if step_kinds else ["followedBy"] * k
    negs = list(neg_preds) if neg_preds else [None] * k
    opts = list(opt_steps) if opt_steps else [False] * k
    assert len(kinds) == k and len(negs) == k and len(opts) == k
    assert not opts[0] and not opts[-1]
    has_next = "next" in kinds
    over_order = f"OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {order_col}"
    over = over_order + " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    relevant = [f"({p})" for p in step_preds] + [
        f"({g})" for g in negs if g is not None
    ]
    where = f"{key_col} IS NOT NULL"
    if not has_next:  # mirror the Spark-side pruning rule exactly
        where += " AND (" + " OR ".join(relevant) + ")"
    gcols = "".join(
        f", CASE WHEN ({g}) THEN {ts_col} END AS g{i}"
        for i, g in enumerate(negs) if g is not None
    )
    sql = (
        f"WITH s0 AS (SELECT {key_col}, {ts_col}, {order_col}, "
        + ", ".join(f"({p}) AS m{i}" for i, p in enumerate(step_preds))
        + gcols
        + f" FROM {table} WHERE {where}"
        + "), c0 AS (SELECT *, CASE WHEN m0 THEN "
        + f"struct_pack(t0 := {ts_col}) END AS ch0 FROM s0)"
    )
    for i in range(1, k):
        fields = ", ".join([f"t{j} := p{i}.t{j}" for j in range(i)]
                           + [f"t{i} := {ts_col}"])
        prev = (
            f"lag(ch{i-1}, 1) {over_order})" if kinds[i] == "next"
            else f"last_value(ch{i-1} IGNORE NULLS) {over}"
        )
        inner = f"SELECT *, {prev} AS p{i}"
        cond = f"m{i} AND p{i} IS NOT NULL"
        if negs[i] is not None:
            inner += f", last_value(g{i} IGNORE NULLS) {over} AS n{i}"
            cond += f" AND (n{i} IS NULL OR n{i} <= p{i}.t{i-1})"
        case = f"CASE WHEN {cond} THEN struct_pack({fields})"
        if opts[i]:
            skip_fields = ", ".join(
                [f"t{j} := ch{i-1}.t{j}" for j in range(i)]
                + [f"t{i} := CAST(NULL AS TIMESTAMP)"]
            )
            case += (f" WHEN ch{i-1} IS NOT NULL THEN "
                     f"struct_pack({skip_fields})")
        sql += (
            f", c{i} AS (SELECT *, {case} END AS ch{i} "
            f"FROM ({inner} FROM c{i-1}))"
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
    carry: list[list | None],
    k: int,
    within_us: int,
    kinds: Sequence[str] | None = None,
    neg_bits: Sequence[int | None] | None = None,
    carry_neg: list[int] | None = None,
    last_comp: int = 0,
    opts: Sequence[bool] | None = None,
):
    """Run the latest-predecessor NFA over one key's mature rows.

    ``ts`` sorted ascending (µs), ``masks`` int64 step bitmasks, ``carry``
    the per-step partial chains from prior batches (``carry[i]`` =
    timestamps ``t0..ti`` of the latest completed step-i chain — entries of
    skipped optional steps are None — or None when absent).
    ``kinds[i]`` is the link kind into positive step i ("followedBy" /
    "next"); ``neg_bits[i]`` the mask bit of the notFollowedBy predicate
    guarding that link (None when unguarded); ``carry_neg[i]`` the latest
    already-processed negated-event ts; ``last_comp`` the completion
    bitmask of the previously-processed row (adjacency seed for "next"
    across batch boundaries); ``opts[i]`` marks optional steps (a row or
    pseudo-row completing step i-1 also completes step i as a same-row
    pass-through with a null t{i}).  Vectorized: per step one masked
    running-argmax (or shift, for "next"); Python only per emitted match /
    carried chain (O(k) each).  Returns (matches, new_carry,
    new_carry_neg, new_last_comp).
    """
    kinds = list(kinds) if kinds else ["followedBy"] * k
    neg_bits = list(neg_bits) if neg_bits else [None] * k
    carry_neg = list(carry_neg) if carry_neg else [-1] * k
    opts = list(opts) if opts else [False] * k

    def _anchor(c) -> int:
        """Completion time of a chain = its last non-skipped timestamp."""
        return int(next(v for v in reversed(c) if v is not None))

    # Materialize carried chains as pseudo-rows completing their step, sorted
    # before all real rows (their completion time <= previous watermark).
    pseudo = [(_anchor(c), i, c) for i, c in enumerate(carry) if c is not None]
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
    pseudo_of_step = {step_i: pj for pj, (_, step_i, _) in enumerate(pseudo)}
    for pj, (_, step_i, _) in enumerate(pseudo):
        comp[step_i, pj] = True
    m_real = [((masks >> i) & 1).astype(bool) for i in range(k)]
    # per-step running "latest negated-event ts strictly before this row"
    neg_run = {}
    for i, b in enumerate(neg_bits):
        if b is None:
            continue
        g = ((masks >> b) & 1).astype(bool)
        run = np.maximum.accumulate(np.where(g, ts, np.int64(-(1 << 62))))
        before = np.empty(n, dtype="int64")
        before[0] = carry_neg[i]
        if n > 1:
            before[1:] = np.maximum(run[:-1], carry_neg[i])
        neg_run[i] = before
    pass_mark = np.zeros((k, N), dtype=bool)
    for i in range(k):
        if i == 0:
            comp[0, np_:] |= m_real[0]
        elif kinds[i] == "next":
            # strict contiguity: predecessor is the key's immediately
            # preceding input row (real rows only; the batch-boundary seed
            # is the previous processed row's completion bitmask)
            adj = np.zeros(n, dtype=bool)
            pred_idx = np.full(n, -1, dtype="int64")
            if n > 0:
                prev_ok = bool((last_comp >> (i - 1)) & 1) and (
                    (i - 1) in pseudo_of_step
                )
                adj[0] = prev_ok
                pred_idx[0] = pseudo_of_step[i - 1] if prev_ok else -1
                if n > 1:
                    adj[1:] = comp[i - 1, np_ + 0:np_ + n - 1]
                    pred_idx[1:] = np.where(
                        adj[1:], idxs[np_:np_ + n - 1], -1
                    )
            comp[i, np_:] = m_real[i] & adj
            preds[i - 1, np_:] = np.where(comp[i, np_:], pred_idx,
                                          preds[i - 1, np_:])
        else:
            comp[i, np_:] |= m_real[i] & (preds[i - 1, np_:] >= 0)
        if i in neg_run and i > 0 and kinds[i] != "next":
            # negation guard: latest negated ts must not land strictly
            # after the predecessor's ts (timestamp-granular, same rule as
            # the batch cascade)
            p = preds[i - 1, np_:]
            pred_ts = np.where(p >= 0, all_ts[np.maximum(p, 0)],
                               np.int64(-(1 << 62)))
            comp[i, np_:] &= neg_run[i] <= pred_ts
        if opts[i]:
            # optional step: every step-(i-1) completion (real or pseudo)
            # doubles as a same-position skip of step i
            pt = comp[i - 1] & ~comp[i]
            comp[i] |= pt
            pass_mark[i] = pt
        if i < k - 1 and kinds[i + 1] != "next":
            run = np.maximum.accumulate(np.where(comp[i], idxs, -1))
            preds[i, 1:] = run[:-1]

    def chain_of(step_i: int, row: int) -> list[int | None] | None:
        """Backtrack the greedy-latest chain ending at ``row`` (step_i);
        entries of skipped optional steps are None."""
        out: list[int | None] = []
        cur, i = row, step_i
        while True:
            if pass_mark[i, cur]:
                # this position's step-i is a skip: the step-(i-1) chain
                # lives at the SAME row/pseudo
                out.insert(0, None)
                i -= 1
                continue
            if cur < np_:  # pseudo-row: full chain is known (i == its step)
                return list(pseudo[cur][2][:i + 1]) + out
            out.insert(0, int(all_ts[cur]))
            if i == 0:
                return out
            p = preds[i - 1, cur]
            if p < 0:
                return None
            cur, i = p, i - 1

    matches = []
    final = comp[k - 1].copy()
    final[:np_] = False  # pseudo-rows never re-emit
    for row in np.flatnonzero(final):
        ch = chain_of(k - 1, row)
        if ch is not None and ch[-1] - ch[0] <= within_us:
            matches.append(ch)

    new_carry: list[list | None] = [None] * k
    for i in range(k - 1):  # final-step chains are never predecessors
        run_last = -1
        hits = np.flatnonzero(comp[i])
        if len(hits):
            run_last = int(hits[-1])
        if run_last >= 0:
            ch = chain_of(i, run_last)
            if ch is not None:
                new_carry[i] = ch
    new_carry_neg = list(carry_neg)
    for i, b in enumerate(neg_bits):
        if b is None:
            continue
        g = ((masks >> b) & 1).astype(bool)
        if g.any():
            new_carry_neg[i] = max(new_carry_neg[i], int(ts[g].max()))
    new_last_comp = (
        sum((1 << i) for i in range(k) if comp[i, N - 1]) if n > 0
        else last_comp
    )
    return matches, new_carry, new_carry_neg, new_last_comp


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

    Same match semantics as :func:`detect_sequence` — including the
    ``next`` / ``notFollowedBy`` step kinds; a match emits when the
    watermark passes its final event's timestamp (append-mode determinism —
    output is independent of micro-batch boundaries for distinct
    timestamps).  State per key: the step-i partial chains (pruned as soon
    as ``t0 + within`` falls behind the watermark — they can no longer
    complete) plus events newer than the watermark (with a ``next`` step
    that buffer holds the key's full stream, since strict contiguity is
    defined over all input rows).  Late rows (ts at or before the
    processed frontier) are dropped, matching built-in late-data
    semantics.
    """
    pos = _parse_pattern(steps)
    k = len(pos)
    kinds = [kind for _, _, kind, _, _ in pos]
    opts_flags = [opt for _, _, _, _, opt in pos]
    has_next = "next" in kinds
    within_us = dur_ms(within) * 1000
    retention_us = dur_ms(late_retention) * 1000
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)

    neg_bits: list[int | None] = []
    next_bit = k
    for _, _, _, neg, _ in pos:
        if neg is None:
            neg_bits.append(None)
        else:
            neg_bits.append(next_bit)
            next_bit += 1
    relevant = pos[0][1]
    for _, cond, _, neg, _ in pos[1:]:
        relevant = relevant | cond
        if neg is not None:
            relevant = relevant | neg
    mask = F.lit(0).cast("long")
    for i, (_, cond, _, _, _) in enumerate(pos):
        mask = mask + F.when(cond, F.lit(1 << i)).otherwise(F.lit(0))
    for i, (_, _, _, neg, _) in enumerate(pos):
        if neg is not None:
            mask = mask + F.when(neg, F.lit(1 << neg_bits[i])).otherwise(F.lit(0))
    keep = F.col(key_col).isNotNull()
    if not has_next:  # strict contiguity needs the key's full stream
        keep = keep & relevant
    # Filtered-out rows must still advance the event clock (FlinkCEP assigns
    # watermarks at the source, upstream of the pattern's select). A filter
    # whose conjuncts never reference the event-time column gets split and
    # pushed BELOW the EventTimeWatermark node by PushPredicateThroughNonJoin,
    # starving the watermark of pruned rows' timestamps — the clock then only
    # moves when a pattern-relevant event arrives. OR-ing in a reference to
    # the watermark column pins the whole filter above the watermark node;
    # null-ts rows that now pass are dropped in the state fn (NaT maps to
    # int64 min, so `ts > thru` rejects them).
    keep = keep | F.col(ts_col).isNull()
    src = df.where(keep).select(
        key_col, F.col(ts_col).alias("_ts"), mask.alias("_m")
    )
    key_sql = df.schema[key_col].dataType.simpleString()
    # fn must close over plain picklable data only (no pyspark Columns)
    step_names = [name for name, _, _, _, _ in pos]
    out_ddl = f"{key_col} {key_sql}, " + ", ".join(
        f"{name}_ts timestamp" for name in step_names
    )
    state_ddl = (
        "thru long, chains array<array<long>>, "
        "bts array<long>, bm array<long>, cneg array<long>, lcomp long"
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        wm_ms = state.getCurrentWatermarkMs()
        wm = wm_ms * 1000
        clamp = lambda t: max(t, wm_ms + 1, 1)
        if state.exists:
            thru, chains_raw, bts, bm, cneg, lcomp = state.get
            # chains serialize skipped-optional entries as the _SKIP sentinel
            carry = [
                [None if v == _SKIP else int(v) for v in c]
                if c is not None and len(c) else None
                for c in chains_raw
            ]
            buf_ts = np.array(bts, dtype="int64")
            buf_m = np.array(bm, dtype="int64")
            carry_neg = list(cneg)
            last_comp = int(lcomp)
        else:
            thru = 0
            carry = [None] * k
            buf_ts = np.empty(0, dtype="int64")
            buf_m = np.empty(0, dtype="int64")
            carry_neg = [-(1 << 62)] * k
            last_comp = 0
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
            matches, carry, carry_neg, last_comp = _cascade(
                buf_ts[mature][order], buf_m[mature][order], carry, k,
                within_us, kinds=kinds, neg_bits=neg_bits,
                carry_neg=carry_neg, last_comp=last_comp, opts=opts_flags,
            )
            thru = max(thru, wm)
            if matches:
                out = {key_col: pd.Series([key[0]] * len(matches))}
                for i, name in enumerate(step_names):
                    col = _us_ts(np.array(
                        [0 if m[i] is None else m[i] for m in matches],
                        dtype="int64",
                    ))
                    na = np.array([m[i] is None for m in matches])
                    if na.any():
                        col[na] = pd.NaT
                    out[f"{name}_ts"] = col
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
                [[_SKIP if v is None else int(v) for v in c]
                 if c is not None else [] for c in carry],
                buf_ts.tolist(), buf_m.tolist(),
                list(carry_neg), int(last_comp),
            ))
            state.setTimeoutTimestamp(clamp(nxt))
        elif state.exists:
            # carry_neg / last_comp need not survive removal: with no
            # partial chain, any future predecessor postdates every
            # already-seen negated event (neg_ts <= pred_ts holds), and
            # "next" adjacency without a carried chain cannot link anyway
            state.remove()
        else:
            # first sight of this key produced nothing durable; keep a short
            # tombstone so the group isn't re-created per batch needlessly
            state.update((thru, [[] for _ in range(k)], [], [],
                          list(carry_neg), int(last_comp)))
            state.setTimeoutTimestamp(clamp((wm + retention_us) // 1000 + 1))

    return src.groupBy(key_col).applyInPandasWithState(
        fn, out_ddl, state_ddl, "append", GroupStateTimeout.EventTimeTimeout
    )

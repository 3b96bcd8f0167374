"""Deterministic, engine-agnostic corpus sampling.

Training-data pipelines need *reproducible* samples: the same fraction of the
same corpus must come out identical across reruns, engines, and cluster
sizes. ``rand(seed)`` cannot promise that (its value depends on partition
layout and row order), so these operators hash a stable row identity instead:
a row is kept iff the first 8 hex chars of ``md5(salt || id)`` fall below a
threshold derived from the requested fraction. md5 of a UTF-8 string is
engine-agnostic (Spark, DuckDB, Python all agree byte-for-byte), the
comparison is a plain lexicographic compare on lowercase hex, and the
predicate is a pure narrow filter — no shuffle, pushdown-friendly, identical
output at any parallelism.

The reference delegates sampling to its remote query engines (random-split
training datasets, ``base/TrainingDatasetSplit.java``); the deterministic
hash-threshold variant here is the reproducible analogue used by
large-corpus pipelines (and mirrors the split-by-hash trick in
``engine/views.py`` training splits).

Scale notes (100 TB): the filter is codegen'd, reads only ``id_col`` plus
whatever the caller selects, and prunes before any downstream shuffle. The
stratified variant folds the per-stratum threshold into one CASE expression
— still a single narrow filter, no join against a strata table needed for
the small dict-sized strata maps it accepts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fraction_to_hex_threshold",
    "deterministic_sample",
    "stratified_sample",
    "pack_sequences",
    "fixed_size_sample",
]

#: Number of leading hex chars compared; 8 chars = 32 bits of resolution,
#: i.e. fraction granularity of ~2.3e-10 — ample for any sampling rate.
_HEX_DIGITS = 8
_SPACE = 16 ** _HEX_DIGITS


def fraction_to_hex_threshold(fraction: float) -> str:
    """Lowercase 8-hex-char threshold T such that P[md5 prefix < T] = fraction."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        # 'g' sorts after every hex char, so this threshold admits all rows.
        return "g" * _HEX_DIGITS
    return format(int(fraction * _SPACE), f"0{_HEX_DIGITS}x")


def _hash_prefix(id_col: str, salt: str) -> Column:
    key = F.concat(F.lit(salt), F.col(id_col)) if salt else F.col(id_col)
    return F.substring(F.md5(key.cast("binary")), 1, _HEX_DIGITS)


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by md5-hash threshold on ``id_col``.

    Reproducible across engines, reruns, and partitionings. ``salt`` selects
    an independent sample (different salt => statistically independent draw).
    """
    if fraction >= 1.0:
        return df
    return df.filter(_hash_prefix(id_col, salt) < F.lit(fraction_to_hex_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing).

    ``fractions`` maps stratum value -> keep fraction; strata absent from the
    map use ``default_fraction``. Implemented as one CASE-folded threshold
    column and a single narrow filter — no shuffle, no join.
    """
    thr: Column = F.lit(fraction_to_hex_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == F.lit(value),
                     F.lit(fraction_to_hex_threshold(frac))).otherwise(thr)
    return df.filter(_hash_prefix(id_col, salt) < thr)


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic concat-then-chunk sequence packing for LLM training.

    Orders the corpus by ``md5(salt || id)`` (a stable, engine-agnostic
    shuffle), concatenates token counts in that order, and assigns each
    document to the ``budget_tokens``-sized chunk where it *starts*
    (``bin = cum_start // budget``) — the classic pack-then-split layout
    where a document may straddle a chunk boundary. Output columns:
    ``id_col, n_tokens, cum_start, bin``.

    Token counts come from ``token_col`` if given, else a whitespace split
    of ``text_col`` (same definition as :func:`engine.text.token_count`).

    Scale notes (100 TB): a single global ordered cumulative sum would be a
    one-partition window. Instead this runs the textbook two-phase prefix
    sum: rows are bucketed by the first 2 hex chars of their hash (256
    buckets), the running sum is computed per bucket, and per-bucket grand
    totals (256 rows) get their own running offset which is broadcast-joined
    back. Because the bucket key is a *prefix* of the ordering key, per-
    bucket order + bucket order == global hash order, so the result is
    bit-identical to the naive global window (pytest-asserted parity).
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    from pyspark.sql import Window

    key = F.concat(F.lit(salt), F.col(id_col)) if salt else F.col(id_col)
    tokens = (
        F.col(token_col)
        if token_col
        else F.size(F.split(F.col(text_col), " "))
    )
    base = df.select(
        F.col(id_col),
        tokens.cast("long").alias("n_tokens"),
        F.md5(key.cast("binary")).alias("_h"),
    ).withColumn("_part", F.substring("_h", 1, 2))

    # n_tokens as secondary sort key pins the order under duplicate ids
    # (identical hash); remaining ties are exact-duplicate rows whose
    # outputs are interchangeable.
    w_in = (
        Window.partitionBy("_part")
        .orderBy("_h", "n_tokens")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = base.withColumn(
        "_prior", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    )

    # 256-row side: per-bucket totals and their running offset. The
    # unpartitioned window is deliberate — it only ever sees <=256 rows.
    w_parts = Window.orderBy("_part").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        base.groupBy("_part")
        .agg(F.sum("n_tokens").alias("_ptot"))
        .withColumn("_poff", F.coalesce(F.sum("_ptot").over(w_parts), F.lit(0)))
        .select("_part", "_poff")
    )

    return (
        within.join(F.broadcast(offsets), "_part")
        .withColumn("cum_start", F.col("_poff") + F.col("_prior"))
        .withColumn(
            "bin", F.floor(F.col("cum_start") / F.lit(budget_tokens)).cast("long")
        )
        .select(id_col, "n_tokens", "cum_start", "bin")
    )


def fixed_size_sample(
    df: DataFrame, n: int, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Exactly-``n`` reproducible sample: the ``n`` rows whose ``md5(salt
    || id)`` sorts lowest. Unlike :func:`deterministic_sample` (a fraction
    with binomial jitter), this pins the sample *size*; membership is still
    stable across engines, reruns, and partitionings.

    Scale notes: plans as TakeOrderedAndProject — per-partition top-``n``
    then a single merge of ``parts × n`` candidates on the driver side of
    the exchange; no full sort, no full shuffle. Keep ``n`` driver-sized
    (samples, not partitions of the corpus) — that is what "fixed-size
    sample" means operationally.
    """
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    # id_col as the final tie-break: rows whose 8-hex md5 prefixes collide
    # at the size-n boundary would otherwise make membership depend on
    # partition order, breaking the stable-across-reruns guarantee
    return (
        df.withColumn("_h", _hash_prefix(id_col, salt))
        .orderBy("_h", id_col)
        .limit(n)
        .drop("_h")
    )

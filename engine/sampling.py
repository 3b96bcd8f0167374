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

__all__ = ["fraction_to_hex_threshold", "deterministic_sample", "stratified_sample"]

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

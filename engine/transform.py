"""Transformation functions attached to feature views (§2.10).

Reference: ``base/TransformationFunction.java:32`` (named + versioned function
with an output type and source payload) and ``base/metadata/
TransformationFunctionAttached.java`` (the feature→function binding on a view).
The reference's Java serving path *refuses* to serve when transformations are
attached (``VectorServer.java:293-315`` — "serving must [be] performed from a
Python application"); this engine IS that Python application: a transformation
is a Spark ``Column → Column`` callable applied JVM-side in batch reads,
training data, and vector serving — no per-row Python.

The builtin library mirrors the reference product's builtin transformation
functions (min-max / standard / robust scaling, label encoding). They are
*statistics-parameterized*: ``fit_*`` computes the needed statistics in ONE
aggregate pass over a training frame (scale: map-side partial agg, a few
scalar results to the driver), and the returned function closes over plain
Python floats — applying it later never re-touches the training data.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class TransformationFunction:
    """A named, versioned column transformation
    (``base/TransformationFunction.java:32``)."""

    name: str
    fn: Callable[[Column], Column]
    version: int = 1
    output_type: str | None = None
    source: str | None = None  # sourceCodeContent analogue (documentation)

    def __call__(self, col: Column) -> Column:
        out = self.fn(col)
        if self.output_type:
            out = out.cast(self.output_type)
        return out


def apply_transformations(
    df: DataFrame, tfs: dict[str, TransformationFunction], suffix: str = ""
) -> DataFrame:
    """Apply each attached function to its feature column (in place when
    ``suffix`` is empty, else as ``<name><suffix>``). Columns not present in
    the frame are skipped — a view's query may project them away."""
    for col_name, tf in tfs.items():
        if col_name in df.columns:
            df = df.withColumn(f"{col_name}{suffix}", tf(F.col(col_name)))
    return df


# -- builtin transformation library -----------------------------------------


def min_max_scaler(min_value: float, max_value: float) -> TransformationFunction:
    """(x - min) / (max - min); degenerate range maps to 0.0."""
    span = max_value - min_value

    def fn(c: Column) -> Column:
        if span == 0:
            return F.lit(0.0)
        return (c - F.lit(float(min_value))) / F.lit(float(span))

    return TransformationFunction("min_max_scaler", fn, output_type="double")


def standard_scaler(mean: float, stdev: float) -> TransformationFunction:
    """(x - mean) / stdev; zero stdev maps to 0.0."""

    def fn(c: Column) -> Column:
        if stdev == 0:
            return F.lit(0.0)
        return (c - F.lit(float(mean))) / F.lit(float(stdev))

    return TransformationFunction("standard_scaler", fn, output_type="double")


def robust_scaler(p25: float, p50: float, p75: float) -> TransformationFunction:
    """(x - median) / IQR; zero IQR maps to 0.0."""
    iqr = p75 - p25

    def fn(c: Column) -> Column:
        if iqr == 0:
            return F.lit(0.0)
        return (c - F.lit(float(p50))) / F.lit(float(iqr))

    return TransformationFunction("robust_scaler", fn, output_type="double")


def label_encoder(vocabulary: list) -> TransformationFunction:
    """Value → its index in the sorted vocabulary; unseen values (and nulls)
    → -1. JVM-side via a literal map (vocabularies are small by
    construction)."""
    vocab = sorted(v for v in set(vocabulary) if v is not None)
    mapping = F.create_map(
        *[F.lit(x) for v, i in ((v, i) for i, v in enumerate(vocab)) for x in (v, i)]
    )

    def fn(c: Column) -> Column:
        return F.coalesce(mapping[c], F.lit(-1))

    return TransformationFunction("label_encoder", fn, output_type="int")


# -- statistics fitting (one aggregate pass each) ----------------------------


def fit_min_max(df: DataFrame, col: str) -> TransformationFunction:
    row = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).first()
    return min_max_scaler(float(row["mn"]), float(row["mx"]))


def fit_standard(df: DataFrame, col: str) -> TransformationFunction:
    row = df.agg(F.avg(col).alias("m"), F.stddev_samp(col).alias("s")).first()
    return standard_scaler(float(row["m"]), float(row["s"] or 0.0))


def fit_robust(df: DataFrame, col: str, relative_error: float = 1e-4) -> TransformationFunction:
    p25, p50, p75 = df.approxQuantile(col, [0.25, 0.5, 0.75], relative_error)
    return robust_scaler(p25, p50, p75)


def fit_label_encoder(df: DataFrame, col: str,
                      max_categories: int = 10_000) -> TransformationFunction:
    """Fit a label encoder over the column's distinct values.

    The fitted mapping becomes a ``create_map`` literal in the serving plan
    (see :func:`label_encoder`), so it is driver-materialized BY DESIGN —
    like the reference's categorical encoders, it targets bounded
    categorical features.  ``max_categories`` bounds the driver pull: the
    distinct scan stops at ``max_categories + 1`` rows and a cardinality
    past the bound raises loudly instead of OOMing the driver (and
    exploding the plan) on a high-cardinality column at scale.  For true
    high-cardinality encodings keep the mapping distributed: build a
    (value, code) DataFrame with a two-phase rank (``engine.text
    build_vocab``'s bucket-rank trick) and join it instead."""
    vals = [r[0] for r in
            df.select(col).distinct().limit(max_categories + 1).collect()]
    if len(vals) > max_categories:
        raise ValueError(
            f"fit_label_encoder({col!r}) found more than "
            f"{max_categories} distinct values — a label-encoder literal "
            "map at this cardinality would OOM the driver/plan; use a "
            "distributed (value, code) mapping join instead, or raise "
            "max_categories explicitly if the cardinality is intended"
        )
    return label_encoder(vals)

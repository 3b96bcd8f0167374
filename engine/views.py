"""FeatureView + training datasets (§1.1).

Reference: ``flink/FeatureView.java:44-155`` (named/versioned saved Query with
label columns, serving entry) and ``base/TrainingDatasetBase.java:63-166`` +
``base/Split.java:29-51`` (materialized query results with RANDOM or
TIME_SERIES splits, seed, format).  The Flink client delegates split
construction to the backend; here ``DataFrame.randomSplit`` / event-time range
filters are the whole implementation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.query import Query
from engine.timeutil import parse_wallclock


@dataclass
class FeatureView:
    """Named, versioned saved Query over ≥1 feature groups with labels.

    ``transformation_functions`` maps feature name → TransformationFunction
    (``base/metadata/TransformationFunctionAttached.java``); they are applied
    in :meth:`training_data` and by :class:`engine.serving.VectorServer` —
    the Python serving path the reference's Java client defers to
    (``VectorServer.java:293-315``).
    """

    name: str
    version: int
    query: Query
    labels: list[str] = field(default_factory=list)
    transformation_functions: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.name = self.name.strip().lower()
        self.labels = [l.strip().lower() for l in self.labels]
        self.transformation_functions = {
            k.strip().lower(): v for k, v in self.transformation_functions.items()
        }

    def attach_transformation(self, feature: str, tf) -> "FeatureView":
        self.transformation_functions[feature.strip().lower()] = tf
        return self

    # -- batch reads -------------------------------------------------------
    def get_batch_query(self, start=None, end=None) -> Query:
        """PIT-bounded batch query (``FeatureViewEngineBase.getBatchQuery``
        ``:213-235``): commit-time range over the view's query.  A start with
        no end bounds up to "now" (the reference's default); the saved query
        is never mutated (``as_of`` returns a copy)."""
        if end is None and start is not None:
            from datetime import datetime, timezone

            end = datetime.now(timezone.utc).replace(tzinfo=None)
        if end is not None:
            return self.query.as_of(end, exclude_until=start)
        return self.query

    def to_df(self, spark: SparkSession | None = None) -> DataFrame:
        return self.query.to_df(spark)

    # -- training data -----------------------------------------------------
    def training_data(
        self, spark: SparkSession | None = None, transform: bool = True
    ) -> tuple[DataFrame, DataFrame | None]:
        """(features, labels) — labels split out by column name; attached
        transformation functions applied to feature columns (JVM-side)."""
        df = self.to_df(spark)
        if transform and self.transformation_functions:
            from engine.transform import apply_transformations

            df = apply_transformations(df, self.transformation_functions)
        if not self.labels:
            return df, None
        return df.drop(*self.labels), df.select(*self.labels)

    def train_test_split(
        self,
        test_fraction: float,
        seed: int = 42,
        spark: SparkSession | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        """RANDOM split (``base/Split.java:29-38``): weights + seed."""
        if not 0.0 < test_fraction < 1.0:
            raise ValueError("test_fraction must be in (0, 1)")
        train, test = self.to_df(spark).randomSplit(
            [1.0 - test_fraction, test_fraction], seed=seed
        )
        return train, test

    def time_series_split(
        self,
        ts_col: str,
        train_end,
        test_end=None,
        spark: SparkSession | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        """TIME_SERIES split (``base/Split.java:40-51``): train = rows before
        ``train_end``; test = rows in [train_end, test_end)."""
        df = self.to_df(spark)
        t0 = parse_wallclock(train_end)
        train = df.filter(F.col(ts_col) < F.lit(t0))
        test = df.filter(F.col(ts_col) >= F.lit(t0))
        if test_end is not None:
            test = test.filter(F.col(ts_col) < F.lit(parse_wallclock(test_end)))
        return train, test

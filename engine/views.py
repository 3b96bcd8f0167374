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

    def get_batch_data(self, spark: SparkSession | None = None,
                       start=None, end=None) -> DataFrame:
        """``FeatureView.getBatchData`` (``flink/FeatureView.java:227-239``):
        the PIT-bounded batch query, lowered."""
        return self.get_batch_query(start, end).to_df(spark)

    # -- serving (FeatureView.java:172-208 → engine.serving.VectorServer) --
    def _query_leaves(self, q=None):
        q = q or self.query
        yield q
        for j in q.joins:
            yield from self._query_leaves(j.sub_query)

    def init_serving(self, spark: SparkSession, store=None,
                     complex_features: dict | None = None):
        """``initServing`` (:172-178): build a VectorServer over the view's
        source feature groups (resolved online tables, primary keys from
        group metadata), with the view's transformation functions attached —
        the Python serving path ``VectorServer.java:293-315`` defers to.
        Returns the server; also cached on the view."""
        from engine.serving import VectorServer

        groups = []
        token_fns = []
        for leaf in self._query_leaves():
            fg = leaf.feature_group
            if fg is None:
                raise ValueError(
                    "init_serving needs feature-group-backed query legs"
                )
            owner = store or getattr(fg, "_store", None)
            if owner is not None:
                # factory, not a resolved DataFrame: FeatureStore.read bakes
                # the visible commit list into the plan, so a token-triggered
                # snapshot rebuild must re-read to actually see new commits
                df = (lambda o=owner, g=fg, s=spark:
                      o.read(s, g, with_commit_ts=False))
            else:
                df = fg.read(spark)
            if not fg.primary_key:
                raise ValueError(
                    f"group '{fg.name}' has no primary key to serve on"
                )
            groups.append((fg.name, df, fg.primary_key))
            if owner is not None and hasattr(owner, "ledger_token"):
                token_fns.append(
                    (lambda o=owner, g=fg: o.ledger_token(g))
                )
        # staleness token for the point-lookup snapshot: the combined ledger
        # state of every store-backed leg — a new commit to any of them
        # rebuilds the snapshot on the next lookup (free to compute: listdir)
        token_fn = (
            (lambda: tuple(fn() for fn in token_fns)) if token_fns else None
        )
        self._server = VectorServer(
            groups, transformations=self.transformation_functions or None,
            complex_features=complex_features,
            snapshot_token_fn=token_fn,
        )
        return self._server

    def get_feature_vector(self, entry: dict) -> dict:
        """``getFeatureVector`` (:186-196); requires :meth:`init_serving`."""
        server = getattr(self, "_server", None)
        if server is None:
            raise RuntimeError("call init_serving(spark[, store]) first")
        return server.get_feature_vector(entry)

    def get_feature_vectors(self, spark: SparkSession, entries: list[dict]) -> DataFrame:
        """``getFeatureVectors`` (:198-208); requires :meth:`init_serving`."""
        server = getattr(self, "_server", None)
        if server is None:
            raise RuntimeError("call init_serving(spark[, store]) first")
        return server.get_feature_vectors(spark, entries)

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

    def train_validation_test_split(
        self,
        validation_fraction: float,
        test_fraction: float,
        seed: int = 42,
        spark: SparkSession | None = None,
    ) -> dict[str, DataFrame]:
        """3-way RANDOM split (``TrainingDatasetBase.setValTestSplit``,
        ``base/TrainingDatasetBase.java:147-160``): TRAIN gets
        1 - val - test."""
        if validation_fraction <= 0 or test_fraction <= 0:
            raise ValueError("validation/test fractions must be > 0")
        train_fraction = 1.0 - validation_fraction - test_fraction
        if train_fraction <= 0:
            raise ValueError("val + test fractions must sum below 1")
        tr, va, te = self.to_df(spark).randomSplit(
            [train_fraction, validation_fraction, test_fraction], seed=seed
        )
        return {"train": tr, "validation": va, "test": te}

    def time_series_splits(
        self,
        ts_col: str,
        train_start=None,
        train_end=None,
        val_start=None,
        val_end=None,
        test_start=None,
        test_end=None,
        spark: SparkSession | None = None,
    ) -> dict[str, DataFrame]:
        """3-way (or 2-way) TIME_SERIES split with the reference's boundary
        fallbacks (``TrainingDatasetBase.setTimeSeriesSplits``,
        ``base/TrainingDatasetBase.java:128-146``): a split's missing end
        falls forward to the next split's start; a missing start falls back
        to the previous split's end. Each split is ``[start, end)`` on
        ``ts_col``; an open bound is unbounded.
        """
        have_val = val_start is not None or val_end is not None
        t_end = train_end if train_end is not None else (
            val_start if val_start is not None else test_start
        )
        v_start = val_start if val_start is not None else train_end
        v_end = val_end if val_end is not None else test_start
        te_start = test_start if test_start is not None else (
            val_end if val_end is not None else train_end
        )
        df = self.to_df(spark)

        def rng(start, end) -> DataFrame:
            out = df
            if start is not None:
                out = out.filter(F.col(ts_col) >= F.lit(parse_wallclock(start)))
            if end is not None:
                out = out.filter(F.col(ts_col) < F.lit(parse_wallclock(end)))
            return out

        splits = {"train": rng(train_start, t_end)}
        if have_val:
            splits["validation"] = rng(v_start, v_end)
        splits["test"] = rng(te_start, test_end)
        return splits


#: DataFormat enum analogue (``base/DataFormat.java:5-22``). ALL formats are
#: real: avro/tfrecord write through the lib-free engine.datafiles writers
#: (Avro OCF + TFRecord wire formats implemented from their public specs).
DATA_FORMATS = ("csv", "tsv", "parquet", "avro", "orc", "json", "tfrecord", "tfrecords")


def split_statistics(
    splits: dict[str, DataFrame],
    config=None,
) -> dict[str, dict]:
    """Per-split descriptive statistics — the ``SplitStatistics`` analogue
    (``base/metadata/SplitStatistics.java``: one (name, content-JSON) pair
    per split; the reference computes them when a statistics-enabled
    training dataset materializes). One single-pass aggregate per split
    (:func:`engine.stats.compute_statistics`); returns split name →
    statistics dict (the JSON ``content``)."""
    from engine.stats import compute_statistics

    return {name: compute_statistics(df, config) for name, df in splits.items()}


def write_training_dataset(
    splits: dict[str, DataFrame],
    out_dir: str,
    data_format: str = "parquet",
    coalesce: bool = False,
    overwrite: bool = True,
    options: dict | None = None,
    statistics_config=None,
) -> dict[str, str]:
    """Materialize split DataFrames to ``<out_dir>/<split>/`` in the requested
    format (``TrainingDatasetBase.java:63-166``: coalesce flag, data formats
    ``base/DataFormat.java:5-22``). Returns split → path.

    ``coalesce=True`` mirrors the reference's single-file option
    (``coalesce``) — one output file per split; leave False at scale.
    avro/tfrecord write through the lib-free spec-layout writers in
    :mod:`engine.datafiles` (one part file per partition, executor-side).

    ``statistics_config`` (a :class:`engine.stats.StatisticsConfig`, or
    ``True`` for defaults) additionally computes per-split statistics and
    persists each as ``<out_dir>/<split>_statistics.json`` beside the split
    dir — the ``SplitStatistics.java`` (name, content) pair.
    """
    import os

    fmt = data_format.strip().lower()
    if fmt not in DATA_FORMATS:
        raise ValueError(f"unsupported data format {fmt!r}; one of {DATA_FORMATS}")
    paths: dict[str, str] = {}
    for split, df in splits.items():
        path = os.path.join(out_dir, split)
        if coalesce:
            df = df.coalesce(1)
        writer = df.write.mode("overwrite" if overwrite else "error")
        opts = dict(options or {})
        if fmt in ("csv", "tsv"):
            opts.setdefault("header", "true")
            if fmt == "tsv":
                opts["sep"] = "\t"
            writer.options(**opts).csv(path)
        elif fmt == "json":
            writer.options(**opts).json(path)
        elif fmt == "orc":
            writer.options(**opts).orc(path)
        elif fmt == "parquet":
            writer.options(**opts).parquet(path)
        else:
            # lib-free writers (engine.datafiles): Avro OCF / TFRecord, one
            # part file per partition — honor the same mode semantics as the
            # Spark writer branches: overwrite clears the split dir (stale
            # part files from a wider previous write must not survive), and
            # overwrite=False errors on an existing non-empty dir
            import shutil as _shutil

            if os.path.isdir(path) and os.listdir(path):
                if not overwrite:
                    raise FileExistsError(
                        f"training-dataset split path {path!r} already exists "
                        "(overwrite=False)"
                    )
                _shutil.rmtree(path)
            if fmt == "avro":
                from engine.datafiles import write_avro_dataset

                write_avro_dataset(df, path)
            else:  # tfrecord / tfrecords
                from engine.datafiles import write_tfrecord_dataset

                write_tfrecord_dataset(df, path)
        paths[split] = path
    if statistics_config is not None and statistics_config is not False:
        import json as _json

        from engine.stats import StatisticsConfig

        cfg = (
            StatisticsConfig()
            if statistics_config is True
            else statistics_config
        )
        for split, stats in split_statistics(
            {s: d for s, d in splits.items()}, cfg
        ).items():
            with open(
                os.path.join(out_dir, f"{split}_statistics.json"), "w"
            ) as fh:
                _json.dump({"name": split, "content": stats}, fh, default=str)
    return paths

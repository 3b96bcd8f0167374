"""Descriptive statistics with a StatisticsConfig (§1.2 long tail).

Reference: ``base/StatisticsConfigBase.java:20-60`` (enabled / histograms /
correlations / exactUniqueness flags + a column allowlist) and
``base/metadata/FeatureGroupBase.java:97,300`` (``statisticsConfig`` +
``computeStatistics`` after commits). The reference delegates computation to
the backend; here it is Spark aggregates:

- **one job** computes every per-column statistic (count, nulls, min, max,
  mean, stddev, distinct) — all expressions live in a single ``agg`` so the
  scan and shuffle happen once regardless of column count; at 100 TB this is
  a map-side-partial aggregation to one scalar row.
- uniqueness uses ``approx_count_distinct`` (HLL sketch, constant memory)
  unless ``exact_uniqueness`` — exact distinct per column forces an expand +
  shuffle, so it is opt-in exactly as in the reference config.
- correlations (opt-in) add Pearson ``corr`` for every numeric column pair to
  the same single pass.
- histograms (opt-in) run ONE extra pass using the ``histogram_numeric``
  aggregate (equi-height bins JVM-side).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


@dataclass
class StatisticsConfig:
    """``base/StatisticsConfigBase.java:20-60``."""

    enabled: bool = True
    histograms: bool = False
    correlations: bool = False
    exact_uniqueness: bool = False
    columns: list[str] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "enabled": self.enabled,
            "histograms": self.histograms,
            "correlations": self.correlations,
            "exact_uniqueness": self.exact_uniqueness,
            "columns": list(self.columns),
        }


def compute_statistics(df: DataFrame, config: StatisticsConfig | None = None) -> dict:
    """Per-column stats dict (plus optional correlations/histograms)."""
    cfg = config or StatisticsConfig()
    if not cfg.enabled:
        return {"enabled": False, "columns": {}}
    cols = [c.lower() for c in cfg.columns] if cfg.columns else [
        f.name for f in df.schema.fields
    ]
    fields = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"statistics columns not in frame: {missing}")
    numeric = [c for c in cols if isinstance(fields[c], _NUMERIC)]

    exprs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        exprs.append(F.count(c).alias(f"{c}__nn"))
        if cfg.exact_uniqueness:
            exprs.append(F.count_distinct(F.col(c)).alias(f"{c}__uniq"))
        else:
            exprs.append(F.approx_count_distinct(c).alias(f"{c}__uniq"))
        if c in numeric:
            exprs += [
                F.min(c).alias(f"{c}__min"),
                F.max(c).alias(f"{c}__max"),
                F.avg(c).alias(f"{c}__mean"),
                F.stddev_samp(c).alias(f"{c}__std"),
            ]
    pairs = []
    if cfg.correlations:
        pairs = [
            (a, b) for i, a in enumerate(numeric) for b in numeric[i + 1:]
        ]
        exprs += [F.corr(a, b).alias(f"__corr__{a}__{b}") for a, b in pairs]

    row = df.agg(*exprs).first().asDict()
    n = row["__rows"]
    out_cols = {}
    for c in cols:
        st = {
            "count": n,
            "num_nulls": n - row[f"{c}__nn"],
            "distinct": row[f"{c}__uniq"],
            "exact_uniqueness": cfg.exact_uniqueness,
        }
        if c in numeric:
            st.update(
                min=row[f"{c}__min"], max=row[f"{c}__max"],
                mean=row[f"{c}__mean"], stddev=row[f"{c}__std"],
            )
        out_cols[c] = st
    result = {"enabled": True, "row_count": n, "columns": out_cols}
    if cfg.correlations:
        result["correlations"] = {
            f"{a},{b}": row[f"__corr__{a}__{b}"] for a, b in pairs
        }
    if cfg.histograms and numeric:
        hrow = df.agg(
            *[
                F.expr(f"histogram_numeric({c}, 10)").alias(c)
                for c in numeric
            ]
        ).first()
        result["histograms"] = {
            c: [{"x": float(b["x"]), "y": float(b["y"])} for b in (hrow[c] or [])]
            for c in numeric
        }
    return result


def save_statistics(table_dir: str, stats: dict, commit_id: int | None = None) -> str:
    """Persist a statistics snapshot next to the table
    (``FeatureGroupBase.computeStatistics`` stores per-commit stats)."""
    d = os.path.join(table_dir, "statistics")
    os.makedirs(d, exist_ok=True)
    ts = int(time.time() * 1000)
    path = os.path.join(d, f"{ts}_{commit_id if commit_id is not None else 'full'}.json")
    with open(path, "w") as fh:
        json.dump(stats, fh, sort_keys=True, default=str)
    return path


def load_latest_statistics(table_dir: str) -> dict | None:
    d = os.path.join(table_dir, "statistics")
    if not os.path.isdir(d):
        return None
    names = sorted(n for n in os.listdir(d) if n.endswith(".json"))
    if not names:
        return None
    with open(os.path.join(d, names[-1])) as fh:
        return json.load(fh)

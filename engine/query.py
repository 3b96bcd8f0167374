"""Query DSL → DataFrame: select / join / filter / time-travel.

The reference builds a compositional logical plan client-side and ships it as
JSON to a remote SQL constructor (``flink/constructor/Query.java:79-94`` →
``base/metadata/QueryConstructorApi.java:39-60``). Here **Catalyst is the query
constructor**: every DSL node lowers directly onto a lazy DataFrame, so
predicate pushdown, column pruning, join reordering and partition pruning are
free (SURVEY.md §4.1).

Surface parity (SURVEY.md §2.2-2.3, §2.7):

- projections  — ``selectAll/select/selectExcept/appendFeature``
  (``flink/StreamFeatureGroup.java:214-242``, ``Query.java:244-247``)
- predicates   — ``lt le eq ne gt ge isin like`` on a feature
  (``base/Feature.java:147-213``, ``base/constructor/SqlFilterCondition.java:20-29``)
- filter trees — AND/OR/SINGLE recursive ``FilterLogic``
  (``base/constructor/FilterLogic.java:25-86``; conjunction fold
  ``QueryBase.genericFilter:242-258``)
- joins        — INNER/FULL/CROSS/LEFT/RIGHT/LEFT_SEMI/COMMA with
  on/leftOn/rightOn + per-join right-side prefix
  (``base/constructor/JoinType.java:20-28``, ``Join.java:28-72``,
  ``flink/constructor/Query.java:96-186``)
- time travel  — ``asOf(ts[, excludeUntil])`` / ``pullChanges(start, end)``
  (``base/constructor/QueryBase.java:186-240``) over the sink's commit ledger
  (`_commit_ts` column) — Iceberg snapshot reads when a catalog is present.

Scale note: join-type choice is left to Catalyst + AQE (broadcast for small
sides, skew-join splitting); the DSL only fixes semantics. ``hint('broadcast')``
is exposed for dimension tables the optimizer can't size.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from engine.schema import FeatureGroup

COMMIT_TS_COL = "_commit_ts"

# ---------------------------------------------------------------------------
# Filter tree (base/constructor/Filter.java, FilterLogic.java)
# ---------------------------------------------------------------------------

_CONDITIONS = {
    "GREATER_THAN_OR_EQUAL",
    "GREATER_THAN",
    "NOT_EQUALS",
    "EQUALS",
    "LESS_THAN_OR_EQUAL",
    "LESS_THAN",
    "IN",
    "LIKE",
}  # SqlFilterCondition.java:20-29


@dataclass(frozen=True)
class Filter:
    """Leaf predicate: (feature, condition, value)  — ``base/constructor/Filter.java:28-54``."""

    feature: str
    condition: str
    value: object

    def __post_init__(self) -> None:
        if self.condition not in _CONDITIONS:
            raise ValueError(f"unknown condition {self.condition}")

    def to_column(self) -> Column:
        c = F.col(self.feature)
        v = self.value
        return {
            "GREATER_THAN_OR_EQUAL": lambda: c >= v,
            "GREATER_THAN": lambda: c > v,
            "NOT_EQUALS": lambda: c != v,
            "EQUALS": lambda: c == v,
            "LESS_THAN_OR_EQUAL": lambda: c <= v,
            "LESS_THAN": lambda: c < v,
            "IN": lambda: c.isin(list(v)),
            "LIKE": lambda: c.like(v),
        }[self.condition]()

    # Filter ∧/∨ Filter → FilterLogic (mirrors Filter.java and/or helpers)
    def __and__(self, other: "Filter | FilterLogic") -> "FilterLogic":
        return FilterLogic("AND", self, other)

    def __or__(self, other: "Filter | FilterLogic") -> "FilterLogic":
        return FilterLogic("OR", self, other)


@dataclass(frozen=True)
class FilterLogic:
    """Recursive boolean tree — ``base/constructor/FilterLogic.java:25-86``.

    type ∈ {AND, OR, SINGLE}; SINGLE wraps one leaf.
    """

    type: str
    left: "Filter | FilterLogic | None" = None
    right: "Filter | FilterLogic | None" = None

    def to_column(self) -> Column:
        if self.type == "SINGLE":
            return self.left.to_column()
        lc, rc = self.left.to_column(), self.right.to_column()
        return (lc & rc) if self.type == "AND" else (lc | rc)

    def __and__(self, other: "Filter | FilterLogic") -> "FilterLogic":
        return FilterLogic("AND", self, other)

    def __or__(self, other: "Filter | FilterLogic") -> "FilterLogic":
        return FilterLogic("OR", self, other)


class FeatureRef:
    """Predicate-building handle for a feature — ``base/Feature.java:147-213``."""

    def __init__(self, name: str):
        self.name = name.lower()

    def lt(self, v) -> Filter:
        return Filter(self.name, "LESS_THAN", v)

    def le(self, v) -> Filter:
        return Filter(self.name, "LESS_THAN_OR_EQUAL", v)

    def eq(self, v) -> Filter:
        return Filter(self.name, "EQUALS", v)

    def ne(self, v) -> Filter:
        return Filter(self.name, "NOT_EQUALS", v)

    def gt(self, v) -> Filter:
        return Filter(self.name, "GREATER_THAN", v)

    def ge(self, v) -> Filter:
        return Filter(self.name, "GREATER_THAN_OR_EQUAL", v)

    def isin(self, vs) -> Filter:
        return Filter(self.name, "IN", list(vs))

    def like(self, pat) -> Filter:
        return Filter(self.name, "LIKE", pat)


# ---------------------------------------------------------------------------
# Join node (base/constructor/Join.java)
# ---------------------------------------------------------------------------

#: JoinType.java:20-28 → Spark join strings; COMMA is an implicit cross join.
JOIN_TYPES = {
    "INNER": "inner",
    "FULL": "full",
    "CROSS": "cross",
    "LEFT": "left",
    "RIGHT": "right",
    "LEFT_SEMI_JOIN": "left_semi",
    "COMMA": "cross",
}


@dataclass
class _Join:
    sub_query: "Query"
    on: list[str]
    left_on: list[str]
    right_on: list[str]
    join_type: str
    prefix: str | None
    broadcast_right: bool = False


# ---------------------------------------------------------------------------
# Query
# ---------------------------------------------------------------------------


@dataclass
class Query:
    """Compositional logical plan over feature groups.

    Mirrors ``base/constructor/QueryBase.java:41-72`` +
    ``flink/constructor/Query.java:45-77``: a left feature group with selected
    features, a list of joins, a filter tree, and time-travel bounds. Terminal
    ``to_df(spark)`` lowers the whole tree onto one lazy DataFrame.
    """

    source: Callable[..., DataFrame]  # (spark) -> DataFrame
    feature_group: FeatureGroup | None = None
    selected: list[str] | None = None
    appended: list[tuple[str, Column]] = field(default_factory=list)
    joins: list[_Join] = field(default_factory=list)
    filter_tree: FilterLogic | Filter | None = None
    as_of_ts: object = None
    as_of_exclude: object = None

    # -- construction ------------------------------------------------------
    @classmethod
    def from_feature_group(cls, fg: FeatureGroup, features: list[str] | None = None) -> "Query":
        def source(spark):
            df = fg.read(spark) if hasattr(fg, "read") else None
            if df is None:
                raise ValueError(f"feature group {fg.name} has no readable source")
            return df

        return cls(source=source, feature_group=fg, selected=features)

    @classmethod
    def from_dataframe(cls, df: DataFrame, features: list[str] | None = None) -> "Query":
        return cls(source=lambda spark=None: df, selected=features)

    # -- projections -------------------------------------------------------
    def select(self, names: list[str]) -> "Query":
        self.selected = [n.lower() for n in names]
        return self

    def select_except(self, names: list[str]) -> "Query":
        drop = {n.lower() for n in names}
        base = self.selected
        if base is None:
            if self.feature_group is not None:
                base = self.feature_group.feature_names
            else:
                raise ValueError("select_except on schemaless query requires prior select")
        self.selected = [n for n in base if n not in drop]
        return self

    def append_feature(self, name: str, col: Column) -> "Query":
        """``Query.appendFeature`` (``flink/constructor/Query.java:244-247``)."""
        self.appended.append((name.lower(), col))
        return self

    # -- filters -----------------------------------------------------------
    def filter(self, f: Filter | FilterLogic) -> "Query":
        """Conjunction fold, as ``QueryBase.genericFilter:242-258``: repeated
        calls AND onto the existing tree."""
        if self.filter_tree is None:
            self.filter_tree = f
        else:
            self.filter_tree = FilterLogic("AND", self.filter_tree, f)
        return self

    # -- joins ---------------------------------------------------------------
    def join(
        self,
        sub: "Query",
        on: list[str] | None = None,
        left_on: list[str] | None = None,
        right_on: list[str] | None = None,
        join_type: str = "INNER",
        prefix: str | None = None,
        broadcast: bool = False,
    ) -> "Query":
        jt = join_type.upper()
        if jt not in JOIN_TYPES:
            raise ValueError(f"unknown join type {join_type} (expected one of {sorted(JOIN_TYPES)})")
        if on is None and (left_on is None) != (right_on is None):
            raise ValueError("left_on and right_on must be given together")
        self.joins.append(
            _Join(
                sub,
                [c.lower() for c in (on or [])],
                [c.lower() for c in (left_on or [])],
                [c.lower() for c in (right_on or [])],
                jt,
                prefix,
                broadcast,
            )
        )
        return self

    # -- time travel ---------------------------------------------------------
    def _clone(self) -> "Query":
        """Shallow structural copy (shared DataFrames, copied query nodes) so
        time-travel bounds never mutate a saved query (e.g. a FeatureView's)."""
        import copy

        c = copy.copy(self)
        c.appended = list(self.appended)
        c.joins = []
        for j in self.joins:
            j2 = copy.copy(j)
            j2.sub_query = j.sub_query._clone()
            c.joins.append(j2)
        return c

    def _apply_bounds(self, ts, exclude) -> None:
        self.as_of_ts = ts
        self.as_of_exclude = exclude
        for j in self.joins:
            j.sub_query._apply_bounds(ts, exclude)

    def as_of(self, wallclock_time, exclude_until=None) -> "Query":
        """``QueryBase.asOf:186-221`` — bounds propagate into every join leg.
        Returns a bounded COPY; the receiver is unchanged."""
        q = self._clone()
        q._apply_bounds(wallclock_time, exclude_until)
        return q

    def pull_changes(self, start, end) -> "Query":
        """``QueryBase.pullChanges:235-240`` (deprecated in reference).
        Bounds propagate into join legs; returns a copy."""
        q = self._clone()
        q._apply_bounds(end, start)
        return q

    # -- lowering ------------------------------------------------------------
    def _base_df(self, spark) -> DataFrame:
        fg = self.feature_group
        store = getattr(fg, "_store", None) if fg is not None else None
        if (
            self.as_of_ts is not None
            and store is not None
            and getattr(fg, "_df", None) is None
        ):
            # store-managed source with time-travel bounds: prune the LEDGER
            # before save-mode resolution, so an as-of earlier than an
            # overwrite/upsert sees the pre-supersession rows instead of
            # resolving first and filtering the survivors to nothing
            df = store.read(
                spark, fg, as_of_ts=self.as_of_ts,
                exclude_until=self.as_of_exclude,
            )
        else:
            df = self.source(spark)
        df = df.toDF(*[c.lower() for c in df.columns])
        if self.as_of_ts is not None and COMMIT_TS_COL in df.columns:
            from engine.timeutil import parse_wallclock

            df = df.filter(F.col(COMMIT_TS_COL) <= F.lit(parse_wallclock(self.as_of_ts)))
            if self.as_of_exclude is not None:
                df = df.filter(F.col(COMMIT_TS_COL) > F.lit(parse_wallclock(self.as_of_exclude)))
        if self.selected is not None:
            df = df.select(*self.selected)
        return df

    def to_df(self, spark=None) -> DataFrame:
        df = self._base_df(spark)
        for j in self.joins:
            right = j.sub_query.to_df(spark)
            if j.prefix:
                # Per-join prefix disambiguation (Join.java:50-71): applied to
                # right-side non-key columns; join keys keep their names.
                keep = set(j.on or j.right_on)
                right = right.select(
                    *[
                        F.col(c).alias(c if c in keep else f"{j.prefix}{c}")
                        for c in right.columns
                    ]
                )
            if j.broadcast_right:
                right = F.broadcast(right)
            how = JOIN_TYPES[j.join_type]
            if j.join_type in ("CROSS", "COMMA"):
                df = df.crossJoin(right)
            elif j.on:
                df = df.join(right, on=j.on, how=how)
            elif j.left_on:
                cond = None
                for lc, rc in zip(j.left_on, j.right_on):
                    c = df[lc] == right[rc]
                    cond = c if cond is None else (cond & c)
                df = df.join(right, on=cond, how=how)
            else:
                raise ValueError("equi-join requires on= or left_on=/right_on=")
        for name, col in self.appended:
            df = df.withColumn(name, col)
        if self.filter_tree is not None:
            df = df.filter(self.filter_tree.to_column())
        return df

    # -- (de)serialization --------------------------------------------------
    # The reference ships the query client→server as a JSON DTO
    # (``flink/constructor/Query.java:79-94`` → ``QueryConstructorApi.java:
    # 39-60``); the same shape here makes feature views persistable.
    def to_dict(self) -> dict:
        """JSON-able DTO of this query. Only feature-group-backed sources
        serialize (an attached in-memory DataFrame or appended Column
        expressions have no durable representation — mirror of the DTO's
        limits)."""
        if self.feature_group is None:
            raise ValueError(
                "only feature-group-backed queries serialize (this one wraps "
                "a raw DataFrame)"
            )
        if self.appended:
            raise ValueError(
                "appended Column expressions are not serializable — apply "
                "them after deserialization"
            )

        def ftree(t):
            if t is None:
                return None
            if isinstance(t, Filter):
                return {"kind": "filter", "feature": t.feature,
                        "condition": t.condition, "value": t.value}
            return {"kind": "logic", "type": t.type,
                    "left": ftree(t.left), "right": ftree(t.right)}

        def wallclock(v):
            # round-trippable through parse_wallclock: datetimes become epoch
            # millis (ints are accepted directly); ints/strings pass through.
            # str() of a datetime/epoch-int would NOT re-parse.
            if v is None:
                return None
            import datetime as _dt

            if isinstance(v, _dt.datetime):
                if v.tzinfo is None:
                    v = v.replace(tzinfo=_dt.timezone.utc)
                return int(v.timestamp() * 1000)
            return v

        return {
            "feature_group": {
                "name": self.feature_group.name,
                "version": self.feature_group.version,
            },
            "selected": self.selected,
            "filter": ftree(self.filter_tree),
            "as_of_ts": wallclock(self.as_of_ts),
            "as_of_exclude": wallclock(self.as_of_exclude),
            "joins": [
                {
                    "sub_query": j.sub_query.to_dict(),
                    "on": j.on,
                    "left_on": j.left_on,
                    "right_on": j.right_on,
                    "join_type": j.join_type,
                    "prefix": j.prefix,
                    "broadcast_right": j.broadcast_right,
                }
                for j in self.joins
            ],
        }

    @classmethod
    def from_dict(cls, d: dict, store) -> "Query":
        """Rebuild a query DTO against a FeatureStore (group lookups by
        name+version, exactly as the backend constructor resolves aliases)."""

        def ftree(t):
            if t is None:
                return None
            if t["kind"] == "filter":
                return Filter(t["feature"], t["condition"], t["value"])
            return FilterLogic(t["type"], ftree(t["left"]), ftree(t["right"]))

        ref = d["feature_group"]
        fg = store.get_feature_group(ref["name"], ref["version"])
        if fg is None:
            raise ValueError(
                f"feature group {ref['name']}_{ref['version']} not in store"
            )
        q = cls.from_feature_group(fg, d.get("selected"))
        q.filter_tree = ftree(d.get("filter"))
        q.as_of_ts = d.get("as_of_ts")
        q.as_of_exclude = d.get("as_of_exclude")
        for j in d.get("joins", []):
            q.joins.append(
                _Join(
                    sub_query=cls.from_dict(j["sub_query"], store),
                    on=j["on"],
                    left_on=j["left_on"],
                    right_on=j["right_on"],
                    join_type=j["join_type"],
                    prefix=j["prefix"],
                    broadcast_right=j.get("broadcast_right", False),
                )
            )
        return q

    # ``query.sql()`` in the reference returns the backend-constructed SQL
    # (QueryConstructorApi); our equivalent is the Catalyst plan itself.
    def explain_string(self, spark=None, mode: str = "formatted") -> str:
        df = self.to_df(spark)
        jvm = df.sparkSession._jvm
        return df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        )


# ---------------------------------------------------------------------------
# Point-in-time (as-of) join — J5
# ---------------------------------------------------------------------------


def as_of_join(
    labels: DataFrame,
    features: DataFrame,
    keys: list[str],
    label_ts: str,
    feature_ts: str,
    feature_cols: list[str] | None = None,
) -> DataFrame:
    """PIT-correct join: for each label row, the latest feature row with
    ``feature_ts <= label_ts`` per key (``FeatureViewEngineBase.getBatchQuery``
    → ``pitQuery``, ``base/constructor/FsQueryBase.java:58-70``).

    Plan (the merge/union-sort as-of): tag both sides, union them, and take a
    running ``last(ignorenulls)`` of each feature column over a per-key window
    sorted by ``(ts, side)`` — features sort before labels at equal timestamps
    so the bound is inclusive. One shuffle on the keys + one sort; shuffle
    volume is O(labels + features), never O(labels × history-per-key) the way
    a join-then-rank plan explodes for long per-key histories. The window is
    partitioned by the join keys (bounded partitions), not per label row.
    All JVM-side — no Python. :func:`as_of_join_rank` keeps the join+rank
    shape as a small-scale oracle twin.
    """
    from pyspark.sql import Window

    fcols = feature_cols or [c for c in features.columns if c not in keys + [feature_ts]]
    l2 = labels.select(
        *keys,
        F.col(label_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[
            F.col(c).alias(f"_l_{c}")
            for c in labels.columns
            if c not in keys
        ],
    )
    # a feature row with a null timestamp can never satisfy ts <= label_ts
    # (matches the rank twin's isNotNull guard); without this filter it would
    # sort to the partition head and leak into every label. Null JOIN KEYS
    # are filtered too: the window partitioner groups nulls together, so a
    # null-key label would otherwise inherit null-key feature rows — an
    # equi-join (the rank twin) never matches nulls.
    _valid = F.col(feature_ts).isNotNull()
    for _k in keys:
        _valid = _valid & F.col(_k).isNotNull()
    f2 = features.filter(_valid).select(
        *keys,
        F.col(feature_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_f_{c}") for c in fcols],
    )
    u = l2.unionByName(f2, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the ENTIRE newest feature row as one struct — filling each column
    # independently with last(ignorenulls) would stitch values from different
    # history versions together when the newest row holds nulls (diverging
    # from as_of_join_rank / merge_asof whole-row semantics)
    frow = F.when(
        F.col("_side") == 0, F.struct(*[F.col(f"_f_{c}") for c in fcols])
    )
    filled = u.select(
        "*", F.last(frow, ignorenulls=True).over(w).alias("_frow")
    )
    return filled.filter(F.col("_side") == 1).select(
        *[
            F.col(c) if c in keys else F.col(f"_l_{c}").alias(c)
            for c in labels.columns
        ],
        *[F.col(f"_frow._f_{c}").alias(c) for c in fcols],
    )


def as_of_join_rank(
    labels: DataFrame,
    features: DataFrame,
    keys: list[str],
    label_ts: str,
    feature_ts: str,
    feature_cols: list[str] | None = None,
) -> DataFrame:
    """Join-then-rank as-of twin (the pre-r2 shape): equi-join on keys + keep
    the newest valid feature row per label via a window rank. Correct but its
    shuffle is O(labels × history-per-key) — kept only as an oracle twin for
    :func:`as_of_join`; prefer the union-sort plan at scale.
    """
    from pyspark.sql import Window

    fcols = feature_cols or [c for c in features.columns if c not in keys + [feature_ts]]
    f = features.select(
        *keys, F.col(feature_ts).alias("_f_ts"), *[F.col(c) for c in fcols]
    )
    lab = labels.withColumn("_label_rid", F.monotonically_increasing_id())
    j = lab.join(f, on=keys, how="left")
    valid = F.col("_f_ts").isNotNull() & (F.col("_f_ts") <= F.col(label_ts))
    # Rank valid matches first, newest first; an all-invalid group keeps the
    # label row with nulled-out features (left-join semantics of pitQuery).
    w = Window.partitionBy("_label_rid").orderBy(
        valid.desc(), F.col("_f_ts").desc_nulls_last()
    )
    ranked = j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    out = ranked.select(
        *[c for c in lab.columns if c != "_label_rid"],
        *[F.when(valid, F.col(c)).alias(c) for c in fcols],
    )
    return out

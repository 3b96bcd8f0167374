"""Query DSL tests: projection, filter-tree fold, join types + prefix,
as-of time travel, PIT join vs pandas merge_asof oracle."""

import numpy as np
import pandas as pd
import pytest

from engine.query import FeatureRef, FilterLogic, Query, as_of_join
from engine.schema import FeatureGroup
from engine.timeutil import parse_wallclock


@pytest.fixture(scope="module")
def orders_q(spark, tables):
    fg = FeatureGroup.from_dataframe("orders", tables["orders"], primary_key=["o_orderkey"])
    fg.attach(tables["orders"])
    return fg


@pytest.fixture(scope="module")
def cust_q(spark, tables):
    fg = FeatureGroup.from_dataframe("customer", tables["customer"], primary_key=["c_custkey"])
    fg.attach(tables["customer"])
    return fg


def test_select_and_except(spark, orders_q):
    q = orders_q.select(["o_orderkey", "o_totalprice", "o_orderstatus"])
    df = q.to_df(spark)
    assert df.columns == ["o_orderkey", "o_totalprice", "o_orderstatus"]
    q2 = orders_q.select_all().select_except(["o_orderpriority", "o_orderdate"])
    assert "o_orderpriority" not in q2.to_df(spark).columns


def test_filter_tree_fold(spark, tables, orders_q):
    f = FeatureRef("o_totalprice")
    s = FeatureRef("o_orderstatus")
    tree = (f.gt(1000.0) & s.eq("O")) | f.le(100.0)
    assert isinstance(tree, FilterLogic)
    q = orders_q.select_all().filter(tree)
    got = q.to_df(spark).count()
    want = tables["orders"].filter(
        "((o_totalprice > 1000.0 AND o_orderstatus = 'O') OR o_totalprice <= 100.0)"
    ).count()
    assert got == want > 0
    # conjunction fold: second .filter ANDs on
    q.filter(FeatureRef("o_custkey").isin([1, 2, 3]))
    got2 = q.to_df(spark).count()
    want2 = tables["orders"].filter(
        "((o_totalprice > 1000.0 AND o_orderstatus = 'O') OR o_totalprice <= 100.0) "
        "AND o_custkey IN (1,2,3)"
    ).count()
    assert got2 == want2


def test_like_and_predicates(spark, cust_q, tables):
    q = cust_q.select_all().filter(FeatureRef("c_name").like("%1%"))
    assert q.to_df(spark).count() == tables["customer"].filter("c_name LIKE '%1%'").count()


@pytest.mark.parametrize(
    "jt", ["INNER", "LEFT", "RIGHT", "FULL", "LEFT_SEMI_JOIN"]
)
def test_join_types(spark, tables, orders_q, cust_q, jt):
    q = orders_q.select_all().join(
        cust_q.select(["c_custkey", "c_name", "c_mktsegment"]),
        left_on=["o_custkey"],
        right_on=["c_custkey"],
        join_type=jt,
    )
    got = q.to_df(spark).count()
    how = {"LEFT_SEMI_JOIN": "left_semi"}.get(jt, jt.lower())
    want = tables["orders"].join(
        tables["customer"].select("c_custkey", "c_name", "c_mktsegment"),
        tables["orders"]["o_custkey"] == tables["customer"]["c_custkey"],
        how,
    ).count()
    assert got == want > 0


def test_cross_join_and_prefix(spark, tables, orders_q):
    nation = FeatureGroup.from_dataframe("nation", tables["nation"]).attach(tables["nation"])
    q = Query.from_dataframe(tables["region"]).join(
        Query.from_dataframe(tables["nation"]), join_type="COMMA"
    )
    assert q.to_df(spark).count() == tables["region"].count() * tables["nation"].count()
    # prefix applied to right-side non-key cols
    q2 = Query.from_dataframe(tables["nation"]).join(
        Query.from_dataframe(tables["region"]),
        left_on=["n_regionkey"],
        right_on=["r_regionkey"],
        join_type="INNER",
        prefix="reg_",
    )
    cols = q2.to_df(spark).columns
    assert "reg_r_name" in cols and "r_regionkey" in cols


def test_append_feature(spark, orders_q):
    from pyspark.sql import functions as F

    q = orders_q.select(["o_orderkey", "o_totalprice"]).append_feature(
        "price_k", F.col("o_totalprice") / 1000.0
    )
    df = q.to_df(spark)
    row = df.orderBy("o_orderkey").first()
    assert abs(row["price_k"] - row["o_totalprice"] / 1000.0) < 1e-9


def test_as_of_commit_ts(spark):
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {
            "k": [1, 1, 2, 2],
            "v": [10, 11, 20, 21],
            "_commit_ts": pd.to_datetime(
                ["2024-01-01", "2024-02-01", "2024-01-15", "2024-03-01"]
            ),
        }
    )
    fg = FeatureGroup.from_dataframe("fgts", spark.createDataFrame(pdf)).attach(
        spark.createDataFrame(pdf)
    )
    got = fg.select_all().as_of("2024-02-01").to_df(spark).toPandas()
    assert sorted(got["v"]) == [10, 11, 20]
    got2 = (
        fg.select_all()
        .pull_changes("20240110", "20240215")
        .to_df(spark)
        .toPandas()
    )
    assert sorted(got2["v"]) == [11, 20]


def test_wallclock_parse_ladder():
    assert parse_wallclock("20240201").year == 2024
    assert parse_wallclock("2024-02-01 13:30:15").minute == 30
    assert parse_wallclock("2024/02/01 13:30:15.123").microsecond == 123000
    assert parse_wallclock(1704067200000).year == 2024
    with pytest.raises(ValueError):
        parse_wallclock("not-a-date")


def test_as_of_join_matches_merge_asof(spark):
    rng = np.random.default_rng(3)
    n_lab, n_feat = 400, 300
    labels = pd.DataFrame(
        {
            "key": rng.integers(1, 20, n_lab),
            "label_ts": pd.to_datetime(rng.integers(0, 10**6, n_lab), unit="s"),
            "y": rng.random(n_lab),
        }
    )
    feats = pd.DataFrame(
        {
            "key": rng.integers(1, 20, n_feat),
            "feat_ts": pd.to_datetime(rng.integers(0, 10**6, n_feat), unit="s"),
            "x": rng.random(n_feat),
        }
    )
    got = (
        as_of_join(
            spark.createDataFrame(labels),
            spark.createDataFrame(feats),
            keys=["key"],
            label_ts="label_ts",
            feature_ts="feat_ts",
        )
        .toPandas()
        .sort_values(["key", "label_ts", "y"])
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            labels.sort_values("label_ts"),
            feats.sort_values("feat_ts"),
            left_on="label_ts",
            right_on="feat_ts",
            by="key",
            direction="backward",
        )
        .drop(columns=["feat_ts"])
        .sort_values(["key", "label_ts", "y"])
        .reset_index(drop=True)
    )
    assert len(got) == len(labels)
    pd.testing.assert_frame_equal(
        got[["key", "label_ts", "y", "x"]], want[["key", "label_ts", "y", "x"]],
        check_exact=False, rtol=1e-12,
    )


def test_as_of_join_long_history_parity_and_plan(spark):
    """Union-sort as-of vs the join+rank twin on a long-per-key-history
    distribution (2 keys x 2000 feature rows); identical output, and the
    scale plan contains no per-label-row window key
    (monotonically_increasing_id) and no join at all (VERDICT r1 item 6)."""
    from engine.query import as_of_join_rank

    rng = np.random.default_rng(9)
    n_lab, n_feat = 150, 4000
    labels = pd.DataFrame(
        {
            "key": rng.integers(1, 3, n_lab),
            "label_ts": pd.to_datetime(rng.integers(0, 10**6, n_lab), unit="s"),
            "y": rng.random(n_lab),
        }
    )
    feats = pd.DataFrame(
        {
            "key": rng.integers(1, 3, n_feat),
            "feat_ts": pd.to_datetime(
                rng.choice(10**6, size=n_feat, replace=False), unit="s"
            ),
            "x": rng.random(n_feat),
        }
    )
    ldf, fdf = spark.createDataFrame(labels), spark.createDataFrame(feats)
    kw = dict(keys=["key"], label_ts="label_ts", feature_ts="feat_ts")
    new_df = as_of_join(ldf, fdf, **kw)
    got = new_df.toPandas().sort_values(["key", "label_ts", "y"]).reset_index(drop=True)
    want = (
        as_of_join_rank(ldf, fdf, **kw)
        .toPandas()
        .sort_values(["key", "label_ts", "y"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-12)
    plan = new_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "monotonically_increasing_id" not in plan
    assert "Join" not in plan  # union + window, no join-then-filter explosion


def test_as_of_join_null_feature_ts_never_matches(spark):
    """A feature row with a null timestamp must not leak into labels
    (parity with the rank twin's isNotNull guard)."""
    from pyspark.sql import functions as F

    from engine.query import as_of_join_rank

    labels = spark.createDataFrame(
        [(1, 100, 1.0)], "key int, label_ts int, y double"
    ).withColumn("label_ts", F.col("label_ts").cast("timestamp"))
    feats = spark.createDataFrame(
        [(1, None, 9.0), (1, 50, 5.0)], "key int, feat_ts int, x double"
    ).withColumn("feat_ts", F.col("feat_ts").cast("timestamp"))
    kw = dict(keys=["key"], label_ts="label_ts", feature_ts="feat_ts")
    got = as_of_join(labels, feats, **kw).toPandas()
    want = as_of_join_rank(labels, feats, **kw).toPandas()
    assert got["x"].tolist() == [5.0] == want["x"].tolist()


def test_as_of_join_newest_row_nulls_not_backfilled(spark):
    """Review fix: the as-of result is the WHOLE newest feature row — a null
    in the newest row must not be backfilled from an older history version
    (parity with as_of_join_rank / merge_asof row semantics)."""
    from pyspark.sql import functions as F

    from engine.query import as_of_join_rank

    labels = spark.createDataFrame(
        [(1, 3, 1.0)], "key int, label_ts int, y double"
    ).withColumn("label_ts", F.col("label_ts").cast("timestamp"))
    feats = spark.createDataFrame(
        [(1, 1, 5.0, 1.0), (1, 2, None, 2.0)],
        "key int, feat_ts int, a double, b double",
    ).withColumn("feat_ts", F.col("feat_ts").cast("timestamp"))
    kw = dict(keys=["key"], label_ts="label_ts", feature_ts="feat_ts")
    got = as_of_join(labels, feats, **kw).toPandas().iloc[0]
    want = as_of_join_rank(labels, feats, **kw).toPandas().iloc[0]
    assert pd.isna(got["a"]) and pd.isna(want["a"])  # newest row's null kept
    assert got["b"] == 2.0 == want["b"]


def test_as_of_join_null_keys_never_match(spark):
    """r3 ADVICE fix: null JOIN KEYS on either side must not match — the
    window partitioner groups nulls together, but an equi-join (the rank
    twin) never matches null keys. Feature rows with null keys are dropped;
    a null-key label gets null features on both plans."""
    from pyspark.sql import functions as F

    from engine.query import as_of_join_rank

    labels = spark.createDataFrame(
        [(1, 100, 1.0), (None, 100, 2.0)],
        "key int, label_ts int, y double",
    ).withColumn("label_ts", F.col("label_ts").cast("timestamp"))
    feats = spark.createDataFrame(
        [(None, 50, 9.0), (1, 50, 5.0)],
        "key int, feat_ts int, x double",
    ).withColumn("feat_ts", F.col("feat_ts").cast("timestamp"))
    kw = dict(keys=["key"], label_ts="label_ts", feature_ts="feat_ts")
    got = (
        as_of_join(labels, feats, **kw).toPandas()
        .sort_values("y").reset_index(drop=True)
    )
    want = (
        as_of_join_rank(labels, feats, **kw).toPandas()
        .sort_values("y").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)
    # key=1 label matched; null-key label got NO feature
    assert got.loc[got["y"] == 1.0, "x"].tolist() == [5.0]
    assert got.loc[got["y"] == 2.0, "x"].isna().all()

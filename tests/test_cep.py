"""CEP sequence detection (engine.cep) — batch vs DuckDB, stream vs batch.

The batch operator's oracle is the identical window-function cascade run in
DuckDB (``detect_sequence_sql``); the streaming operator's oracle is the
batch operator filtered to matches closed by the final watermark, exercised
across multiple micro-batches so the NFA's carried-chain / buffer / prune
state machinery is genuinely used.
"""

import datetime
import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.cep import detect_sequence, detect_sequence_sql, stateful_pattern_detect

SF = "/root/testdata/sf0.001"

_NAMES = ["view", "click", "purchase"]
_PREDS = [f"event_type = '{n}'" for n in _NAMES]


def _steps():
    return [(n, F.col("event_type") == n) for n in _NAMES]


_MEMQ = [0]


def _run_stream(spark, df):
    _MEMQ[0] += 1
    name = f"cep_mem_{_MEMQ[0]}"
    q = df.writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"select * from {name}").toPandas()


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = ["user_id"] + [f"{n}_ts" for n in _NAMES]
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_batch_matches_duckdb(spark):
    ev = spark.read.parquet(SF + "/events.parquet")
    got = detect_sequence(
        ev, "user_id", "ts", _steps(), "48 hours", order_col="event_id"
    ).toPandas()
    duckdb.sql(
        "CREATE OR REPLACE VIEW events AS "
        f"SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = duckdb.sql(
        detect_sequence_sql("user_id", "ts", _NAMES, _PREDS,
                            "INTERVAL 48 HOUR", "events", "event_id")
    ).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_batch_plan_single_exchange(spark):
    """k-step cascade = ONE shuffle + sort; predicates pushed to the scan."""
    ev = spark.read.parquet(SF + "/events.parquet")
    out = detect_sequence(ev, "user_id", "ts", _steps(), "48 hours",
                          order_col="event_id")
    plan = out._jdf.queryExecution().executedPlan().treeString()
    assert plan.count("Exchange") == 1
    assert plan.count("+- Sort") == 1
    assert "PushedFilters" in plan and "event_type" in plan


def test_greedy_latest_predecessor(spark):
    """Each step chains to the most recent valid predecessor, and `within`
    is judged on that latest chain (which minimizes the span)."""
    rows = [
        # user 1: A at 0s and 90s, B at 100s, C at 110s, within 60s:
        # the greedy chain is A@90 -> B@100 -> C@110 (span 20s) — a match
        # even though A@0 -> ... (span 110s) would fail.
        (1, 1, 0.0, "a"), (2, 1, 90.0, "a"), (3, 1, 100.0, "b"),
        (4, 1, 110.0, "c"),
        # user 2: only the stale A@0 exists -> span 110s > 60s: no match
        (5, 2, 0.0, "a"), (6, 2, 100.0, "b"), (7, 2, 110.0, "c"),
    ]
    df = spark.createDataFrame(
        [(i, u, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), t)
         for i, u, s, t in rows],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    steps = [(n, F.col("event_type") == n) for n in ("a", "b", "c")]
    got = detect_sequence(df, "user_id", "ts", steps, "60 seconds",
                          order_col="event_id").toPandas()
    assert list(got["user_id"]) == [1]
    assert got["a_ts"].iloc[0].second == 30  # 90 s = 00:01:30


def test_stream_matches_batch_multibatch(spark, tmp_path):
    """Split the events table into time-ordered files streamed one per
    micro-batch: the NFA must carry partial chains across batches and emit
    exactly the batch operator's matches closed by the final watermark."""
    src_pq = SF + "/events.parquet"
    pdf = pd.read_parquet(src_pq).sort_values("ts").reset_index(drop=True)
    d = str(tmp_path / "ev_stream")
    os.makedirs(d)
    n_files = 6
    for i in range(n_files):
        chunk = pdf.iloc[i * len(pdf) // n_files:(i + 1) * len(pdf) // n_files]
        p = f"{d}/part{i:02d}.parquet"
        chunk.to_parquet(p, index=False)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    schema = spark.read.parquet(src_pq).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(d).withColumn("ts", F.col("ts").cast("timestamp"))
    )
    got = _run_stream(
        spark,
        stateful_pattern_detect(stream, "ts", "user_id", _steps(), "48 hours",
                                watermark="60 seconds"),
    )
    ev = spark.read.parquet(src_pq)
    cut = ev.agg(F.max("ts")).collect()[0][0] - datetime.timedelta(seconds=60)
    want = detect_sequence(ev, "user_id", "ts", _steps(), "48 hours",
                           order_col="event_id").toPandas()
    want = want[want["purchase_ts"] <= cut]
    assert len(got) > 0
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def _mini_dir(tmp_path, files):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "mini")
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(files):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
        t = pa.Table.from_pandas(
            pdf,
            schema=pa.schema([("user_id", pa.int64()),
                              ("ts", pa.timestamp("us")),
                              ("event_type", pa.string())]),
            preserve_index=False,
        )
        pq.write_table(t, f"{d}/p{i:03d}.parquet")
        os.utime(f"{d}/p{i:03d}.parquet", (1_000_000 + i, 1_000_000 + i))
    return d


def _mini_stream(spark, d):
    return spark.readStream.schema(
        "user_id long, ts timestamp, event_type string"
    ).option("maxFilesPerTrigger", 1).parquet(d)


def test_chain_carries_across_batches(spark, tmp_path):
    """a completes in batch 0, b in batch 1, c in batch 2 — the partial
    chains must survive in state; a second 'c' far outside `within` (batch 3)
    must NOT match because the carried chain is pruned once it can no longer
    complete."""
    steps = [(n, F.col("event_type") == n) for n in ("a", "b", "c")]
    d = _mini_dir(tmp_path, [
        [(1, 100, "a"), (9, 100, "x")],
        [(1, 200, "b"), (9, 5_000, "x")],       # wm -> 4940: a,b processed
        [(1, 300, "c"), (9, 10_000, "x")],      # wm -> 9940: c@300 matches
        [(1, 90_000, "c"), (9, 200_000, "x")],  # chain a@100 pruned long ago
        [(9, 300_000, "x")],
    ])
    got = _run_stream(
        spark,
        stateful_pattern_detect(_mini_stream(spark, d), "ts", "user_id",
                                steps, "10 minutes", watermark="60 seconds"),
    )
    assert len(got) == 1
    assert got["user_id"].iloc[0] == 1
    assert got["c_ts"].iloc[0] == pd.Timestamp("1970-01-01 00:05:00")


def test_stream_two_step_and_state_bounded(spark, tmp_path):
    """2-step pattern across batches + state removal: after the key's buffer
    drains and chains are pruned, re-sending the second step alone produces
    nothing (state was dropped, not leaked)."""
    steps = [("a", F.col("event_type") == "a"), ("b", F.col("event_type") == "b")]
    d = _mini_dir(tmp_path, [
        [(1, 100, "a")],
        [(9, 1_000, "x")],            # wm advances: a@100 processed, carried
        [(1, 200, "b")],              # match (a@100, b@200)
        [(9, 50_000, "x")],           # wm far ahead: chains pruned (within 5m)
        [(1, 60_000, "b")],           # no 'a' inside within -> no match
        [(9, 99_000, "x")],
    ])
    got = _run_stream(
        spark,
        stateful_pattern_detect(_mini_stream(spark, d), "ts", "user_id",
                                steps, "5 minutes", watermark="60 seconds"),
    )
    assert len(got) == 1
    assert got["b_ts"].iloc[0] == pd.Timestamp("1970-01-01 00:03:20")


def test_rejects_bad_patterns():
    with pytest.raises(ValueError):
        detect_sequence(None, "k", "ts", [("only", F.lit(True))], "1 hour")
    with pytest.raises(ValueError):
        detect_sequence(None, "k", "ts",
                        [("dup", F.lit(True)), ("dup", F.lit(True))], "1 hour")
    t = F.lit(True)
    for bad in (
        [("n", t, "notFollowedBy"), ("a", t), ("b", t)],   # neg first
        [("a", t), ("b", t), ("n", t, "notFollowedBy")],   # neg last
        [("a", t), ("n1", t, "notFollowedBy"),
         ("n2", t, "notFollowedBy"), ("b", t)],            # consecutive negs
        [("a", t), ("n", t, "notFollowedBy"),
         ("b", t, "next")],                                # neg before next
        [("a", t), ("b", t, "sometimes")],                 # unknown kind
    ):
        with pytest.raises(ValueError):
            detect_sequence(None, "k", "ts", bad, "1 hour")


# ---------------------------------------------------------------------------
# next / notFollowedBy step kinds (FlinkCEP strict contiguity + negation)
# ---------------------------------------------------------------------------

_STRICT_NAMES = ["view", "click", "purchase"]


def _strict_steps():
    return [
        ("view", F.col("event_type") == "view"),
        ("click", F.col("event_type") == "click", "next"),
        ("err", F.col("event_type") == "error", "notFollowedBy"),
        ("purchase", F.col("event_type") == "purchase"),
    ]


def _strict_sql():
    return detect_sequence_sql(
        "user_id", "ts", _STRICT_NAMES,
        ["event_type = 'view'", "event_type = 'click'",
         "event_type = 'purchase'"],
        "INTERVAL 48 HOUR", "events", "event_id",
        step_kinds=["begin", "next", "followedBy"],
        neg_preds=[None, None, "event_type = 'error'"],
    )


def _sorted_strict(df: pd.DataFrame) -> pd.DataFrame:
    cols = ["user_id"] + [f"{n}_ts" for n in _STRICT_NAMES]
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_batch_next_and_negation_match_duckdb(spark):
    ev = spark.read.parquet(SF + "/events.parquet")
    got = detect_sequence(
        ev, "user_id", "ts", _strict_steps(), "48 hours", order_col="event_id"
    ).toPandas()
    duckdb.sql(
        "CREATE OR REPLACE VIEW events AS "
        f"SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = duckdb.sql(_strict_sql()).df()
    assert len(got) > 0
    # strict contiguity + negation must cut the relaxed-funnel match set
    relaxed = detect_sequence(ev, "user_id", "ts", _steps(), "48 hours",
                              order_col="event_id").count()
    assert len(got) < relaxed
    pd.testing.assert_frame_equal(
        _sorted_strict(got), _sorted_strict(want), check_dtype=False
    )


def test_stream_next_and_negation_match_batch(spark, tmp_path):
    src_pq = SF + "/events.parquet"
    pdf = pd.read_parquet(src_pq).sort_values("ts").reset_index(drop=True)
    d = str(tmp_path / "ev_stream_strict")
    os.makedirs(d)
    n_files = 6
    for i in range(n_files):
        chunk = pdf.iloc[i * len(pdf) // n_files:(i + 1) * len(pdf) // n_files]
        p = f"{d}/part{i:02d}.parquet"
        chunk.to_parquet(p, index=False)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    schema = spark.read.parquet(src_pq).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(d).withColumn("ts", F.col("ts").cast("timestamp"))
    )
    got = _run_stream(
        spark,
        stateful_pattern_detect(stream, "ts", "user_id", _strict_steps(),
                                "48 hours", watermark="60 seconds"),
    )
    ev = spark.read.parquet(src_pq)
    cut = ev.agg(F.max("ts")).collect()[0][0] - datetime.timedelta(seconds=60)
    want = detect_sequence(ev, "user_id", "ts", _strict_steps(), "48 hours",
                           order_col="event_id").toPandas()
    want = want[want["purchase_ts"] <= cut]
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        _sorted_strict(got), _sorted_strict(want), check_dtype=False
    )


def test_next_adjacency_across_batch_boundary(spark, tmp_path):
    """user 1: a is the last mature row of one batch, b the first of the
    next — strict contiguity must link them through carried state. user 2:
    an intervening x breaks adjacency."""
    steps = [("a", F.col("event_type") == "a"),
             ("b", F.col("event_type") == "b", "next")]
    d = _mini_dir(tmp_path, [
        [(1, 100, "a"), (2, 100, "a"), (2, 150, "x")],
        [(9, 1_000, "x")],                  # wm advances past 100/150
        [(1, 200, "b"), (2, 200, "b")],
        [(9, 50_000, "x")],
    ])
    got = _run_stream(
        spark,
        stateful_pattern_detect(_mini_stream(spark, d), "ts", "user_id",
                                steps, "10 minutes", watermark="60 seconds"),
    )
    assert list(got["user_id"]) == [1]
    # batch twin agrees
    rows = [(1, 100, "a"), (2, 100, "a"), (2, 150, "x"),
            (1, 200, "b"), (2, 200, "b")]
    bdf = spark.createDataFrame(
        [(u, datetime.datetime.utcfromtimestamp(s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string",
    )
    want = detect_sequence(bdf, "user_id", "ts", steps, "10 minutes").toPandas()
    assert list(want["user_id"]) == [1]


def test_negation_across_batch_boundary(spark, tmp_path):
    """user 1: the negated event lands in an EARLIER batch than the final
    step — the carried latest-neg timestamp must still invalidate the link.
    user 2: neg event before the 'a' match does not invalidate."""
    steps = [("a", F.col("event_type") == "a"),
             ("n", F.col("event_type") == "n", "notFollowedBy"),
             ("b", F.col("event_type") == "b")]
    d = _mini_dir(tmp_path, [
        [(1, 100, "a"), (1, 150, "n"), (2, 50, "n"), (2, 100, "a")],
        [(9, 1_000, "x")],                  # wm advances: batch 0 processed
        [(1, 200, "b"), (2, 200, "b")],
        [(9, 50_000, "x")],
    ])
    got = _run_stream(
        spark,
        stateful_pattern_detect(_mini_stream(spark, d), "ts", "user_id",
                                steps, "10 minutes", watermark="60 seconds"),
    )
    assert list(got["user_id"]) == [2]
    rows = [(1, 100, "a"), (1, 150, "n"), (2, 50, "n"), (2, 100, "a"),
            (1, 200, "b"), (2, 200, "b")]
    bdf = spark.createDataFrame(
        [(u, datetime.datetime.utcfromtimestamp(s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string",
    )
    want = detect_sequence(bdf, "user_id", "ts", steps, "10 minutes").toPandas()
    assert list(want["user_id"]) == [2]


# ---------------------------------------------------------------------------
# times(n) looping quantifier (FlinkCEP .times(n))
# ---------------------------------------------------------------------------

_TIMES_NAMES = ["view", "click_1", "click_2", "purchase"]


def _times_steps():
    return [
        ("view", F.col("event_type") == "view"),
        ("click", F.col("event_type") == "click", "followedBy", 2),
        ("purchase", F.col("event_type") == "purchase"),
    ]


def test_batch_times_matches_duckdb(spark):
    """times(2) == the hand-expanded pattern, value-checked against the
    DuckDB cascade over the expanded step list."""
    ev = spark.read.parquet(SF + "/events.parquet")
    got = detect_sequence(
        ev, "user_id", "ts", _times_steps(), "48 hours", order_col="event_id"
    ).toPandas()
    duckdb.sql(
        "CREATE OR REPLACE VIEW events AS "
        f"SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = duckdb.sql(
        detect_sequence_sql(
            "user_id", "ts", _TIMES_NAMES,
            ["event_type = 'view'", "event_type = 'click'",
             "event_type = 'click'", "event_type = 'purchase'"],
            "INTERVAL 48 HOUR", "events", "event_id",
        )
    ).df()
    assert len(got) > 0
    cols = ["user_id"] + [f"{n}_ts" for n in _TIMES_NAMES]
    assert list(got.columns) == cols
    got_s = got[cols].sort_values(cols).reset_index(drop=True)
    want_s = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)


def test_times_consecutive_semantics(spark):
    """("fail", cond, "next", 3) = three ADJACENT failures: an intervening
    non-matching row breaks the run."""
    rows = [
        # user 1: ok, fail, fail, fail, alert  -> match
        (1, 1, 0, "ok"), (2, 1, 10, "fail"), (3, 1, 20, "fail"),
        (4, 1, 30, "fail"), (5, 1, 40, "alert"),
        # user 2: fail, fail, ok, fail, alert  -> run broken, no match
        (6, 2, 10, "fail"), (7, 2, 20, "fail"), (8, 2, 25, "ok"),
        (9, 2, 30, "fail"), (10, 2, 40, "alert"),
    ]
    df = spark.createDataFrame(
        [(i, u, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), t)
         for i, u, s, t in rows],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    steps = [
        ("fail", F.col("event_type") == "fail", "next", 3),
        ("alert", F.col("event_type") == "alert"),
    ]
    got = detect_sequence(df, "user_id", "ts", steps, "5 minutes",
                          order_col="event_id").toPandas()
    assert list(got["user_id"]) == [1]
    assert list(got.columns) == [
        "user_id", "fail_1_ts", "fail_2_ts", "fail_3_ts", "alert_ts"
    ]
    # note: the FIRST replica of a "next"-quantified begin step keeps kind
    # "begin", so only internal links are strict — by construction
    assert got["fail_1_ts"].iloc[0].second == 10


def test_stream_times_matches_batch(spark, tmp_path):
    """Quantified pattern through the streaming NFA across micro-batches
    equals the batch operator (watermark-closed matches)."""
    steps = [("a", F.col("event_type") == "a"),
             ("b", F.col("event_type") == "b", "followedBy", 2),
             ("c", F.col("event_type") == "c")]
    d = _mini_dir(tmp_path, [
        [(1, 100, "a"), (1, 110, "b")],
        [(1, 120, "b"), (2, 100, "a"), (2, 110, "b")],
        [(1, 130, "c"), (2, 130, "c")],       # user 2 has only ONE b
        [(9, 50_000, "x")],
    ])
    got = _run_stream(
        spark,
        stateful_pattern_detect(_mini_stream(spark, d), "ts", "user_id",
                                steps, "10 minutes", watermark="60 seconds"),
    )
    assert list(got["user_id"]) == [1]
    rows = [(1, 100, "a"), (1, 110, "b"), (1, 120, "b"), (2, 100, "a"),
            (2, 110, "b"), (1, 130, "c"), (2, 130, "c")]
    bdf = spark.createDataFrame(
        [(u, datetime.datetime.utcfromtimestamp(s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string",
    )
    want = detect_sequence(bdf, "user_id", "ts", steps, "10 minutes").toPandas()
    assert list(want["user_id"]) == [1]
    assert list(got.columns) == list(want.columns)


def test_rejects_bad_times():
    t = F.lit(True)
    for bad in (
        [("a", t, "followedBy", 0), ("b", t)],             # times < 1
        [("a", t, "followedBy", 1.5), ("b", t)],           # non-int
        [("a", t), ("n", t, "notFollowedBy", 2), ("b", t)],  # neg quantified
    ):
        with pytest.raises(ValueError):
            detect_sequence(None, "k", "ts", bad, "1 hour")
    # times == 1 degenerates to the plain step
    from engine.cep import _parse_pattern
    pos = _parse_pattern([("a", t, "followedBy", 1), ("b", t)])
    assert [p[0] for p in pos] == ["a", "b"]


# ---------------------------------------------------------------------------
# optional steps + times(m, n) range quantifier (FlinkCEP .optional())
# ---------------------------------------------------------------------------


def test_batch_optional_matches_duckdb(spark):
    """view → click(optional) → purchase against the DuckDB cascade with the
    same pass-through rule."""
    ev = spark.read.parquet(SF + "/events.parquet")
    steps = [
        ("view", F.col("event_type") == "view"),
        ("click", F.col("event_type") == "click", "optional"),
        ("purchase", F.col("event_type") == "purchase"),
    ]
    got = detect_sequence(ev, "user_id", "ts", steps, "48 hours",
                          order_col="event_id").toPandas()
    duckdb.sql(
        "CREATE OR REPLACE VIEW events AS "
        f"SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = duckdb.sql(
        detect_sequence_sql(
            "user_id", "ts", ["view", "click", "purchase"],
            ["event_type = 'view'", "event_type = 'click'",
             "event_type = 'purchase'"],
            "INTERVAL 48 HOUR", "events", "event_id",
            opt_steps=[False, True, False],
        )
    ).df()
    assert len(got) > 0
    cols = ["user_id", "view_ts", "click_ts", "purchase_ts"]

    def canon(df):
        df = df[cols].copy()
        for c in cols[1:]:  # unify dtype so NaT sorts identically
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        return df.sort_values(cols, na_position="last").reset_index(drop=True)

    # a skipped optional step emits a null ts somewhere in the result
    assert want["click_ts"].isna().any() and (~want["click_ts"].isna()).any()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


def test_optional_semantics_handcrafted(spark):
    rows = [
        # user 1: a, c (b skipped)  -> match with null b_ts
        (1, 1, 0, "a"), (2, 1, 10, "c"),
        # user 2: a, b, c           -> match with real b_ts
        (3, 2, 0, "a"), (4, 2, 5, "b"), (5, 2, 10, "c"),
        # user 3: b, c (no a)       -> no match (anchor step required)
        (6, 3, 5, "b"), (7, 3, 10, "c"),
    ]
    df = spark.createDataFrame(
        [(i, u, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), t)
         for i, u, s, t in rows],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    steps = [("a", F.col("event_type") == "a"),
             ("b", F.col("event_type") == "b", "optional"),
             ("c", F.col("event_type") == "c")]
    got = detect_sequence(df, "user_id", "ts", steps, "5 minutes",
                          order_col="event_id").toPandas().sort_values("user_id")
    assert list(got["user_id"]) == [1, 2]
    assert pd.isna(got["b_ts"].iloc[0])
    assert got["b_ts"].iloc[1].second == 5


def test_times_range_quantifier(spark):
    """times(1, 2): one required + one optional replica."""
    rows = [
        (1, 1, 0, "a"), (2, 1, 5, "b"), (3, 1, 10, "c"),            # 1 b
        (4, 2, 0, "a"), (5, 2, 4, "b"), (6, 2, 7, "b"), (7, 2, 10, "c"),  # 2 bs
        (8, 3, 0, "a"), (9, 3, 10, "c"),                            # 0 bs
    ]
    df = spark.createDataFrame(
        [(i, u, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), t)
         for i, u, s, t in rows],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    steps = [("a", F.col("event_type") == "a"),
             ("b", F.col("event_type") == "b", "followedBy", (1, 2)),
             ("c", F.col("event_type") == "c")]
    got = detect_sequence(df, "user_id", "ts", steps, "5 minutes",
                          order_col="event_id").toPandas().sort_values("user_id")
    # user 3 has zero b's -> no match; users 1-2 match
    assert list(got["user_id"]) == [1, 2]
    assert list(got.columns) == ["user_id", "a_ts", "b_1_ts", "b_2_ts", "c_ts"]
    assert pd.isna(got["b_2_ts"].iloc[0])      # user 1: second b skipped
    assert got["b_2_ts"].iloc[1].second == 7   # user 2: both b's bound


def test_stream_optional_matches_batch(spark, tmp_path):
    """Optional step through the streaming NFA across micro-batches —
    including a skipped-step chain carried in state."""
    steps = [("a", F.col("event_type") == "a"),
             ("b", F.col("event_type") == "b", "optional"),
             ("c", F.col("event_type") == "c")]
    d = _mini_dir(tmp_path, [
        [(1, 100, "a"), (2, 100, "a"), (2, 110, "b")],
        [(9, 1_000, "x")],                 # watermark advances: chains carried
        [(1, 1_200, "c"), (2, 1_200, "c")],
        [(9, 50_000, "x")],
    ])
    got = _run_stream(
        spark,
        stateful_pattern_detect(_mini_stream(spark, d), "ts", "user_id",
                                steps, "30 minutes", watermark="60 seconds"),
    ).sort_values("user_id").reset_index(drop=True)
    assert list(got["user_id"]) == [1, 2]
    assert pd.isna(got["b_ts"].iloc[0])            # user 1 skipped b
    assert not pd.isna(got["b_ts"].iloc[1])        # user 2 matched b
    rows = [(1, 100, "a"), (2, 100, "a"), (2, 110, "b"),
            (1, 1_200, "c"), (2, 1_200, "c")]
    bdf = spark.createDataFrame(
        [(u, datetime.datetime.utcfromtimestamp(s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string",
    )
    want = detect_sequence(bdf, "user_id", "ts", steps,
                           "30 minutes").toPandas().sort_values("user_id")
    assert got[["user_id", "a_ts", "b_ts", "c_ts"]].equals(
        want[["user_id", "a_ts", "b_ts", "c_ts"]].reset_index(drop=True)
    )


def test_rejects_bad_optional():
    t = F.lit(True)
    for bad in (
        [("a", t, "optional"), ("b", t)],                    # first optional
        [("a", t), ("b", t, "optional")],                    # last optional
        [("a", t), ("n", t, "notFollowedBy"),
         ("b", t, "optional"), ("c", t)],                    # neg before opt
        [("a", t), ("b", t, "optional"),
         ("n", t, "notFollowedBy"), ("c", t)],               # neg after opt
        [("a", t), ("b", t, "followedBy", (2, 1)), ("c", t)],  # bad range
    ):
        with pytest.raises(ValueError):
            detect_sequence(None, "k", "ts", bad, "1 hour")


def test_quantified_plan_still_single_exchange(spark):
    """times/optional expansion must not add shuffles: the cascade stays
    ONE Exchange + ONE Sort regardless of quantifiers."""
    ev = spark.read.parquet(SF + "/events.parquet")
    steps = [
        ("view", F.col("event_type") == "view"),
        ("click", F.col("event_type") == "click", "followedBy", (1, 3)),
        ("purchase", F.col("event_type") == "purchase"),
    ]
    out = detect_sequence(ev, "user_id", "ts", steps, "48 hours",
                          order_col="event_id")
    plan = out._jdf.queryExecution().executedPlan().treeString()
    assert plan.count("Exchange") == 1
    assert plan.count("+- Sort") == 1

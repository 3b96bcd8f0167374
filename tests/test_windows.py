"""Window-aggregate golden tests: Spark plans vs the independent pandas oracle
(SURVEY.md §5.2 item 3) — epoch alignment, [start,end) bounds, bug-compatible
stdev, sliding expansion, session merge."""

import numpy as np
import pandas as pd
import pytest

from engine import oracle
from engine.synth import make_transactions_pdf
from engine.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
    with_event_time,
)

WIDTH_10M = 600_000


@pytest.fixture(scope="module")
def tx_pdf():
    return make_transactions_pdf(n=4000, seed=7)


@pytest.fixture(scope="module")
def tx_df(spark, tx_pdf):
    df = spark.createDataFrame(tx_pdf)
    return with_event_time(df, epoch_ms_col="datetime", ts_col="ts")


def _normalize(pdf, label):
    cols = [
        "window_start_ms",
        "cc_num",
        f"num_trans_per_{label}",
        f"avg_amt_per_{label}",
        f"stdev_amt_per_{label}",
        f"min_amt_per_{label}",
        f"max_amt_per_{label}",
    ]
    return (
        pdf[cols]
        .sort_values(["window_start_ms", "cc_num"])
        .reset_index(drop=True)
        .astype({f"num_trans_per_{label}": np.int64})
    )


def _spark_to_ms(sdf):
    pdf = sdf.toPandas()
    pdf["window_start_ms"] = pdf["window_start"].astype("datetime64[ns]").astype(np.int64) // 1_000_000
    return pdf


@pytest.mark.parametrize("bug_mode", [True, False])
def test_tumbling_matches_oracle(spark, tx_pdf, tx_df, bug_mode):
    got = _spark_to_ms(
        tumbling_agg(tx_df, "ts", "cc_num", "amount", "10 minutes",
                     bug_compatible_stdev=bug_mode)
    )
    want = oracle.tumbling_oracle(
        tx_pdf, "datetime", "cc_num", "amount", WIDTH_10M, "10m",
        bug_compatible_stdev=bug_mode,
    )
    g, w = _normalize(got, "10m"), _normalize(want, "10m")
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(g, w, check_exact=False, rtol=1e-9)
    # single-element windows: stddev_samp is NaN in corrected mode — both sides
    # agree because pandas std(ddof=1) is also NaN.


def test_tumbling_epoch_alignment_and_bounds(spark):
    # A row exactly at a window end lands in the NEXT window ([start, end)).
    rows = pd.DataFrame(
        {
            "datetime": [0, WIDTH_10M - 1, WIDTH_10M, WIDTH_10M + 1],
            "cc_num": [1, 1, 1, 1],
            "amount": [1.0, 2.0, 3.0, 4.0],
        }
    )
    df = with_event_time(spark.createDataFrame(rows), "datetime", "ts")
    out = _spark_to_ms(tumbling_agg(df, "ts", "cc_num", "amount", "10 minutes"))
    out = out.sort_values("window_start_ms").reset_index(drop=True)
    assert out["window_start_ms"].tolist() == [0, WIDTH_10M]
    assert out["num_trans_per_10m"].tolist() == [2, 2]


def test_sliding_matches_oracle(spark, tx_pdf, tx_df):
    got = _spark_to_ms(
        sliding_agg(tx_df, "ts", "cc_num", "amount", "10 minutes", "5 minutes", label="10m")
    )
    want = oracle.sliding_oracle(
        tx_pdf, "datetime", "cc_num", "amount", WIDTH_10M, 300_000, "10m"
    )
    g, w = _normalize(got, "10m"), _normalize(want, "10m")
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(g, w, check_exact=False, rtol=1e-9)


def test_session_matches_oracle(spark):
    # Controlled gaps: sessions split at >= 30 s of silence per key.
    rows = pd.DataFrame(
        {
            "datetime": [0, 10_000, 25_000, 70_000, 99_999, 130_000,
                         0, 50_000],
            "cc_num": [1, 1, 1, 1, 1, 1, 2, 2],
            "amount": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
        }
    )
    df = with_event_time(spark.createDataFrame(rows), "datetime", "ts")
    got = _spark_to_ms(session_agg(df, "ts", "cc_num", "amount", "30 seconds"))
    want = oracle.session_oracle(rows, "datetime", "cc_num", "amount", 30_000)
    g = got.sort_values(["cc_num", "window_start_ms"]).reset_index(drop=True)
    w = want.sort_values(["cc_num", "window_start_ms"]).reset_index(drop=True)
    assert g["window_start_ms"].tolist() == w["window_start_ms"].tolist()
    assert g["num_trans_per_session"].tolist() == w["num_trans_per_session"].tolist()
    # session [min_ts, max_ts + gap)
    end_ms = g["window_end"].astype("datetime64[ns]").astype(np.int64) // 1_000_000
    assert end_ms.tolist() == w["window_end_ms"].tolist()


def test_multi_width(spark, tx_df, tx_pdf):
    from engine.windows import multi_width_aggs

    aggs = multi_width_aggs(tx_df, "ts", "cc_num", "amount")
    assert set(aggs) == {"10m", "1h", "12h"}
    n1h = aggs["1h"].count()
    want = oracle.tumbling_oracle(
        tx_pdf, "datetime", "cc_num", "amount", 3_600_000, "1h"
    )
    assert n1h == len(want)


def test_merge_associativity_property(tx_pdf):
    """add/merge associativity of the accumulator (§5.2 item 5): aggregating
    two halves then merging equals aggregating the whole."""
    label = "10m"
    full = oracle.tumbling_oracle(tx_pdf, "datetime", "cc_num", "amount", WIDTH_10M, label)
    h1 = tx_pdf.iloc[::2]
    h2 = tx_pdf.iloc[1::2]

    def partial(p):
        w = oracle.assign_tumbling(p["datetime"].to_numpy().astype(np.int64), WIDTH_10M)
        return p.assign(window_start_ms=w).groupby(["window_start_ms", "cc_num"])["amount"].agg(
            cnt="count", s="sum"
        )

    merged = partial(h1).add(partial(h2), fill_value=0.0).reset_index()
    merged["avg"] = merged["s"] / merged["cnt"]
    j = full.merge(merged, on=["window_start_ms", "cc_num"])
    assert len(j) == len(full) == len(merged)
    np.testing.assert_allclose(j[f"avg_amt_per_{label}"], j["avg"], rtol=1e-12)
    np.testing.assert_array_equal(j[f"num_trans_per_{label}"], j["cnt"].astype(np.int64))


def test_keyed_percentiles_hand_computed(spark):
    from engine.windows import keyed_percentiles

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 5)] + [("b", 10.0)],
        ["k", "v"],
    )
    got = {r.k: r for r in keyed_percentiles(df, "k", "v", probs=(0.5, 0.25)).collect()}
    # 1,2,3,4: p50 = 2.5 (linear midpoint), p25 = 1.75
    assert got["a"].n == 4 and got["a"].p50 == 2.5 and got["a"].p25 == 1.75
    # singleton group: every percentile is the value itself
    assert got["b"].n == 1 and got["b"].p50 == 10.0 and got["b"].p25 == 10.0


def test_keyed_percentiles_approx_rank_error_bound(spark):
    from pyspark.sql import functions as F

    from engine.windows import keyed_percentiles

    # 10k skewed values in one group; GK guarantee: rank error <= n/accuracy
    n, accuracy = 10_000, 100
    df = spark.range(n).select(
        F.lit("k").alias("k"), (F.col("id") * F.col("id")).cast("double").alias("v")
    )
    got = keyed_percentiles(df, "k", "v", probs=(0.5, 0.99), approx=True,
                            accuracy=accuracy).collect()[0]
    assert got.n == n
    for label, p in (("p50", 0.5), ("p99", 0.99)):
        v = got[label]
        # v is an actual sample; its rank must be within n/accuracy of target
        rank = int(round(v**0.5)) + 1  # values are id^2 -> rank = id + 1
        assert abs(rank - p * n) <= n / accuracy + 1, (label, v, rank)


def test_keyed_percentiles_label_scheme_and_validation(spark):
    import pytest

    from engine.windows import keyed_percentiles

    df = spark.createDataFrame([("a", float(v)) for v in range(1, 5)], ["k", "v"])
    # p=1.0 names cleanly as p100 (no dot in the identifier) and equals max
    got = keyed_percentiles(df, "k", "v", probs=(1.0, 0.05)).collect()[0]
    assert got.p100 == 4.0 and got.p05 == 1.15
    # probs the pNN scheme cannot name unambiguously are rejected
    with pytest.raises(ValueError):
        keyed_percentiles(df, "k", "v", probs=(0.125,))
    with pytest.raises(ValueError):
        keyed_percentiles(df, "k", "v", probs=(0.0,))
    with pytest.raises(ValueError):
        keyed_percentiles(df, "k", "v", probs=(1.5,))

"""Deterministic sampling + TF-IDF operator properties.

Covers engine/sampling.py (md5-threshold reproducible sampling) and
engine/text.py tfidf_top_terms: determinism under repartitioning, binomial
plausibility of the realized fraction, per-stratum rates, salt independence,
plan narrowness (no shuffle in the sample filter), and a hand-computed
TF-IDF vector on a tiny corpus.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from engine.sampling import (
    deterministic_sample,
    fraction_to_hex_threshold,
    stratified_sample,
)
from engine.text import tfidf_top_terms


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.concat(F.lit("doc_"), F.format_string("%05d", F.col("id"))).alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("lang"),
    )


def test_threshold_mapping():
    assert fraction_to_hex_threshold(0.0) == "00000000"
    assert fraction_to_hex_threshold(0.25) == "40000000"
    assert fraction_to_hex_threshold(0.5) == "80000000"
    assert fraction_to_hex_threshold(1.0) == "gggggggg"
    with pytest.raises(ValueError):
        fraction_to_hex_threshold(1.5)


def test_sample_fraction_and_determinism(spark):
    df = _docs(spark)
    s1 = deterministic_sample(df, 0.2, salt="s")
    # 4-sigma binomial bound around 400 of 2000.
    n = s1.count()
    assert abs(n - 400) < 4 * math.sqrt(2000 * 0.2 * 0.8)
    # Identical membership regardless of physical partitioning.
    s2 = deterministic_sample(df.repartition(13), 0.2, salt="s")
    assert sorted(r.doc_id for r in s1.collect()) == sorted(
        r.doc_id for r in s2.collect()
    )
    # Matches a driver-side python md5 re-derivation row for row.
    thr = fraction_to_hex_threshold(0.2)
    expect = sorted(
        f"doc_{i:05d}"
        for i in range(2000)
        if hashlib.md5(f"sdoc_{i:05d}".encode()).hexdigest()[:8] < thr
    )
    assert sorted(r.doc_id for r in s1.collect()) == expect


def test_salt_gives_independent_draws(spark):
    df = _docs(spark)
    a = {r.doc_id for r in deterministic_sample(df, 0.3, salt="a").collect()}
    b = {r.doc_id for r in deterministic_sample(df, 0.3, salt="b").collect()}
    # Independent 30% draws overlap ~9%; anything far from |a| means the salt
    # is actually changing the hash, and the intersection is plausible.
    assert a != b
    inter = len(a & b)
    assert abs(inter - 0.09 * 2000) < 4 * math.sqrt(2000 * 0.09 * 0.91) + 20


def test_fraction_one_keeps_everything(spark):
    df = _docs(spark, 100)
    assert deterministic_sample(df, 1.0).count() == 100
    out = stratified_sample(df, {"0": 1.0}, "lang", default_fraction=0.0)
    assert out.count() == 25
    assert {r.lang for r in out.collect()} == {"0"}


def test_stratified_rates(spark):
    df = _docs(spark, 4000)  # 1000 per lang
    out = stratified_sample(
        df, {"0": 0.5, "1": 0.25, "2": 0.125}, "lang", salt="t"
    )
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "3" not in got  # default_fraction=0
    for lang, frac in [("0", 0.5), ("1", 0.25), ("2", 0.125)]:
        assert abs(got[lang] - 1000 * frac) < 4 * math.sqrt(1000 * frac * (1 - frac))


def test_sample_plan_is_narrow(spark):
    df = _docs(spark)
    plan = deterministic_sample(df, 0.1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter: no shuffle


def test_tfidf_hand_computed(spark):
    rows = [
        ("d1", "apple banana apple"),
        ("d2", "banana cherry"),
        ("d3", "cherry durian cherry durian"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r.doc_id, r.term): (r.tf, r.dfreq, r.tfidf)
        for r in tfidf_top_terms(df, k=2).collect()
    }
    ln = math.log
    # apple: tf 2 in d1, df 1 -> 2*ln(3)
    assert out[("d1", "apple")] == (2, 1, round(2 * ln(3.0), 6))
    # banana appears in 2 docs -> ln(3/2)
    assert out[("d1", "banana")] == (1, 2, round(ln(1.5), 6))
    assert out[("d3", "cherry")] == (2, 2, round(2 * ln(1.5), 6))
    assert out[("d3", "durian")] == (2, 1, round(2 * ln(3.0), 6))
    # k=2 cap respected
    assert len([k for k in out if k[0] == "d3"]) == 2


def test_tfidf_tie_break_and_k(spark):
    # Four equal-score terms; tie-break must be term-ascending.
    df = spark.createDataFrame(
        [("d1", "w x y z"), ("d2", "q r s t")], ["doc_id", "text"]
    )
    got = [
        r.term
        for r in tfidf_top_terms(df, k=3)
        .filter(F.col("doc_id") == "d1")
        .orderBy("rn")
        .collect()
    ]
    assert got == ["w", "x", "y"]


def test_pack_sequences_matches_naive_prefix_sum(spark):
    import hashlib as _h

    from engine.sampling import pack_sequences

    rows = [(f"doc_{i:04d}", "w " * (i % 37 + 1)) for i in range(800)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(11)
    got = {r.doc_id: (r.n_tokens, r.cum_start, r.bin)
           for r in pack_sequences(df, 64, salt="s").collect()}
    # Driver-side naive recomputation: global md5 order, running sum.
    toks = {d: len(t.split(" ")) for d, t in rows}
    order = sorted(toks, key=lambda d: _h.md5(f"s{d}".encode()).hexdigest())
    cum = 0
    for d in order:
        assert got[d] == (toks[d], cum, cum // 64), d
        cum += toks[d]
    assert len(got) == 800


def test_pack_sequences_bins_are_contiguous_and_bounded(spark):
    from engine.sampling import pack_sequences

    df = spark.createDataFrame(
        [(f"d{i}", "x " * 10) for i in range(500)], ["doc_id", "text"]
    )
    out = pack_sequences(df, 128).collect()
    by_bin = {}
    for r in out:
        by_bin.setdefault(r.bin, []).append(r)
    bins = sorted(by_bin)
    assert bins == list(range(len(bins)))  # no gaps
    for b in bins:
        starts = [r.cum_start for r in by_bin[b]]
        # every doc STARTS inside its bin's budget range
        assert all(b * 128 <= s < (b + 1) * 128 for s in starts)


def test_pack_sequences_token_col_and_validation(spark):
    import pytest as _pt

    from engine.sampling import pack_sequences

    df = spark.createDataFrame([("a", 5), ("b", 7)], ["doc_id", "n_tok"])
    out = pack_sequences(df, 8, token_col="n_tok").collect()
    assert sorted(r.n_tokens for r in out) == [5, 7]
    assert sum(r.cum_start == 0 for r in out) == 1
    with _pt.raises(ValueError):
        pack_sequences(df, 0, token_col="n_tok")


def test_chunk_documents_hand_computed(spark):
    from engine.text import chunk_documents

    text = " ".join(str(i) for i in range(10))  # tokens "0".."9"
    df = spark.createDataFrame([("d", text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r.chunk_idx,
    )
    # step=2 -> starts 1,3,5,7,9
    assert [r.start_token for r in rows] == [1, 3, 5, 7, 9]
    assert rows[0].chunk_text == "0 1 2 3"
    assert rows[1].chunk_text == "2 3 4 5"
    assert rows[-1].chunk_text == "8 9"  # clipped tail
    assert rows[-1].n_chunk_tokens == 2
    # consecutive chunks share exactly `overlap` tokens
    for a, b in zip(rows, rows[1:]):
        assert a.chunk_text.split(" ")[-2:] == b.chunk_text.split(" ")[:2]


def test_chunk_documents_covers_every_token_and_validates(spark):
    import pytest as _pt

    from engine.text import chunk_documents

    df = spark.createDataFrame(
        [(f"d{n}", " ".join("t%d" % i for i in range(n))) for n in (1, 5, 63, 64, 65, 200)],
        ["doc_id", "text"],
    )
    out = chunk_documents(df, 64, 16).collect()
    covered = {}
    for r in out:
        covered.setdefault(r.doc_id, set()).update(
            range(r.start_token, r.start_token + r.n_chunk_tokens)
        )
    for n in (5, 63, 64, 65, 200):
        assert covered[f"d{n}"] == set(range(1, n + 1)), n
    with _pt.raises(ValueError):
        chunk_documents(df, 0)
    with _pt.raises(ValueError):
        chunk_documents(df, 64, overlap=64)


def test_random_projection_preserves_distances(spark):
    import numpy as np

    from engine.similarity import projection_matrix, random_projection

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 64)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    out = random_projection(df, out_dim=16, dim=64, seed=7).collect()
    proj = {r.vec_id: np.array(r.proj) for r in out}
    assert all(p.shape == (16,) for p in proj.values())
    # JL: relative pairwise-distance distortion concentrated ~1/sqrt(16);
    # assert a generous envelope over all pairs.
    ratios = []
    for i in range(40):
        for j in range(i + 1, 40):
            d0 = np.linalg.norm(vecs[i].astype(np.float64) - vecs[j])
            d1 = np.linalg.norm(proj[i] - proj[j])
            ratios.append(d1 / d0)
    assert 0.4 < min(ratios) and max(ratios) < 1.8, (min(ratios), max(ratios))
    # Median distortion should be near 1 (unbiased projection).
    assert abs(float(np.median(ratios)) - 1.0) < 0.15
    # Deterministic: same seed -> same matrix -> same outputs on rerun.
    again = {r.vec_id: np.array(r.proj)
             for r in random_projection(df.repartition(7), 16, 64, seed=7).collect()}
    assert all(np.array_equal(proj[i], again[i]) for i in proj)
    # Seeded matrix is reproducible and scaled.
    W = projection_matrix(64, 16, 7)
    assert np.array_equal(W, projection_matrix(64, 16, 7))
    assert abs(float(np.std(W)) * np.sqrt(16) - 1.0) < 0.1


def test_corpus_pipeline_plans_single_exchange(spark):
    """The composed conditioning chain must cost exactly its one necessary
    shuffle (the fp-keyed dedup window); everything else stays narrow."""
    import re

    import __spark_entry__ as em

    df = em.queries()["corpus_pipeline"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange", plan)) == 1, plan


def test_fixed_size_sample_exact_n_and_stable(spark):
    from engine.sampling import fixed_size_sample

    df = _docs(spark, 1000)
    a = fixed_size_sample(df, 64, salt="f").collect()
    assert len(a) == 64
    b = fixed_size_sample(df.repartition(17), 64, salt="f").collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
    # membership = lowest-64 md5, python-recomputed
    import hashlib as _h

    expect = sorted(
        (f"doc_{i:05d}" for i in range(1000)),
        key=lambda d: _h.md5(f"f{d}".encode()).hexdigest()[:8],
    )[:64]
    assert sorted(r.doc_id for r in a) == sorted(expect)
    # n larger than table -> whole table; n=0 -> empty; negative raises
    assert fixed_size_sample(df, 5000).count() == 1000
    assert fixed_size_sample(df, 0).count() == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        fixed_size_sample(df, -1)
    # scale shape: per-partition top-n + merge, not a full sort shuffle
    plan = (
        fixed_size_sample(df, 64)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_build_vocab_counts_and_rank(spark):
    from engine.text import build_vocab

    df = spark.createDataFrame(
        [("d1", "b b a c"), ("d2", "a b x")], ["doc_id", "text"]
    )
    rows = {r.term: (r["count"], r.rank) for r in build_vocab(df).collect()}
    # b:3 a:2 c:1 x:1 -> ties rank by term asc
    assert rows == {"b": (3, 1), "a": (2, 2), "c": (1, 3), "x": (1, 4)}
    assert {r.term for r in build_vocab(df, min_count=2).collect()} == {"a", "b"}


def test_bigram_collocations_hand_computed(spark):
    import math

    from engine.text import bigram_collocations

    # "a b" appears 3x, tokens: a=3, b=3, x=2; bigrams total = 5
    df = spark.createDataFrame(
        [("d1", "a b x a b"), ("d2", "a b x")], ["doc_id", "text"]
    )
    rows = {(r.w1, r.w2): (r.c_xy, r.pmi)
            for r in bigram_collocations(df, min_count=2).collect()}
    n_uni, n_bi = 8, 6  # d1: 5 tokens/4 bigrams, d2: 3 tokens/2 bigrams
    exp = round(math.log((3 * n_uni * n_uni) / (n_bi * 3 * 3)), 6)
    assert rows[("a", "b")] == (3, exp)
    assert ("b", "x") in rows and rows[("b", "x")][0] == 2
    # bigrams never span documents
    assert ("x", "a") not in rows or rows[("x", "a")][0] < 2


def test_tokenize_with_vocab_ids_and_oov(spark):
    from engine.text import build_vocab, tokenize_with_vocab

    df = spark.createDataFrame(
        [("d1", "b b a c"), ("d2", "a b x")], ["doc_id", "text"]
    )
    vocab = build_vocab(df, min_count=2)  # b->1, a->2; c,x OOV
    rows = sorted(
        tokenize_with_vocab(df, vocab).collect(),
        key=lambda r: (r.doc_id, r.pos),
    )
    seq = {d: [r.term_id for r in rows if r.doc_id == d] for d in ("d1", "d2")}
    assert seq["d1"] == [1, 1, 2, -1]
    assert seq["d2"] == [2, 1, -1]
    # positions are dense from 0 per doc
    assert [r.pos for r in rows if r.doc_id == "d1"] == [0, 1, 2, 3]


def test_build_vocab_two_phase_rank_parity_and_plan(spark):
    """The bucketed rank must be bit-identical to the naive global
    row_number AND leave no unpartitioned row_number window over the term
    table in the plan (the 100x-scale hazard: a one-executor vocab sort)."""
    import re

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from engine.text import build_vocab

    rng_words = [
        f"w{i % 97:02d}" for i in range(4000)
    ]  # heavy tie structure: 97 terms, many equal counts
    docs = [
        (f"d{i}", " ".join(rng_words[i * 40 : (i + 1) * 40]))
        for i in range(100)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = build_vocab(df).toPandas().sort_values("rank").reset_index(drop=True)

    # naive twin: global window over the aggregated term table
    tok = df.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term")
    ).filter(F.col("term") != "")
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("count"))
    naive = (
        counts.withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("count"), F.asc("term")))
        )
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert got["term"].tolist() == naive["term"].tolist()
    assert got["rank"].tolist() == naive["rank"].tolist()

    # plan gate: every row_number window carries a partition spec (three
    # bracket groups: [functions], [partition], [order]); the only
    # unpartitioned window is the running SUM over distinct count values
    plan = build_vocab(df)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "row_number()" in line:
            m = re.findall(r"\[[^\]]*\]", line)
            assert len(m) >= 3, f"unpartitioned row_number window:\n{line}"

    # top_v cap: plans as TakeOrderedAndProject and keeps the best v terms
    capped = build_vocab(df, top_v=10)
    cp = capped._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in cp, cp
    cpdf = capped.toPandas().sort_values("rank")
    assert cpdf["term"].tolist() == naive["term"].tolist()[:10]
    import pytest

    with pytest.raises(ValueError):
        build_vocab(df, top_v=0)

"""Text analysis operators over document tables (training-data pipeline ops).

The reference ships payload values through untouched (no scalar expression
library of its own — SURVEY.md §2.8), so these operators are the
training-data-pipeline extensions the graft calls for: language ID, quality
scoring, token counting, document fingerprinting. Everything here is built
from JVM-side ``pyspark.sql.functions`` (whole-stage codegen, no Python in the
hot path) and has an exact ANSI-SQL twin used as the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword-hit heuristic.
# Deterministic and SQL-expressible; real language ID would plug a model into
# the same column contract.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "que", "de"],
    "fr": ["le", "la", "et", "les"],
    "de": ["der", "die", "und", "das"],
}

_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def _count_word(col: Column, word: str) -> Column:
    """Whole-word occurrence count, JVM-side regexp."""
    return F.regexp_count(col, F.lit(rf"\b{word}\b"))


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokenization + a BPE-ish subword estimate.

    ``n_tokens``: whitespace split count. ``n_subwords``: count of
    letter-runs/digit-runs/punctuation (a cheap regex proxy for BPE piece
    count). Both as pure SQL expressions.
    """
    return df.withColumns(
        {
            "n_tokens": F.size(F.split(F.col(text_col), " ")),
            "n_chars": F.length(F.col(text_col)),
            "n_subwords": F.regexp_count(
                F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
            ),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristics: length, mean word length, stopword
    ratio, alpha ratio, and a composite score in [0, 1]."""
    text = F.col(text_col)
    n_tokens = F.size(F.split(text, " "))
    n_chars = F.length(text)
    stop_hits = None
    for w in _STOPWORDS:
        c = _count_word(text, w)
        stop_hits = c if stop_hits is None else (stop_hits + c)
    alpha_chars = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    mean_word_len = (n_chars - (n_tokens - F.lit(1))) / n_tokens
    stop_ratio = stop_hits / n_tokens
    alpha_ratio = alpha_chars / n_chars
    score = F.round(
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.3
        + alpha_ratio * 0.3,
        6,
    )
    return df.withColumns(
        {
            "n_tokens": n_tokens,
            "mean_word_len": F.round(mean_word_len, 6),
            "stop_ratio": F.round(stop_ratio, 6),
            "alpha_ratio": F.round(alpha_ratio, 6),
            "quality": score,
        }
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-stopword language ID with deterministic ties (highest count,
    then lexicographic language code)."""
    text = F.col(text_col)
    scores = {
        lang: sum(
            (_count_word(text, w) for w in words[1:]), _count_word(text, words[0])
        )
        for lang, words in LANG_MARKERS.items()
    }
    df2 = df.withColumns({f"_s_{lang}": c for lang, c in scores.items()})
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in LANG_MARKERS])
    pred = F.lit("und")
    # reversed lexicographic fold → first lexicographic language wins ties
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when((F.col(f"_s_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    out = df2.withColumn("pred_lang", pred)
    return out.drop(*[f"_s_{lang}" for lang in LANG_MARKERS])


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized, lowercased text.
    (A content-defined rolling hash reduces to this for whole-doc identity.)"""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn("fp", F.md5(norm))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    w: int = 16,
    out_col: str = "sketch",
) -> DataFrame:
    """Winnowing document sketch (the rolling-hash fingerprint proper):
    polynomial rolling hash over character ``k``-grams, then the minimum hash
    of every ``w``-gram window (rightmost-min tie-break) — the standard
    near-duplicate / plagiarism sketch (Schleimer et al., SIGMOD'03 scheme).

    Vectorized per document with numpy inside ``mapInPandas`` (per-character
    work is genuinely un-expressible in codegen'd built-ins; array
    higher-order functions execute interpreted and are far slower).  Output:
    ``out_col: array<long>`` of distinct selected hashes — two documents
    sharing a substring of length ≥ ``w + k - 1`` are guaranteed to share a
    sketch value.
    """
    import numpy as np
    import pandas as pd

    B = np.int64(1_000_003)          # base (wraps mod 2^64 intentionally)
    BK = B ** np.int64(k - 1)        # B^(k-1) with int64 wraparound

    def sketch_one(text: str) -> list[int]:
        b = np.frombuffer(text.lower().encode("utf-8", "ignore"), dtype=np.uint8)
        b = b.astype(np.int64)
        n = b.size
        if n < k:
            return [int((b * B).sum())] if n else []
        with np.errstate(over="ignore"):
            # rolling polynomial hash of every k-gram, fully vectorized:
            # h[i] = sum_{j<k} b[i+j] * B^(k-1-j)   (int64 wraparound arithmetic)
            powers = B ** np.arange(k - 1, -1, -1, dtype=np.int64)
            grams = np.lib.stride_tricks.sliding_window_view(b, k)
            h = (grams * powers).sum(axis=1)
        if h.size <= w:
            return sorted(set(int(x) for x in [h.min()]))
        wins = np.lib.stride_tricks.sliding_window_view(h, w)
        # rightmost minimum per window
        rev_arg = w - 1 - np.argmin(wins[:, ::-1], axis=1)
        sel = wins[np.arange(len(wins)), rev_arg]
        return sorted(set(int(x) for x in sel))

    passthrough = list(df.columns)
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<long>"

    def op(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [sketch_one(t or "") for t in pdf[text_col]]
            yield pdf[passthrough + [out_col]]

    return df.mapInPandas(op, schema=schema)


def winnow_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 16,
    min_shared: int = 2,
) -> DataFrame:
    """Near-dup candidate pairs by shared winnowing sketch hashes: explode the
    sketch, bucket-join on the hash (never a cross join), keep pairs sharing
    ≥ ``min_shared`` selected hashes."""
    sk = winnow_fingerprints(df.select(id_col, text_col), text_col, k, w)
    ex = sk.select(F.col(id_col).alias("id"), F.explode("sketch").alias("h"))
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_hashes"))
        .filter(F.col("shared_hashes") >= min_shared)
    )


def frequent_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_doc_freq: int = 5,
) -> DataFrame:
    """Corpus-frequent word n-grams — boilerplate candidates (headers,
    footers, license blurbs) in a training corpus. One shuffle: distinct
    per-doc shingles (engine.dedup.shingles, codegen) → groupBy(shingle)
    count. Returns (shingle, doc_freq) with ``doc_freq >= min_doc_freq``."""
    from engine.dedup import shingles

    return (
        shingles(df, id_col, text_col, n)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_doc_freq)
    )


def boilerplate_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_doc_freq: int = 5,
) -> DataFrame:
    """Per-document boilerplate share: the fraction of a doc's distinct word
    n-grams whose corpus document-frequency reaches ``min_doc_freq`` — a
    standard quality signal for filtering template-heavy pages out of LLM
    training data. Plan: one shingle pass reused for both the doc-frequency
    aggregate and the per-doc rollup (two shuffles total, both keyed,
    map-side combined); no all-pairs stage anywhere."""
    from engine.dedup import shingles

    sh = shingles(df, id_col, text_col, n)
    freq = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_doc_freq)
        .select("shingle", F.lit(1).alias("_hot"))
    )
    return (
        sh.join(freq, "shingle", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hot"), F.lit(0))).alias("n_frequent"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            "n_frequent",
            F.round(F.col("n_frequent") / F.col("n_shingles"), 6).alias(
                "boilerplate_ratio"
            ),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    Tokenizes to lowercase alpha runs (engine-agnostic ``[^a-z]+`` split),
    computes tf per (doc, term) and document frequency per term, scores
    ``tf * ln(N / df)`` and keeps the ``k`` best per doc (score desc, term
    asc tie-break). Score is rounded to 6 dp *before* ranking so the
    ordering — not just the output — is identical across engines.

    Scale notes: two shuffles (tf groupBy and the df-side groupBy feeding a
    term-keyed join) plus one per-doc window; token rows carry only
    (id, term), never the document body. N is resolved once via a
    metadata-cheap ``count()`` rather than a 1-row broadcast cross join,
    keeping the plan free of nested-loop joins.
    """
    n_docs = df.count()
    tok = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    scored = (
        tf.join(dfreq, "term")
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("dfreq")), 6),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", "tf", "dfreq", "tfidf", "rn")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping fixed-token windows (RAG/embedding prep).

    Whitespace tokens (same definition as :func:`token_count`); chunk ``i``
    covers tokens ``[1 + i*step, 1 + i*step + chunk_tokens)`` with
    ``step = chunk_tokens - overlap``, so consecutive chunks share
    ``overlap`` tokens; the final chunk is clipped at the document end.
    Output: ``id_col, chunk_idx, start_token, n_chunk_tokens, chunk_text``.

    Scale notes: pure narrow plan — split / sequence / explode / slice are
    all codegen'd JVM expressions, no Python, no shuffle; output rows carry
    ~``1/(1-overlap/chunk_tokens)``× the corpus bytes (the overlap factor),
    which is the algorithm's floor.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap} vs {chunk_tokens}"
        )
    step = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    return (
        df.select(
            F.col(id_col),
            toks.alias("_toks"),
            F.explode(
                F.sequence(F.lit(1), F.size(toks), F.lit(step))
            ).alias("start_token"),
        )
        .select(
            id_col,
            F.floor((F.col("start_token") - 1) / step).cast("long").alias("chunk_idx"),
            F.col("start_token").cast("long"),
            F.slice(F.col("_toks"), F.col("start_token"), chunk_tokens).alias("_c"),
        )
        .select(
            id_col,
            "chunk_idx",
            "start_token",
            F.size("_c").cast("long").alias("n_chunk_tokens"),
            F.array_join("_c", " ").alias("chunk_text"),
        )
    )


def build_vocab(
    df: DataFrame,
    min_count: int = 1,
    text_col: str = "text",
    top_v: int | None = None,
) -> DataFrame:
    """Corpus vocabulary: term -> total count + rank.

    Tokenizes to lowercase alpha runs (the :func:`tfidf_top_terms`
    definition), keeps terms with total count >= ``min_count`` (and, when
    ``top_v`` is given, only the ``top_v`` best terms — the usual
    fixed-size-vocabulary cap), ranks by (count desc, term asc) — the id
    assignment step of tokenizer/vocab construction.

    Scale notes (100 TB): a web-scale vocabulary is 10^6-10^8 terms, so a
    single unpartitioned ``row_number`` window over the term table would be
    a one-executor sort. Instead the rank runs as a two-phase bucket rank
    (the :func:`engine.sampling.pack_sequences` prefix-sum pattern applied
    to ordering): terms are bucketed by ``(count, first two chars)`` — a
    prefix of the global sort key ``(count desc, term asc)``, so per-bucket
    order + bucket order == global order — ranked within their bucket, and
    offset by broadcast running bucket totals. The only unpartitioned
    window left runs over the *distinct count values* (inherently small:
    integer counts concentrate under a heavy tail), and every partitioned
    window sees at most one (count, prefix) group. ``top_v`` additionally
    pre-caps via orderBy+limit, which plans as TakeOrderedAndProject
    (per-partition top-N + single merge, no full sort).
    """
    tok = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("term")
        )
        .filter(F.col("term") != "")
    )
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("count")).filter(
        F.col("count") >= min_count
    )
    if top_v is not None:
        if top_v <= 0:
            raise ValueError(f"top_v must be positive, got {top_v}")
        counts = counts.orderBy(F.desc("count"), F.asc("term")).limit(top_v)
    from pyspark.sql import Window

    b = counts.withColumn("_pfx", F.substring("term", 1, 2))
    bt = b.groupBy("count", "_pfx").agg(F.count(F.lit(1)).alias("_nbp"))
    # per-count block totals + running offset over count DESC — the one
    # unpartitioned window, over distinct count values only
    ct = bt.groupBy("count").agg(F.sum("_nbp").alias("_nc"))
    w_c = Window.orderBy(F.desc("count")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ct = ct.withColumn("_coff", F.coalesce(F.sum("_nc").over(w_c), F.lit(0)))
    # prefix offset within each count block (<= 26^2+ buckets per count)
    w_p = Window.partitionBy("count").orderBy("_pfx").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bt = bt.withColumn("_poff", F.coalesce(F.sum("_nbp").over(w_p), F.lit(0)))
    offsets = bt.join(F.broadcast(ct), "count").select(
        "count", "_pfx", (F.col("_coff") + F.col("_poff")).alias("_base")
    )
    w_in = Window.partitionBy("count", "_pfx").orderBy(F.asc("term"))
    return (
        b.join(F.broadcast(offsets), ["count", "_pfx"])
        .withColumn("rank", (F.col("_base") + F.row_number().over(w_in)))
        .select("term", "count", "rank")
    )


def bigram_collocations(
    df: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """PMI-scored bigram collocations (phrase mining).

    Adjacent lowercase-alpha token pairs with total count >= ``min_count``,
    scored ``pmi = ln(P(xy) / (P(x)P(y)))`` using corpus-wide unigram and
    bigram totals. Output: ``w1, w2, c_xy, pmi`` (rounded 6 dp; the
    arithmetic is ordered identically to the SQL oracle so the doubles —
    not just the rounded values — agree).

    Scale notes: bigrams come from one codegen'd ``arrays_zip`` of two
    shifted slices (no self-join of the token stream); two keyed
    aggregates (bigram, unigram) and two term-keyed joins of the bigram
    table against the (much smaller) unigram table. The two corpus totals
    are metadata-cheap ``count()`` actions, keeping 1-row cross joins out
    of the plan.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda x: x != ""
    )
    base = df.select(toks.alias("_t"))
    tok = base.select(F.explode("_t").alias("term"))
    n_uni = tok.count()
    pairs = base.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))),
            )
        ).alias("b")
    ).select(F.col("b.0").alias("w1"), F.col("b.1").alias("w2"))
    n_bi = pairs.count()
    uni = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    bi = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    return (
        bi.join(uni.select(F.col("term").alias("w1"), F.col("c").alias("c_x")), "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("c").alias("c_y")), "w2")
        .select(
            "w1",
            "w2",
            "c_xy",
            F.round(
                F.log(
                    (F.col("c_xy") * F.lit(float(n_uni)) * F.lit(float(n_uni)))
                    / (F.lit(float(n_bi)) * F.col("c_x") * F.col("c_y"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def tokenize_with_vocab(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = -1,
) -> DataFrame:
    """Apply a vocabulary to the corpus: one row per token position with its
    assigned term id (``vocab``'s ``rank`` column) — the id-mapping step
    that turns text into training-ready integer sequences. Out-of-vocabulary
    tokens get ``oov_id``. Output: ``id_col, pos, term_id``.

    Scale notes: posexplode carries only (id, pos, term); the vocabulary is
    broadcast (even a 10^6-term vocab is tens of MB) so the id join adds no
    shuffle — the whole plan is scan → explode → broadcast-join.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda x: x != ""
    )
    tok = df.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "term")
    )
    ids = vocab.select("term", F.col("rank").alias("term_id"))
    return (
        tok.join(F.broadcast(ids), "term", "left")
        .select(
            id_col,
            F.col("pos").cast("long").alias("pos"),
            F.coalesce(F.col("term_id"), F.lit(oov_id)).cast("long").alias("term_id"),
        )
    )

"""Text analysis operators over the documents table.

Language-ID, quality scoring, token counting, and fingerprinting — all as
built-in column expressions (split / higher-order functions / hash), zero
Python UDFs, so the hot path stays inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from neo4j_database_spark.catalog import load_table

# Tiny English function-word list for the stopword-ratio heuristic.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def _tokens(col: F.Column) -> F.Column:
    """Whitespace tokenization, empty tokens dropped; null text behaves
    as an empty document (coalesce, so counts are 0 not NULL)."""
    return F.filter(F.split(F.coalesce(col, F.lit("")), r"\s+"), lambda t: t != "")


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts + quality signals.

    quality features: token count, distinct-token ratio (repetitiveness),
    stopword ratio, mean token length — the standard cheap pre-filters of
    a training-data pipeline.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    total_chars = F.length(F.concat_ws("", toks))
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        n_stop.alias("n_stopwords"),
        total_chars.alias("n_token_chars"),
        F.length("text").alias("n_chars_actual"),
    ).orderBy("doc_id")


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based quality bucket per document.

    Deterministic integer scoring (no float thresholds → oracle-exact):
    +1 if 50 ≤ n_tokens ≤ 10000, +1 if distinct ratio ≥ 1/4 (4*distinct ≥
    tokens), +1 if at least one stopword per 25 tokens.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    score = (
        F.when((n_tokens >= 50) & (n_tokens <= 10000), 1).otherwise(0)
        + F.when(n_distinct * 4 >= n_tokens, 1).otherwise(0)
        + F.when(n_stop * 25 >= n_tokens, 1).otherwise(0)
    )
    return docs.select(
        "doc_id", score.alias("quality_score")
    ).orderBy("doc_id")


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: English function-word hit rate.

    (A real pipeline swaps in a fastText-style model via mapInPandas; the
    Spark-side shape — per-doc score → argmax label — is identical.)
    Integer-ratio decision rule keeps it oracle-exact: predict 'en' iff
    stopword_hits * 20 >= n_tokens.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    pred = F.when(n_stop * 20 >= n_tokens, F.lit("en")).otherwise(F.lit("unknown"))
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
    ).orderBy("doc_id")


def regex_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization: split on non-alphanumeric runs.

    The classic pre-tokenizer shape (lowercase → alnum runs); counts are
    comparable with the whitespace tokenizer in token_stats to flag
    punctuation-heavy documents.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
    )
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length(F.concat_ws("", toks)).alias("n_alnum_chars"),
    ).orderBy("doc_id")


def winnow_fingerprints(
    spark: SparkSession, sf_dir: str, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (local-minimum hash selection).

    Standard winnowing: hash every k-gram shingle, slide a ``window`` over
    consecutive shingle hashes, keep each window's minimum — the selected
    set is position-robust (the rolling-hash fingerprint family). Output
    is the per-document fingerprint profile (count + extremes), compact
    enough to compare corpora-scale.

    One shuffle (doc_id window sort) + one aggregation; the shingle hash
    is md5 (oracle-comparable; production swaps xxhash64).
    """
    from pyspark.sql.window import Window as W

    from neo4j_database_spark.pipeline.dedup import positional_shingles

    docs = load_table(spark, "documents", sf_dir)
    sh = positional_shingles(docs).withColumn("h", F.md5(F.col("shingle")))
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    selected = (
        sh.withColumn("win_min", F.min("h").over(w))
        .select("doc_id", F.col("win_min").alias("fp"))
        .distinct()
    )
    return (
        selected.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
        .orderBy("doc_id")
    )


def top_distinctive_terms(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Per-document top-k distinctive terms: TF-IDF-family scoring with
    score = tf / df (term frequency over corpus document frequency).

    The tf/df ratio ranks like tf·idf for a fixed corpus size but keeps
    ordering integer-exact across engines (double division of identical
    ints; ties broken by term) — a log-based idf would depend on libm
    rounding. Plan: explode → per-(doc,term) counts → df join →
    per-doc row_number top-k. Two shuffles, both keyed on term/doc.
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, "documents", sf_dir)
    toks = _tokens(F.col("text"))
    term_rows = docs.select("doc_id", F.explode(toks).alias("term"))
    tf = term_rows.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        term_rows.distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = tf.join(df_, "term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df").cast("double")
    )
    w = W.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", F.col("rn").alias("rank"), "term", "tf", "df")
        .orderBy("doc_id", "rank")
    )


def clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning: exact-dedup survivors ∩ quality gate
    ∩ language gate — the composed filter chain every training-data
    pipeline runs first. One plan: digest-groupBy for survivorship,
    token stats reused for both gates, semi-join composition.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    scored = docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("digest"),
        (
            F.when((n_tokens >= 50) & (n_tokens <= 10000), 1).otherwise(0)
            + F.when(n_distinct * 4 >= n_tokens, 1).otherwise(0)
            + F.when(n_stop * 25 >= n_tokens, 1).otherwise(0)
        ).alias("quality"),
        F.when(n_stop * 20 >= n_tokens, F.lit("en"))
        .otherwise(F.lit("unknown"))
        .alias("pred_lang"),
    )
    survivors = scored.groupBy("digest").agg(F.min("doc_id").alias("doc_id"))
    return (
        scored.join(survivors.select("doc_id"), "doc_id", "left_semi")
        .filter((F.col("quality") >= 2) & (F.col("pred_lang") == "en"))
        .select("doc_id", "quality")
        .orderBy("doc_id")
    )


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprints: full-text md5 + a normalized
    "shape" fingerprint (lowercased, whitespace-collapsed) that catches
    trivial reformat near-dups."""
    docs = load_table(spark, "documents", sf_dir)
    norm = F.concat_ws(" ", _tokens(F.lower(F.col("text"))))
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("fp_exact"),
        F.md5(norm).alias("fp_normalized"),
    ).orderBy("doc_id")


def train_test_split_counts(spark, sf_dir: str):
    """Deterministic hash-based train/val/test split of the document
    corpus (90/5/5 by md5 of the document id).

    The split is a pure function of the stable id — reproducible across
    runs, engines, cluster sizes, and data layout (unlike randomSplit,
    which is seed + partitioning dependent). This is how large training
    corpora are split in practice: adding documents never reshuffles
    existing assignments. md5 is used (not xxhash64) because every
    engine agrees on it, making the split itself oracle-checkable.
    Returns per-split counts + length sums as the audit view.
    """
    from pyspark.sql import functions as F

    from neo4j_database_spark.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    # First 4 hex digits of md5(id): fixed-length lowercase hex compares
    # lexicographically exactly like its numeric value, so the split
    # thresholds are plain string comparisons — no base conversion, and
    # bit-identical in any engine with md5(). 0.90*65536=58982=0xe666,
    # 0.95*65536=62259=0xf333.
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = (
        F.when(bucket < "e666", F.lit("train"))
        .when(bucket < "f333", F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), F.length("text").alias("len"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("len").alias("sum_len"),
        )
        .orderBy("split")
    )


def byte_entropy_col():
    """Vectorized scalar ``@pandas_udf``: Shannon byte-entropy of a text
    column (bits/byte) — the standard cheap gibberish/compression gate
    in corpus quality filtering.

    The one scalar kernel in this engine that genuinely needs Python:
    a 256-bin histogram + entropy per value has no built-in expression.
    Arrow-batched (pandas Series in/out), so the Python boundary costs
    one transfer per batch, not per row. Float output → test-checked
    (not oracle-hashed; libm log2 is not cross-engine exact).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them module-wide and PySpark's hint resolver then rejects the
    # signature — the explicit PandasUDFType path is hint-free
    @pandas_udf("double")
    def entropy(s):
        out = np.zeros(len(s))
        for i, v in enumerate(s):
            if v:
                counts = np.bincount(
                    np.frombuffer(v.encode("utf-8", "ignore"), dtype=np.uint8),
                    minlength=256,
                )
                p = counts[counts > 0] / counts.sum()
                out[i] = float(-(p * np.log2(p)).sum())
        return pd.Series(out)

    return entropy


def pack_sequences(
    spark: SparkSession,
    sf_dir: str,
    capacity: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """LLM sequence packing (concat-then-chunk): assign documents to
    fixed-token-budget training chunks.

    The standard packing recipe for pretraining data: concatenate
    documents in a deterministic order and split the token stream every
    ``capacity`` tokens — a document lands in the chunk where its first
    token falls (chunk = floor(tokens_before / capacity)). Packing runs
    independently per shard (``doc_id % n_shards``), which is exactly
    how a 100 TB pipeline does it: each shard is one writer's stream,
    the per-shard window sort never sees more than 1/n_shards of the
    corpus, and adding shards scales out with zero coordination. Output
    is one row per (shard, chunk) with occupancy stats — the packing
    efficiency report every training-data pipeline needs.

    Integer-exact (token counts + floor division) → exact SQL oracle.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    chunked = toks.withColumn(
        "chunk_id", F.floor(before / F.lit(capacity)).cast("long")
    )
    return (
        chunked.groupBy("shard", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard", "chunk_id")
    )


def chunk_documents(
    spark: SparkSession,
    sf_dir: str,
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Sliding-window document chunking: split each document into
    ~``chunk_tokens``-token windows overlapping by ``overlap`` tokens —
    the text splitter feeding RAG indexes and long-document pretraining.

    Chunk starts are 1, 1+stride, 1+2·stride, … (stride = chunk_tokens −
    overlap) up to n_tokens − overlap, so every token is covered and
    consecutive chunks share exactly ``overlap`` tokens (the final chunk
    is shorter). Pure higher-order array functions — sequence → explode →
    slice — so chunking runs inside codegen with zero Python; one narrow
    map stage, no shuffle at all (the parallelism is the input
    partitioning, which is why this scales to any corpus size).

    Integer positions + deterministic text reassembly → exact SQL oracle.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("t")).withColumn(
        "n", F.size("t")
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.col("n") - overlap, F.lit(1)), F.lit(stride)
    )
    exploded = toks.filter(F.col("n") >= 1).select(
        "doc_id", "t", "n", F.explode(starts).alias("start")
    )
    chunk = F.slice(F.col("t"), F.col("start"), chunk_tokens)
    return exploded.select(
        "doc_id",
        ((F.col("start") - 1) / stride).cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_digest"),
    ).orderBy("doc_id", "chunk_idx")


def repetition_stats(
    spark: SparkSession, sf_dir: str, width: int = 3
) -> DataFrame:
    """Intra-document repetition profile: how much of a document is
    repeated word n-grams — the standard filter for boilerplate, chat
    logs, and degenerate generations (the Gopher/MassiveText
    "repetition" rules). A document whose trigrams are mostly
    duplicates of each other is near-certainly low-value training text.

    Per document over positional (multiplicity-preserving) ``width``-
    grams: total occurrences, distinct grams, duplicated occurrences
    (total − distinct), and the hottest gram's multiplicity. All
    integers — callers threshold (e.g. drop if n_dup_grams·5 ≥ n_grams)
    without any float in the contract; exact SQL oracle.

    One explode + one two-level aggregate; grams never join anything,
    so the cost is a linear scan however large the corpus.
    """
    from neo4j_database_spark.pipeline.dedup import positional_shingles

    docs = load_table(spark, "documents", sf_dir)
    grams = positional_shingles(docs, width).select("doc_id", "shingle")
    per_gram = grams.groupBy("doc_id", "shingle").agg(
        F.count(F.lit(1)).alias("m")
    )
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_grams"),
            F.count(F.lit(1)).alias("n_distinct_grams"),
            (F.sum("m") - F.count(F.lit(1))).cast("long").alias("n_dup_grams"),
            F.max("m").cast("long").alias("max_gram_count"),
        )
        .orderBy("doc_id")
    )


def bigram_collocations(
    spark: SparkSession, sf_dir: str, min_count: int = 5, k: int = 20
) -> DataFrame:
    """Top-k bigram collocations ranked by lift — the PMI family of
    phrase/term-of-art mining used in tokenizer-vocabulary construction
    and corpus exploration.

    lift(x,y) = N_bigrams·c(xy) / (c(x)·c(y)); PMI is its log, a
    monotone transform, so the ranking is identical while every
    operation stays IEEE-exact (integer counts, one correctly-rounded
    double division — no libm log crossing engines; the same trick as
    curation.bm25_scores' rational idf).

    Plan shape: one explode over token positions feeds BOTH the bigram
    and unigram counts (Catalyst reuses the scan), the unigram
    vocabulary (tiny vs corpus — Heaps' law) broadcasts back onto the
    bigram counts twice, and the result is a TakeOrderedAndProject.
    The only corpus-sized shuffles are the two count aggregations,
    keyed on short token strings. At true 100 TB the integer products
    here can pass 2^53 — the production variant then emits log-lift
    from the same exact counts instead; ranking unchanged.
    """
    from neo4j_database_spark.pipeline.dedup import positional_shingles

    docs = load_table(spark, "documents", sf_dir)
    uni = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_tok"))
    )
    bi = (
        positional_shingles(docs, width=2)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= min_count)
        .select(
            F.element_at(F.split(F.col("shingle"), " "), 1).alias("w1"),
            F.element_at(F.split(F.col("shingle"), " "), 2).alias("w2"),
            "c_xy",
        )
    )
    n_bi = positional_shingles(docs, width=2).agg(
        F.count(F.lit(1)).alias("n_bigrams")
    )
    return (
        bi.join(F.broadcast(uni.withColumnRenamed("tok", "w1")), "w1")
        .withColumnRenamed("c_tok", "c_w1")
        .join(
            F.broadcast(
                uni.withColumnRenamed("tok", "w2").withColumnRenamed(
                    "c_tok", "c_w2"
                )
            ),
            "w2",
        )
        .crossJoin(F.broadcast(n_bi))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            (
                (F.col("n_bigrams") * F.col("c_xy")).cast("double")
                / (F.col("c_w1") * F.col("c_w2")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def bpe_pair_counts(spark: SparkSession, sf_dir: str, k: int = 30) -> DataFrame:
    """One BPE vocabulary-induction round: count adjacent SYMBOL PAIRS
    inside words across the corpus and rank the merge candidates — the
    statistic the byte-pair-encoding trainer computes every merge
    (Sennrich et al. 2016). Symbols here are characters (round 0 of
    BPE, before any merges exist).

    All JVM-side: lowercase alnum word split, then a higher-order
    ``transform`` over word positions emits each 2-char window —
    explode → count → top-k. Per-word fan-out is len-1 pairs, linear in
    corpus bytes; the aggregate is classic word-count (map-side partial
    on the pair key). At 100 TB the only care is the final top-k, which
    is TakeOrderedAndProject (no global sort).

    Ties (equal counts) break on the pair string so the top-k slice is
    total-ordered and engine-exact.
    """
    docs = load_table(spark, "documents", sf_dir)
    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
    )
    # substring with a COLUMN start needs the SQL form (the Python
    # wrapper takes literal ints only)
    exploded = (
        docs.select(F.explode(words).alias("word"))
        .filter(F.length("word") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1),"
                    " i -> substring(word, i, 2))"
                )
            ).alias("pair")
        )
    )
    return (
        exploded.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(k)
    )


def lm_coverage(
    spark: SparkSession, sf_dir: str, ref_mod: int = 13
) -> DataFrame:
    """KenLM-lite quality scoring: bigram coverage against a reference
    corpus model.

    The CCNet/RedPajama recipe scores documents with a language model
    trained on a trusted corpus and filters by perplexity. True
    perplexity needs log-probabilities, and libm log is not correctly
    rounded — not engine-portable — so the engine-exact counterpart is
    COVERAGE: the fraction of a document's word bigrams present in the
    reference model's vocabulary (an integer ratio; the one double
    division is correctly rounded). Low coverage ≡ high perplexity for
    filtering purposes.

    The reference model here is the deterministic doc_id % ref_mod == 0
    slice (a stand-in for a Wikipedia dump). Scale shape: the model's
    distinct-bigram dictionary is tiny versus a 100 TB corpus, so it
    BROADCASTS and the corpus is scanned once map-side; matched/total
    aggregate per doc_id is the only shuffle. A dictionary too big to
    broadcast degrades to a shuffle join on the bigram key.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("t"))
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bigram"),
    )
    is_ref = (F.col("doc_id") % ref_mod) == 0
    ref_bigrams = bigrams.where(is_ref).select("bigram").distinct()
    scored = (
        bigrams.where(~is_ref)
        .join(
            F.broadcast(ref_bigrams.withColumn("__hit", F.lit(1))),
            "bigram",
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_matched"),
        )
    )
    return (
        docs.where(~is_ref)
        .select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) > 0,
                F.coalesce("n_matched", F.lit(0)).cast("double")
                / F.col("n_bigrams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("coverage"),
        )
        .orderBy("doc_id")
    )


def _merge_pair(sym: F.Column, a: str, b: str) -> F.Column:
    """Greedy left-to-right BPE merge of adjacent (a, b) into a||b —
    a single fold over the symbol array (the overlap semantics of the
    classic implementation: after a merge the new symbol cannot
    re-merge with the consumed right element)."""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = 6
) -> DataFrame:
    """BPE tokenizer TRAINING: the iterative merge loop (Sennrich-style),
    not just one round of pair counts (bpe_pair_counts is the single
    round).

    Per round: count weighted adjacent symbol pairs over the vocabulary,
    pick the most frequent (ties broken lexicographically — Neo4j-free
    determinism), apply the merge greedily left-to-right to every word.
    The pair argmax is a 1-row driver collect per round (like
    pagerank's dangling scalar); everything else stays distributed.

    Scale shape: the corpus collapses to the (word, count) vocabulary in
    ONE fact-sized shuffle up front; all merge rounds then run on the
    vocabulary frame, which is corpus-size-independent (Heaps' law: a
    100 TB corpus has ~10^7-10^8 distinct words — a small frame). The
    per-round pair aggregate is a vocab-sized shuffle.

    Returns the merge table: (round, left, right, pair_count).
    """
    docs = load_table(spark, "documents", sf_dir)
    words = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.split("w", "").alias("sym"), "n")
        .localCheckpoint()
    )
    merges = []
    for r in range(n_merges):
        pairs = words.select(
            F.explode(
                F.zip_with(
                    F.slice(
                        F.col("sym"),
                        F.lit(1),
                        F.greatest(F.size("sym") - 1, F.lit(0)),
                    ),
                    F.slice(
                        F.col("sym"),
                        F.lit(2),
                        F.greatest(F.size("sym") - 1, F.lit(0)),
                    ),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
            "n",
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("p.l"), F.asc("p.r"))
            .first()
        )
        if best is None:
            break
        left, right, cnt = best["p"]["l"], best["p"]["r"], int(best["cnt"])
        merges.append((r, left, right, cnt))
        words = words.select(
            _merge_pair(F.col("sym"), left, right).alias("sym"), "n"
        )
        if r % 2 == 1 or r == n_merges - 1:
            words = words.localCheckpoint()
    return spark.createDataFrame(
        merges, "round int, left string, right string, pair_count long"
    )

"""Pipeline-operator unit tests on hand-built documents/vectors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_database_spark.pipeline import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
            (3, "the quick brown fox jumps over the sleepy dog"),  # near dup
            (4, "completely different text with no overlap here at all"),
            (5, "xy"),  # shorter than one shingle
            (6, ""),  # empty
        ],
        "doc_id long, text string",
    )


def test_shingles_short_docs_empty(docs):
    sh = dedup.shingles(docs)
    ids = {r["doc_id"] for r in sh.select("doc_id").distinct().collect()}
    assert 5 not in ids and 6 not in ids
    n1 = sh.filter(F.col("doc_id") == 1).count()
    assert n1 == 7  # 9 tokens → 7 distinct trigrams


def test_exact_dup_groups(spark, docs, tmp_path):
    # exact_dedup reads from a directory; exercise the digest logic inline
    grouped = (
        docs.select(F.md5(F.col("text")).alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(F.min("doc_id").alias("survivor"), F.count("*").alias("n"))
    )
    rows = {r["survivor"]: r["n"] for r in grouped.collect()}
    assert rows[1] == 2  # docs 1,2 collapse
    assert rows[3] == 1


def test_minhash_near_dup_pair(spark, docs):
    sig = dedup.minhash_signatures(docs.filter(F.col("doc_id").isin(1, 2, 3, 4)))
    rows = {r["doc_id"]: [r[f"mh_{i}"] for i in range(8)] for r in sig.collect()}
    # exact dup → identical signature; near dup → mostly matching
    assert rows[1] == rows[2]
    overlap_near = sum(a == b for a, b in zip(rows[1], rows[3]))
    overlap_far = sum(a == b for a, b in zip(rows[1], rows[4]))
    assert overlap_near > overlap_far
    assert overlap_far == 0


def test_minhash_xxhash64_production_path(spark, docs):
    """The xxhash64 variant (prod path) has the same signature algebra:
    identical docs → identical signatures."""
    sig = dedup.minhash_signatures(
        docs.filter(F.col("doc_id").isin(1, 2, 4)), hash_fn="xxhash64"
    )
    rows = {r["doc_id"]: [r[f"mh_{i}"] for i in range(8)] for r in sig.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[4]
    assert all(isinstance(v, int) for v in rows[1])


def test_knn_identical_vector_ranks_first(spark, monkeypatch, tmp_path):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0], 0),
            (1, [1.0, 0.0, 0.0], 0),   # identical → cos 1
            (2, [0.9, 0.1, 0.0], 0),   # close
            (3, [-1.0, 0.0, 0.0], 0),  # opposite → cos -1
            (4, [0.0, 1.0, 0.0], 0),   # orthogonal → cos 0
        ],
        "vec_id long, embedding array<float>, label int",
    )
    path = str(tmp_path / "embeddings.parquet")
    emb.write.parquet(path)
    monkeypatch.setattr(
        "neo4j_database_spark.pipeline.similarity.load_table",
        lambda spark, name, sf_dir: spark.read.parquet(path),
    )
    rows = similarity.knn_bruteforce(spark, "ignored", query_vec_id=0, k=4).collect()
    assert [r["vec_id"] for r in rows] == [1, 2, 4, 3]
    assert rows[0]["cosine"] == pytest.approx(1.0, abs=1e-6)
    assert rows[-1]["cosine"] == pytest.approx(-1.0, abs=1e-6)


def test_srp_same_vector_same_bucket(spark):
    emb = spark.createDataFrame(
        [(0, [0.5, -0.25, 0.125]), (1, [0.5, -0.25, 0.125])],
        "vec_id long, embedding array<float>",
    )
    out = emb.select(
        "vec_id",
        similarity._srp_bucket(
            F.col("embedding").cast("array<double>"), 4
        ).alias("b"),
    ).collect()
    assert out[0]["b"] == out[1]["b"]


def test_byte_entropy_pandas_udf(spark):
    import math

    from pyspark.sql import functions as F

    from neo4j_database_spark.pipeline.text import byte_entropy_col

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, ""), (4, None), (5, "abcd")],
        "id long, text string",
    )
    got = {
        r.id: r.h
        for r in df.select("id", byte_entropy_col()(F.col("text")).alias("h")).collect()
    }
    assert got[1] == 0.0            # single symbol → zero entropy
    assert abs(got[2] - 1.0) < 1e-9  # two equiprobable symbols → 1 bit
    assert got[3] == 0.0 and got[4] == 0.0
    assert abs(got[5] - 2.0) < 1e-9  # four equiprobable symbols → 2 bits


def test_pack_sequences_invariants(spark, sf_dir):
    from neo4j_database_spark.pipeline.text import pack_sequences

    from neo4j_database_spark.catalog import load_table

    chunks = pack_sequences(spark, sf_dir, capacity=2048, n_shards=8).collect()
    n_docs_total = load_table(spark, "documents", sf_dir).count()
    # every document lands in exactly one chunk
    assert sum(c["n_docs"] for c in chunks) == n_docs_total
    by_shard = {}
    for c in chunks:
        by_shard.setdefault(c["shard"], []).append(c)
    for shard, cs in by_shard.items():
        cs.sort(key=lambda c: c["chunk_id"])
        # chunk ids dense from 0; doc ranges strictly increasing (concat
        # order preserved); every doc id belongs to its shard
        assert cs[0]["chunk_id"] == 0
        for prev, nxt in zip(cs, cs[1:]):
            assert nxt["first_doc"] > prev["last_doc"]
        for c in cs:
            assert c["first_doc"] % 8 == shard and c["last_doc"] % 8 == shard
            assert c["total_tokens"] > 0


def test_dedup_clusters_merges_exact_and_near(spark, sf_dir):
    from neo4j_database_spark.catalog import load_table
    from neo4j_database_spark.pipeline.dedup import dedup_clusters

    rows = dedup_clusters(spark, sf_dir).collect()
    docs = load_table(spark, "documents", sf_dir)
    assert len(rows) == docs.count()  # every doc labeled exactly once
    label = {r["doc_id"]: r["cluster_id"] for r in rows}
    # canonical label: min id in cluster → label ≤ member id, and the
    # label is itself a member carrying its own id as label
    assert all(c <= d for d, c in label.items())
    assert all(label[c] == c for c in set(label.values()))
    # exact duplicates (identical text) must share a cluster
    dup_groups = (
        docs.groupBy("text")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .collect()
    )
    for g in dup_groups:
        assert len({label[i] for i in g["ids"]}) == 1
    # cluster_size consistent with the labeling
    from collections import Counter

    sizes = Counter(label.values())
    assert all(r["cluster_size"] == sizes[r["cluster_id"]] for r in rows)


def test_incremental_near_dups(spark, docs):
    """Batch probing: near-dup of a corpus doc is flagged against the
    corpus; two near-dup docs inside the batch are flagged once; a
    novel doc is silent. Linear-in-batch by construction (band probe)."""
    from neo4j_database_spark.pipeline.dedup import incremental_near_dups

    # NB: only EXACT duplicates are guaranteed band collisions under any
    # hash function (identical text → identical signature); a moderate-
    # Jaccard near-dup colliding is probabilistic in the hash realization
    # and must not be pinned (a hash-derivation change once flipped it).
    corpus = docs.filter(F.col("doc_id").isin([1, 4]))
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # dup of 1
            (11, "the quick brown fox jumps over the lazy dog"),  # dup of 10
            (12, "nothing like anything else in any corpus anywhere truly"),
        ],
        "doc_id long, text string",
    )
    rows = incremental_near_dups(corpus, batch).collect()
    got = {(r["batch_id"], r["match_id"], r["source"]) for r in rows}
    assert (10, 1, "corpus") in got  # batch-vs-corpus probe
    assert (10, 11, "batch") in got  # batch-internal pair, once (10 < 11)
    assert (11, 10, "batch") not in got
    assert not any(b == 12 for b, _m, _s in got)  # novel doc is clean
    # exact dups collide in every band
    hits = {
        (r["batch_id"], r["match_id"]): r["n_bands_hit"] for r in rows
    }
    assert hits[(10, 1)] == 4
    assert hits[(10, 11)] == 4


def test_chunk_documents_coverage(spark, sf_dir):
    """Chunks tile each document: consecutive chunks overlap by exactly
    `overlap` tokens, the last chunk ends at n_tokens, and token counts
    reconcile (sum of chunk lengths = n + overlap * (n_chunks - 1))."""
    from neo4j_database_spark.catalog import load_table
    from neo4j_database_spark.pipeline.text import chunk_documents, _tokens

    chunks = chunk_documents(spark, sf_dir, chunk_tokens=64, overlap=8)
    rows = chunks.collect()
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.size(_tokens(F.col("text"))).alias("n")
    )
    n_by_doc = {r["doc_id"]: r["n"] for r in docs.collect()}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every non-empty doc chunked
    assert set(by_doc) == {d for d, n in n_by_doc.items() if n >= 1}
    for d, cs in by_doc.items():
        cs.sort(key=lambda r: r["chunk_idx"])
        n = n_by_doc[d]
        assert [c["chunk_idx"] for c in cs] == list(range(len(cs)))
        assert cs[0]["chunk_start"] == 1
        for prev, nxt in zip(cs, cs[1:]):
            assert nxt["chunk_start"] - prev["chunk_start"] == 56  # stride
        last = cs[-1]
        assert last["chunk_start"] + last["n_chunk_tokens"] - 1 == n
        total = sum(c["n_chunk_tokens"] for c in cs)
        assert total == n + 8 * (len(cs) - 1)


def test_repetition_stats_hand_case(spark, monkeypatch):
    """'a b c a b c a b c' has 7 trigrams, 3 distinct ('a b c' ×3,
    'b c a' ×2, 'c a b' ×2) → 4 duplicated, hottest count 3."""
    from neo4j_database_spark.pipeline import text as textmod

    fake = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "w x y z")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(
        textmod, "load_table", lambda _s, _t, _d: fake
    )
    rows = {r["doc_id"]: r for r in textmod.repetition_stats(spark, "x").collect()}
    assert (
        rows[1]["n_grams"],
        rows[1]["n_distinct_grams"],
        rows[1]["n_dup_grams"],
        rows[1]["max_gram_count"],
    ) == (7, 3, 4, 3)
    assert rows[2]["n_dup_grams"] == 0 and rows[2]["n_grams"] == 2


def test_semantic_dedup_prunes_planted_duplicates(spark, monkeypatch, tmp_path):
    # 8 well-separated "centroid" vectors (ids 0-7), then planted members:
    #  - id 8: duplicate of centroid 0's direction  -> pruned (0 < 8, cos=1)
    #  - id 9: near-dup of id 8's cluster direction -> pruned
    #  - id 10: orthogonal-ish direction in cluster 1's list -> kept
    import math

    def unit(i, dim=8):
        v = [0.0] * dim
        v[i] = 1.0
        return v

    rows = [(i, unit(i), 0) for i in range(8)]
    rows.append((8, [1.0, 0.05] + [0.0] * 6, 0))   # ~ centroid 0
    rows.append((9, [0.99, 0.06] + [0.0] * 6, 0))  # ~ id 8
    rows.append((10, [0.7, 0.7, 0.1] + [0.0] * 5, 0)) # cluster 0 or 1, distinct
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    path = str(tmp_path / "embeddings.parquet")
    emb.write.parquet(path)
    monkeypatch.setattr(
        "neo4j_database_spark.pipeline.similarity.load_table",
        lambda spark, name, sf_dir: spark.read.parquet(path),
    )
    out = {r.vec_id: r for r in similarity.semantic_dedup(
        spark, "ignored", n_lists=8, threshold=0.9
    ).collect()}
    assert len(out) == 11                      # one row per vector
    assert all(out[i].is_kept for i in range(8))  # centroids are lowest ids
    assert not out[8].is_kept                  # dup of centroid 0 (cos≈1 ≥ .9)
    assert not out[9].is_kept                  # dup of id 8 in same list
    assert out[10].is_kept                     # cos(10, others) < 0.9
    # cluster-bounded: members assigned to centroid 0's list
    assert out[8].cent_id == 0 and out[9].cent_id == 0


def test_bpe_pair_counts_hand_case(spark, monkeypatch):
    from neo4j_database_spark.pipeline import text as tx

    df = spark.createDataFrame(
        [(1, "aba ab", "en", "s", 6), (2, "ba!", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(
        "neo4j_database_spark.pipeline.text.load_table",
        lambda s, n, d: df,
    )
    out = {r.pair: r.n for r in tx.bpe_pair_counts(spark, "unused", k=10).collect()}
    # words: aba, ab, ba -> pairs: ab, ba (from aba), ab, ba
    assert out == {"ab": 2, "ba": 2}


def test_pq_adc_matches_python_reference(spark, sf_dir):
    out = similarity.pq_adc_knn(spark, sf_dir, query_vec_id=0, k=5).collect()
    assert len(out) == 5
    d2s = [r.adc_d2 for r in out]
    assert d2s == sorted(d2s) and all(d >= 0 for d in d2s)

    # Python reference: same codebook/query, float arithmetic ~ the
    # decimal plan within 1e-6
    from neo4j_database_spark.catalog import load_table
    from neo4j_database_spark.pipeline.similarity import (
        PQ_CENTROID_IDS,
        PQ_SUBSPACES,
        _pq_assign,
    )

    emb = {r.vec_id: list(map(float, r.embedding))
           for r in load_table(spark, "embeddings", sf_dir).collect()}
    codes_df, cb, sub = _pq_assign(spark, sf_dir)
    codes = {}
    for r in codes_df.collect():
        codes.setdefault(r.vec_id, {})[r.subspace] = r.code
    q = emb[0]

    def lut(s, cid):
        return sum(
            (q[j] - cb[cid][j]) ** 2
            for j in range(s * sub, (s + 1) * sub)
        )

    for r in out:
        want = sum(
            lut(s, PQ_CENTROID_IDS[codes[r.vec_id][s]])
            for s in range(PQ_SUBSPACES)
        )
        assert abs(r.adc_d2 - want) < 1e-6

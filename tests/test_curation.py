"""Corpus-curation operator tests (pipeline/curation.py + pq_codes)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from neo4j_database_spark.pipeline import curation, similarity


def _patch_docs(spark, monkeypatch, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(
        "neo4j_database_spark.pipeline.curation.load_table",
        lambda spark, name, sf_dir: df,
    )
    return df


def test_decontaminate_flags_eval_overlap(spark, monkeypatch):
    _patch_docs(
        spark,
        monkeypatch,
        [
            (0, "a b c d", "en", "s", 7),          # eval (0 % 97 == 0)
            (1, "a b c x", "en", "s", 7),          # shares shingle "a b c"
            (2, "z z z w", "en", "s", 7),          # clean
            (3, "hi", "en", "s", 2),               # too short for shingles
        ],
    )
    out = {r["doc_id"]: r for r in curation.decontaminate(spark, "x").collect()}
    assert set(out) == {1, 2, 3}  # eval doc excluded from the output
    assert out[1]["contaminated"] and out[1]["n_shared_shingles"] == 1
    assert not out[2]["contaminated"] and out[2]["n_shared_shingles"] == 0
    assert not out[3]["contaminated"]


def test_scrub_pii_counts_and_digest(spark, monkeypatch):
    raw = "mail bob@example.com phone 555-123-4567 ask customer spark now"
    _patch_docs(spark, monkeypatch, [(1, raw, "en", "s", len(raw))])
    r = curation.scrub_pii(spark, "x").collect()[0]
    assert (r["n_email"], r["n_phone"], r["n_denied"]) == (1, 1, 2)
    expected = "mail <EMAIL> phone <PHONE> ask <TERM> <TERM> now"
    assert r["redacted_digest"] == hashlib.md5(expected.encode()).hexdigest()


def test_mixture_sample_balances_sources(spark, monkeypatch):
    rows = [(i, f"doc {i}", "en", "A", 10) for i in range(1, 9)] + [
        (100, "small corpus", "en", "B", 12),
        (101, "small corpus two", "en", "B", 16),
    ]
    _patch_docs(spark, monkeypatch, rows)
    out = {r["source"]: r for r in curation.mixture_sample(spark, "x").collect()}
    assert out["A"]["n_orig"] == 8 and out["B"]["n_orig"] == 2
    # the smallest source keeps everything (threshold = full bucket space)
    assert out["B"]["n_kept"] == 2 and out["B"]["kept_chars"] == 28
    assert out["A"]["n_kept"] <= 8
    # keep decision is the documented pure function of doc_id: recompute
    expected_a = sum(
        1
        for i in range(1, 9)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:5], 16)
        < (2 * 16**5) // 8
    )
    assert out["A"]["n_kept"] == expected_a


def test_bm25_ranks_term_dense_docs_first(spark, monkeypatch):
    _patch_docs(
        spark,
        monkeypatch,
        [
            (1, "spark merge window spark merge window", "en", "s", 38),
            (2, "spark alone among many other plain words here", "en", "s", 46),
            (3, "no query words at all in this document", "en", "s", 38),
            (4, "window", "en", "s", 6),
        ],
    )
    rows = curation.bm25_scores(spark, "x").collect()
    ids = [r["doc_id"] for r in rows]
    assert 3 not in ids  # zero-score docs filtered
    assert ids[0] == 1  # densest doc wins
    assert all(rows[i]["bm25"] >= rows[i + 1]["bm25"] for i in range(len(rows) - 1))


def test_pq_codes_assign_nearest_centroid(spark, monkeypatch):
    # constant vectors → every subspace distance is unambiguous (no ties)
    emb = spark.createDataFrame(
        [
            (1, [1.0] * 8, 0),
            (2, [2.0] * 8, 0),
            (3, [3.0] * 8, 0),
            (4, [4.0] * 8, 0),
            (5, [2.1] * 8, 0),  # nearest centroid 2 → code 1 everywhere
        ],
        "vec_id long, embedding array<float>, label int",
    )
    monkeypatch.setattr(
        "neo4j_database_spark.pipeline.similarity.load_table",
        lambda spark, name, sf_dir: emb,
    )
    out = similarity.pq_codes(spark, "x")
    codes5 = [
        r["code"]
        for r in out.where(F.col("vec_id") == 5).orderBy("subspace").collect()
    ]
    assert codes5 == [1, 1, 1, 1]
    # each codebook vector is its own nearest centroid in every subspace
    for cid, code in zip(similarity.PQ_CENTROID_IDS, range(4)):
        own = [
            r["code"]
            for r in out.where(F.col("vec_id") == cid).orderBy("subspace").collect()
        ]
        assert own == [code] * 4


def test_approx_user_counts_error_bound(spark, sf_dir):
    rows = curation.approx_user_counts(spark, sf_dir).collect()
    assert rows, "expected at least one event type"
    for r in rows:
        rel_err = abs(r["approx_users"] - r["exact_users"]) / max(
            r["exact_users"], 1
        )
        assert rel_err < 0.05, (r["event_type"], rel_err)


def test_decontaminate_fuzzy_flags_near_dup_of_eval(spark, monkeypatch):
    from neo4j_database_spark.pipeline import curation

    eval_text = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [
        (0, eval_text),                      # eval doc (id % 25 == 0)
        (1, eval_text + " extra tail"),      # near-dup of eval → flag
        (2, "totally different words that share no shingles at all ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(
        "neo4j_database_spark.pipeline.curation.load_table",
        lambda s, n, d: df,
    )
    out = {r.doc_id: r.n_eval_hits for r in
           curation.decontaminate_fuzzy(spark, "unused").collect()}
    assert 1 in out and out[1] >= 1
    assert 2 not in out
    assert 0 not in out  # eval docs themselves are not reported


def test_training_shuffle_invariants(spark, sf_dir):
    from neo4j_database_spark.pipeline import curation

    out = curation.training_shuffle(spark, sf_dir, n_shards=8)
    rows = out.collect()
    n_docs = len({r.doc_id for r in rows})
    assert len(rows) == n_docs                       # every doc exactly once
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():              # dense 1..n per shard
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # stability: append-only corpora keep existing (shard) assignments —
    # shard is a pure function of doc_id
    again = {r.doc_id: r.shard for r in
             curation.training_shuffle(spark, sf_dir, n_shards=8).collect()}
    assert all(again[r.doc_id] == r.shard for r in rows)


def test_bpe_train_matches_python_reference(spark, sf_dir):
    """The distributed merge loop ≡ the classic single-machine BPE
    trainer on the same word counts."""
    from collections import Counter

    from neo4j_database_spark.catalog import load_table
    from neo4j_database_spark.pipeline.text import bpe_train

    got = [
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(spark, sf_dir, n_merges=5).collect()
    ]

    docs = load_table(spark, "documents", sf_dir).select("text").collect()
    counts = Counter()
    for row in docs:
        for w in (row.text or "").split():
            counts[w] += 1
    vocab = {tuple(w): n for w, n in counts.items()}
    want = []
    for r in range(5):
        pc = Counter()
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += n
        if not pc:
            break
        (l, rr), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((r, l, rr, cnt))
        new_vocab = Counter()
        for sym, n in vocab.items():
            out = []
            for x in sym:
                if out and out[-1] == l and x == rr:
                    out[-1] = l + rr
                else:
                    out.append(x)
            new_vocab[tuple(out)] += n
        vocab = new_vocab
    assert got == want
    assert len(got) == 5
    # the argmax sequence is non-increasing (each round consumes the
    # current best pair)
    cnts = [c for _, _, _, c in got]
    assert cnts == sorted(cnts, reverse=True)

"""Behavioral-analytics operator tests (funnel, retention, collocations)."""

from __future__ import annotations

from datetime import datetime

import pytest

from neo4j_database_spark.pipeline import text
from neo4j_database_spark.queries import relational as rel


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


def _patch_events(spark, monkeypatch, rows):
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    monkeypatch.setattr(
        "neo4j_database_spark.queries.relational.load_table",
        lambda spark, name, sf_dir: df,
    )
    return df


def test_events_funnel_strict_ordering(spark, monkeypatch):
    _patch_events(
        spark,
        monkeypatch,
        [
            # user 1: full ordered funnel
            (1, "view", _ts(1, 1)),
            (1, "click", _ts(1, 2)),
            (1, "purchase", _ts(1, 3)),
            # user 2: click precedes the first view → stops at step 1
            (2, "click", _ts(1, 1)),
            (2, "view", _ts(1, 2)),
            (2, "purchase", _ts(1, 3)),
            # user 3: view + click but no purchase → step 2
            (3, "view", _ts(1, 1)),
            (3, "click", _ts(1, 2)),
            # user 4: purchase only → never enters
            (4, "purchase", _ts(1, 1)),
        ],
    )
    out = {r["step"]: r["n_users"] for r in rel.events_funnel(spark, "x").collect()}
    assert out == {
        "1_view": 3,
        "2_view_click": 2,
        "3_view_click_purchase": 1,
    }


def test_retention_cohorts_day_offsets(spark, monkeypatch):
    _patch_events(
        spark,
        monkeypatch,
        [
            (1, "view", _ts(1, 5)),
            (1, "click", _ts(1, 9)),   # same day — distinct() collapses
            (1, "view", _ts(3, 2)),    # offset 2
            (2, "view", _ts(2, 1)),    # cohort day 2
        ],
    )
    rows = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in rel.events_retention_cohorts(spark, "x").collect()
    }
    d1, d2 = _ts(1), _ts(2)
    assert rows == {(d1, 0): 1, (d1, 2): 1, (d2, 0): 1}


def test_bigram_lift_hand_case(spark, monkeypatch):
    docs = spark.createDataFrame(
        [(1, "a b a b", "en", "s", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(
        "neo4j_database_spark.pipeline.text.load_table",
        lambda spark, name, sf_dir: docs,
    )
    rows = text.bigram_collocations(spark, "x", min_count=1).collect()
    lifts = {(r["w1"], r["w2"]): (r["c_xy"], r["lift"]) for r in rows}
    # bigrams: "a b" ×2, "b a" ×1; n_bigrams=3; c(a)=c(b)=2
    assert lifts[("a", "b")] == (2, pytest.approx(1.5))
    assert lifts[("b", "a")] == (1, pytest.approx(0.75))
    assert rows[0]["w1"] == "a"  # highest lift first

"""Round-5 twins: multimodal audit queries and bucketed-spine twins.

The heavy cross-engine evidence lives in the DuckDB oracles
(scripts/check_oracle.py); these tests pin the Spark-side invariants
that must hold regardless of the oracle — planted near-dup pairs,
quarantine rows, and raw≡bucketed result identity.
"""

from __future__ import annotations

from neo4j_database_spark.pipeline.multimodal import (
    audit_near_dup_pairs,
    audit_video_stats,
)
from neo4j_database_spark.queries import relational as rel


def test_near_dup_audit_finds_exactly_the_planted_rerenders(spark):
    """Every 9th image re-renders the previous image's content at its
    own resolution; the block pattern keeps every aHash cell far from
    threshold, so re-renders collide at Hamming 0 and unrelated keys
    sit ~32 bits apart — the ≤7 pair set is exactly the plants."""
    rows = [tuple(r) for r in audit_near_dup_pairs(spark).collect()]
    assert rows == [(21, 24, 0), (48, 51, 0), (75, 78, 0)]


def test_video_audit_quarantines_every_third_container(spark):
    rows = {r["media_id"]: r for r in audit_video_stats(spark).collect()}
    assert len(rows) == 32
    for mid, r in rows.items():
        corrupt = ((mid // 3) % 3) == 2
        assert r["decoded"] is (not corrupt), mid
        if corrupt:
            assert r["width"] is None and r["n_frames"] is None
            assert r["n_bytes"] == 128 + mid  # garbage payload length
        else:
            assert r["handler"] == "vide"
            assert r["n_bytes"] == 470  # fixed box skeleton + 64B mdat


def test_bucketed_twins_match_raw(spark, sf_dir):
    """Storage layout must never change answers: each bucketed-spine
    twin returns the identical ordered rows as its raw-parquet twin."""
    for raw, bkt in [
        (rel.top_unshipped_orders, rel.top_unshipped_orders_bucketed),
        (rel.returned_item_losses, rel.returned_item_losses_bucketed),
        (rel.big_volume_customers, rel.big_volume_customers_bucketed),
    ]:
        a = [tuple(r) for r in raw(spark, sf_dir).collect()]
        b = [tuple(r) for r in bkt(spark, sf_dir).collect()]
        assert a == b, raw.__name__

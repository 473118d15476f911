"""Bloom-filter semi-join: runtime-filter pre-filtering for huge scans.

The 100 TB problem this solves: a selective dimension-derived key set
(say 10M surviving keys out of 1.5B) must filter a fact table far too
large to shuffle. A shuffle-hash or sort-merge semi-join moves the
whole fact side; broadcasting the raw key set as a join hash table
costs O(keys × key_width). A Bloom filter compresses the key set to
``m_bits`` regardless of key width (10M keys at ~10 bits/key ≈ 12 MB
for ~1% false positives), ships map-side, and eliminates non-matching
fact rows AT THE SCAN, so only candidates (true matches + FPR-bounded
false positives) reach the exact join.

Spark's optimizer can inject this itself (runtime row-group filtering,
``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator is
the explicit, composable form — usable where the optimizer's heuristics
decline (non-equi residuals, pre-aggregated key sets, cross-job reuse
of a built filter).

Everything stays JVM-side: build is one map-side-combining groupBy on
word index; the probe is a broadcast join against the one-row bitmap
frame plus pure column bit arithmetic — no Python UDFs, no driver
round-trip for the bits themselves.

Determinism: hash functions are ``xxhash64(key, seed_i)`` with fixed
seeds, so filter contents are reproducible across runs and engines that
share xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITMAP_COL = "__bloom_bitmap"


def _positions(key: Column, n_hashes: int, m_bits: int) -> list[Column]:
    """k deterministic bit positions for a key (seeded xxhash64 family)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(n_hashes)
    ]


def build_bloom(
    keys: DataFrame,
    on: str,
    m_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> DataFrame:
    """Aggregate a key column into a ONE-ROW Bloom bitmap frame.

    The bitmap is a ``map<int, bigint>`` of 64-bit words keyed by word
    index — sparse, so an underfull filter costs only its set words.
    Build cost: one explode (×n_hashes) of the KEY SET (small side, not
    the fact side) and one groupBy with map-side bit_or combining; the
    final map assembly handles at most ``m_bits/64`` entries (16 K words
    = ~128 KB per 2^20 bits) in a single row, comfortably broadcastable.
    """
    key = F.col(on)
    pos = F.explode(F.array(*_positions(key, n_hashes, m_bits))).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            # shiftleft by a COLUMN amount needs the SQL form (the Python
            # wrapper only takes literal ints)
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias(
            _BITMAP_COL
        )
    )


def bloom_probe(
    fact: DataFrame,
    bloom: DataFrame,
    on: str,
    m_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> DataFrame:
    """Keep fact rows whose key MAY be in the filter (no false negatives).

    Broadcast-joins the one-row bitmap and tests all k bits with column
    arithmetic — map-side only, no shuffle of ``fact``, candidates are a
    superset of the true matches bounded by the filter's FPR.
    """
    probed = fact.crossJoin(F.broadcast(bloom))
    cond = F.lit(True)
    for i in range(n_hashes):
        p = F.pmod(F.xxhash64(F.col(on), F.lit(i)), F.lit(m_bits))
        word = (p / 64).cast("int")
        bit = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pmod(xxhash64(`{on}`, {i}), {m_bits}) % 64 AS INT))"
        )
        cond = cond & (
            F.coalesce(F.element_at(F.col(_BITMAP_COL), word), F.lit(0)).bitwiseAND(
                bit
            )
            != 0
        )
    return probed.filter(cond).drop(_BITMAP_COL)


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    on: str,
    m_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> DataFrame:
    """EXACT semi-join accelerated by a Bloom pre-filter.

    build(keys) → probe(fact) map-side → exact ``left_semi`` join of the
    surviving candidates against the key set. Result is identical to
    ``fact.join(keys, on, "left_semi")`` (the exact join removes the
    false positives); the filter's job is that only ~FPR of the
    non-matching fact survives to the shuffle. Exactness is what makes
    the operator oracle-checkable with a plain SQL semi-join.
    """
    bloom = build_bloom(keys, on, m_bits=m_bits, n_hashes=n_hashes)
    candidates = bloom_probe(fact, bloom, on, m_bits=m_bits, n_hashes=n_hashes)
    return candidates.join(keys.select(on).distinct(), on=on, how="left_semi")

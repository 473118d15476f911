"""Entity resolution: exact edit-distance similarity self-join.

The fuzzy-matching primitive behind dedupe/record-linkage pipelines:
find all pairs of strings within Levenshtein distance ``max_dist``
WITHOUT the quadratic all-pairs scan. This is the Ed-Join / prefix
filtering algorithm (Xiao et al., VLDB'08; same family as PPJoin):

1. q-gram multiset per string (an edit destroys ≤ q grams; an indel
   shifts positions but not gram *contents*, so the multiset changes by
   ≤ q·d grams for distance d);
2. global total order on grams by ascending document frequency
   (rare-first, ties broken lexically) — both engines sort identically,
   making the plan oracle-exact;
3. PREFIX: the first q·d+1 grams of each string under that order. Two
   strings within distance d MUST share a prefix gram (pigeonhole on
   the ≤ q·d destroyed grams per side) — no recall loss;
4. equi-join on prefix grams → candidate pairs (rare grams ⇒ small
   buckets), length filter, then exact levenshtein verification.

Scale design: every step is an equi-join / aggregation — no cross
join anywhere. The gram-frequency frame is gram-domain-sized (tiny vs
the corpus) and broadcasts; the candidate join hashes on rare grams by
construction, which is exactly what bounds bucket skew. Verification
cost is |candidates|, the quantity prefix filtering minimizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    s_col: str,
    max_dist: int = 1,
    q: int = 3,
) -> DataFrame:
    """All (id_a < id_b) pairs with levenshtein(s_a, s_b) <= max_dist.

    Completeness boundary (standard Ed-Join): a pair is guaranteed
    found only when both strings have ≥ q·(max_dist+1) characters —
    below that, all n−q+1 grams can be destroyed by max_dist edits and
    no shared prefix gram is forced (strings shorter than ``q`` produce
    no grams at all). Callers with very short keys should pad, lower
    ``q``, or brute-force the short stratum separately; the boundary is
    pinned by test_edit_distance_pairs_short_string_contract.
    """
    prefix_len = q * max_dist + 1
    base = df.select(F.col(id_col).alias("id"), F.col(s_col).alias("s"))
    # NB: Spark's sequence(1, 0) is a DESCENDING [1, 0], not empty — a
    # string shorter than q would emit two junk grams (and every empty
    # string would land in one shared quadratic bucket), while DuckDB's
    # generate_series(1, 0) is empty; the explicit length guard keeps
    # the documented "no grams below q" contract on both engines
    grams = base.filter(F.length("s") >= q).select(
        "id",
        "s",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(s) - {q - 1}),"
                f" i -> substring(s, i, {q}))"
            )
        ).alias("gram"),
    )
    gram_df = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    ranked = grams.join(F.broadcast(gram_df), "gram").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("id").orderBy("df", "gram")
        ),
    )
    # the prefix frame carries only (gram, id, len): the length filter
    # is the sole pre-verification use of the string, so the candidate
    # join shuffles narrow rows — strings re-attach by id afterwards
    prefix = ranked.filter(F.col("rn") <= prefix_len).select(
        "gram", "id", F.length("s").alias("len")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # dedup candidate pairs on the NARROW id columns (a pair is emitted
    # once per shared prefix gram), so verification sees each pair
    # exactly once
    cand_ids = (
        a.join(b, "gram")
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(
            F.abs(F.col("a.len") - F.col("b.len")) <= max_dist
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
        )
        .distinct()
    )
    na = base.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
    nb = base.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
    cand = cand_ids.join(na, "id_a").join(nb, "id_b")
    # thresholded levenshtein: banded O(len·d) with early exit instead
    # of the full O(len²) DP — ~2× at d=1 on 18-char keys, growing with
    # string length; returns −1 above the bound, and the banded value
    # equals the exact distance for every surviving pair
    return (
        cand.withColumn(
            "dist", F.levenshtein("s_a", "s_b", max_dist).cast("long")
        )
        .filter(F.col("dist").between(0, max_dist))
        .select("id_a", "id_b", "s_a", "s_b", "dist")
    )

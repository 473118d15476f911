"""Entity resolution: exact edit-distance similarity self-join.

The fuzzy-matching primitive behind dedupe/record-linkage pipelines:
find all pairs of strings within Levenshtein distance ``max_dist``
WITHOUT the quadratic all-pairs scan.

Two candidate-generation strategies, picked by ``max_dist``:

- ``max_dist == 1`` (the overwhelmingly common ER setting): the
  DELETION-NEIGHBORHOOD join (FastSS, Bocek et al. 2007; the SymSpell
  family). Each string emits itself plus its length single-deletion
  variants; ed(a,b) <= 1 implies the variant sets intersect
  (substitution at i -> both del_i variants equal; indel -> the longer
  string's deletion equals the shorter's identity), so an equi-join on
  variants is a complete candidate generator with NO length boundary —
  exact for arbitrarily short strings. Candidate volume is
  near-duplicate-group-sized rather than gram-bucket-sized: on the
  padded customer keys at sf0.1 this is 1.46M candidates vs the gram
  prefix filter's 11.1M, and the measured r06 profile showed the
  banded-levenshtein VERIFICATION (2.6 us/pair) was ~90% of the old
  25.8 s runtime — cutting candidates 7.6x cut the query to 2.4 s.

- ``max_dist >= 2``: Ed-Join / prefix filtering (Xiao et al., VLDB'08;
  same family as PPJoin) — deletion neighborhoods grow O(len^d) keys
  per string at distance d, so gram prefixes win there:

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

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import shuffle_partitions

# --- character-bag signature (templated-corpus mitigation, r08) -----------
#
# VERDICT r07 item 3 / SCALE_PROBE.md "Ed-Join d=2 replica cells": on a
# low-gram-diversity (templated) corpus, every string's rarest q·d+1
# blocking grams are shared with all its template-mates, so the
# candidate set grows with corpus self-similarity (16× replicas →
# ~30× runtime) even though none of the extra pairs verifies. The
# mismatch those pairs DO exhibit is in character CONTENT (the
# distinguishing region — a salt, an id, a version stamp), which gram
# prefixes never look at but a character histogram sees immediately.
#
# BAG-DISTANCE FILTER (exact, no recall loss): one edit changes a
# string's character multiset by at most 2 in L1 (substitution: −1 old
# +1 new; indel: ±1), so ed(a,b) ≤ d  ⇒  L1(hist(a), hist(b)) ≤ 2d
# (the classic "bag distance" lower bound, Bartolini et al. 2002).
# The histogram is coarsened two ways, each of which only SHRINKS the
# L1 (merging or dropping classes can only cancel differences), so the
# bound — and exactness — survives coarsening:
#   * 16 classes by codepoint % 16 (collisions = class merging);
#   * 4-bit saturating counts (|min(a,15)−min(b,15)| ≤ |a−b|).
# The 16 nibbles pack into ONE BIGINT carried on the narrow candidate
# frame, and the pair check is 16 unrolled shift/mask/abs terms —
# whole-stage-codegen arithmetic applied in the SAME stage as the
# candidate equi-join, so template-mate candidates die before the
# pre-verification dedup shuffle, the string re-attach joins, and the
# banded levenshtein ever see them. Measured on the 16× suffix-salted
# replica cell: see SCALE_PROBE.md r08.

_BAG_CLASSES = 16
_BAG_SAT = 15  # 4-bit saturating per-class count


def _bag_signature(s: Column) -> Column:
    """Pack a 16-class saturating char histogram of ``s`` into a long.

    Class c counts the occurrences of printable-ASCII chars with
    codepoint % 16 == c via length-after-translate (JVM codegen, no
    UDF). Non-ASCII chars fall outside every class — equivalent to
    merging them into an invisible 17th class, which keeps the bag
    bound valid (see module comment).
    """
    terms = []
    for c in range(_BAG_CLASSES):
        chars = "".join(
            chr(cp) for cp in range(32, 127) if cp % 16 == c
        )
        cnt = F.least(
            F.lit(_BAG_SAT),
            F.length(s) - F.length(F.translate(s, chars, "")),
        )
        terms.append(F.shiftleft(cnt.cast("long"), 4 * c))
    return reduce(lambda x, y: x + y, terms)


def _bag_l1(sig_a: Column, sig_b: Column) -> Column:
    """L1 distance between two packed bag signatures (16 unrolled
    shift/mask/abs terms — stays inside whole-stage codegen)."""
    terms = [
        F.abs(
            (F.shiftright(sig_a, 4 * c).bitwiseAND(F.lit(15)))
            - (F.shiftright(sig_b, 4 * c).bitwiseAND(F.lit(15)))
        )
        for c in range(_BAG_CLASSES)
    ]
    return reduce(lambda x, y: x + y, terms)


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    s_col: str,
    max_dist: int = 1,
    q: int = 3,
    broadcast_row_limit: int = 5_000_000,
    size_hint_rows: int | None = None,
    dedup_candidates: bool | None = None,
    bag_filter: bool = True,
) -> DataFrame:
    """All (id_a < id_b) pairs with levenshtein(s_a, s_b) <= max_dist.

    max_dist == 1 routes to the deletion-neighborhood join (exact for
    ALL string lengths — no completeness boundary; see module
    docstring). max_dist >= 2 uses Ed-Join prefix filtering, whose
    completeness boundary is standard: a pair is guaranteed found only
    when both strings have ≥ q·(max_dist+1) characters — below that,
    all n−q+1 grams can be destroyed by max_dist edits and no shared
    prefix gram is forced (strings shorter than ``q`` produce no grams
    at all). Ed-Join callers with very short keys should pad, lower
    ``q``, or brute-force the short stratum separately; both contracts
    are pinned by test_edit_distance_pairs_short_string_contract.

    Shared plan shape (r06 rewrite): the candidate stream is never
    shuffled between generation and verification. Profiling showed the
    old pre-verification ``distinct`` removed only ~10% of candidates
    for 9 s of shuffle, and the two string re-attach joins shuffled the
    candidate set twice more. Now: candidate equi-join → length filter
    → two BROADCAST joins re-attach strings map-side (the (id, s)
    projection is key-universe-sized; gated by ``broadcast_row_limit``
    — above it, e.g. billion-key corpora on a cluster, the plan falls
    back to shuffle joins and re-instates the narrow pre-verification
    dedup, which IS worth it when the candidate set must shuffle
    anyway) → banded levenshtein map-side → dedup the matches.

    The broadcast/shuffle decision is made WITHOUT an eager Spark job
    (ADVICE r06: the old ``base.count()`` ran a job at plan-construction
    time): pass ``size_hint_rows`` when the caller knows the key-universe
    cardinality; otherwise the gate reads Catalyst's optimized-plan
    ``sizeInBytes`` estimate (metadata-only — derived from file sizes ×
    projection ratio) against ``broadcast_row_limit`` × a conservative
    32 B/row for the narrow (id, string) projection.

    ``dedup_candidates`` controls the PRE-verification candidate dedup.
    Default ``None`` = automatic: dedup on the shuffle path (the
    candidate set moves anyway), skip on the broadcast path — profiling
    on near-unique keys showed the distinct costing 9 s to remove ~10%
    of candidates. CAVEAT (ADVICE r06): on duplicate-heavy corpora the
    broadcast path verifies each of an m-duplicate group's m²/2 pairs
    once per shared variant (L+1 times for length-L strings at d=1);
    such callers should pass ``dedup_candidates=True`` (or exact-dedup
    the corpus first, which is strictly better).

    Templated-corpus mitigation (``bag_filter``, default ON for
    max_dist ≥ 2; measured r07→r08, SCALE_PROBE.md d=2 replica cells):
    gram blocking quality depends on gram DIVERSITY — on a corpus
    whose strings share a template (boilerplate web text, generated
    keys), each string's rarest q·(max_dist)+1 grams collide with
    every template-mate, so the candidate set grows with corpus
    self-similarity even though the extra candidates all fail
    verification (16× replicas: output exactly 16×, runtime ~30×
    before the mitigation). The bag-distance filter (see
    ``_bag_signature``) prunes, EXACTLY and inside the candidate-join
    codegen stage, every candidate whose character histograms differ
    by more than 2·max_dist in L1 — which is precisely what
    template-mates' distinguishing regions (salts, ids, version
    stamps) do. FastSS (max_dist=1) is immune to the blowup — deletion
    variants contain the distinguishing region verbatim — so the d=1
    path skips the signature. Residual d ≥ 2 exposure: template-mates
    whose distinguishing regions are ANAGRAMS of each other (same char
    bag) still collide; for those, strip the template before blocking
    or pre-partition by the template key.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(s_col).alias("s"))
    if max_dist == 1:
        # identity + all single-deletion variants; the CASE guards the
        # Spark sequence(1, 0) descending-not-empty trap for empty
        # strings (same trap as the gram path below)
        cand_ids = _candidates_on(
            base.select(
                "id",
                F.length("s").alias("len"),
                F.explode(
                    F.concat(
                        F.array(F.col("s")),
                        F.expr(
                            "CASE WHEN length(s) = 0 THEN array() ELSE"
                            " transform(sequence(1, length(s)),"
                            " i -> concat(left(s, i-1), substr(s, i+1)))"
                            " END"
                        ),
                    )
                ).alias("k"),
            ),
            max_dist,
        )
        return _verify(
            base, cand_ids, max_dist, broadcast_row_limit,
            size_hint_rows, dedup_candidates,
        )
    prefix_len = q * max_dist + 1
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
    # the prefix frame carries only (gram, id, len[, sig]): the length
    # and bag filters are the sole pre-verification uses of the string,
    # so the candidate join shuffles narrow rows — strings re-attach by
    # id afterwards. The 8-byte bag signature rides along so template-
    # mate candidates die inside the join stage (module comment).
    narrow = ["id", F.length("s").alias("len")]
    if bag_filter:
        narrow.append(_bag_signature(F.col("s")).alias("sig"))
    prefix = ranked.filter(F.col("rn") <= prefix_len).select(
        F.col("gram").alias("k"), *narrow
    )
    cand_ids = _candidates_on(prefix, max_dist, bag=bag_filter)
    return _verify(
        base, cand_ids, max_dist, broadcast_row_limit,
        size_hint_rows, dedup_candidates,
    )


def _candidates_on(
    keyed: DataFrame, max_dist: int, bag: bool = False
) -> DataFrame:
    """Ordered candidate id pairs from an equi-join on a blocking key
    ``k``: (id, len, k[, sig]) → (id_a < id_b) with the length filter —
    and, when ``bag`` is set, the bag-distance filter — applied on the
    NARROW frame, in the join's own codegen stage, before strings
    re-attach. A pair is emitted once per shared key; dedup placement
    is _verify's call."""
    # Pin the self-join's parallelism: the keyed frame is narrow, so
    # AQE's byte-based coalescing would run the join (whose OUTPUT
    # fan-out is the quadratic per-key pair expansion, invisible to
    # input-size estimates) on 1-2 tasks — the same defect class as
    # the verify stage, see _verify. User-specified counts are exempt.
    keyed = keyed.repartition(shuffle_partitions(keyed.sparkSession), "k")
    cols_a = [F.col("id").alias("id_a"), F.col("len").alias("len_a")]
    cols_b = [F.col("id").alias("id_b"), F.col("len").alias("len_b")]
    if bag:
        cols_a.append(F.col("sig").alias("sig_a"))
        cols_b.append(F.col("sig").alias("sig_b"))
    a = keyed.select("k", *cols_a)
    b = keyed.select("k", *cols_b)
    cand = (
        a.join(b, "k")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.col("len_a") - F.col("len_b")) <= max_dist)
    )
    if bag:
        cand = cand.filter(
            _bag_l1(F.col("sig_a"), F.col("sig_b")) <= 2 * max_dist
        )
    return cand.select("id_a", "id_b")


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate for ``df`` — metadata
    only (file sizes × projection ratio, or runtime stats for cached /
    checkpointed inputs); runs NO Spark job, so building the plan stays
    side-effect-free (ADVICE r06 on the old construction-time count)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


# conservative serialized width of the narrow (id, string-key) row used
# to convert broadcast_row_limit (rows) into a sizeInBytes gate
_BYTES_PER_KEY_ROW = 32


def _verify(
    base: DataFrame,
    cand_ids: DataFrame,
    max_dist: int,
    broadcast_row_limit: int,
    size_hint_rows: int | None = None,
    dedup_candidates: bool | None = None,
) -> DataFrame:
    """Re-attach strings and run the exact verification.

    Thresholded levenshtein: banded O(len·d) with early exit instead
    of the full O(len²) DP — ~2× at d=1 on 18-char keys, growing with
    string length; returns −1 above the bound, and the banded value
    equals the exact distance for every surviving pair.
    """
    na = base.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
    nb = base.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
    if size_hint_rows is not None:
        small = size_hint_rows <= broadcast_row_limit
    else:
        small = (
            _plan_size_bytes(na)
            <= broadcast_row_limit * _BYTES_PER_KEY_ROW
        )
    if dedup_candidates is None:
        # shuffle path: the candidate set must move anyway, so the
        # narrow pre-verification dedup pays for itself; broadcast
        # path skips it (measured: 9 s to remove ~10% on near-unique
        # keys — see the public docstring's duplicate-heavy caveat)
        dedup_candidates = not small
    if small:
        na, nb = F.broadcast(na), F.broadcast(nb)
    if dedup_candidates:
        cand_ids = cand_ids.distinct()
    # Pin verification parallelism: the candidate frame is NARROW
    # (two longs), so AQE's byte-based post-shuffle coalescing folds
    # it into 1-2 partitions — and the levenshtein stage, whose cost
    # is per-ROW compute (banded O(len·d) each), then runs on one
    # core. Measured r07 at sf0.1 d=2 (4.08M true pairs): 501 s with
    # the coalesced single-task stages, 107 s with this verify pin
    # alone, 51.6 s with the _candidates_on pin too (~10x); the d=1
    # FastSS path drops 5.0 -> 1.4 s from the same two pins. A
    # user-specified repartition count is exempt from AQE coalescing;
    # the extra exchange moves only the narrow id pairs.
    cand_ids = cand_ids.repartition(
        shuffle_partitions(cand_ids.sparkSession), "id_a", "id_b"
    )
    cand = cand_ids.join(na, "id_a").join(nb, "id_b")
    return (
        cand.withColumn(
            "dist", F.levenshtein("s_a", "s_b", max_dist).cast("long")
        )
        .filter(F.col("dist").between(0, max_dist))
        .select("id_a", "id_b", "s_a", "s_b", "dist")
        .distinct()
    )

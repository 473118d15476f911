"""Custom mergeable sketches beyond Spark's built-ins (HLL, GK):
Misra-Gries heavy hitters.

The pattern this demonstrates is the one every custom distributed
sketch follows on Spark: an Arrow-batched per-partition summarizer
(mapInPandas) producing bounded-size partials, then a standard
aggregation merging them — the sketch's merge must be expressible as
(or bounded by) a sum for the shuffle to stay a plain hash aggregate.

Misra-Gries guarantee: a summary with ``capacity`` m counters
undercounts any item by at most n_p/(m+1) on a partition of n_p rows;
summing partial counts per item keeps the total undercount ≤ n/(m+1).
Therefore every item with true frequency > n/(m+1) SURVIVES into the
merged summary, and estimates are always lower bounds within n/(m+1)
of truth. Output is top-k by merged lower bound plus the data-derived
error bound — the caller can verify candidates exactly with one
filtered COUNT if needed (two-phase heavy hitters).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("item", T.StringType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("n_part", T.LongType()),
    ]
)


def _mg_summary(values, capacity: int) -> dict[str, int]:
    counters: dict[str, int] = {}
    for v in values:
        if v is None:
            continue
        if v in counters:
            counters[v] += 1
        elif len(counters) < capacity:
            counters[v] = 1
        else:
            # decrement-all step (amortized via dict rebuild)
            counters = {k: c - 1 for k, c in counters.items() if c > 1}
    return counters


def misra_gries_topk(
    df: DataFrame, col: str, k: int | None = 20, capacity: int = 256
) -> DataFrame:
    """Approximate top-k heavy hitters of ``col``:
    (item, est_count, n_total, max_underestimate).

    est_count is a LOWER bound on the true count; true − est ≤
    max_underestimate = n_total // (capacity + 1). Any item whose true
    count exceeds that bound is guaranteed present.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n = 0
        for pdf in batches:
            vals = pdf[col]
            n += len(vals)
            # fold this batch into the running partition summary
            for v, c in _mg_summary(vals, capacity).items():
                counters[v] = counters.get(v, 0) + c
            if len(counters) > capacity:
                # re-compress the merged counters to capacity: subtract
                # the (capacity+1)-th largest count (classic MG merge)
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    kk: c - cut for kk, c in counters.items() if c > cut
                }
        yield pd.DataFrame(
            {
                "item": list(counters.keys()),
                "cnt": list(counters.values()),
                "n_part": [n] * len(counters),
            }
        )

    partials = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, schema=_PARTIAL_SCHEMA
    )
    # n for the error bound comes from an exact count — cheap (scan
    # count, no shuffle) and the caller usually has it already
    n_total = df.count()
    merged = partials.groupBy("item").agg(F.sum("cnt").alias("est_count"))
    if k is not None:
        # k=None keeps every merged counter — needed by the exact-audit
        # oracle query: the MG guarantee (any item with true count >
        # n/(capacity+1) is present, with true − est ≤ n//(capacity+1))
        # holds for the merged counter SET under any partitioning, but a
        # top-k cut can drop a guaranteed item whose est ranks below
        # higher-est mid-frequency items, and which items those are
        # depends on the partitioning.
        merged = merged.orderBy(
            F.desc("est_count"), F.asc("item")
        ).limit(k)
    return merged.select(
        "item",
        "est_count",
        F.lit(n_total).alias("n_total"),
        F.lit(n_total // (capacity + 1)).alias("max_underestimate"),
    )


def misra_gries_merged(
    df: DataFrame, col: str, k: int | None = 20, capacity: int = 256
) -> DataFrame:
    """Order-insensitive Misra-Gries summary via the MERGE form
    (Agarwal et al., "Mergeable Summaries", PODS'12): treat each item's
    exact count as a trivially-correct MG summary of its own
    occurrences and fold them all with the standard merge — sum
    counters (one exact groupBy count), subtract the (capacity+1)-th
    largest counter, drop non-positives. Same contract as
    ``misra_gries_topk`` (≤ capacity counters; est ≤ true ≤
    est + n/(capacity+1), since capacity+1 counters ≥ cut implies
    (capacity+1)·cut ≤ n) — but the result is a pure function of the
    MULTISET: identical under any partitioning, row order, or batch
    boundaries, so the registry entry carrying it is exact-oracle-
    checkable (VERDICT r06 item 5). For survivors the offset is exact:
    true − est == cut, reported as ``max_underestimate``.

    Cost: the exact count's single item shuffle (map-side combined)
    plus a top-(capacity+1) threshold (TakeOrdered — capacity-sized,
    driver-merged) re-broadcast into the plan; fully lazy, no
    construction-time job. The single-pass ``misra_gries_topk``
    remains the bounded-memory path when even one count shuffle is
    unwanted (true streams); its partition-dependent guarantees are
    certified by the doc_token_heavy_hitters_audit entry.
    """
    cnts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = cnts.agg(F.sum("cnt").cast("long").alias("n_total"))
    # the (capacity+1)-th largest count VALUE (0 when fewer than
    # capacity+1 distinct items): min over a top-(capacity+1) limit —
    # deterministic under ties because it is a value, not a row pick
    cut = (
        cnts.orderBy(F.desc("cnt"))
        .limit(capacity + 1)
        .agg(
            F.when(
                F.count(F.lit(1)) >= capacity + 1, F.min("cnt")
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("cut")
        )
    )
    out = (
        cnts.crossJoin(F.broadcast(cut))
        .withColumn("est_count", (F.col("cnt") - F.col("cut")).cast("long"))
        .filter(F.col("est_count") > 0)
        .crossJoin(F.broadcast(tot))
        .select(
            "item",
            "est_count",
            "n_total",
            F.col("cut").alias("max_underestimate"),
        )
    )
    if k is not None:
        out = out.orderBy(F.desc("est_count"), F.asc("item")).limit(k)
    return out


_Q_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("value", T.DoubleType()),
        T.StructField("weight", T.LongType()),
    ]
)


def quantile_summary(
    df: DataFrame, col: str, b: int = 1024
) -> DataFrame:
    """Mergeable ε-approximate quantile summary (MRL-style, deterministic):
    per-partition evenly spaced order statistics with their gap weights.

    Each partition of n_p rows sorts its values and emits one point per
    ``step = max(1, n_p // b)`` items: (value, weight) where weight is
    the number of partition rows in the half-open value-gap the point
    closes. Weights per partition sum to exactly n_p, so the union of
    partials is a weighted sample whose cumulative-weight rank function
    est_rank(v) deviates from the true rank by at most
    Σ_p (step_p − 1) ≤ n/b — a worst-case (not probabilistic) bound
    that holds under ANY partitioning and survives merging by plain
    union (no counter interaction, unlike MG). Partitions with
    n_p ≤ b emit every distinct-position value (step 1, zero error).

    Summary size ≤ 2·b points per partition — bounded like every other
    sketch here, so a 100 TB scan shuffles O(b · partitions) rows, and
    downstream quantile extraction is a window over a tiny frame.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        chunks = [
            pdf[col].dropna().to_numpy(dtype="float64") for pdf in batches
        ]
        vals = (
            np.sort(np.concatenate(chunks))
            if chunks
            else np.empty(0, dtype="float64")
        )
        n_p = len(vals)
        if n_p == 0:
            yield pd.DataFrame({"value": [], "weight": []})
            return
        step = max(1, n_p // b)
        # emit ranks step-1, 2*step-1, ... and always the last item, so
        # every gap between consecutive emitted ranks is ≤ step
        idx = list(range(step - 1, n_p, step))
        if idx[-1] != n_p - 1:
            idx.append(n_p - 1)
        prev = -1
        out_v, out_w = [], []
        for i in idx:
            out_v.append(float(vals[i]))
            out_w.append(i - prev)
            prev = i
        yield pd.DataFrame({"value": out_v, "weight": out_w})

    return df.select(F.col(col).cast("double").alias(col)).mapInPandas(
        summarize, schema=_Q_PARTIAL_SCHEMA
    )


def quantile_estimates(
    summary: DataFrame, qs: list[float]
) -> DataFrame:
    """Extract quantile estimates from a ``quantile_summary`` frame:
    (q, est_value) — est_value is the smallest summary point whose
    cumulative weight reaches ceil(q·n). Its true rank is within n/b of
    the target (the summary's worst-case bound), making the estimate an
    ε=1/b rank-accurate quantile.

    The summary is bounded-size (O(b · partitions)), so the cumulative
    window runs in one task on a coalesced frame — no full-data sort
    anywhere.
    """
    from pyspark.sql import Window

    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        summary.groupBy("value")
        .agg(F.sum("weight").alias("weight"))
        .select("value", F.sum("weight").over(w).alias("cum"))
    )
    total = cum.agg(F.max("cum").alias("n"))
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    targets = qdf.crossJoin(F.broadcast(total)).select(
        "q", F.ceil(F.col("q") * F.col("n")).cast("long").alias("target")
    )
    return (
        F.broadcast(targets)
        .join(cum, cum.cum >= targets.target)
        .groupBy("q")
        .agg(F.min("value").alias("est_value"))
        .orderBy("q")
    )


def grouped_quantile_summary(
    df: DataFrame, group_cols: list[str], col: str, b: int = 256
) -> DataFrame:
    """Per-group :func:`quantile_summary`: one bounded weighted sample
    per (partition, group). The n_g/b worst-case rank bound holds PER
    GROUP under any partitioning — each partition compresses each
    group's local run independently, and group partials merge by union
    exactly like the global summary.

    Output: group columns (original types) + (value, weight). Size
    ≤ 2·b points per group per partition; distribution profiling of a
    100 TB corpus by (source, lang) shuffles only these partials."""
    gtypes = [df.schema[c] for c in group_cols]
    out_schema = T.StructType(
        [*gtypes,
         T.StructField("value", T.DoubleType()),
         T.StructField("weight", T.LongType())]
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        chunks = list(batches)
        if not chunks:
            yield pd.DataFrame(
                {**{c: [] for c in group_cols}, "value": [], "weight": []}
            )
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if len(pdf) == 0:
            yield pd.DataFrame(
                {**{c: [] for c in group_cols}, "value": [], "weight": []}
            )
            return
        outs = []
        for key, grp in pdf.dropna(subset=[col]).groupby(
            group_cols, dropna=False, sort=False
        ):
            vals = np.sort(grp[col].to_numpy(dtype="float64"))
            n_p = len(vals)
            if n_p == 0:
                continue
            step = max(1, n_p // b)
            idx = list(range(step - 1, n_p, step))
            if idx[-1] != n_p - 1:
                idx.append(n_p - 1)
            prev = -1
            out_v, out_w = [], []
            for i in idx:
                out_v.append(float(vals[i]))
                out_w.append(i - prev)
                prev = i
            kvals = key if isinstance(key, tuple) else (key,)
            outs.append(
                pd.DataFrame(
                    {
                        **{
                            c: [kv] * len(out_v)
                            for c, kv in zip(group_cols, kvals)
                        },
                        "value": out_v,
                        "weight": out_w,
                    }
                )
            )
        yield (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(
                {**{c: [] for c in group_cols}, "value": [], "weight": []}
            )
        )

    return df.select(
        *group_cols, F.col(col).cast("double").alias(col)
    ).mapInPandas(summarize, schema=out_schema)


def grouped_quantile_estimates(
    summary: DataFrame, group_cols: list[str], qs: list[float]
) -> DataFrame:
    """Per-group quantile extraction from a grouped summary: one row per
    (group, q), est_value's true within-group rank within n_g/b of
    ceil(q·n_g). Window + joins over the bounded partial frame only."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        summary.groupBy(*group_cols, "value")
        .agg(F.sum("weight").alias("weight"))
        .select(*group_cols, "value", F.sum("weight").over(w).alias("cum"))
    )
    totals = cum.groupBy(*group_cols).agg(F.max("cum").alias("n"))
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    targets = totals.crossJoin(F.broadcast(qdf)).select(
        *group_cols,
        "q",
        "n",
        F.ceil(F.col("q") * F.col("n")).cast("long").alias("target"),
    )
    return (
        targets.join(cum, group_cols)
        .filter(F.col("cum") >= F.col("target"))
        .groupBy(*group_cols, "q", "n")
        .agg(F.min("value").alias("est_value"))
        .orderBy(*group_cols, "q")
    )


def count_min_sketch(
    df: DataFrame, key_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Build a Count-Min sketch of a key column as a (seed, bucket, cnt)
    frame — d×w counters (Cormode & Muthukrishnan 2005).

    Merge IS a sum: partial sketches from any partitioning combine by
    adding per-(seed, bucket) counts, so the build is one explode (×d)
    and one hash aggregate with map-side combining — sketching a 100 TB
    stream shuffles at most d·w counter rows per partition regardless
    of key cardinality.

    Hash family: bucket_i(x) = int(md5("i:" || x)[:5 hex]) mod w.
    md5 rather than xxhash64 keeps the sketch contents engine-portable
    (exactly reproducible in the DuckDB oracle); swap in xxhash64 for
    raw throughput where cross-engine parity isn't needed.
    """
    seeds = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("seed")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.col("seed"), F.col(key_col).cast("string"))
                ),
                1,
                5,
            ),
            16,
            10,
        ).cast("long")
        % w
    )
    return (
        df.select(F.col(key_col), seeds)
        .select("seed", bucket.alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Point-query the sketch: estimate(x) = min over seeds of the
    counter at bucket_i(x). Never undercounts; overcounts by collision
    mass ≤ e·n/w with probability ≥ 1 - e^-d.

    The probe side is exploded ×d, joined to the sketch on (seed,
    bucket) — broadcastable when the sketch is its bounded d·w size —
    then min-aggregated per key. Missing buckets are true zeros.
    """
    seeds = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("seed")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.col("seed"), F.col(key_col).cast("string"))
                ),
                1,
                5,
            ),
            16,
            10,
        ).cast("long")
        % w
    )
    probed = probes.select(F.col(key_col), seeds).select(
        key_col, "seed", bucket.alias("bucket")
    )
    return (
        probed.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_n"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the join-cardinality primitive.
# Keep the k smallest (deterministic) hash values of a column's distinct
# set; the sketch is mergeable by "k smallest of the union", supports
# distinct-count estimation ((k-1)/h_(k)), and — unlike plain HLL —
# supports SET INTERSECTION estimation: combine two sketches into the
# union's k-min set L, count how many of L lie in both input sketches,
# and scale the union estimate by that Jaccard fraction. That is exactly
# the |A ⋈ B| estimate a planner wants before committing to a join
# strategy. Hashes use the cross-engine md5-prefix recipe and the
# estimator is pure INTEGER arithmetic (c·(k'-1)·2^32 div (k'·(h_max+1)))
# so the DuckDB oracle reproduces the estimate bit-exactly.
# ---------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV sketch: (g, h) rows, the k smallest distinct
    32-bit md5-prefix hashes of ``value_col`` within each group.

    Scale shape: one distinct on (group, hash) — the only shuffle, with
    map-side combine — then a per-group bottom-k window over ≤ the
    distinct set. The sketch is k rows per group regardless of corpus
    size; a group with fewer than k distinct values yields an
    EXHAUSTIVE sketch (callers detect this via the row count and switch
    estimates to exact counts).

    NULL values are excluded before hashing: md5(NULL) is NULL, and the
    two engines disagree on where a NULL hash sorts (Spark ascending
    windows put NULLs FIRST — stealing a bottom-k slot — while the
    DuckDB oracle's ORDER BY is NULLS LAST), so a single NULL value
    would silently diverge the sketch contents cross-engine.
    """
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    hashes = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("g"), h.alias("h"))
        .distinct()
    )
    return _kmv_bottom_k(hashes, k)


def _kmv_bottom_k(hashes: DataFrame, k: int) -> DataFrame:
    """k smallest distinct h per group g — THE sketch invariant; every
    KMV path (build, merge, pair union) must apply the identical rule
    or the lossless-merge property silently breaks."""
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("h")
    return (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("g", "h")
    )


def kmv_merge(sketch_a: DataFrame, sketch_b: DataFrame, k: int = 64) -> DataFrame:
    """Merge two per-group KMV sketches: k smallest distinct hashes of
    the union, per group — exactly ``kmv_sketch`` of the concatenated
    inputs (the lossless-merge property that makes KMV a sketch rather
    than a sample: sketches computed per partition / per day / per
    table can be combined without revisiting any base data; pinned by
    tests/test_kmv.py::test_merge_equals_sketch_of_union).

    Scale shape: inputs are k rows per group by construction, so the
    merge is sketch-sized work — one distinct + bottom-k over ≤ 2k rows
    per group, no base-table access.

    CONTRACT: the merge ``k`` must be <= the k used to BUILD both
    inputs. A k-row sketch has already discarded hashes above its k-th
    minimum, so merging with a LARGER k yields a frame that is NOT the
    k-min sketch of the union — it simply cannot recover the discarded
    values, and nothing downstream can detect the corruption. The
    lossless-merge property test (tests/test_kmv.py) holds only under
    this k relationship; pass the build k (or smaller) here.
    """
    both = sketch_a.select("g", "h").unionByName(
        sketch_b.select("g", "h")
    ).distinct()
    return _kmv_bottom_k(both, k)


def kmv_intersection_estimates(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    include_exact: bool = False,
) -> DataFrame:
    """Pairwise intersection-cardinality estimates between all groups,
    from k-row sketches only. With ``include_exact=True`` the exact
    intersection rides along as an audit column — that branch costs the
    full-data self-join the sketch exists to avoid, so production runs
    the default sketch-only path (the registry splits the two as
    events_kmv_estimates / events_kmv_audit so plan audits see the
    product plan, not the verification scaffold).

    For each group pair (a < b): L = k smallest of sketch_a ∪ sketch_b;
    c = |{x ∈ L : x ∈ sketch_a ∧ x ∈ sketch_b}|; the union estimate is
    (k'-1)·2^32 div (h_max+1) with k' = |L|, and the intersection
    estimate scales it by c/k' — all integer arithmetic, identical in
    Spark (`div`) and DuckDB (`//`). When k' < k both sketches were
    exhaustive, so c is the intersection of the full 32-bit md5-prefix
    HASH sets — exact up to 32-bit prefix collisions between distinct
    values (both engines hash identically, so the oracle still matches;
    only the exactness claim carries that caveat).
    """
    # the sketch is referenced three times below (the type list and
    # both pair sides); without a barrier Catalyst re-executes the
    # full base-data distinct per reference (measured: 19 exchanges in
    # the product plan, 3 redundant base scans). The sketch is k rows
    # per group — materialize it once, lazily (eager=False keeps
    # DataFrame construction side-effect-free, same contract as
    # cosine_dup_pairs).
    sk = kmv_sketch(df, group_col, value_col, k).localCheckpoint(
        eager=False
    )
    types = sk.select("g").distinct()
    pairs = (
        types.alias("x")
        .join(types.alias("y"), F.col("x.g") < F.col("y.g"))
        .select(F.col("x.g").alias("ta"), F.col("y.g").alias("tb"))
    )
    ca = (
        F.broadcast(pairs)
        .join(sk, sk.g == F.col("ta"))
        .select(
            "ta", "tb", "h",
            F.lit(True).alias("in_a"), F.lit(False).alias("in_b"),
        )
    )
    cb = (
        F.broadcast(pairs)
        .join(sk, sk.g == F.col("tb"))
        .select(
            "ta", "tb", "h",
            F.lit(False).alias("in_a"), F.lit(True).alias("in_b"),
        )
    )
    cand = (
        ca.unionByName(cb)
        .groupBy("ta", "tb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("ta", "tb").orderBy("h")
    L = cand.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    stats = L.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("kp"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long")).alias("c"),
        F.max("h").alias("hmax"),
    )
    est = F.when(F.col("kp") < k, F.col("c")).otherwise(
        F.expr("(c * (kp - 1) * 4294967296) div (kp * (hmax + 1))")
    )
    if not include_exact:
        return stats.select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            est.cast("long").alias("est_common_users"),
        ).orderBy("type_a", "type_b")
    dist = df.select(
        F.col(group_col).alias("t"), F.col(value_col).alias("u")
    ).distinct()
    exact = (
        dist.alias("a")
        .join(
            dist.alias("b"),
            (F.col("a.u") == F.col("b.u")) & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(
            F.col("a.t").alias("ta"), F.col("b.t").alias("tb")
        )
        .agg(F.count(F.lit(1)).alias("exact_common"))
    )
    return (
        stats.join(exact, ["ta", "tb"], "left")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            est.cast("long").alias("est_common_users"),
            F.coalesce("exact_common", F.lit(0))
            .cast("long")
            .alias("exact_common_users"),
        )
        .orderBy("type_a", "type_b")
    )

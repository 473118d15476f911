"""Property-graph model: nodes + typed edges as DataFrames.

The reference stores a labeled property graph in Neo4j — Person/House
nodes and five relationship types created by rule-based ETL
(reference: get_insert.py:74-163). We realize the same model as two
DataFrames (GraphFrames convention):

    persons(id BIGINT, name STRING, house STRING, segment STRING,
            acctbal DOUBLE, species STRING, gender STRING, alive BOOLEAN,
            image STRING, is_user BOOLEAN)
    edges(src BIGINT, dst BIGINT, type STRING)

mapped from the driver's tables per FIXTURES.md §5: ``customer`` plays
persons, ``nation`` plays houses, and the reference's rule-derived edges
are re-derived with the same *shape*:

    FRIEND_OF      same house (co-nation), stored once with
                   name(a) < name(b)                 [get_insert.py:132-138]
    SAME_FAMILY    same surname (here: last 2 digits of the customer
                   name — a derived join key, like Cypher's
                   split(name,' ')[-1]), stored once  [get_insert.py:122-128]
    ENEMY_OF       every member of house_a × every member of house_b,
                   stored in BOTH directions           [get_insert.py:141-145]
    ROMANTIC_WITH  curated small pair list, BOTH directions
                                                      [get_insert.py:147-163]
    BELONGS_TO     person → house, normalized as persons.house (a
                   foreign key, not an edge row)      [get_insert.py:107-111]

Scale notes (100 TB design):
- FRIEND_OF is a quadratic self-join keyed on ``house`` — the classic
  skewed self-join. The join key is derived *first* (never a theta-join),
  AQE skew-join is on (session.py), and the tie-break ``a.name < b.name``
  halves the output exactly like the reference's ``id(a) < id(b)``.
- ENEMY_OF is an explicit cross join of two *filtered* sides; at scale the
  smaller side must be broadcast — Catalyst does this automatically once
  the filter brings it under the broadcast threshold.
- All symmetric-type reads go through :meth:`GraphModel.sym_edges`, a
  lazy union of both directions (storage stays canonical, 1×).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neo4j_database_spark.catalog import load_table

# Relationship types stored once with src.name < dst.name, queried undirected.
CANONICAL_TYPES = ("FRIEND_OF", "SAME_FAMILY")
# Relationship types stored in both directions (reference stores them twice).
BIDIRECTIONAL_TYPES = ("ENEMY_OF", "ROMANTIC_WITH")

# The two feuding houses of the enemy rule (Gryffindor × Slytherin analog).
ENEMY_HOUSE_A = "NATION_0"
ENEMY_HOUSE_B = "NATION_1"

# Curated-romance analog (get_insert.py:15-43 is a fixed 27-pair list):
# customers whose key is a multiple of ROMANCE_STEP pair with key+1.
ROMANCE_STEP = 101


# Full person property set of the reference (get_insert.py:87-103 SETs
# house, species, gender, alive, image, id; app.py:105 adds isUser on
# user writeback). The TPC-H fixture tables have no such columns, so they
# are derived as pure functions of the person id — deterministic,
# engine-portable (the DuckDB oracle CTE reproduces the same CASE
# expressions), and stable under repartitioning.
PERSON_PROP_COLS = ("species", "gender", "alive", "image", "is_user")


def with_person_props(persons: DataFrame) -> DataFrame:
    """Add any missing reference person properties, derived from ``id``.

    Idempotent: frames that already carry a property column (e.g. a real
    ingest through etl.normalize_persons, or a user-node writeback) keep
    their values; only absent columns are filled. Test fixtures with the
    minimal (id, name, house, segment, acctbal) schema pass through here
    so every serving query can rely on the full property set.
    """
    out = persons
    if "species" not in out.columns:
        out = out.withColumn(
            "species",
            F.when(F.col("id") % 19 == 0, F.lit("half-giant"))
            .when(F.col("id") % 23 == 0, F.lit("werewolf"))
            .otherwise(F.lit("human")),
        )
    if "gender" not in out.columns:
        out = out.withColumn(
            "gender",
            F.when(F.col("id") % 2 == 0, F.lit("female")).otherwise(
                F.lit("male")
            ),
        )
    if "alive" not in out.columns:
        out = out.withColumn("alive", (F.col("id") % 7) != 0)
    if "image" not in out.columns:
        out = out.withColumn(
            "image",
            F.when(F.col("id") % 10 < 3, F.lit("")).otherwise(
                F.concat(
                    F.lit("https://img.invalid/p"),
                    F.col("id").cast("string"),
                    F.lit(".png"),
                )
            ),
        )
    if "is_user" not in out.columns:
        out = out.withColumn("is_user", F.lit(False))
    return out


def persons_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Person nodes: customer rows with the house (nation name) denormalized
    plus the reference's full property set (species/gender/alive/image/
    is_user, get_insert.py:87-103).

    The nation dim is ≤25 rows — broadcast join, no shuffle on the fact side.
    """
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    return with_person_props(
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
            "left",
        )
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("house"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").alias("acctbal"),
        )
    )


def houses_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """House nodes (nation dim)."""
    return load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("id"), F.col("n_name").alias("name")
    )


def _family_key(name_col: F.Column) -> F.Column:
    """Derived surname key: last 2 characters of the person name.

    Mirrors the reference's ``split(a.name,' ')[-1]`` (get_insert.py:125) —
    an equality join on a *derived* column, which Catalyst hashes like any
    equi-join key (never express this as a theta-join).
    """
    return F.substring(name_col, -2, 2)


def friend_edges(persons: DataFrame) -> DataFrame:
    """FRIEND_OF: same non-null house, canonical direction name(a)<name(b).

    Reference: get_insert.py:132-138 (``a.house = b.house AND id(a)<id(b)``).
    Deterministic total order by name replaces Neo4j's internal id
    (SURVEY.md §2 F4). Quadratic per house — AQE skew-join handles hot
    houses; at 100 TB this is additionally a candidate for salting the
    house key.
    """
    a = persons.filter(F.col("house").isNotNull()).select(
        F.col("id").alias("src"), F.col("name").alias("src_name"), "house"
    )
    b = persons.filter(F.col("house").isNotNull()).select(
        F.col("id").alias("dst"), F.col("name").alias("dst_name"), "house"
    )
    return (
        a.join(b, "house")
        .filter(F.col("src_name") < F.col("dst_name"))
        .select("src", "dst", F.lit("FRIEND_OF").alias("type"))
    )


def family_edges(persons: DataFrame) -> DataFrame:
    """SAME_FAMILY: equal derived surname key, canonical direction.

    Reference: get_insert.py:122-128.
    """
    a = persons.select(
        F.col("id").alias("src"),
        F.col("name").alias("src_name"),
        _family_key(F.col("name")).alias("fam"),
    )
    b = persons.select(
        F.col("id").alias("dst"),
        F.col("name").alias("dst_name"),
        _family_key(F.col("name")).alias("fam"),
    )
    return (
        a.join(b, "fam")
        .filter(F.col("src_name") < F.col("dst_name"))
        .select("src", "dst", F.lit("SAME_FAMILY").alias("type"))
    )


def enemy_edges(persons: DataFrame) -> DataFrame:
    """ENEMY_OF: cross join of two filtered houses, stored both directions.

    Reference: get_insert.py:141-145 (Gryffindor × Slytherin, MERGE both
    ways). Both sides are filtered to a single house before the cross
    join so the optimizer can broadcast the smaller one.
    """
    a = persons.filter(F.col("house") == ENEMY_HOUSE_A).select(
        F.col("id").alias("src")
    )
    b = persons.filter(F.col("house") == ENEMY_HOUSE_B).select(
        F.col("id").alias("dst")
    )
    fwd = a.crossJoin(b)
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).select(
        "src", "dst", F.lit("ENEMY_OF").alias("type")
    )


def romance_edges(persons: DataFrame) -> DataFrame:
    """ROMANTIC_WITH: deterministic curated-pair analog, both directions.

    Reference: get_insert.py:147-163 iterates a fixed 27-pair list; here
    the "curated list" is {(k, k+1) : k ≡ 0 (mod ROMANCE_STEP)}, joined
    against persons so dangling pairs are dropped (like the reference's
    MATCH-before-MERGE).
    """
    ids = persons.select("id")
    fwd = (
        ids.filter((F.col("id") % ROMANCE_STEP) == 0)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .join(ids.select(F.col("id").alias("dst")), "dst")
    )
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).select(
        "src", "dst", F.lit("ROMANTIC_WITH").alias("type")
    )


def build_edges(persons: DataFrame) -> DataFrame:
    """All person↔person edges; unique on (src, dst, type) by construction.

    Cypher MERGE's create-iff-absent semantics (SURVEY.md §2 S5) hold
    structurally: each rule emits distinct pairs (tie-break filters /
    distinct cross products) and rules are disjoint by type, so no dedup
    shuffle is spent here. The invariant is enforced by test
    (tests/test_graph_model.py::test_edges_unique) instead of a 6M-row
    dropDuplicates in the build hot path; ingest-facing merges
    (etl.derive_rule_edges, etl.upsert_user_node) keep their explicit
    dropDuplicates because their inputs are not structurally unique.
    """
    return (
        friend_edges(persons)
        .unionByName(family_edges(persons))
        .unionByName(enemy_edges(persons))
        .unionByName(romance_edges(persons))
    )


@dataclass(frozen=True)
class GraphModel:
    """The materialized-as-plan property graph for one scale factor."""

    persons: DataFrame
    houses: DataFrame
    edges: DataFrame
    # Identity of the immutable store snapshot backing this model, set by
    # ``store.load_graph`` ((store dir, build-marker mtime)) and None for
    # derived/mutated models. Enables the Cypher compiled-plan cache
    # (cypher.run_cypher): Neo4j-style statement-plan caching is only
    # sound when the underlying graph is known not to have changed.
    plan_cache_key: tuple | None = None

    def sym_edges(self, types: tuple[str, ...] | None = None) -> DataFrame:
        """Undirected edge view: canonical types unioned with their reverse.

        Reproduces Cypher's ``-[:T]-`` over one-way storage
        (SURVEY.md §1.3). Bidirectional types are already stored both
        ways, so only canonical types get reversed — no double counting.
        """
        e = self.edges
        if types is not None:
            e = e.filter(F.col("type").isin(list(types)))
        canonical = e.filter(F.col("type").isin(list(CANONICAL_TYPES)))
        rev = canonical.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "type"
        )
        return e.unionByName(rev)


def build_graph(spark: SparkSession, sf_dir: str) -> GraphModel:
    persons = persons_df(spark, sf_dir)
    return GraphModel(
        persons=persons,
        houses=houses_df(spark, sf_dir),
        edges=build_edges(persons),
    )

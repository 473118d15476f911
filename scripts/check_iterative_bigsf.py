"""Sequential-materialization DuckDB oracles for the iterative graph
algorithms at big SFs (VERDICT r03 item 5).

The registry oracles unroll every superstep into ONE chained-CTE
statement; at sf0.1 DuckDB has to materialize ~10 rounds of 24M-edge
intermediates inside a single query and exhausts temp disk. Here each
round materializes into a TEMP TABLE and the previous round is dropped,
so peak disk is one round — the oracle-side equivalent of the engine's
localCheckpoint-per-superstep. The per-round arithmetic is copied
verbatim from the unrolled builders in __spark_entry__
(_pagerank_sql / _hits_sql / _ktruss_sql / _sssp_rounds_sql), including
the nano-unit quantization contract and the Python-side scalar
recurrences, so the comparison is exactly as strict as the driver's.

Usage: python scripts/check_iterative_bigsf.py [sf_dir] [name ...]
Defaults: sf_dir=/root/testdata/sf0.1, all eight algorithms
(g_pagerank g_pagerank_prod g_connected_components g_hits g_ktruss
g_sssp g_kcore g_label_propagation — the last two added r08 per
VERDICT r07 item 7: the same scale-graze risk class the pagerank
margin lint covers).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import duckdb

import __spark_entry__ as entrymod
from check_oracle import table_fingerprint
from neo4j_database_spark.session import get_spark

NANO = "CAST(1000000000 AS DOUBLE)"


def build_graph_tables(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for t in entrymod.ALL_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    # materialize the property graph once; every algorithm reuses it
    con.execute(
        f"CREATE TEMP TABLE t_persons AS {entrymod.GRAPH_CTES} "
        "SELECT * FROM persons"
    )
    con.execute(
        f"CREATE TEMP TABLE t_edges AS {entrymod.GRAPH_CTES} "
        "SELECT * FROM edges"
    )
    con.execute(
        "CREATE TEMP TABLE t_sym AS "
        "SELECT src, dst, type FROM t_edges "
        "UNION ALL "
        "SELECT dst AS src, src AS dst, type FROM t_edges "
        "WHERE type IN ('FRIEND_OF', 'SAME_FAMILY')"
    )


def _swap_in(con, cur: str, nxt: str) -> None:
    con.execute(f"DROP TABLE IF EXISTS {cur}")
    con.execute(f"ALTER TABLE {nxt} RENAME TO {cur.split('.')[-1]}")


def oracle_pagerank(con, max_iter: int = 10, damping: float = 0.85):
    """Per-round materialized twin of _pagerank_sql: same nano-quantized
    contribution sum per round; the teleport+dangling scalar recurrence
    runs in PYTHON doubles with the engine's exact operation order
    (algorithms.py::pagerank) and binds per round as a prepared
    PARAMETER — never a text literal: DuckDB parses decimal literals
    whose unscaled digits exceed 2^53 through an inexact int64→double
    conversion (see oracle_hits), while a bound Python float crosses
    exactly."""
    d = f"CAST({damping!r} AS DOUBLE)"
    con.execute(
        "CREATE TEMP TABLE pr_deg AS "
        "SELECT src, COUNT(*) AS deg FROM t_sym GROUP BY src"
    )
    n = con.execute("SELECT COUNT(*) FROM t_persons").fetchone()[0]
    n_deg = con.execute("SELECT COUNT(*) FROM pr_deg").fetchone()[0]
    n_dang = n - n_deg
    dangling_mass = n_dang / n
    con.execute(
        "CREATE TEMP TABLE pr_r AS "
        "SELECT id, ? AS rank FROM t_persons",
        [1.0 / n],
    )
    for _ in range(max_iter):
        tpd = (1.0 - damping) / n + damping * dangling_mass / n
        con.execute(
            f"""CREATE TEMP TABLE pr_next AS
SELECT p.id,
       ? + {d} * COALESCE(i.inflow, CAST(0 AS DOUBLE)) AS rank
FROM t_persons p
LEFT JOIN (
  SELECT e.dst AS id,
         CAST(SUM(CAST(round((r.rank / CAST(dg.deg AS DOUBLE)) * {NANO})
                       AS BIGINT)) AS DOUBLE) / {NANO} AS inflow
  FROM t_sym e
  JOIN pr_r r ON e.src = r.id
  JOIN pr_deg dg ON dg.src = e.src
  GROUP BY e.dst
) i ON i.id = p.id""",
            [tpd],
        )
        _swap_in(con, "pr_r", "pr_next")
        dangling_mass = n_dang * tpd
    return con.execute(
        "SELECT p.name, r.rank FROM t_persons p JOIN pr_r r ON r.id = p.id "
        "ORDER BY r.rank DESC, p.name ASC"
    )


def oracle_connected_components(con):
    """CC's oracle is closed-form (FRIEND_OF components = per-house
    cliques) — no iteration needed; included so the big-SF row exists
    alongside the genuinely iterative ones."""
    return con.execute(
        "SELECT MIN(id) AS component, COUNT(*) AS size "
        "FROM t_persons GROUP BY house ORDER BY component"
    )


def oracle_hits(con, max_iter: int = 5):
    """Per-round materialized twin of _hits_sql: nano-quantized
    contribution and squared-norm sums; the L2 norm stays INSIDE SQL
    as a 1-row cross join exactly like the unrolled CTE. (A first cut
    fetched the norm to Python and inlined it via repr — DuckDB parses
    a 16-digit decimal literal whose unscaled value exceeds 2^53
    through an inexact int64→double conversion, which double-rounded
    nrm=928.6399908161095 one ulp off at sf0.1 and flipped ~14k output
    cells by 1 ulp. Scalars that must ROUND-TRIP through Python bind
    as prepared parameters instead — never as text literals.)"""
    n = con.execute("SELECT COUNT(*) FROM t_persons").fetchone()[0]
    con.execute("DROP TABLE IF EXISTS ht_h")
    con.execute("DROP TABLE IF EXISTS ht_a")
    con.execute(
        f"CREATE TEMP TABLE ht_h AS SELECT id, "
        f"CAST(1 AS DOUBLE) / CAST({n} AS DOUBLE) AS hub FROM t_persons"
    )
    for _ in range(max_iter):
        con.execute(
            f"""CREATE TEMP TABLE ht_ar AS
SELECT p.id, COALESCE(i.raw, CAST(0 AS DOUBLE)) AS raw
FROM t_persons p LEFT JOIN (
  SELECT e.dst AS id,
    CAST(SUM(CAST(round(h.hub * {NANO}) AS BIGINT)) AS DOUBLE) / {NANO} AS raw
  FROM t_edges e JOIN ht_h h ON e.src = h.id GROUP BY e.dst
) i ON i.id = p.id"""
        )
        con.execute(
            f"CREATE TEMP TABLE ht_a_next AS "
            f"SELECT id, raw / nrm AS auth FROM ht_ar, ("
            f"SELECT sqrt(CAST(SUM(CAST(round((raw * raw) * {NANO}) "
            f"AS BIGINT)) AS DOUBLE) / {NANO}) AS nrm FROM ht_ar)"
        )
        con.execute("DROP TABLE ht_ar")
        _swap_in(con, "ht_a", "ht_a_next")
        con.execute(
            f"""CREATE TEMP TABLE ht_hr AS
SELECT p.id, COALESCE(i.raw, CAST(0 AS DOUBLE)) AS raw
FROM t_persons p LEFT JOIN (
  SELECT e.src AS id,
    CAST(SUM(CAST(round(a.auth * {NANO}) AS BIGINT)) AS DOUBLE) / {NANO} AS raw
  FROM t_edges e JOIN ht_a a ON e.dst = a.id GROUP BY e.src
) i ON i.id = p.id"""
        )
        con.execute(
            f"CREATE TEMP TABLE ht_h_next AS "
            f"SELECT id, raw / nrm AS hub FROM ht_hr, ("
            f"SELECT sqrt(CAST(SUM(CAST(round((raw * raw) * {NANO}) "
            f"AS BIGINT)) AS DOUBLE) / {NANO}) AS nrm FROM ht_hr)"
        )
        con.execute("DROP TABLE ht_hr")
        _swap_in(con, "ht_h", "ht_h_next")
    return con.execute(
        "SELECT p.name, h.hub, a.auth AS authority "
        "FROM t_persons p "
        "JOIN ht_h h ON h.id = p.id "
        "JOIN ht_a a ON a.id = p.id "
        "ORDER BY authority DESC, h.hub DESC, p.name ASC"
    )


def oracle_ktruss(con, k: int = 5, rounds: int = 5):
    """Per-round materialized twin of _ktruss_sql (pure integer peel)."""
    ms = k - 2
    con.execute(
        "CREATE TEMP TABLE kt_e AS SELECT DISTINCT least(src, dst) AS src, "
        "greatest(src, dst) AS dst FROM t_edges WHERE type = 'FRIEND_OF'"
    )

    def support():
        con.execute("DROP TABLE IF EXISTS kt_s")
        con.execute(
            "CREATE TEMP TABLE kt_s AS "
            "SELECT src, dst, COUNT(*) AS support FROM ("
            "SELECT ab.src, ab.dst FROM kt_e ab "
            "JOIN kt_e bc ON ab.dst = bc.src "
            "JOIN kt_e ac ON ac.src = ab.src AND ac.dst = bc.dst "
            "UNION ALL "
            "SELECT ab.dst AS src, bc.dst AS dst FROM kt_e ab "
            "JOIN kt_e bc ON ab.dst = bc.src "
            "JOIN kt_e ac ON ac.src = ab.src AND ac.dst = bc.dst "
            "UNION ALL "
            "SELECT ab.src, bc.dst AS dst FROM kt_e ab "
            "JOIN kt_e bc ON ab.dst = bc.src "
            "JOIN kt_e ac ON ac.src = ab.src AND ac.dst = bc.dst"
            ") GROUP BY 1, 2"
        )

    for _ in range(rounds):
        support()
        con.execute(
            f"CREATE TEMP TABLE kt_e_next AS "
            f"SELECT e.src, e.dst FROM kt_e e "
            f"LEFT JOIN kt_s s ON s.src = e.src AND s.dst = e.dst "
            f"WHERE COALESCE(s.support, 0) >= {ms}"
        )
        _swap_in(con, "kt_e", "kt_e_next")
    support()
    return con.execute(
        "SELECT pa.name AS a_name, pb.name AS b_name, "
        "CAST(COALESCE(s.support, 0) AS BIGINT) AS support "
        "FROM kt_e e "
        "LEFT JOIN kt_s s ON s.src = e.src AND s.dst = e.dst "
        "JOIN t_persons pa ON pa.id = e.src "
        "JOIN t_persons pb ON pb.id = e.dst "
        "ORDER BY a_name, b_name"
    )


def oracle_sssp(con, rounds: int = 8):
    """Per-round materialized twin of _sssp_rounds_sql (integer min-plus
    Bellman-Ford relaxation over (src+dst)%7+1 weights)."""
    seed = entrymod.EGO_NAME.replace("'", "''")
    con.execute(
        "CREATE TEMP TABLE ss_we AS SELECT src, dst, (src + dst) % 7 + 1 AS w "
        "FROM t_sym WHERE type = 'FRIEND_OF'"
    )
    con.execute(
        f"CREATE TEMP TABLE ss_d AS SELECT id, CAST(0 AS BIGINT) AS d "
        f"FROM t_persons WHERE name = '{seed}'"
    )
    for _ in range(rounds):
        con.execute(
            "CREATE TEMP TABLE ss_d_next AS "
            "SELECT id, MIN(d) AS d FROM ("
            "SELECT id, d FROM ss_d "
            "UNION ALL "
            "SELECT e.dst AS id, p.d + e.w AS d "
            "FROM ss_d p JOIN ss_we e ON e.src = p.id"
            ") GROUP BY id"
        )
        _swap_in(con, "ss_d", "ss_d_next")
    return con.execute(
        "SELECT p.name, CAST(d.d AS BIGINT) AS dist "
        "FROM ss_d d JOIN t_persons p USING (id) ORDER BY p.name"
    )


def oracle_pagerank_prod(
    con, max_iter: int = 30, damping: float = 0.85, tol: float = 1e-3
):
    """Per-round materialized twin of _pagerank_tol_sql: the same
    nano-quantized rounds as oracle_pagerank, plus the engine's
    convergence rule — checkpoints after supersteps 2, 4, 6, …, L1
    between consecutive checkpoints over ACTIVE (non-isolated) nodes
    only, stop at the first L1 < tol (ceiling ``max_iter``)."""
    d = f"CAST({damping!r} AS DOUBLE)"
    con.execute("DROP TABLE IF EXISTS pr_deg")
    con.execute(
        "CREATE TEMP TABLE pr_deg AS "
        "SELECT src, COUNT(*) AS deg FROM t_sym GROUP BY src"
    )
    n = con.execute("SELECT COUNT(*) FROM t_persons").fetchone()[0]
    n_deg = con.execute("SELECT COUNT(*) FROM pr_deg").fetchone()[0]
    n_dang = n - n_deg
    dangling_mass = n_dang / n
    con.execute("DROP TABLE IF EXISTS pr_r")
    con.execute(
        "CREATE TEMP TABLE pr_r AS SELECT id, ? AS rank FROM t_persons",
        [1.0 / n],
    )
    con.execute("DROP TABLE IF EXISTS pr_prev")
    have_prev = False
    for it in range(max_iter):
        tpd = (1.0 - damping) / n + damping * dangling_mass / n
        con.execute(
            f"""CREATE TEMP TABLE pr_next AS
SELECT p.id,
       ? + {d} * COALESCE(i.inflow, CAST(0 AS DOUBLE)) AS rank
FROM t_persons p
LEFT JOIN (
  SELECT e.dst AS id,
         CAST(SUM(CAST(round((r.rank / CAST(dg.deg AS DOUBLE)) * {NANO})
                       AS BIGINT)) AS DOUBLE) / {NANO} AS inflow
  FROM t_sym e
  JOIN pr_r r ON e.src = r.id
  JOIN pr_deg dg ON dg.src = e.src
  GROUP BY e.dst
) i ON i.id = p.id""",
            [tpd],
        )
        _swap_in(con, "pr_r", "pr_next")
        dangling_mass = n_dang * tpd
        if it % 2 == 1 or it == max_iter - 1:
            if have_prev:
                l1 = con.execute(
                    "SELECT SUM(ABS(a.rank - b.rank)) FROM pr_r a "
                    "JOIN pr_prev b ON a.id = b.id "
                    "WHERE a.id IN (SELECT src FROM pr_deg)"
                ).fetchone()[0]
                if l1 is not None and l1 < tol:
                    break
            con.execute("DROP TABLE IF EXISTS pr_prev")
            con.execute("CREATE TEMP TABLE pr_prev AS SELECT * FROM pr_r")
            have_prev = True
    return con.execute(
        "SELECT p.name, r.rank FROM t_persons p JOIN pr_r r ON r.id = p.id "
        "ORDER BY r.rank DESC, p.name ASC"
    )


def oracle_kcore(con, k: int = 70, rounds: int = 10):
    """Per-round materialized twin of _kcore_rounds_sql (pure integer
    peel: recompute degrees on the surviving subgraph, drop nodes
    under k)."""
    con.execute(
        "CREATE TEMP TABLE kc_a AS SELECT id FROM t_persons"
    )
    for _ in range(rounds):
        con.execute(
            f"CREATE TEMP TABLE kc_a_next AS "
            f"SELECT src AS id FROM ("
            f"SELECT e.src, COUNT(*) AS n FROM t_sym e "
            f"JOIN kc_a s ON e.src = s.id "
            f"JOIN kc_a t ON e.dst = t.id GROUP BY e.src"
            f") WHERE n >= {k}"
        )
        _swap_in(con, "kc_a", "kc_a_next")
    return con.execute(
        "SELECT p.name FROM t_persons p JOIN kc_a USING (id) "
        "ORDER BY p.name"
    )


def oracle_label_propagation(con, rounds: int = 5):
    """Per-round materialized twin of _lpa_rounds_sql: each node adopts
    its neighbors' most frequent label, ties to the smallest label
    ((n DESC, label ASC) is a total order per node, so every round is
    engine-exact); isolated nodes keep theirs."""
    con.execute(
        "CREATE TEMP TABLE lp_l AS SELECT id, id AS label FROM t_persons"
    )
    for _ in range(rounds):
        con.execute(
            "CREATE TEMP TABLE lp_l_next AS "
            "SELECT a.id, COALESCE(b.label, a.label) AS label "
            "FROM lp_l a LEFT JOIN ("
            "SELECT src AS id, label FROM ("
            "SELECT src, label, row_number() OVER "
            "(PARTITION BY src ORDER BY n DESC, label ASC) AS rn "
            "FROM (SELECT e.src, l.label, COUNT(*) AS n "
            "FROM t_sym e JOIN lp_l l ON e.dst = l.id "
            "GROUP BY e.src, l.label)) WHERE rn = 1"
            ") b ON a.id = b.id"
        )
        _swap_in(con, "lp_l", "lp_l_next")
    return con.execute(
        "SELECT p.name, CAST(l.label AS BIGINT) AS community "
        "FROM lp_l l JOIN t_persons p USING (id) ORDER BY p.name"
    )


ORACLES = {
    "g_pagerank": oracle_pagerank,
    "g_pagerank_prod": oracle_pagerank_prod,
    "g_connected_components": oracle_connected_components,
    "g_hits": oracle_hits,
    "g_ktruss": oracle_ktruss,
    "g_sssp": oracle_sssp,
    "g_kcore": oracle_kcore,
    "g_label_propagation": oracle_label_propagation,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(ORACLES)
    spark = get_spark("iterative-bigsf-check")
    con = duckdb.connect()
    build_graph_tables(con, sf_dir)
    qs = entrymod.queries()
    failures = []
    for name in names:
        sdf = qs[name](spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        res = ORACLES[name](con)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        sc, sn, sh, sl = table_fingerprint(scols, srows)
        oc, on, oh, ol = table_fingerprint(ocols, orows)
        ok = (sc == oc) and (sn == on) and (sh == oh)
        print(f"{name:28s} {'OK ' if ok else 'FAIL'} spark={sn} oracle={on}")
        if not ok:
            failures.append(name)
            if sc != oc:
                print(f"  schema: spark={sc} oracle={oc}")
            else:
                sset, oset = set(sl), set(ol)
                for line in list(sset - oset)[:3]:
                    print(f"  spark-only:  {line!r}")
                for line in list(oset - sset)[:3]:
                    print(f"  oracle-only: {line!r}")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all OK")


if __name__ == "__main__":
    main()

"""Static lints over the oracle corpus (scripts/check_oracle.py).

The round-4 judge proved the local checker's fetchall() path cannot see
the driver's failure mode for HUGEINT outputs (DuckDB types a bare
SUM(BIGINT) as int128; fetchall() → Python int == Spark, pandas/Arrow →
float64 '204.0' != '204').  These tests pin the TYPE-level preflight that
closes the blind spot, and keep the older per-row-DECIMAL-roundtrip lint
honest.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "scripts"))

import __spark_entry__ as entrymod
from check_oracle import (
    lint_per_row_decimal_roundtrip,
    preflight_result_types,
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE t (k INT, qty BIGINT, price DOUBLE)")
    c.execute("INSERT INTO t VALUES (1, 100, 1.5), (1, 104, 2.5)")
    return c


def test_preflight_rejects_uncast_sum_bigint(con):
    # DuckDB types SUM(BIGINT) as HUGEINT — exactly the Q18/Q20 red class
    bad = preflight_result_types(
        con, {"synthetic": "SELECT k, SUM(qty) AS total FROM t GROUP BY k"}
    )
    assert bad == [("synthetic", "total", "HUGEINT")]


def test_preflight_rejects_decimal_output(con):
    bad = preflight_result_types(
        con,
        {"synthetic": "SELECT CAST(SUM(price) AS DECIMAL(18,2)) AS m FROM t"},
    )
    assert [(n, c) for n, c, _ in bad] == [("synthetic", "m")]
    assert bad[0][2].upper().startswith("DECIMAL")


def test_preflight_accepts_cast_bigint_and_double(con):
    ok_sql = (
        "SELECT k, CAST(SUM(qty) AS BIGINT) AS total, "
        "CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS m, "
        "COUNT(*) AS n FROM t GROUP BY k"
    )
    assert preflight_result_types(con, {"ok": ok_sql}) == []


def test_decimal_roundtrip_lint_still_fires():
    sql = "SELECT CAST(CAST(o_totalprice AS DECIMAL(28,6)) AS DOUBLE) FROM orders"
    assert lint_per_row_decimal_roundtrip({"q": sql}) == [
        ("q", "o_totalprice", 28)
    ]


def test_registry_oracles_pass_both_lints(sf_dir):
    """Every registered oracle binds clean: no HUGEINT/UHUGEINT/DECIMAL
    output column anywhere (judge r04: 3 latent bombs sat out-of-window
    passing fetchall() locally), no wide per-row decimal round-trips."""
    oracles = entrymod.oracle_sql()
    assert lint_per_row_decimal_roundtrip(oracles) == []
    c = duckdb.connect()
    for t in entrymod.ALL_TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM '{os.path.join(sf_dir, t)}.parquet'"
        )
    assert preflight_result_types(c, oracles) == []


def test_pagerank_margin_lint_safe_at_test_sf(sf_dir):
    """ADVICE r06: the g_pagerank_prod oracle's kstop rule compares
    float L1 sums against tol, so it is trustworthy only while every
    checkpoint's L1 keeps a relative margin above ORACLE_MARGIN_FLOOR.
    check_oracle enforces this at run time; this test pins that the
    margin SQL runs, yields a margin, and the test SF sits safely above
    the floor (measured: 4.97% at sf0.001, 2.62% at sf0.01)."""
    c = duckdb.connect()
    for t in entrymod.ALL_TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM '{os.path.join(sf_dir, t)}.parquet'"
        )
    lints = entrymod.oracle_margin_lints()
    assert "g_pagerank_prod" in lints
    margin = c.execute(lints["g_pagerank_prod"]).fetchone()[0]
    assert margin is not None
    assert margin > entrymod.ORACLE_MARGIN_FLOOR

"""Dev harness: run queries() vs oracle_sql() side-by-side, like the driver.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
Compares row count, sorted-column schema, and an order-insensitive value
hash (rows stringified, sorted) — a stand-in for the driver's t2 check.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from neo4j_database_spark.session import get_spark


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return sorted(cols), len(rows), hash(tuple(lines)), lines


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in entrymod.ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:32s} rows-only: {len(srows)} rows")
            continue
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        sc, sn, sh, sl = table_fingerprint(scols, srows)
        oc, on, oh, ol = table_fingerprint(ocols, orows)
        ok = (sc == oc) and (sn == on) and (sh == oh)
        status = "OK " if ok else "FAIL"
        print(f"{name:32s} {status} spark={sn} oracle={on}")
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

"""Width/bag probe for the d=2 deletion route (r09).

The heap-sensitivity finding (SCALE_PROBE.md) showed the deletion
route's two heavy stages — the variant-frame candidate SMJ and the
pre-verification dedup — spill below ~100g at the default
32-partition width on the x16 replica cell, and that spill is where
the 170 s -> 295-387 s warm-run variance comes from. Two levers,
both measured here with everything else pinned:

* ``parts_mult`` — DELETION_PARTS_MULT applied to BOTH stages: finer
  tasks shrink the CONCURRENT working set (32 running tasks hold
  1/parts_mult of the data each) without changing total work.
* ``bag`` — the bag filter on the deletion route: the generator is
  already output-shaped on templated corpora (template mates share no
  variant), so the 12-16 B of (len, sig) riding every variant row may
  cost more in SMJ sort volume than the ed<=4 false-candidate prune
  saves.

Run each config in a FRESH JVM (fair heap comparison):
    python scripts/er_deletion_width_probe.py 16 2 8 bag
    python scripts/er_deletion_width_probe.py 16 2 8 nobag
    python scripts/er_deletion_width_probe.py 16 2 1 bag   # committed r09 baseline
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "110g")


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    parts_mult = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    bag = (sys.argv[4] if len(sys.argv) > 4 else "bag") == "bag"

    from bench_scale import build_er_d2_input, load_avgs, time_noop

    from neo4j_database_spark.operators import er
    from neo4j_database_spark.session import get_spark

    er.DELETION_PARTS_MULT = parts_mult

    spark = get_spark("er-deletion-width-probe")
    path = build_er_d2_input(spark, "/root/testdata/sf0.1", mult)
    cust = spark.read.parquet(path)
    print(f"load_start: {load_avgs()}", flush=True)

    def q():
        return er.edit_distance_pairs(
            cust,
            "c_custkey",
            "c_name",
            max_dist=2,
            strategy="deletion",
            bag_filter=bag,
        )

    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        time_noop(q())
        times.append(round(time.perf_counter() - t0, 2))
    n = q().count()
    print(
        f"x{mult} parts_mult={parts_mult} bag={bag}: runs={times} "
        f"rows={n} load={load_avgs()}",
        flush=True,
    )


if __name__ == "__main__":
    main()

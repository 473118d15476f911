"""Interleaved A/B of spark.sql.join.preferSortMergeJoin (true=default
vs false=allow SHJ) across every headline query in ONE session (r10,
VERDICT r09 item 8 / guide §9). Conf is runtime-settable; queries plan
at construction, so toggling before each construction+execution is a
clean per-line A/B."""
import os, sys, time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod
import bench
from neo4j_database_spark.session import get_spark
from neo4j_database_spark.graph import store

spark = get_spark("shj-ab-r10")
sf_dir = "/root/testdata/sf0.1"
store.build_store(spark, sf_dir, store._store_dir(sf_dir))
with open(os.path.join(store._store_dir(sf_dir), "_BUILT"), "w") as f:
    f.write(sf_dir)
qs = entrymod.queries()
names = [n for n in bench.HEADLINE]

# warm each query once (default conf)
for n in names:
    qs[n](spark, sf_dir).write.mode("overwrite").format("noop").save()

res = {n: {"smj": [], "shj": []} for n in names}
for rep in range(2):
    for n in names:
        for key, val in (("smj", "true"), ("shj", "false")):
            spark.conf.set("spark.sql.join.preferSortMergeJoin", val)
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
            res[n][key].append(time.perf_counter() - t0)
spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")

tot_smj = tot_shj = 0.0
for n in names:
    a, b = min(res[n]["smj"]), min(res[n]["shj"])
    tot_smj += a
    tot_shj += b
    flag = "<<" if b < a * 0.9 else (">>" if a < b * 0.9 else "")
    print(f"{n:36s} smj {a:6.2f}  shj {b:6.2f} {flag}", flush=True)
print(f"{'TOTAL':36s} smj {tot_smj:6.2f}  shj {tot_shj:6.2f}")
print("load", os.getloadavg())

"""Confirm the SHJ-flip losers (pagerank, d2) with 3 interleaved reps."""
import os, sys, time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod
import bench
from neo4j_database_spark.session import get_spark
from neo4j_database_spark.graph import store

spark = get_spark("shj-losers-r10")
sf_dir = "/root/testdata/sf0.1"
store.build_store(spark, sf_dir, store._store_dir(sf_dir))
with open(os.path.join(store._store_dir(sf_dir), "_BUILT"), "w") as f:
    f.write(sf_dir)
qs = entrymod.queries()
names = ["g_pagerank", "g_pagerank_prod", "customer_fuzzy_matches_d2",
         "g_feature_matrix", "nation_revenue"]
for n in names:
    qs[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
res = {n: {"smj": [], "shj": []} for n in names}
for rep in range(3):
    for n in names:
        for key, val in (("smj", "true"), ("shj", "false")):
            spark.conf.set("spark.sql.join.preferSortMergeJoin", val)
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
            res[n][key].append(round(time.perf_counter() - t0, 2))
for n in names:
    print(f"{n:30s} smj {min(res[n]['smj']):6.2f} {res[n]['smj']}  shj {min(res[n]['shj']):6.2f} {res[n]['shj']}", flush=True)
print("load", os.getloadavg())

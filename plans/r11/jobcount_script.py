#!/usr/bin/env python
"""Job-count + wall evidence for one query: warm at sf0.001, then one
timed run at sf0.1; reports Spark REST job count and wall for the
timed run. argv: repo_root query [reps]"""
import json
import sys
import time
import urllib.request

repo = sys.argv[1]
qname = sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
sys.path.insert(0, repo)
import os

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
from spark_fits_spark.plans import build_session
from spark_fits_spark.suite import QUERIES


def njobs(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs?status=succeeded") as r:
        return len(json.load(r))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
spark = build_session(app_name=f"jobcount-{qname}", shuffle_partitions=cpus * 2)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
fn = QUERIES[qname]
try:
    noop(fn(spark, "/root/testdata/sf0.001"))
except Exception as e:
    print("warm failed:", e)
spark.catalog.clearCache()
out = []
for i in range(reps):
    j0 = njobs(spark)
    t0 = time.perf_counter()
    noop(fn(spark, "/root/testdata/sf0.1"))
    out.append({"wall": round(time.perf_counter() - t0, 3),
                "jobs": njobs(spark) - j0})
    spark.catalog.clearCache()
print(json.dumps({"repo": repo, "query": qname, "runs": out}))
spark.stop()

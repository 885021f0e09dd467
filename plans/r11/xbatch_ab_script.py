#!/usr/bin/env python
"""One arm of the -Xbatch A/B: cold JVM, bench-parity warm-up, then
REPS timed reps per target query at sf0.1 with wall + JVM process CPU
per rep. The flag state comes from SPARK_GRAFT_JIT_BATCH in the
environment; this script just reports it. Prints one JSON object."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

def jvm_cpu_seconds() -> float:
    tck = os.sysconf("SC_CLK_TCK")
    total = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                if f.read().strip() != "java":
                    continue
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / tck
        except OSError:
            continue
    return total


def main() -> None:
    targets = sys.argv[1].split(",")
    reps = int(sys.argv[2])
    sf_dir = "/root/testdata/sf0.1"
    warm_sf = "/root/testdata/sf0.001"
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from bench import _noop_consume, _parallel_efficiency
    from spark_fits_spark.plans import build_session
    from spark_fits_spark.suite import QUERIES

    peff_pre = _parallel_efficiency()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    t_session0 = time.perf_counter()
    spark = build_session(app_name="xbatch-ab", shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).count()
    from pyspark.sql import functions as F

    (spark.range(cpus * 100)
     .withColumn("g", F.pmod("id", F.lit(cpus)))
     .groupBy("g").applyInPandas(lambda k, p: p, "id long, g long")
     .write.format("noop").mode("overwrite").save())
    for name in targets:
        try:
            _noop_consume(QUERIES[name](spark, warm_sf))
        except Exception:
            pass
        spark.catalog.clearCache()
    session_setup_wall = time.perf_counter() - t_session0
    setup_cpu = jvm_cpu_seconds()

    out = {"jit_batch": os.environ.get("SPARK_GRAFT_JIT_BATCH", "1"),
           "peff_pre": peff_pre,
           "setup_wall": round(session_setup_wall, 2),
           "setup_cpu": round(setup_cpu, 2),
           "reps": {}, "cpu": {}}
    for name in targets:
        fn = QUERIES[name]
        walls, cpus_l = [], []
        for _ in range(reps):
            c0 = jvm_cpu_seconds()
            t0 = time.perf_counter()
            _noop_consume(fn(spark, sf_dir))
            walls.append(round(time.perf_counter() - t0, 3))
            cpus_l.append(round(jvm_cpu_seconds() - c0, 2))
        out["reps"][name] = walls
        out["cpu"][name] = cpus_l
        spark.catalog.clearCache()
    out["total_wall"] = round(sum(sum(v) for v in out["reps"].values()), 2)
    out["total_cpu"] = round(sum(sum(v) for v in out["cpu"].values()), 2)
    out["peff_post"] = _parallel_efficiency()
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

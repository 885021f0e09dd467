#!/usr/bin/env python
"""Per-rep attribution for the dedup-chain CPU grind: wall, JVM process
CPU, GC time delta, JIT compilation time delta, and a jstack snapshot
taken mid-rep when a rep runs slow. Flag state from env."""
import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, "/root/repo")


def jvm_pid() -> int:
    out = subprocess.run(["pgrep", "-f", "org.apache.spark.deploy.SparkSubmit"],
                         capture_output=True, text=True).stdout.split()
    return int(out[0])


def proc_cpu(pid: int) -> float:
    tck = os.sysconf("SC_CLK_TCK")
    with open(f"/proc/{pid}/stat") as f:
        parts = f.read().rsplit(")", 1)[1].split()
    return (int(parts[11]) + int(parts[12])) / tck


def main() -> None:
    q = sys.argv[1] if len(sys.argv) > 1 else "q48_dedup_clusters"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from bench import _noop_consume
    from spark_fits_spark.plans import build_session
    from spark_fits_spark.suite import QUERIES

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = build_session(app_name="grind-diag", shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    pid = jvm_pid()

    def gc_ms() -> float:
        t = 0
        it = mf.getGarbageCollectorMXBeans().iterator()
        while it.hasNext():
            t += it.next().getCollectionTime()
        return t

    def jit_ms() -> float:
        return mf.getCompilationMXBean().getTotalCompilationTime()

    def code_cache() -> dict:
        out = {}
        it = mf.getMemoryPoolMXBeans().iterator()
        while it.hasNext():
            p = it.next()
            nm = p.getName()
            if "CodeHeap" in nm or "Code Cache" in nm:
                u = p.getUsage()
                out[nm] = {"used_mb": round(u.getUsed() / 2**20, 1),
                           "max_mb": round(u.getMax() / 2**20, 1)}
        return out

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    _noop_consume(QUERIES[q](spark, "/root/testdata/sf0.001"))
    spark.catalog.clearCache()

    fn = QUERIES[q]
    rows = []
    for i in range(n):
        stack_file = f"/tmp/grind_stack_{i}.txt"
        stop = threading.Event()

        def snap():
            # wait; if the rep is still running after 20 s, it's a slow
            # rep — take two jstacks 3 s apart
            if not stop.wait(20):
                for k in range(2):
                    r = subprocess.run(["jstack", str(pid)],
                                       capture_output=True, text=True)
                    with open(stack_file, "a") as f:
                        f.write(f"==== dump {k} ====\n{r.stdout}\n")
                    if stop.wait(3):
                        break

        th = threading.Thread(target=snap, daemon=True)
        c0, g0, j0 = proc_cpu(pid), gc_ms(), jit_ms()
        t0 = time.perf_counter()
        th.start()
        _noop_consume(fn(spark, "/root/testdata/sf0.1"))
        stop.set()
        wall = time.perf_counter() - t0
        rows.append({"rep": i, "wall": round(wall, 2),
                     "cpu": round(proc_cpu(pid) - c0, 1),
                     "gc_s": round((gc_ms() - g0) / 1000, 2),
                     "jit_s": round((jit_ms() - j0) / 1000, 2),
                     "code_cache": code_cache(),
                     "stack": os.path.exists(stack_file) and stack_file})
        print(json.dumps(rows[-1]), flush=True)
        spark.catalog.clearCache()
    spark.stop()
    print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()

"""Session construction with scale-appropriate defaults.

These settings are what we would run with on a 1000-executor cluster
reading ~100 TB; locally they also give the best local[N] behavior:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy switching (broadcast when a side turns out
  small).
- ``spark.sql.python.filterPushdown.enabled``: required for the `fits`
  datasource's pushFilters path (off by default in Spark 4.1).
- Arrow enabled for pandas UDF paths used by the operators library.
"""

from __future__ import annotations

import os


def tuned_conf(shuffle_partitions: int | None = None) -> dict[str, str]:
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.python.filterPushdown.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    }
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    return conf


def jit_jvm_options() -> str:
    """JVM compilation-policy options applied to driver and executor
    (see the comment block in :func:`build_session` for the measured
    rationale). ``SPARK_GRAFT_JIT_BATCH=0`` opts out of synchronous
    JIT for deployments that prefer background compilation."""
    opts = "-XX:-DontCompileHugeMethods"
    if os.environ.get("SPARK_GRAFT_JIT_BATCH", "1") != "0":
        opts += " -Xbatch"
    return opts


def build_session(app_name: str = "spark-fits-spark",
                  master: str | None = None,
                  shuffle_partitions: int | None = None,
                  extra_conf: dict[str, str] | None = None):
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    # Make this package importable in executor Python workers: the
    # datasource/UDF closures are pickled by reference to the module. In
    # local mode the workers inherit the driver JVM's environment, so
    # extending PYTHONPATH before JVM launch suffices; on a real cluster
    # ship the package with --py-files / spark.submit.pyFiles instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else ""))

    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]")
    builder = builder.config("spark.executorEnv.PYTHONPATH",
                             os.environ["PYTHONPATH"])
    # Two JVM compilation-policy flags (r10), both output-neutral:
    #
    # -XX:-DontCompileHugeMethods — backstop: let HotSpot JIT-compile
    # generated methods past its 8000-bytecode limit. The r9 MinHash
    # plan shape (coalesced probe fusing bucket join + exact-Jaccard
    # verify into one span) generated such a method and silently ran
    # the WHOLE span INTERPRETED — measured 42x CPU on identical
    # rows/plan (q22 verify: 13.7 s vs 576 s of executorCpuTime; q48
    # read 280 s in a full bench run). The r10 plan restructure keeps
    # every span small (measured max 1953 bytecode via CodegenMetrics);
    # a 21-rep A/B with the flag on vs off (OPTIMIZATION_r10.md §11)
    # read total CPU within 8% either way, so the flag is neither
    # load-bearing nor harmful — kept as cheap insurance.
    #
    # -Xbatch (synchronous JIT) — fix for the round's dominant
    # pathology: interleaving many distinct query plans keeps loading
    # new generated classes, invalidating JIT-compiled shared call
    # sites; with background compilation the recompile waits in a
    # starved compiler queue while all task threads grind the stage
    # INTERPRETED — measured 10-50x CPU on identical input (q48 reps
    # of 1,592-1,879 CPU-s against a ~40 CPU-s floor), randomly per
    # stage-run. Blocking compilation bounds that: the invoking thread
    # waits for the (fast, small-method) compile instead of an
    # unbounded interpreted grind. Same 21-rep sequence, same box:
    # total 5,843 -> 1,552 CPU-s (0.27x), wall 599 -> 286 s, worst
    # q48 rep 1,592 -> 94 CPU-s, zero control spikes (§11). The cost
    # is a one-time synchronous-compile wait per hot method (first
    # reps only). Applies equally to busy cluster executors (compiler
    # threads compete with task threads there too); opt out with
    # SPARK_GRAFT_JIT_BATCH=0 if a deployment prefers background JIT.
    jvm_opts = jit_jvm_options()
    builder = builder.config("spark.driver.defaultJavaOptions", jvm_opts)
    builder = builder.config("spark.executor.defaultJavaOptions", jvm_opts)
    # local mode runs everything in one JVM whose default heap is 1g —
    # far too small for 32 concurrent tasks (cached shingle tables,
    # broadcast sides, sort buffers all GC-thrash). Only effective at
    # JVM launch; harmless if a session already exists.
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    for k, v in tuned_conf(shuffle_partitions).items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    from spark_fits_spark import register_fits

    register_fits(spark)
    return spark

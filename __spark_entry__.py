"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``spark_fits_spark.suite``; this module is the
thin stable shim the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _prepare(spark: SparkSession) -> None:
    """Best-effort session prep: register the fits datasource and enable
    the configs our operators rely on (no-ops if already set)."""
    try:
        from spark_fits_spark import register_fits

        register_fits(spark)
    except Exception:
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _prepare(spark)
    from spark_fits_spark.suite import QUERIES

    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable is wrapped to prepare the session first:
    ``register_fits`` ships the package zip to executor Python workers
    (pandas-UDF closures are pickled by reference to this package, which
    a bare harness session cannot import otherwise) and enables the
    python-datasource filter-pushdown conf. Idempotent per session."""
    from spark_fits_spark.suite import QUERIES

    def _wrap(fn):
        def run(spark, sf, _fn=fn):
            _prepare(spark)
            return _fn(spark, sf)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    approximate/non-SQL-expressible ops → rows-only check)."""
    from spark_fits_spark.suite import ORACLES

    return dict(ORACLES)

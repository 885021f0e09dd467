"""Plan audit as code: the two standing 100 TB claims the round
verdicts have so far verified by hand become mechanical regressions.

1. No query plan may contain a ``CartesianProduct`` — the only cross
   joins the suite is allowed are broadcast-scalar ones (which plan as
   ``BroadcastNestedLoopJoin`` over a 1-row side). A CartesianProduct
   is the signature of an accidental all-pairs path, the one shape
   that cannot survive a 100x scale-up.
2. No query plan may contain ``BatchEvalPython`` — row-at-a-time
   Python UDF evaluation. Python stages must be Arrow-batched
   (``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``
   / ``FlatMapGroupsInPandasWithState``), which are allowed.

Plans are built (not executed) for every registered query at
sf0.001; operators with eager driver-side steps (k-means fits, BPE
merge loops, ALS rounds) run those bounded steps during construction,
which is exactly what the mirror pays too.

3. Source lint: every ``.collect()`` call site in the package must
   carry the ``# bounded-collect: <bound>`` annotation on its line —
   the convention that lets a reviewer grep-audit that no collect
   scales with the data (bounds are things like k, dim, n_regions,
   |nation|). A new unannotated collect fails here, not in a verdict.
"""

import os
import re

import pytest

SF_DIR = os.environ.get("ENTRY_SF_DIR", "/root/testdata/sf0.001")
PKG = os.path.join(os.path.dirname(__file__), "..", "spark_fits_spark")

#: physical-plan node names that must never appear, with the claim
#: each one would break
_FORBIDDEN = {
    "CartesianProduct": "non-broadcast all-pairs join",
    "BatchEvalPython": "row-at-a-time Python UDF",
}


def _plan_string(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return qe.explainString(mode)


def test_no_scale_killer_nodes_in_any_query_plan(spark):
    from spark_fits_spark.suite import QUERIES

    violations = {}
    for name, fn in QUERIES.items():
        plan = _plan_string(fn(spark, SF_DIR))
        hits = [f"{tok} ({why})" for tok, why in _FORBIDDEN.items()
                if tok in plan]
        if hits:
            violations[name] = hits
        spark.catalog.clearCache()
    assert violations == {}, (
        f"scale-killer plan nodes in {len(violations)} queries: "
        f"{violations}")


def test_every_collect_is_annotated_bounded():
    bad = []
    for root, _dirs, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            for i, line in enumerate(open(path), start=1):
                if re.search(r"\.collect\(\)", line) \
                        and "bounded-collect" not in line:
                    rel = os.path.relpath(path, os.path.dirname(PKG))
                    bad.append(f"{rel}:{i}: {line.strip()}")
    assert bad == [], (
        "unannotated .collect() call sites (add '# bounded-collect: "
        "<bound>' or make the operator distributed):\n" + "\n".join(bad))


def test_forbidden_tokens_still_meaningful(spark):
    """Guard the auditor itself: the node names we grep for must be
    the ones Spark actually prints, else the audit silently passes on
    everything. Build one deliberate row-UDF plan and one deliberate
    cartesian plan and require the tokens to appear."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    udf = F.udf(lambda x: x + 1, LongType())
    df = spark.range(3).select(udf("id").alias("y"))
    assert "BatchEvalPython" in _plan_string(df)

    a, b = spark.range(3), spark.range(3)
    cart = a.crossJoin(b.hint("shuffle_replicate_nl"))
    assert "CartesianProduct" in _plan_string(cart)

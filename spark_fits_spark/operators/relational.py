"""Relational helpers for skewed data at scale.

AQE's skew-join splitting handles sort-merge skew automatically, but two
patterns still need explicit structure at 100 TB:

- :func:`salted_join` — explicit key salting for a shuffle join where one
  side has pathological hot keys: the hot side gets a random salt in
  [0, n), the other side is exploded n× over all salts, and the join key
  becomes (key, salt). Use when AQE can't help (e.g. hash joins on a
  pre-shuffled layout, or a hot key inside an aggregation upstream).
- :func:`two_phase_count` — skewed groupBy as partial-then-final
  aggregation with an explicit salt (for aggregations whose combiner
  can't be expressed as a simple partial agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` (skewed) with ``small`` on ``key`` using ``salts``-way
    key salting. ``small`` is replicated ``salts``× (keep it modest).

    The result has the same rows as ``big.join(small, key, how)``."""
    salted_big = big.withColumn("_salt", (F.rand(seed=42) * salts).cast("int"))
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_count(df: DataFrame, key: str, *, salts: int = 16) -> DataFrame:
    """count(*) per key for heavily skewed keys, as an explicit
    two-phase aggregation: partial count per (key, salt) then final sum
    per key. (Spark's hash agg already does map-side partials for
    count/sum — this shape is for teaching/validation and for custom
    aggs without partial support.) Returns (key, n)."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_n"))
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))

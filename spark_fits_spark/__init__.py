"""spark-fits-spark — a PySpark-native engine with the capabilities of
astrolabsoftware/spark-fits (reference studied read-only at
/root/reference; see SURVEY.md).

Components:
- ``fitscore``   — pure-Python FITS parsing (headers, boundaries, types,
                   vectorized numpy→Arrow decode).
- ``sources``    — the ``fits`` Python DataSource (Spark 4 Python Data
                   Source API): distributed bintable/image scans with
                   row-aligned partitions, column pruning, filter
                   pushdown.
- ``operators``  — DataFrame-level library operators beyond the
                   reference: dedup (exact / MinHash-LSH / SimHash /
                   n-gram Jaccard / embedding), similarity search.
- ``functions``  — text analysis (language id, quality, tokens,
                   fingerprints) as pure `pyspark.sql.functions`
                   compositions (JVM-side, codegen-friendly).
- ``streaming``  — Structured Streaming helpers.

Usage::

    from spark_fits_spark import register_fits
    register_fits(spark)
    df = spark.read.format("fits").option("hdu", 1).load("file.fits")
"""

from __future__ import annotations

__version__ = "0.1.0"


def register_fits(spark) -> None:
    """Register the ``fits`` datasource on a SparkSession (the analog of
    the reference's META-INF service-loader registration,
    ``DefaultSource.scala:31``)."""
    from spark_fits_spark.sources.fits_datasource import FitsDataSource

    spark.dataSource.register(FitsDataSource)

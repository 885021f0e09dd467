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
    ``DefaultSource.scala:31``).

    Self-contained on ANY session, not just ``plans.build_session``:

    - ``spark.sql.python.filterPushdown.enabled`` is flipped on (it is a
      runtime SQL conf): Spark 4 *raises* DATA_SOURCE_PUSHDOWN_DISABLED
      at scan planning when a reader implements ``pushFilters()`` under
      the default-false conf — so a bare session could not even scan.
    - the package zip is shipped via ``addPyFile`` so executor workers
      can unpickle the datasource when the session's JVM was launched
      without this repo on PYTHONPATH (no-op / best-effort otherwise).
    """
    import importlib.util

    from spark_fits_spark.sources.fits_datasource import FitsDataSource

    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    spec = importlib.util.find_spec("spark_fits_spark")
    if spec and spec.submodule_search_locations:
        pkg_dir = list(spec.submodule_search_locations)[0]
        try:
            spark.sparkContext.addPyFile(_package_zip(pkg_dir))
        except Exception:
            pass  # best-effort: plain local sessions don't need it
    spark.dataSource.register(FitsDataSource)


def _package_zip(pkg_dir: str) -> str:
    """Zip ``spark_fits_spark`` into a content-stable temp file (built
    once per source state) suitable for ``SparkContext.addPyFile``."""
    import hashlib
    import os
    import zipfile

    parent = os.path.dirname(pkg_dir)
    paths = []
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                paths.append(os.path.join(root, f))
    h = hashlib.md5()
    for p in sorted(paths):
        h.update(p.encode())
        with open(p, "rb") as fh:
            h.update(fh.read())
    out = os.path.join(
        "/tmp", f"spark_fits_spark_{h.hexdigest()[:12]}.zip")
    if not os.path.exists(out):
        # per-process temp name + atomic replace: concurrent sessions
        # (bench + tests) building the same content must not interleave
        # writes into one shared .part file
        import tempfile

        fd, tmp = tempfile.mkstemp(
            dir="/tmp", prefix="spark_fits_spark_", suffix=".zip.part")
        os.close(fd)
        with zipfile.ZipFile(tmp, "w") as z:
            for p in sorted(paths):
                z.write(p, os.path.relpath(p, parent))
        os.replace(tmp, out)
    return out


def fits_info(spark, path: str):
    """Dataset discovery: one row per (file, HDU) with index, type,
    EXTNAME, row/column counts and byte boundaries — the DataFrame
    analog of the reference's ``getNHDU``/``getHduType`` driver API.

    File listing is driver-side; header walking is distributed (one
    task per file), so inventories of many-file datasets scale out."""
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    from spark_fits_spark.sources.fits_datasource import search_fits_files

    files = search_fits_files(path)
    schema = StructType([
        StructField("file", StringType()),
        StructField("hdu", IntegerType()),
        StructField("hdu_type", StringType()),
        StructField("extname", StringType()),
        StructField("n_rows", LongType()),
        StructField("n_cols", IntegerType()),
        StructField("data_start", LongType()),
        StructField("data_len", LongType()),
    ])

    def _walk(fp: str):
        from spark_fits_spark.fitscore.file import walk_hdus
        from spark_fits_spark.fitscore.header import header_value, parse_cards

        out = []
        with open(fp, "rb") as f:
            for i, (b, cards) in enumerate(walk_hdus(f)):
                h = parse_cards(cards)
                out.append((
                    fp, i,
                    header_value(h, "XTENSION", "primary") or "primary",
                    header_value(h, "EXTNAME", None),
                    int(h.get("NAXIS2", "0") or "0"),
                    int(h.get("TFIELDS", "0") or "0"),
                    b.data_start, b.data_len,
                ))
        return out

    rdd = spark.sparkContext.parallelize(files, max(1, len(files)))
    return spark.createDataFrame(rdd.flatMap(_walk), schema)

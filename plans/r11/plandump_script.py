#!/usr/bin/env python
"""Dump .explain('formatted') for the r11-touched queries.
argv: repo_root suffix(before|after) [outdir]"""
import contextlib
import io
import os
import sys

repo = sys.argv[1]
suffix = sys.argv[2]
outdir = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/plans/r11"
sys.path.insert(0, repo)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
os.environ.setdefault("SPARK_GRAFT_JIT_BATCH", "0")

from spark_fits_spark.plans import build_session
from spark_fits_spark.suite import QUERIES

SF = "/root/testdata/sf0.01"
spark = build_session(app_name=f"plandump-{suffix}")
spark.sparkContext.setLogLevel("ERROR")

names = ["q88_ivfpq_recall", "q81_ann_recall", "q84_mrl_truncated_recall",
         "q63_hybrid_rrf", "q58_kmeans_assign", "q99_cluster_balanced_sample"]
for n in names:
    df = QUERIES[n](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(outdir, f"{n.split('_')[0]}_{suffix}.txt"), "w") as f:
        f.write(f"# {n} — explain('formatted') at sf0.01, tree={repo}\n")
        f.write(buf.getvalue())
    print(n, "done")

# q111's returned DF is an eager localCheckpoint scan (opaque), so dump
# the sigma-clip stats subplan exactly as detect_sources builds it.
from spark_fits_spark import register_fits  # noqa: E402
from spark_fits_spark.operators import images  # noqa: E402

register_fits(spark)
QUERIES["q111_source_detection"](spark, SF)  # writes the cube to /tmp
import hashlib  # noqa: E402

d = os.path.join("/tmp", "spark_fits_q111_"
                 + hashlib.md5(SF.encode()).hexdigest()[:8])
df = spark.read.format("fits").option("hdu", 1).load(
    os.path.join(d, "cube.fits.fz"))
if suffix == "before":
    stats = images.sigma_clipped_plane_stats(df)
else:
    rows, src = images._plane_rows_and_source(df)
    stats = images.sigma_clipped_plane_stats(src)
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    stats.explain("formatted")
with open(os.path.join(outdir, f"q111_stats_{suffix}.txt"), "w") as f:
    f.write("# q111 detect_sources sigma-clip stats subplan (the piece "
            f"r11 changed), tree={repo}\n")
    f.write(buf.getvalue())
print("q111 stats done")
spark.stop()

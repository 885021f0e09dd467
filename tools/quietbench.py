#!/usr/bin/env python
"""Host-state-aware measurement harness for the burstable bench box.

The box's CPU credits are externally driven (PLANS.md r9/r10: probes
swing 0.18-0.68 within minutes), so absolute timings are only evidence
under a verified window. This tool packages the protocols the r8-r10
rounds converged on, so per-round evidence runs are reviewable code
instead of ad-hoc scripts:

- ``probe``: one parallel-efficiency reading (bench.py's measure).
- ``exonerate``: re-measure TARGET queries against the committed
  anchors with zero-code-change CONTROL queries interleaved, using
  BENCH-PARITY reps (N back-to-back reps sharing intra-query state,
  cache cleared only between queries — clearing between reps
  penalizes multi-job compositions 1.4-1.6x and fabricates
  regressions) in order-balanced passes (pass 2 reversed; fixed-order
  interleaves mis-signed a CC A/B by 1.5x in r9). The window verdict
  is IN-BAND: mean control drift vs the anchors <= --max-drift
  (end-of-run peff is biased low by the run's own credit drain, so it
  is recorded but not gating).
- ``ricemicro``: the rice/plain end-to-end ratio (ABBA x2 in one
  session) plus the decode gate — the short (~3 min) form of the
  ratio evidence a full 15-min bench run usually loses to mid-run
  throttle.
- ``watch``: probe loop that fires one of the above when the host
  looks idle and applies the matching acceptance gate.

Anchors default to the committed BENCH_DETAIL.json (median per query).
Every subcommand prints one JSON object; watch copies accepted
results to ``<out>.accepted.json``.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _peff() -> float:
    from bench import _parallel_efficiency

    return _parallel_efficiency()


def _session(app: str):
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from spark_fits_spark.plans import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = build_session(app_name=app, shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    return spark


def _anchors(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d.get("queries_median") or {}


def cmd_probe(_args) -> dict:
    return {"peff": _peff()}


def cmd_exonerate(args) -> dict:
    from bench import _noop_consume
    from spark_fits_spark.suite import QUERIES

    targets = args.targets.split(",")
    controls = args.controls.split(",")
    anchors = _anchors(args.anchors)
    missing = [q for q in targets + controls
               if q not in QUERIES or q not in anchors]
    if missing:
        raise SystemExit(f"unknown or unanchored queries: {missing}")

    peff_pre = _peff()
    spark = _session("quietbench-exonerate")
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    (spark.range(cpus * 100)
     .withColumn("g", F.pmod("id", F.lit(cpus)))
     .groupBy("g").applyInPandas(lambda k, p: p, "id long, g long")
     .write.format("noop").mode("overwrite").save())
    # codegen warm at the smallest SF, data path left cold
    warm_sf = args.warm_sf
    names = targets + controls
    for n in names:
        try:
            _noop_consume(QUERIES[n](spark, warm_sf))
        except Exception:
            pass
        spark.catalog.clearCache()

    # interleave targets with controls 1:1 (cycled)
    order = []
    for i, t in enumerate(targets):
        order.append(t)
        order.append(controls[i % len(controls)])
    for c in controls:
        if c not in order:
            order.append(c)
    reps: dict[str, list] = {n: [] for n in names}
    for p in range(args.passes):
        seq = order if p % 2 == 0 else order[::-1]
        for n in seq:
            spark.catalog.clearCache()
            for _ in range(args.reps):
                t0 = time.perf_counter()
                _noop_consume(QUERIES[n](spark, args.sf_dir))
                reps[n].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    peff_post = _peff()
    spark.stop()

    out = {"peff_pre": peff_pre, "peff_post": peff_post,
           "passes": args.passes, "reps_per_pass": args.reps,
           "sf_dir": args.sf_dir, "reps": reps, "summary": {}}
    for n in names:
        med = round(statistics.median(reps[n]), 3)
        out["summary"][n] = {
            "median": med, "min": min(reps[n]), "anchor": anchors[n],
            "ratio": round(med / anchors[n], 3),
            "role": "target" if n in targets else "control"}
    drift = statistics.mean(
        out["summary"][c]["ratio"] for c in controls)
    out["control_drift"] = round(drift, 3)
    out["window_valid"] = drift <= args.max_drift
    for n in targets:
        s = out["summary"][n]
        s["ratio_control_normalized"] = round(s["ratio"] / drift, 3)
        s["exonerated"] = bool(
            out["window_valid"]
            and s["ratio_control_normalized"] <= args.max_residue)
    return out


def cmd_ricemicro(_args) -> dict:
    from bench import fits_scan_rice_seconds, fits_scan_seconds

    peff_pre = _peff()
    spark = _session("quietbench-ricemicro")
    rice, plain, decode = [], [], None
    for pat in ("RP", "PR", "PR", "RP"):
        for ch in pat:
            if ch == "R":
                sec, mb = fits_scan_rice_seconds(spark)
                rice.append(mb / sec)
            else:
                sec, mb, dec = fits_scan_seconds(spark)
                plain.append(mb / sec)
                decode = dec if decode is None else max(decode, dec)
    peff_post = _peff()
    spark.stop()
    r_med, p_med = statistics.median(rice), statistics.median(plain)
    return {
        "rice_mb_s": [round(x, 1) for x in rice],
        "plain_mb_s": [round(x, 1) for x in plain],
        "ratio_rice_plain_median": round(r_med / p_med, 3),
        "ratio_rice_plain_best": round(max(rice) / max(plain), 3),
        "decode_mb_per_s_per_task": decode,
        "peff_pre": peff_pre, "peff_post": peff_post,
    }


def _accepted(cmd: str, result: dict, args) -> bool:
    if cmd == "exonerate":
        return bool(result.get("window_valid"))
    if cmd == "ricemicro":
        from bench import HOST_GATE_DECODE_MBPS, HOST_GATE_PEFF

        return ((result.get("decode_mb_per_s_per_task") or 0)
                >= HOST_GATE_DECODE_MBPS
                and min(result["peff_pre"], result["peff_post"])
                >= HOST_GATE_PEFF)
    return True


def cmd_watch(args) -> dict:
    sub = {"exonerate": cmd_exonerate, "ricemicro": cmd_ricemicro}[args.run]
    attempts = []
    for i in range(args.max_probes):
        p = _peff()
        print(f"probe {i}: {p}", flush=True)
        if p >= args.threshold:
            result = sub(args)
            ok = _accepted(args.run, result, args)
            attempts.append({"attempt": i, "accepted": ok,
                             "result": result})
            with open(args.out, "w") as f:
                json.dump(attempts, f, indent=1)
            if ok:
                with open(args.out + ".accepted.json", "w") as f:
                    json.dump(result, f, indent=1)
                return {"accepted": True, "attempts": len(attempts)}
        time.sleep(args.sleep)
    return {"accepted": False, "attempts": len(attempts)}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sp = ap.add_subparsers(dest="cmd", required=True)
    sp.add_parser("probe")

    def _common(p):
        p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
        p.add_argument("--warm-sf", default="/root/testdata/sf0.001")
        p.add_argument("--anchors", default=os.path.join(
            _REPO, "BENCH_DETAIL.json"))
        p.add_argument("--targets", default="")
        p.add_argument("--controls",
                       default="q01_pricing_summary,q112_healpix_skymap,"
                               "q20_dedup_exact")
        p.add_argument("--passes", type=int, default=2)
        p.add_argument("--reps", type=int, default=3)
        p.add_argument("--max-drift", type=float, default=1.15)
        p.add_argument("--max-residue", type=float, default=1.3)

    _common(sp.add_parser("exonerate"))
    sp.add_parser("ricemicro")
    w = sp.add_parser("watch")
    _common(w)
    w.add_argument("--run", choices=["exonerate", "ricemicro"],
                   required=True)
    w.add_argument("--threshold", type=float, default=0.45)
    w.add_argument("--sleep", type=int, default=150)
    w.add_argument("--max-probes", type=int, default=60)
    w.add_argument("--out", default="/tmp/quietbench_watch.json")
    args = ap.parse_args()
    fn = {"probe": cmd_probe, "exonerate": cmd_exonerate,
          "ricemicro": cmd_ricemicro, "watch": cmd_watch}[args.cmd]
    print(json.dumps(fn(args), indent=1))


if __name__ == "__main__":
    main()

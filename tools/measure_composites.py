"""Build/exec wall split for the r17 'Not yet optimized' residue: the
composite driver rows (curation_pipeline, semdedup, heavy_hitters,
curriculum_stages) plus the two largest remaining tails
(dedup_clusters, ann_pq_recall). bench.py discipline: quiet-box gate,
untimed warm-up, min-of-N noop-sink execs.

Usage: python tools/measure_composites.py [--runs 3] [--sf DIR] [names...]
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import _wait_for_quiet_box

from aws_cloudfront_realtime_monitoring_spark.session import get_spark

DEFAULT_QUERIES = [
    "curation_pipeline",
    "semdedup",
    "heavy_hitters",
    "curriculum_stages",
    "dedup_clusters",
    "ann_pq_recall",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    queries = args.names or DEFAULT_QUERIES

    load, still_loaded = _wait_for_quiet_box()
    print(f"# start load: {load:.2f} (flagged: {still_loaded})",
          file=sys.stderr)
    spark = get_spark("composites")
    from aws_cloudfront_realtime_monitoring_spark.plans import load_full
    import __spark_entry__

    __spark_entry__._ship_package(spark)
    registry = load_full()

    for name in queries:  # untimed warm-up
        registry[name].build(spark, args.sf).write.format("noop").mode(
            "overwrite").save()
        spark.catalog.clearCache()

    rows = {}
    for name in queries:
        builds, execs = [], []
        for _ in range(args.runs):
            t0 = time.time()
            df = registry[name].build(spark, args.sf)
            t1 = time.time()
            spark.sparkContext.setJobDescription(f"composites: {name}")
            df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobDescription(None)
            t2 = time.time()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            spark.catalog.clearCache()
        rows[name] = (min(builds), min(execs))

    print("| query | build_s | exec_s | total_s | build% |")
    print("|---|---|---|---|---|")
    out = {}
    for name, (b, e) in rows.items():
        t = b + e
        print(f"| {name} | {b:.3f} | {e:.3f} | {t:.3f} | {100*b/t:.0f}% |")
        out[name] = {"build": round(b, 3), "exec": round(e, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

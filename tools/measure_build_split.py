"""Plan-build vs execute wall split for the widest registry rows
(VERDICT r7 item #5).

The parser's r6 SQL-string rewrite removed ~4,300 py4j round-trips from
PLAN CONSTRUCTION; this tool measures whether any other wide plan pays
a comparable build tax. For each query: ``build`` = calling the
registry builder (Python-side Column/DataFrame composition + analysis
RPCs), ``execute`` = the noop-sink write of the already-built frame.
Both min-of-N after an untimed warm-up (bench.py discipline).

A row where build >= 30% of total wall is a candidate for the same
SQL-string treatment; below that, the py4j chatter is noise against the
shuffle work and a rewrite would trade readable Column composition for
nothing.

Usage: python tools/measure_build_split.py [--runs 5] [--sf DIR]
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

from bench import _wait_for_quiet_box  # the shared load gate

from aws_cloudfront_realtime_monitoring_spark.session import get_spark

#: the widest plans by PLANS.md exchange/broadcast count, plus the
#: flagship parse row whose rewrite motivated the question
QUERIES = [
    "curation_pipeline",     # 9 exchanges, 8 broadcasts
    "set_operations",        # 6 exchanges
    "bm25_topk",             # 6 exchanges, 5 broadcasts
    "curriculum_stages",     # 5 exchanges
    "ann_ivf_recall",        # 5 exchanges (r8 driver row)
    "cf_parse_wire_roundtrip",  # the SQL-string precedent, for reference
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    load, still_loaded = _wait_for_quiet_box()
    print(f"# start load: {load:.2f} (flagged: {still_loaded})",
          file=sys.stderr)
    spark = get_spark("build_split")
    from aws_cloudfront_realtime_monitoring_spark.plans import load_full
    import __spark_entry__

    __spark_entry__._ship_package(spark)
    registry = load_full()

    # untimed warm-up: registers views, JIT-compiles codegen
    for name in QUERIES:
        registry[name].build(spark, args.sf).write.format("noop").mode(
            "overwrite").save()
        spark.catalog.clearCache()

    rows = {}
    for name in QUERIES:
        builds, execs = [], []
        for _ in range(args.runs):
            t0 = time.time()
            df = registry[name].build(spark, args.sf)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            spark.catalog.clearCache()
        b, e = min(builds), min(execs)
        rows[name] = {"build_s": round(b, 3), "exec_s": round(e, 3),
                      "build_pct": round(100 * b / (b + e), 1)}
        print(f"# {name}: build {b:.3f}s exec {e:.3f}s "
              f"({rows[name]['build_pct']}%)", file=sys.stderr)

    print(f"| Query | build (min of {args.runs}) | execute | build % |")
    print("|---|---|---|---|")
    for name, r in rows.items():
        print(f"| {name} | {r['build_s']:.3f} s | {r['exec_s']:.3f} s "
              f"| {r['build_pct']}% |")
    print(json.dumps({"build_split": rows, "sf": args.sf}))


if __name__ == "__main__":
    main()

"""CC fast-path seed-handling measurement (r17).

History: r16 evaluated the unbarriered seed subplan three times (the
probe's two broadcast builds + the final apply/anchor); early r17 added
a ``CC_SEED_PERSIST`` MEMORY_ONLY cache and this tool A/B'd it
interleaved (measured: a wash at sf0.1's ~3k-row seed — persist 5.191 s
vs recompute 5.163 s median in a drifting window; 1.18x at the
near-gate 1M-node chain — 11.773 s vs 13.864 s). The current spelling
(late r17) subsumes the persist: the seed is a LAZY localCheckpoint the
probe job materializes as a side effect, which also anchors the
returned plan and removes the separate anchor-localCheckpoint job. The
flag is gone, so this tool now measures the two cells under the current
spelling — same quiet-box gate, same cells, same output shape — so the
series stays comparable with the recorded A/B numbers.

Usage: python tools/measure_cc_seed_ab.py [--reps 5] [--sf-dir DIR]
Prints per-rep runs, medians, and one JSON line.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import _wait_for_quiet_box  # noqa: E402

from aws_cloudfront_realtime_monitoring_spark.operators import graph  # noqa: E402
from aws_cloudfront_realtime_monitoring_spark.plans import load_full  # noqa: E402
from aws_cloudfront_realtime_monitoring_spark.session import get_spark  # noqa: E402


def _time_dedup_clusters(spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    load_full()["dedup_clusters"].build(spark, sf_dir).write.format(
        "noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    spark.catalog.clearCache()
    return sec


def _time_edge_gate_graph(spark, n_nodes: int) -> float:
    """An ascending-chain graph sized just under the edge gate (the
    symmetrized edge count is 2*(n-1), so n_nodes <= 1M keeps the fast
    path engaged at BROADCAST_MAX_NODES = 2M): the seed labeling is
    maximally NON-flat (every node's label points one back), so the
    contracted label graph is ~n pairs — the local finish's heaviest
    legal shape, evaluating the seed subplan at its largest."""
    from pyspark.sql import functions as F

    # checked-nothing guard: the fast path (the thing under test) only
    # engages when n_edges <= BROADCAST_MAX_NODES after symmetrization.
    # An oversized cell would time the distributed loop and print a
    # confident number having measured nothing -- refuse it up front.
    if 2 * (n_nodes - 1) > graph.BROADCAST_MAX_NODES:
        raise ValueError(
            f"gate cell n_nodes={n_nodes}: 2*(n-1) edges exceed "
            f"BROADCAST_MAX_NODES={graph.BROADCAST_MAX_NODES}; the fast "
            "path (the thing under test) would not engage")
    pairs = spark.range(n_nodes - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    t0 = time.perf_counter()
    graph.connected_components(pairs).write.format("noop").mode(
        "overwrite").save()
    sec = time.perf_counter() - t0
    spark.catalog.clearCache()
    return sec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--gate-nodes", type=int, default=1_000_000,
                    help="node count for the near-gate synthetic cell "
                         "(symmetrized edges = 2*(n-1) must stay under "
                         "BROADCAST_MAX_NODES so the fast path engages)")
    args = ap.parse_args()

    load, flagged = _wait_for_quiet_box()
    print(f"# start load {load:.2f} flagged={flagged}", file=sys.stderr)
    spark = get_spark("cc_seed_ab")
    import __spark_entry__

    __spark_entry__._ship_package(spark)

    cells: dict[str, dict] = {}
    for cell_name, thunk in (
        ("dedup_clusters@sf0.1",
         lambda: _time_dedup_clusters(spark, args.sf_dir)),
        (f"near_gate@{args.gate_nodes}",
         lambda: _time_edge_gate_graph(spark, args.gate_nodes)),
    ):
        thunk()  # untimed warm-up (worker spinup, file listing)
        runs = []
        for rep in range(args.reps):
            sec = thunk()
            runs.append(round(sec, 3))
            print(f"# {cell_name} rep{rep}: {sec:.3f}s", file=sys.stderr)
        cells[cell_name] = {"runs": runs,
                            "median": round(statistics.median(runs), 3),
                            "min": min(runs)}

    print("\n| cell | median (s) | min (s) | runs |")
    print("|---|---|---|---|")
    for cell_name, st in cells.items():
        print(f"| {cell_name} | {st['median']} | {st['min']} |"
              f" {st['runs']} |")
    print(json.dumps({"metric": "cc_seed_lazy_lc", "cells": cells,
                      "reps": args.reps, "load_start": round(load, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()

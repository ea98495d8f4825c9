"""Worst-case third-decade probe of the connected-components operator
(VERDICT r12 item #6): does the contracted-graph local finish stay sane
at its cap, and does each at-scale fallback engage cleanly past it?

The adversarial shape is a single PATH GRAPH 0-1-2-...-N: under the
operator's seed labeling (lbl(n) = min over {n} + neighbors(n)) every
interior node takes n-1, so the contracted label graph is ANOTHER path
of ~N edges -- contraction buys nothing, making the path simultaneously
the worst case for the probe size, the loop depth (component diameter
N), and the pointer-jumping flatten. Two cells bracket the decision
tree at scale:

- ``nodes = 2e6`` (== BROADCAST_MAX_NODES): the node gate admits the
  two-phase finish and the contracted path sits just UNDER
  LOCAL_FINISH_MAX_EDGES -- the largest driver union-find the operator
  can ever attempt (~2M pairs through the bounded toPandas probe).
- ``nodes = 5e6``: past the node gate, the plain shuffle loop is the
  only path; diameter 5e6 maximizes hook rounds.
- ``2e6:path2`` (a DOUBLE-step path: edges (i, i+1) AND (i, i+2)): the
  node gate admits the finish but the contracted graph is ~4M pairs --
  over the cap -- so the bounded probe must report oversize and the
  BROADCAST hook loop must engage; still one component labeled 0, so
  exactness proves the full fallback ran.

Each run asserts exactness (every node labeled 0, N nodes) -- only a
clean full pass of whichever path can produce that -- and times the
operator end-to-end. Realistic-density cells (the ~sf10 minhash pair
graph) live in SCALE.md's dedup table; this pins the adversarial bound.

Usage: python tools/measure_cc_scale.py [--cells 2000000,5000000]
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import _wait_for_quiet_box  # the shared load gate

from aws_cloudfront_realtime_monitoring_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default="2000000,2000000:path2,5000000",
                    help="comma-separated node counts, each optionally "
                         "suffixed ':path2' for the double-step shape")
    args = ap.parse_args()
    cells = []
    for c in args.cells.split(","):
        name, _, shape = c.partition(":")
        cells.append((int(name), shape or "path"))

    spark = get_spark("cc_scale")
    import __spark_entry__

    __spark_entry__._ship_package(spark)

    from pyspark.sql import functions as F

    from aws_cloudfront_realtime_monitoring_spark.operators import graph
    from aws_cloudfront_realtime_monitoring_spark.operators.graph import (
        connected_components,
    )

    results = {}
    rows = []
    for n_nodes, shape in cells:
        load, flagged = _wait_for_quiet_box()  # re-gate per cell
        print(f"# cell {n_nodes} ({shape}): load {load:.2f} "
              f"(flagged: {flagged})", file=sys.stderr)

        def chain_edges():
            step1 = spark.range(0, n_nodes - 1, 1, 32).select(
                F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
            )
            if shape == "path":
                return step1
            step2 = spark.range(0, n_nodes - 2, 1, 32).select(
                F.col("id").alias("doc_a"), (F.col("id") + 2).alias("doc_b")
            )
            return step1.union(step2)

        # which path the operator's decision tree takes, from its own
        # thresholds. Contracted pairs under the seed labeling: a plain
        # path contracts to n-2 pairs; the double-step path's seed is
        # lbl(0)=lbl(1)=0, lbl(i>=2)=i-2, so family (i,i+1) yields the
        # n-3 distinct cross pairs (i-2, i-1) for i in 2..n-2 and family
        # (i,i+2) adds the n-4 new pairs (i-2, i) for i in 2..n-3
        # (i=0 self-pairs, i=1 duplicates (0,1)): 2n-7 total
        contracted = n_nodes - 2 if shape == "path" else 2 * n_nodes - 7
        if n_nodes > graph.BROADCAST_MAX_NODES:
            path = "shuffle loop (node gate)"
        elif contracted > graph.LOCAL_FINISH_MAX_EDGES:
            path = "broadcast loop (probe oversize)"
        else:
            path = "local finish (max-size driver union-find)"

        t0 = time.time()
        labels = connected_components(chain_edges())
        agg = labels.agg(
            F.count("*").alias("n"),
            F.countDistinct("lbl").alias("k"),
            F.max("lbl").alias("mx"),
        ).head()
        wall = time.time() - t0
        assert agg.n == n_nodes, f"{agg.n} labeled nodes != {n_nodes}"
        assert agg.k == 1 and agg.mx == 0, (
            f"chain must collapse to one component labeled 0, got "
            f"k={agg.k} max={agg.mx}"
        )
        print(f"# {n_nodes} ({shape}): {path} -> {wall:.1f}s exact",
              file=sys.stderr)
        results[f"{n_nodes}:{shape}"] = {
            "contracted_pairs": contracted, "path": path,
            "wall_sec": round(wall, 1), "exact": True,
        }
        rows.append((n_nodes, shape, contracted, path, wall))

    print("| Graph | nodes | contracted pairs @seed | path taken | wall |"
          " exact |")
    print("|---|---|---|---|---|---|")
    for n_nodes, shape, contracted, path, wall in rows:
        print(f"| worst-case {shape} | {n_nodes:,} | {contracted:,} "
              f"| {path} | {wall:.1f} s | yes |")
    print(json.dumps({"cc_scale": results,
                      "caps": {"local_finish": graph.LOCAL_FINISH_MAX_EDGES,
                               "broadcast_nodes": graph.BROADCAST_MAX_NODES}}))


if __name__ == "__main__":
    main()

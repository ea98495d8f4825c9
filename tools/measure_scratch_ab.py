"""Scratch-pool A/B for the blocked near-dup kernel (r15, VERDICT #1).

The r14 sweep attributed integer-factor wall swings on an identical
plan to a first-touch page-fault regime (~10 MB/s in bad windows);
r15's mitigation reuses per-worker numpy buffers (operators/scratch.py)
so tiles fault once per worker instead of once per group. But the
regime DRIFTS between runs — a before/after comparison across windows
measures the window, not the mitigation. This tool therefore
INTERLEAVES the two spellings (pool / fresh-alloc) back to back within
one session, N pairs, bracketing every run with the fault/read memory
probe, so each pair shares (approximately) one regime and the paired
ratio isolates the allocation variable.

r15 addendum measured while building this: a regime EXISTS where even
backed-page READS collapse (0.1-0.6 GB/s vs the normal ~8; probed
2026-08-16) — buffer reuse cannot mitigate that component, so pairs
whose probes show read_gbps < 1 are reported but excluded from the
headline ratio.

Usage: python tools/measure_scratch_ab.py [--copies 100] [--pairs 4]
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
sys.path.insert(0, str(REPO / "tools"))

import numpy as np

from bench import _wait_for_quiet_box

from scale_sweep import SWEEP_DIR, build_scaled_embeddings

from aws_cloudfront_realtime_monitoring_spark.plans import load_full
from aws_cloudfront_realtime_monitoring_spark.plans import similarity as sim
from aws_cloudfront_realtime_monitoring_spark.session import get_spark


def mem_probe(mb: int = 128) -> tuple[float, float]:
    """(first-touch fault MB/s, backed-page read GB/s) — the bench.py
    memory-regime probe, kept small so the probe itself is cheap."""
    n = mb * 1024 * 1024 // 8
    t0 = time.perf_counter()
    a = np.ones(n, dtype=np.int64)
    t1 = time.perf_counter()
    float(a.sum())
    t2 = time.perf_counter()
    return round(mb / (t1 - t0), 1), round(mb / (t2 - t1) / 1024, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=100)
    ap.add_argument("--pairs", type=int, default=4)
    args = ap.parse_args()

    load, flagged = _wait_for_quiet_box()
    print(f"# start load {load:.2f} flagged={flagged}", file=sys.stderr)
    spark = get_spark("scratch_ab")
    registry = load_full()
    build_scaled_embeddings(spark, "/root/testdata/sf0.1", args.copies)
    d = str(SWEEP_DIR / f"sf0.1x{args.copies}")

    def run(pool: bool) -> float:
        sim.SCRATCH_POOL = pool  # snapshotted into the closure per build
        t0 = time.perf_counter()
        (registry["embedding_near_dup_blocked"].build(spark, d)
         .write.format("noop").mode("overwrite").save())
        return round(time.perf_counter() - t0, 2)

    # try/finally: run() flips the module-global SCRATCH_POOL; an
    # exception mid-sweep must not leave the process with the pool OFF
    # for anything run afterwards in the same session (r15 ADVICE --
    # same pattern as tests/test_scratch.py)
    pairs = []
    try:
        # one untimed warm-up per arm (worker spinup, page cache)
        run(True)
        run(False)

        for i in range(args.pairs):
            f0, r0 = mem_probe()
            a = run(True)
            b = run(False)
            f1, r1 = mem_probe()
            rec = {"pool_s": a, "fresh_s": b,
                   "ratio": round(b / a, 2) if a else None,
                   "fault_mbps": (f0, f1), "read_gbps": (r0, r1)}
            pairs.append(rec)
            print(f"# pair {i}: {rec}", file=sys.stderr)
    finally:
        sim.SCRATCH_POOL = True

    healthy = [p for p in pairs if min(p["read_gbps"]) >= 1.0]
    ratios = [p["ratio"] for p in healthy if p["ratio"]]
    print("\n| pair | pool (s) | fresh (s) | fresh/pool | fault MB/s | read GB/s |")
    print("|---|---|---|---|---|---|")
    for i, p in enumerate(pairs):
        print(f"| {i} | {p['pool_s']} | {p['fresh_s']} | {p['ratio']} |"
              f" {p['fault_mbps']} | {p['read_gbps']} |")
    print(json.dumps({
        "metric": "scratch_ab", "copies": args.copies, "pairs": pairs,
        "healthy_pairs": len(healthy),
        "median_ratio": (round(sorted(ratios)[len(ratios) // 2], 2)
                         if ratios else None),
        "load_start": round(load, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Scale-factor stress sweep for the dedup family (VERDICT r5 item #6).

Measures dedup_exact / dedup_minhash_lsh / dedup_simhash / dedup_clusters
wall time at sf0.01, sf0.1, and a synthetic ~sf1 built locally from sf0.1,
to catch super-linear surprises before a real cluster does.

The ~sf1 corpus is NOT a plain self-union: copying rows verbatim would
multiply every duplicate-group size by the copy count, which multiplies
LSH candidate pairs QUADRATICALLY in the copy count -- a data-distribution
change, not a scale-up, and it would conflate "the corpus is 10x bigger"
with "the corpus is 100x more duplicated". Instead each copy ``i`` salts
EVERY word with the copy index (``regexp_replace(text, '(\\S+)', '$1<i>')``),
which:

- keeps per-document token/shingle counts identical (same per-row cost),
- keeps the WITHIN-copy duplicate structure bit-identical (two docs that
  were near-dups still are -- both got the same salt),
- makes every cross-copy shingle AND word hash distinct, so no cross-copy
  MinHash/SimHash collisions beyond random chance: duplicate-group sizes
  stay constant while the corpus grows 10x -- a true scale-up.

Usage:  python tools/scale_sweep.py [--copies 10] [--runs 2]
Prints one markdown table (for SCALE.md) plus a JSON line.

Sweep data lives under ``.scale_sweep/`` (gitignored) inside the repo and
is rebuilt only when missing.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from aws_cloudfront_realtime_monitoring_spark.plans import load_all
from aws_cloudfront_realtime_monitoring_spark.session import get_spark
from aws_cloudfront_realtime_monitoring_spark.sources.tables import load_table

QUERIES = ["dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_clusters"]
SWEEP_DIR = REPO / ".scale_sweep"


def build_scaled_documents(spark, base_sf_dir: str, copies: int) -> str:
    """Materialize a word-salted ``copies``-fold documents table; returns the
    sf_dir-shaped directory containing ``documents.parquet`` (a parquet
    DIRECTORY -- ``load_table`` reads it as-is and, being a small-stat dir
    path, skips the layout cache; we pre-partition it ourselves)."""
    out_dir = SWEEP_DIR / f"sf0.1x{copies}"
    table = out_dir / "documents.parquet"
    if (table / "_SUCCESS").exists():
        return str(out_dir)
    if table.exists():
        shutil.rmtree(table)
    base = load_table(spark, base_sf_dir, "documents")
    n = base.count()
    parts = []
    for i in range(copies):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                # salt every word with the copy index: per-copy dup structure
                # preserved, cross-copy shingles/word-hashes disjoint
                F.regexp_replace("text", r"(\S+)", r"$1" + str(i)).alias("text"),
                "lang",
                "source",
            )
        )
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionAll(p)
    scaled = scaled.withColumn("n_chars", F.length("text"))
    scaled.repartition(32).write.mode("overwrite").parquet(str(table))
    print(f"# built {table}: {n * copies} docs ({copies} salted copies of {n})",
          file=sys.stderr)
    return str(out_dir)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("scale_sweep")
    registry = load_all()

    scales = [
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
        (f"~sf{args.copies / 10:g}",
         build_scaled_documents(spark, "/root/testdata/sf0.1", args.copies)),
    ]

    # untimed warm-up at the smallest scale: the signature/flatten plans are
    # codegen-heavy and the JIT keeps improving them for several executions
    # (measured: cold 7.6 s -> warm 1.0 s for minhash at sf0.1); without this
    # the small-scale cells measure JVM warm-up, not the query
    for name in QUERIES:
        registry[name].build(spark, scales[0][1]).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()

    results: dict[str, dict[str, float]] = {}
    rows: dict[str, int] = {}
    for label, sf_dir in scales:
        rows[label] = load_table(spark, sf_dir, "documents").count()
        for name in QUERIES:
            runs = []
            for _ in range(args.runs):
                t0 = time.time()
                registry[name].build(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.time() - t0)
                spark.catalog.clearCache()
            results.setdefault(name, {})[label] = min(runs)
            print(f"# {label} {name}: {min(runs):.2f}s (runs: "
                  f"{[round(r, 2) for r in runs]})", file=sys.stderr)

    # markdown table for SCALE.md
    labels = [lbl for lbl, _ in scales]
    print("| Query | " + " | ".join(f"{l} ({rows[l]} docs)" for l in labels)
          + " | 10x ratio |")
    print("|---|" + "---|" * (len(labels) + 1))
    for name in QUERIES:
        r = results[name]
        ratio = r[labels[2]] / r[labels[1]]
        print("| " + name + " | "
              + " | ".join(f"{r[l]:.2f} s" for l in labels)
              + f" | {ratio:.1f}x |")
    print(json.dumps({"sweep": results, "rows": rows}))


if __name__ == "__main__":
    main()

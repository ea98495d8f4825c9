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

from bench import _wait_for_quiet_box  # the shared load gate

from aws_cloudfront_realtime_monitoring_spark.session import get_spark
from aws_cloudfront_realtime_monitoring_spark.sources.tables import load_table

#: the r5 dedup sweep set plus the r6 curation family (r7): every op that
#: scans only the documents table, plus semdedup over the embeddings table
QUERIES = ["dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_clusters",
           "bm25_topk", "decontaminate", "unigram_logprob", "dedup_spans",
           "curation_pipeline", "semdedup"]

#: the r8 relational/headline sweep set (VERDICT r7 item #1): the flagship
#: Q1 + wire-parse paths and the window/join/interpolate/stats/HLL family,
#: over the salted events/orders corpus
RELATIONAL_QUERIES = [
    "q1_hourly_measure_by_dim", "cf_parse_wire_roundtrip", "sessionize",
    "asof_join_latest_order", "window_frames_ranking",
    "interpolate_linear_fill", "stats_profile", "hll_cube_range",
]
SWEEP_DIR = REPO / ".scale_sweep"


def build_scaled_documents(spark, base_sf_dir: str, copies: int) -> str:
    """Materialize a word-salted ``copies``-fold documents table; returns the
    sf_dir-shaped directory containing ``documents.parquet`` (a parquet
    DIRECTORY -- ``load_table`` reads it as-is and, being a small-stat dir
    path, skips the layout cache; we pre-partition it ourselves)."""
    # guard BELOW the docstring (r11 review: it sat above, turning the
    # docstring into a dead statement)
    if copies > 999:
        raise ValueError("copies > 999 exceeds the fixed-width salt")
    out_dir = SWEEP_DIR / f"sf0.1x{copies}"
    table = out_dir / "documents.parquet"
    # key the cache on the SOURCE file's stat: the driver regenerates
    # testdata between rounds, and a stale scaled corpus would silently
    # measure last round's data (the tables.py layout-cache policy)
    src = os.stat(os.path.join(base_sf_dir, "documents.parquet"))
    # v3: st_mtime_ns, NOT whole seconds -- a same-second same-size
    # regen must invalidate the cache (tables.py r8 review; r11 here)
    stamp = out_dir / f".src-v3-{src.st_size}-{src.st_mtime_ns}"
    if (table / "_SUCCESS").exists() and stamp.exists():
        return str(out_dir)
    # wipe only THIS table's artifacts: the dir is shared with the
    # relational corpus (events/orders), which a documents rebuild must
    # not destroy (r8 review); retire superseded stamps so a source
    # stat that ever reverts cannot resurrect an old corpus
    if table.exists():
        shutil.rmtree(table)
    for old_stamp in out_dir.glob(".src-v*"):
        old_stamp.unlink()
    out_dir.mkdir(parents=True, exist_ok=True)
    stamp.touch()
    base = load_table(spark, base_sf_dir, "documents")
    n = base.count()
    parts = []
    for i in range(copies):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                # salt every word with the copy index: per-copy dup structure
                # preserved, cross-copy shingles/word-hashes disjoint
                # fixed-width salt: equal-length suffixes are collision-
                # free across copies (str(i) was not prefix-free past
                # copies=10: 'foo'+'11' == 'foo1'+'1' -- r7 review; the
                # recorded 10-copy sweeps used single-digit salts, which
                # ARE uniform width, so their numbers stand)
                F.regexp_replace("text", r"(\S+)", r"$1" + f"{i:03d}").alias("text"),
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


def build_scaled_embeddings(spark, base_sf_dir: str, copies: int) -> None:
    """Materialize a ``copies``-fold embeddings table in the sweep dir.

    The word-salt analog for vectors is a per-copy SIGNED ROTATION of the
    dimensions (rotate by the copy index, flip signs by a deterministic
    per-(copy, dim) bit): an orthogonal transform, so every WITHIN-copy
    cosine -- and therefore the within-copy near-dup/cluster structure --
    is preserved bit-identically, while cross-copy pairs decorrelate to
    random-vector cosines. A verbatim self-union would instead create
    copies^2 exact-duplicate pairs (cos = 1), a data-distribution change,
    not a scale-up."""
    out_dir = SWEEP_DIR / f"sf0.1x{copies}"
    table = out_dir / "embeddings.parquet"
    src = os.stat(os.path.join(base_sf_dir, "embeddings.parquet"))
    # v2: per-(copy, dim) hashed sign bits replaced the parity form
    stamp = out_dir / f".esrc-v3-{src.st_size}-{src.st_mtime_ns}"
    if (table / "_SUCCESS").exists() and stamp.exists():
        return
    if table.exists():
        shutil.rmtree(table)
    for old_stamp in out_dir.glob(".esrc-v*"):
        old_stamp.unlink()
    out_dir.mkdir(parents=True, exist_ok=True)
    stamp.touch()
    base = load_table(spark, base_sf_dir, "embeddings")
    dim = len(base.select("embedding").head()[0])

    def _sign(i: int, j: int) -> float:
        # genuinely per-(copy, dim) bit: parity of the hashed pair. The
        # r6 form parity(i*odd + j*odd) collapsed to parity(i + j) -- a
        # constant GLOBAL sign per copy pair, no per-dim decorrelation.
        h = (i * 2654435761 + j * 40503) & 0xFFFFFFFF
        h ^= h >> 16
        return 1.0 if bin(h).count("1") % 2 == 0 else -1.0

    # Past dim copies the rotation offsets repeat (copies i and i+dim
    # share an offset), but the per-(copy, dim) sign patterns still
    # decorrelate them: for same-offset copies the cross-copy cosine is
    # sum_j s_ij * s_i'j * e_j^2 / ||e||^2, and with independent-looking
    # hashed sign bits that is a +-e_j^2 random walk -- mean 0, std
    # ~1/sqrt(dim), i.e. random-vector cosines, same as the rotated
    # pairs. The former copies<=dim refusal predated the v2 hashed
    # signs (the parity form WAS degenerate); what must now hold is
    # that no two same-offset copies share a sign pattern (else those
    # two copies are bit-identical: copies^2 cos=1 pairs, the
    # distribution change this construction exists to avoid). Checked
    # explicitly -- a hash collision refuses rather than corrupts.
    by_offset: dict[int, dict[tuple, int]] = {}
    for i in range(copies):
        pat = tuple(_sign(i, j) for j in range(dim))
        prev = by_offset.setdefault(i % dim, {}).setdefault(pat, i)
        if prev != i:
            raise ValueError(
                f"copies {prev} and {i} share rotation offset {i % dim} "
                "AND sign pattern -- they would be bit-identical; change "
                "the sign hash or the copy count"
            )

    parts = []
    for i in range(copies):
        rotated = F.array(*[
            (F.element_at("embedding", (j + i) % dim + 1)
             * F.lit(_sign(i, j))).cast("float")
            for j in range(dim)
        ])
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                rotated.alias("embedding"),
                "label",
            )
        )
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionAll(p)
    scaled.repartition(32).write.mode("overwrite").parquet(str(table))
    print(f"# built {table}: {copies}x embeddings (signed-rotation copies)",
          file=sys.stderr)


def build_scaled_events_orders(spark, base_sf_dir: str, copies: int,
                               tables: tuple = ("events", "orders")) -> str:
    """Materialize ``copies``-fold events + orders tables in the sweep dir.

    The word-salt discipline applied to the relational family -- each
    copy ``i`` must neither merge with nor tie against the others, while
    its INTERNAL structure (sessions, window frames, as-of matches,
    per-series interpolation points) stays bit-identical:

    - ``user_id``/``o_custkey`` += i * 1e5 (above o_custkey's 15k max,
      small enough that stats_profile's SUM(user_id^2) moment stays
      within int64 -- a 1e8 offset overflowed it): disjoint key spaces, so
      sessions, per-user windows, and as-of joins never merge across
      copies (a verbatim self-union would 10x every user's row count --
      a distribution change, not a scale-up);
    - ``event_type`` gets a fixed-width copy suffix: series-keyed ops
      (interpolate's per-type grid, stats' per-type groups) see 10x MORE
      series of unchanged density -- how dimension cardinality actually
      grows at scale -- instead of 10x denser series that would serialize
      into 5 partitions;
    - ``ts``/``o_orderdate`` += i ms: breaks cross-copy exact sort ties
      (10x tie multiplicity would change window/sort behavior) while
      leaving hour bins, the ago(24h) horizon, and 30-min session gaps
      unchanged -- the time RANGE stays fixed, so time-windowed queries
      hold 10x the rows: a traffic scale-up, not a history stretch;
    - ``event_id``/``o_orderkey`` += i * 1e9: globally unique tiebreaks.

    One cell-level caveat, documented rather than hidden: the salted
    event_type no longer matches _synth_wire_lines' literal
    _TYPE_STATUS map, so cf_parse_wire_roundtrip's final tiny GROUP BY
    collapses to the ELSE-500 status for the scaled corpus (both
    engines treat it identically -- correctness holds; the measured
    per-row parse work, which dominates that row, is unchanged).
    """
    if copies > 214:
        # at 215 copies, stats_profile's SUM(user_id^2) moment already
        # exceeds int64 (copy 214's biggest group: 20,302 rows x
        # (2.14e7)^2 ~ 9.30e18 > 2^63-1 ~ 9.22e18; 214 sums to ~9.21e18)
        # -- refuse instead of overflowing mid-sweep (r11 review: the
        # old > 215 guard was off by one against its own arithmetic)
        raise ValueError(
            "copies > 214 overflows int64 in the SUM(user_id^2) moment"
        )
    out_dir = SWEEP_DIR / f"sf0.1x{copies}"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, key_col, id_col, t_col in (
        ("events", "user_id", "event_id", "ts"),
        ("orders", "o_custkey", "o_orderkey", "o_orderdate"),
    ):
        if name not in tables:
            # callers that only replay one table (the streaming
            # throughput tool reads events alone) skip the other
            # table's full scaled build (r11 review)
            continue
        table = out_dir / f"{name}.parquet"
        src = os.stat(os.path.join(base_sf_dir, f"{name}.parquet"))
        # v3: the id offset changed 1e9 -> 1e6 (r11) AFTER v2 corpora were
        # materialized; without the version bump an on-disk v2 corpus
        # (old offsets) would pass the stat check and silently keep
        # feeding sweeps (the bm25 empty-tf lesson: stale corpora corrupt
        # cells without erroring)
        stamp = out_dir / f".{name}src-v3-{src.st_size}-{src.st_mtime_ns}"
        if (table / "_SUCCESS").exists() and stamp.exists():
            continue
        if table.exists():
            shutil.rmtree(table)
        for old_stamp in out_dir.glob(f".{name}src-v*"):
            old_stamp.unlink()
        stamp.touch()
        base = load_table(spark, base_sf_dir, name)
        # the per-copy offsets below are only collision-free for the
        # RANGES the sf0.1 base corpus actually has; a larger base dir
        # passed as base_sf_dir would silently produce colliding
        # ids/keys across copies and corrupt the measured dedup/stats
        # semantics (r11 advice) -- verify the assumption, don't trust it
        mx_id, mx_key = base.agg(F.max(id_col), F.max(key_col)).head()
        if mx_id is not None and int(mx_id) >= 1_000_000:
            raise ValueError(
                f"{name}.{id_col} max {mx_id} >= 1e6: the per-copy id "
                "offset would collide across copies; use a smaller base "
                "corpus or raise the offset (and re-check the min_by/"
                "max_by 2^33 injectivity bound)"
            )
        if mx_key is not None and int(mx_key) >= 100_000:
            raise ValueError(
                f"{name}.{key_col} max {mx_key} >= 1e5: the per-copy key "
                "salt would collide across copies"
            )
        parts = []
        for i in range(copies):
            sel = []
            for c in base.columns:
                if c == key_col:
                    sel.append((F.col(c) + F.lit(i * 100_000)).alias(c))
                elif c == id_col:
                    # +1e6 per copy, NOT 1e9: stats_profile's min_by/
                    # max_by composite key is injective only while
                    # event_id < 2^33 ~ 8.6e9 (advanced.py, r8), which
                    # the old offset broke from copy 9 on; base ids are
                    # < 1e6 in both tables so 1e6 stays globally unique
                    # through the 214-copy cap (r11 review)
                    sel.append((F.col(c) + F.lit(i * 1_000_000)).alias(c))
                elif c == t_col:
                    sel.append(
                        F.timestamp_micros(
                            F.unix_micros(F.col(c)) + F.lit(i * 1000)
                        ).alias(c)
                    )
                elif c == "event_type":
                    sel.append(F.concat(F.col(c), F.lit(f"{i:03d}")).alias(c))
                else:
                    sel.append(F.col(c))
            parts.append(base.select(*sel))
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionAll(p)
        scaled.repartition(32).write.mode("overwrite").parquet(str(table))
        print(f"# built {table}: {copies}x salted {name}", file=sys.stderr)
    return str(out_dir)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--family", choices=["dedup", "relational"],
                    default="dedup",
                    help="dedup/curation (documents+embeddings corpus) or "
                         "relational/headline (events+orders corpus)")
    args = ap.parse_args()
    load, still_loaded = _wait_for_quiet_box()
    print(f"# start load: {load:.2f} (flagged: {still_loaded})",
          file=sys.stderr)
    queries = QUERIES if args.family == "dedup" else RELATIONAL_QUERIES
    count_table = "documents" if args.family == "dedup" else "events"

    spark = get_spark("scale_sweep")
    from aws_cloudfront_realtime_monitoring_spark.plans import load_full

    registry = load_full()
    import __spark_entry__

    __spark_entry__._ship_package(spark)

    if args.family == "dedup":
        scaled_dir = build_scaled_documents(
            spark, "/root/testdata/sf0.1", args.copies
        )
        build_scaled_embeddings(spark, "/root/testdata/sf0.1", args.copies)
    else:
        scaled_dir = build_scaled_events_orders(
            spark, "/root/testdata/sf0.1", args.copies
        )
    scales = [
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
        (f"~sf{args.copies / 10:g}", scaled_dir),
    ]

    # untimed warm-up at the smallest scale: the signature/flatten plans are
    # codegen-heavy and the JIT keeps improving them for several executions
    # (measured: cold 7.6 s -> warm 1.0 s for minhash at sf0.1); without this
    # the small-scale cells measure JVM warm-up, not the query
    for name in queries:
        registry[name].build(spark, scales[0][1]).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()

    results: dict[str, dict[str, float]] = {}
    rows: dict[str, int] = {}
    for label, sf_dir in scales:
        rows[label] = load_table(spark, sf_dir, count_table).count()
        for name in queries:
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
    print("| Query | " + " | ".join(f"{l} ({rows[l]} rows)" for l in labels)
          + f" | {args.copies}x ratio |")
    print("|---|" + "---|" * (len(labels) + 1))
    for name in queries:
        r = results[name]
        ratio = r[labels[2]] / r[labels[1]]
        print("| " + name + " | "
              + " | ".join(f"{r[l]:.2f} s" for l in labels)
              + f" | {ratio:.1f}x |")
    print(json.dumps({"sweep": results, "rows": rows}))


if __name__ == "__main__":
    main()

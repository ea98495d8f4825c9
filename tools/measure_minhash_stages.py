"""Stage-level wall breakdown of dedup_minhash_lsh at the ~sf10 sweep
corpus (VERDICT r10 item #1: the suite's steepest 100x ratio, 39.7x /
20.35 s with md5-string band signatures).

Splits the query into its four physical stages, each materialized with
an eager localCheckpoint so the next stage's clock starts from real
blocks instead of recomputing the prefix:

1. ``sig``      -- shingle + 16 minhash permutations + band signatures
                   (map-side expression work, no shuffle)
2. ``bandjoin`` -- the band self-join producing RAW (i, j) collisions
3. ``distinct`` -- the (i, j)-keyed DISTINCT over the collisions
4. ``verify``   -- join the shingle arrays back + exact Jaccard

Also times the r10 md5-string signature form (reconstructed inline;
the registry row moved to int64 band signatures in r11) against the
int64 form, full-query, so SCALE.md records the swap's effect at scale.

Usage: python tools/measure_minhash_stages.py [--copies 100] [--runs 3]
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
from aws_cloudfront_realtime_monitoring_spark.sources.tables import register_views


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _md5_sigs_stmt() -> str:
    """The r10 signature statement (md5-string band sigs) -- kept here,
    not in the engine, purely as the measurement comparator."""
    from aws_cloudfront_realtime_monitoring_spark.plans.dedup import (
        LSH_BANDS, LSH_ROWS, minhash_sigs_stmt)

    band_sigs = ", ".join(
        "md5(concat_ws(',', {cols})) AS s{b}".format(
            b=b,
            cols=", ".join(f"m{b * LSH_ROWS + r}" for r in range(LSH_ROWS)),
        )
        for b in range(LSH_BANDS)
    )
    return minhash_sigs_stmt(band_sigs)


def _md5_pairs_stmt(view: str) -> str:
    from aws_cloudfront_realtime_monitoring_spark.plans.dedup import LSH_BANDS

    stack_args = ", ".join(f"{b}, s{b}" for b in range(LSH_BANDS))
    return f"""
        WITH bands AS (
          SELECT doc_id, stack({LSH_BANDS}, {stack_args}) AS (band, sig)
          FROM {view}),
        cand AS (
          SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        verified AS (
          SELECT i, j,
                 CAST(size(array_intersect(sa.sh, sb.sh)) AS BIGINT) AS c,
                 CAST(size(sa.sh) + size(sb.sh)
                   - size(array_intersect(sa.sh, sb.sh)) AS BIGINT) AS u
          FROM cand
          JOIN {view} sa ON sa.doc_id = i
          JOIN {view} sb ON sb.doc_id = j)
        SELECT i AS doc_a, j AS doc_b,
               (20000 * c + u) div (2 * u) AS jaccard_bp
        FROM verified WHERE c * 10 >= u * 6
    """


def _stage_pass(spark) -> dict[str, float]:
    """One staged pass over the registered ``documents`` view; returns
    per-stage wall seconds. Each stage reads the previous stage's
    eager localCheckpoint."""
    from aws_cloudfront_realtime_monitoring_spark.plans.dedup import (
        LSH_BANDS, minhash_sigs_stmt)

    out: dict[str, float] = {}
    t0 = time.time()
    sigs = spark.sql(minhash_sigs_stmt()).localCheckpoint(eager=True)
    out["sig"] = time.time() - t0
    sigs.createOrReplaceTempView("mh_stage_sigs")

    stack_args = ", ".join(f"s{b}" for b in range(LSH_BANDS))
    t0 = time.time()
    raw = spark.sql(f"""
        WITH bands AS (
          SELECT doc_id, stack({LSH_BANDS}, {stack_args}) AS sig
          FROM mh_stage_sigs)
        SELECT a.doc_id AS i, b.doc_id AS j
        FROM bands a JOIN bands b
          ON a.sig = b.sig AND a.doc_id < b.doc_id
    """).localCheckpoint(eager=True)
    out["bandjoin"] = time.time() - t0

    t0 = time.time()
    cand = raw.distinct().localCheckpoint(eager=True)
    out["distinct"] = time.time() - t0
    cand.createOrReplaceTempView("mh_stage_cand")

    t0 = time.time()
    _noop(spark.sql("""
        SELECT i AS doc_a, j AS doc_b,
               (20000 * c + u) div (2 * u) AS jaccard_bp
        FROM (SELECT i, j,
                     CAST(size(array_intersect(sa.sh, sb.sh)) AS BIGINT) AS c,
                     CAST(size(sa.sh) + size(sb.sh)
                       - size(array_intersect(sa.sh, sb.sh)) AS BIGINT) AS u
              FROM mh_stage_cand
              JOIN mh_stage_sigs sa ON sa.doc_id = i
              JOIN mh_stage_sigs sb ON sb.doc_id = j)
        WHERE c * 10 >= u * 6
    """))
    out["verify"] = time.time() - t0
    out["raw_pairs"] = float(raw.count())
    out["cand_pairs"] = float(cand.count())
    return out


def _full_pass(spark, sigs_stmt: str, pairs_stmt_fn) -> float:
    t0 = time.time()
    sigs = spark.sql(sigs_stmt).localCheckpoint(eager=False)
    sigs.createOrReplaceTempView("mh_full_sigs")
    _noop(spark.sql(pairs_stmt_fn("mh_full_sigs")))
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=100)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    load, flagged = _wait_for_quiet_box()
    print(f"# start load: {load:.2f} (flagged: {flagged})", file=sys.stderr)

    spark = get_spark("minhash_stages")
    import __spark_entry__

    __spark_entry__._ship_package(spark)
    sys.path.insert(0, str(REPO / "tools"))
    from scale_sweep import build_scaled_documents

    from aws_cloudfront_realtime_monitoring_spark.plans.dedup import (
        minhash_pairs_stmt, minhash_sigs_stmt)

    scaled_dir = build_scaled_documents(
        spark, "/root/testdata/sf0.1", args.copies
    )

    results: dict[str, dict] = {}
    for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"),
                          (f"~sf{args.copies / 10:g}", scaled_dir)):
        # re-gate per cell: the corpus build + the earlier cell run for
        # minutes, so the start-of-process gate says nothing about the
        # box by the time a later cell is timed (r12 review)
        load, flagged = _wait_for_quiet_box()
        if flagged:
            print(f"# {label}: box never went quiet (load {load:.2f}) -- "
                  "cell is suspect", file=sys.stderr)
        register_views(spark, sf_dir)
        # untimed warm-up (JIT: cold 7.6 s vs warm 1.0 s at sf0.1)
        _full_pass(spark, minhash_sigs_stmt(), minhash_pairs_stmt)

        stage_runs = [_stage_pass(spark) for _ in range(args.runs)]
        stages = {
            k: min(r[k] for r in stage_runs)
            for k in ("sig", "bandjoin", "distinct", "verify")
        }
        stages["raw_pairs"] = stage_runs[0]["raw_pairs"]
        stages["cand_pairs"] = stage_runs[0]["cand_pairs"]
        # INTERLEAVE the int64/md5 comparator runs: session state
        # (accumulated never-unpersisted localCheckpoint blocks) drifts
        # monotonically, so running all int64 passes before all md5
        # passes would confound the headline comparison with
        # measurement order (r12 review)
        int64_runs: list[float] = []
        md5_runs: list[float] = []
        for _ in range(args.runs):
            int64_runs.append(
                _full_pass(spark, minhash_sigs_stmt(), minhash_pairs_stmt))
            md5_runs.append(
                _full_pass(spark, _md5_sigs_stmt(), _md5_pairs_stmt))
        # per-run raw timings: a neighbor burst mid-cell must be
        # detectable post-hoc (r12 review)
        for k in ("sig", "bandjoin", "distinct", "verify"):
            print(f"# {label} {k} runs: "
                  f"{[round(r[k], 2) for r in stage_runs]}", file=sys.stderr)
        print(f"# {label} full int64 runs: "
              f"{[round(t, 2) for t in int64_runs]}", file=sys.stderr)
        print(f"# {label} full md5 runs: "
              f"{[round(t, 2) for t in md5_runs]}", file=sys.stderr)
        stages["full_int64"] = min(int64_runs)
        stages["full_md5"] = min(md5_runs)
        results[label] = stages
        print(f"# {label}: {stages}", file=sys.stderr)

    print("| Scale | sig | band join | distinct | verify | staged total |"
          " full (int64) | full (md5, r10 form) | raw pairs | cand pairs |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for label, s in results.items():
        total = s["sig"] + s["bandjoin"] + s["distinct"] + s["verify"]
        print(f"| {label} | {s['sig']:.2f} s | {s['bandjoin']:.2f} s "
              f"| {s['distinct']:.2f} s | {s['verify']:.2f} s "
              f"| {total:.2f} s | {s['full_int64']:.2f} s "
              f"| {s['full_md5']:.2f} s | {int(s['raw_pairs'])} "
              f"| {int(s['cand_pairs'])} |")
    print(json.dumps({"minhash_stages": results}))


if __name__ == "__main__":
    main()

"""Stage-level wall breakdown of bm25_topk at the ~sf10 sweep corpus
(VERDICT r10 item #2: 29.6 s / 18.7x at 100x -- confirm the
"linear-with-constant" claim by splitting the two corpus scans from the
scoring join; the checkpointed doc-length relation is the suspect).

Stages, each from the previous stage's eager localCheckpoint:

1. ``dl``    -- tokenize scan #1: per-doc lengths (explode + groupBy)
2. ``tf``    -- tokenize scan #2: query-term tf (explode + broadcast
               semi-filter + groupBy); output is O(matching docs x 9)
3. ``score`` -- dfr/stats/score/rank over the tiny tf and O(docs) dl

Usage: python tools/measure_bm25_stages.py [--copies 100] [--runs 3]
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


def _values_clause(copies: int | None) -> str:
    """The probe-query VALUES clause. ``copies`` None = the registry
    row's literal terms; an int = per-copy SALTED terms (the sweep
    corpus suffixes every word with its 3-digit copy index, so literal
    terms match NOTHING there -- salting the query terms per copy makes
    the tf relation grow with the corpus, a true scoring scale-up)."""
    from aws_cloudfront_realtime_monitoring_spark.plans.text import (
        BM25_QUERIES, _bm25_values)

    if copies is None:
        return _bm25_values("spark")
    rows = ", ".join(
        f"('{qid}', '{t}{i:03d}')"
        for qid, terms in BM25_QUERIES for t in terms for i in range(copies)
    )
    return f"SELECT * FROM VALUES {rows} AS v(query_id, term)"


def _stage_pass(spark, qcopies: int | None) -> dict[str, float]:
    # the stage statements come FROM the plan module, so this tool times
    # the exact SQL the registry row composes (r12 review: a hand copy
    # here would silently desynchronize on any scoring tweak)
    from aws_cloudfront_realtime_monitoring_spark.plans.text import (
        bm25_combined_select, bm25_dl_select, bm25_score_ctes,
        bm25_split_expr, bm25_tf_select)

    split_expr = bm25_split_expr("spark")
    out: dict[str, float] = {}

    if qcopies is None:
        # r18: the registry row now checkpoints ONE fused corpus pass
        # (dl + fixture-query tfs) instead of separate dl/tf scans; time
        # it alongside the unfused stages (which stay: the oracle runs
        # them, and the copies sweep scales only the unfused tf's
        # VALUES clause)
        t0 = time.time()
        spark.sql(bm25_combined_select(split_expr)).localCheckpoint(
            eager=True)
        out["combined"] = time.time() - t0

    t0 = time.time()
    dl = spark.sql(bm25_dl_select(split_expr)).localCheckpoint(eager=True)
    out["dl"] = time.time() - t0
    dl.createOrReplaceTempView("bm25_stage_dl")

    t0 = time.time()
    tf = spark.sql(
        bm25_tf_select(split_expr, _values_clause(qcopies))
    ).localCheckpoint(eager=True)
    out["tf"] = time.time() - t0
    tf.createOrReplaceTempView("bm25_stage_tf")

    t0 = time.time()
    _noop(spark.sql(
        "WITH " + bm25_score_ctes("bm25_stage_dl", "bm25_stage_tf")
    ))
    out["score"] = time.time() - t0
    out["tf_rows"] = float(tf.count())
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=100)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    load, flagged = _wait_for_quiet_box()
    print(f"# start load: {load:.2f} (flagged: {flagged})", file=sys.stderr)

    spark = get_spark("bm25_stages")
    import __spark_entry__

    __spark_entry__._ship_package(spark)
    sys.path.insert(0, str(REPO / "tools"))
    from scale_sweep import build_scaled_documents

    from aws_cloudfront_realtime_monitoring_spark.plans import load_full

    registry = load_full()
    scaled_dir = build_scaled_documents(
        spark, "/root/testdata/sf0.1", args.copies
    )

    results: dict[str, dict] = {}
    # at the scaled corpus the registry terms match nothing (every word
    # carries a copy salt): run the staged pass TWICE there -- literal
    # terms (the sweep-comparable scan cost) and per-copy salted terms
    # (tf grows ~copies-fold: the true scoring scale-up)
    cells = [("sf0.1", "/root/testdata/sf0.1", None),
             (f"~sf{args.copies / 10:g}", scaled_dir, None),
             (f"~sf{args.copies / 10:g} salted-q", scaled_dir, args.copies)]
    def _full_pass(sf_dir: str) -> float:
        t0 = time.time()
        _noop(registry["bm25_topk"].build(spark, sf_dir))
        return time.time() - t0

    for label, sf_dir, qcopies in cells:
        # re-gate per cell: the corpus build + earlier cells run for
        # minutes, so the start-of-process gate says nothing about the
        # box by the time a later cell is timed (r12 review; the r10
        # 29.6 s artifact this tool exists to audit was itself a
        # busy-box cell)
        load, flagged = _wait_for_quiet_box()
        if flagged:
            print(f"# {label}: box never went quiet (load {load:.2f}) -- "
                  "cell is suspect", file=sys.stderr)
        register_views(spark, sf_dir)
        _noop(registry["bm25_topk"].build(spark, sf_dir))  # warm-up

        stage_runs = [_stage_pass(spark, qcopies) for _ in range(args.runs)]
        stages = {
            k: min(r[k] for r in stage_runs) for k in ("dl", "tf", "score")
        }
        stages["tf_rows"] = stage_runs[0]["tf_rows"]
        # per-run raw timings: a neighbor burst mid-cell must be
        # detectable post-hoc (r12 review)
        for k in ("dl", "tf", "score"):
            print(f"# {label} {k} runs: "
                  f"{[round(r[k], 2) for r in stage_runs]}", file=sys.stderr)
        if qcopies is None:
            full_runs = [_full_pass(sf_dir) for _ in range(args.runs)]
            print(f"# {label} full runs: "
                  f"{[round(t, 2) for t in full_runs]}", file=sys.stderr)
            stages["full"] = min(full_runs)
        else:
            # the registry row always probes LITERAL terms, which the
            # salted corpus cannot match -- re-timing it here would
            # duplicate the previous cell's number under a salted-q
            # label (r12 review); no salted full query exists to time
            stages["full"] = None
        results[label] = stages
        print(f"# {label}: {stages}", file=sys.stderr)

    print("| Scale | dl scan | tf scan | score+rank | staged total |"
          " full query | tf rows |")
    print("|---|---|---|---|---|---|---|")
    for label, s in results.items():
        total = s["dl"] + s["tf"] + s["score"]
        full = f"{s['full']:.2f} s" if s["full"] is not None else "-"
        print(f"| {label} | {s['dl']:.2f} s | {s['tf']:.2f} s "
              f"| {s['score']:.2f} s | {total:.2f} s | {full} "
              f"| {int(s['tf_rows'])} |")
    print(json.dumps({"bm25_stages": results}))


if __name__ == "__main__":
    main()

"""Physical-plan audit: one summary row per registry query (exchanges,
broadcasts, pushed filters, codegen spans, pathological nodes). Emits
markdown to stdout -- redirected into PLANS.md as the per-round plan
artifact the perf review reads.

Usage: python tools/audit_plans.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    n_err = 0
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from aws_cloudfront_realtime_monitoring_spark.plans import load_full
    from aws_cloudfront_realtime_monitoring_spark.session import get_spark

    # driver rows plus the demoted/extra rows (same verification in the
    # test suite, no driver slot) -- the audit guards every plan we ship
    registry = load_full()
    spark = get_spark("audit_plans", cpus=4)

    print("# PLANS — physical-plan audit of every registry query\n")
    print(f"Generated against `{sf_dir}`. Node counts from `explain('formatted')`'s")
    print("tree section (details section excluded). Broadcast = BroadcastHashJoin +")
    print("BroadcastNestedLoopJoin; flags: CART = CartesianProduct present,")
    print("ROWUDF = row-at-a-time Python UDF (pandas/Arrow ops don't count).")
    print("The ONE expected ROWUDF is udtf_tokenize: an API-capability row for")
    print("Python UDTFs, which evaluate row-at-a-time by construction; it is")
    print("intentionally NOT the tokenization scale path (text_profile's")
    print("Catalyst expressions are). Any other ROWUDF is a regression.\n")
    print("| query | exchanges | bcast joins | smj/shj | windows | scans | pushed filters | flags |")
    print("|---|---|---|---|---|---|---|---|")

    for name, q in sorted(registry.items()):
        try:
            df = q.build(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            full = buf.getvalue()
            tree = full.split("\n\n")[0]  # tree section only
            n_ex = len(re.findall(r"\bExchange\b", tree))
            n_bc = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", tree))
            n_smj = len(re.findall(r"SortMergeJoin|ShuffledHashJoin", tree))
            n_win = len(re.findall(r"\bWindow\b", tree))
            n_scan = len(re.findall(r"Scan parquet", tree))
            pushed = len(re.findall(r"PushedFilters: \[[^\]]", full))
            flags = []
            if "CartesianProduct" in tree:
                flags.append("CART")
            if "BatchEvalPython" in full:
                flags.append("ROWUDF")
            print(
                f"| {name} | {n_ex} | {n_bc} | {n_smj} | {n_win} | {n_scan} "
                f"| {pushed} | {' '.join(flags) or '-'} |"
            )
        except Exception as e:  # pragma: no cover
            # escape '|' so a pipe inside the message cannot corrupt the
            # markdown row; count it so the process exits nonzero (r13
            # review: a round where plan builds ERROR used to regenerate
            # PLANS.md "successfully" and ship a useless artifact)
            msg = str(e)[:60].replace("|", "\\|")
            print(f"| {name} | ERROR: {msg} | | | | | | |")
            n_err += 1
    spark.stop()
    return 1 if n_err else 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

"""Semantics tests for the sampling/mixing operators beyond the oracle
comparison: budget edge cases and the greedy-prefix invariant."""

from __future__ import annotations

from collections import defaultdict

from aws_cloudfront_realtime_monitoring_spark.plans import load_demoted
from aws_cloudfront_realtime_monitoring_spark.plans.sampling import (
    MIX_BUDGET_OVERRIDES,
    MIX_DEFAULT_BUDGET,
)


def test_domain_mix_budgets_respected(spark, sf_dir):
    out = load_demoted()["domain_mix_tokens"].build(spark, sf_dir).collect()
    assert out
    per_src = defaultdict(list)
    for r in out:
        per_src[r.source].append(r)
    # a zero budget excludes the source entirely
    assert "src2" not in per_src
    for src, rows in per_src.items():
        budget = MIX_BUDGET_OVERRIDES.get(src, MIX_DEFAULT_BUDGET)
        total = sum(r.n_tokens for r in rows)
        # kept set fills but never exceeds the budget
        assert total <= budget
        assert total == max(r.cum_tokens for r in rows)
        # greedy prefix: cumulative totals are consistent with the kept
        # rows alone (no dropped doc sits between two kept ones in the
        # deterministic order)
        for prev, cur in zip(sorted(r.cum_tokens for r in rows),
                             sorted(rows, key=lambda r: r.cum_tokens)[1:]):
            assert cur.cum_tokens == prev + cur.n_tokens

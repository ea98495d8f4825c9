"""Semantics tests for the sampling/mixing operators beyond the oracle
comparison: budget edge cases and the greedy-prefix invariant."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

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


def test_lang_temperature_sample_caps_rare_language():
    """On a corpus skewed enough, the rare language's keep probability
    hits the cap (p_micro == 1e6: keep everything) while the majority
    language downsamples below the budget fraction -- exercised via the
    SAME SQL text the Spark builder runs, on a synthetic skewed corpus."""
    import duckdb

    from aws_cloudfront_realtime_monitoring_spark.functions.hashing import h60_sql
    from aws_cloudfront_realtime_monitoring_spark.plans.sampling import _temp_sql

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS "
        "SELECT i AS doc_id, CASE WHEN i < 990 THEN 'en' ELSE 'xx' END AS lang "
        "FROM range(1000) t(i)"
    )
    df = con.execute(_temp_sql(h60_sql("CAST(doc_id AS VARCHAR)"))).df()
    p = df.groupby("lang")["p_micro"].first()
    assert p["xx"] == 1_000_000          # rare language: keep everything
    assert p["en"] < 500_000             # majority: below the 50% budget
    kept = df.groupby("lang")["kept"].sum()
    assert kept["xx"] == 10              # cap means every rare doc survives


def test_lang_temperature_sample_matches_reference_formula(spark, sf_dir):
    """The per-language p_micro equals an independent numpy recomputation
    of min(1, frac * N * (n_l/N)^a / (Z * n_l)) in micro-units."""
    import math

    from aws_cloudfront_realtime_monitoring_spark.plans.sampling import (
        TEMP_ALPHA,
        TEMP_BUDGET_FRAC,
        lang_temperature_sample,
    )

    rows = lang_temperature_sample(spark, sf_dir).collect()
    n_l = {}
    for r in rows:
        n_l[r.lang] = n_l.get(r.lang, 0) + 1
    n = float(sum(n_l.values()))
    w = {l: (c / n) ** TEMP_ALPHA for l, c in n_l.items()}
    z = sum(w.values())
    for r in rows:
        expect = min(
            1_000_000,
            int(math.floor(
                TEMP_BUDGET_FRAC * n * (w[r.lang] / z) / n_l[r.lang] * 1e6 + 0.5
            )),
        )
        assert r.p_micro == expect


def test_curriculum_stages_are_balanced_rank_quartiles(spark, sf_dir):
    """Stages are monotone in score, every stage is nonempty, the quartile
    boundary rule matches an independent Python recomputation, and ties
    always share a stage."""
    from aws_cloudfront_realtime_monitoring_spark.plans.sampling import (
        CURRICULUM_STAGES,
        curriculum_stages,
    )

    rows = curriculum_stages(spark, sf_dir).collect()
    n = len(rows)
    scores = sorted(r.score for r in rows)
    k = CURRICULUM_STAGES
    # independent boundary computation: smallest score whose cumulative
    # count reaches q/k of the corpus
    bounds = []
    for q in (1, 2, 3):
        cum = 0
        seen = {}
        for s in scores:
            seen[s] = seen.get(s, 0) + 1
        cum = 0
        for s in sorted(seen):
            cum += seen[s]
            if cum * k >= q * n:
                bounds.append(s)
                break
    by_score = {}
    for r in rows:
        expected = sum(1 for b in bounds if r.score > b)
        assert r.stage == expected
        by_score.setdefault(r.score, set()).add(r.stage)
    assert all(len(v) == 1 for v in by_score.values())  # ties share a stage
    stages = {r.stage for r in rows}
    # stages must form a contiguous prefix 0..max (no gaps: a skewed corpus
    # can collapse stages, but it cannot skip one under the boundary rule)
    assert stages == set(range(max(stages) + 1))
    assert len(stages) >= 2, "staging is vacuous on this corpus"


def test_case_helpers_degrade_to_default_on_empty_mapping(spark):
    """r13 review: _case_col({}) crashed on None.otherwise and
    _case_sql({}) emitted a WHEN-less CASE (a syntax error in both
    engines) -- "uniform default only" must mean the bare default."""
    import duckdb

    from aws_cloudfront_realtime_monitoring_spark.plans.sampling import _case_col, _case_sql

    sql = _case_sql("source", {}, 800)
    got = spark.range(1).select(
        _case_col("source", {}, 800).alias("v"),
        F.expr(sql).alias("s"),
    ).head()
    assert (got.v, got.s) == (800, 800)
    assert duckdb.connect().execute(f"SELECT {sql}").fetchone()[0] == 800
    # non-empty mapping unchanged
    assert "WHEN 'a' THEN 1" in _case_sql("c", {"a": 1}, 2)


def test_domain_mix_excludes_zero_token_docs(spark, tmp_path):
    """r13 review: a zero-token document costs no budget, so the plain
    cum_tokens <= budget cut kept it even from a ZERO-budget source --
    and both engines agreed, so the registry oracle could never catch
    the leak. Plants empty docs in a zero-budget and a positive-budget
    source and pins exclusion AND Spark-vs-DuckDB agreement."""
    import duckdb

    from aws_cloudfront_realtime_monitoring_spark.plans import load_full

    q = load_full()["domain_mix_tokens"]
    rows = [
        (1, "src2", "leaked words from the excluded source"),
        (2, "src2", "   "),            # zero tokens, zero budget
        (3, "src0", ""),               # zero tokens, positive budget
        (4, "src0", "four words of text"),
        (5, "src0", "more words beyond the first doc"),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, source string, text string")
    sf_dir = str(tmp_path)
    sdf.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    got = {r.doc_id: r.asDict() for r in q.build(spark, sf_dir).collect()}
    assert 2 not in got and 3 not in got       # zero-token docs excluded
    assert 1 not in got                        # zero-budget source empty
    assert 4 in got and 5 in got               # positive budget unaffected

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    oracle = {int(r[0]) for r in con.execute(q.oracle).fetchall()}
    assert oracle == set(got)

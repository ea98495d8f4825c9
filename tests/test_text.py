"""Text-pipeline invariants for the merged profile and TF-IDF queries."""

from __future__ import annotations

from aws_cloudfront_realtime_monitoring_spark.plans import load_all


def test_tfidf_topk_invariants(spark, sf_dir):
    """Per doc: <= k rows, ranks contiguous from 1, scores non-increasing,
    term tiebreak ascending on equal scores; df consistent per term."""
    from aws_cloudfront_realtime_monitoring_spark.plans.text import TFIDF_TOPK

    rows = load_all()["text_tfidf_topk"].build(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    df_by_term: dict[str, int] = {}
    for r in rows:
        assert r.tf >= 1 and r.df >= 1 and r.score_micro >= 0
        df_by_term.setdefault(r.term, r.df)
        assert df_by_term[r.term] == r.df
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.rnk)
        assert 1 <= len(rs) <= TFIDF_TOPK
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a.score_micro >= b.score_micro
            if a.score_micro == b.score_micro:
                assert a.term < b.term


def test_text_profile_consistency(spark, sf_dir):
    """Merged profile agrees with its own internal definitions: stopword
    hits bound by token count, quality gate recomputable from the row."""
    rows = load_all()["text_profile"].build(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_stop <= r.n_ws_tokens
        assert r.top_score >= r.n_stop or r.pred_lang != "en"
        expected = 1 if (10 <= r.n_ws_tokens <= 1000 and r.n_stop * 20 >= r.n_ws_tokens) else 0
        assert r.quality_pass == expected
        assert r.sum_word_len + max(r.n_ws_tokens - 1, 0) <= r.n_chars + r.n_ws_tokens


def test_tfidf_idf_quantization_margin(spark):
    """The hash contract depends on Spark (Java Math.log) and DuckDB (libm)
    agreeing on floor(ln(N/df)*1e6 + 0.5). Neither log is guaranteed
    correctly rounded, so agreement is only certain when no quantization
    input lands near an integer boundary: a 1-ulp log divergence moves
    x = ln(N/df)*1e6 + 0.5 by at most ~|x|*2^-52 < 1e-8, so a margin of
    1e-5 to the nearest boundary makes a flip impossible. Checked over ALL
    distinct df values of the tf relation (not just output rows -- a flip
    in a non-output row could reorder the top-k cut) at both pytest and
    driver-correctness scale factors."""
    import math

    from pyspark.sql import functions as F

    from aws_cloudfront_realtime_monitoring_spark.sources.tables import load_table

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()
        words = docs.select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != F.lit(""))
            ).alias("term"),
        )
        dfs = {
            r.df
            for r in words.groupBy("doc_id", "term")
            .count()
            .groupBy("term")
            .agg(F.count("*").alias("df"))
            .select("df")
            .distinct()
            .collect()
        }
        worst = min(
            min(frac, 1.0 - frac)
            for df in dfs
            for frac in [math.modf(math.log(n_docs / df) * 1e6 + 0.5)[0]]
        )
        assert worst > 1e-5, (
            f"{sf_dir}: idf quantization margin {worst:.2e} too close to a "
            "boundary; the Spark/DuckDB hash contract may flip"
        )

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

"""Semantic tests for similarity search: brute-force top-k agrees with a
NumPy reference; IVF results are a subset of same-bucket truth."""

from __future__ import annotations

import numpy as np

from aws_cloudfront_realtime_monitoring_spark.plans import load_all, load_full
from aws_cloudfront_realtime_monitoring_spark.plans.similarity import (
    N_QUERIES,
    QUANT,
    TOP_K,
)
from aws_cloudfront_realtime_monitoring_spark.sources.tables import load_table

REGISTRY = load_all()


def _numpy_topk(sf_dir: str, spark):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in emb])
    # same quantization as the engine
    # qvec_numpy, not np.round: half-away-from-zero like the engines
    from aws_cloudfront_realtime_monitoring_spark.functions.quantize import qvec_numpy
    mat = qvec_numpy([r.embedding for r in emb])
    norms = (mat * mat).sum(axis=1)
    out = {}
    for qi in range(N_QUERIES):
        q = mat[ids == qi][0]
        qn = (q * q).sum()
        cos = (mat @ q) / np.sqrt(norms) / np.sqrt(qn)
        order = sorted(
            [(c, i) for c, i in zip(cos, ids) if i != qi],
            key=lambda t: (-t[0], t[1]),
        )
        out[qi] = [i for _, i in order[:TOP_K]]
    return out


def test_bruteforce_topk_matches_numpy(spark, sf_dir):
    df = REGISTRY["ann_topk_bruteforce"].build(spark, sf_dir)
    got = {}
    for r in df.collect():
        got.setdefault(r.query_id, []).append((r.rnk, r.cand_id))
    # completeness first: an empty/partial result must fail loudly, not
    # skip the loop body (r7 review)
    assert set(got) == set(range(N_QUERIES))
    expected = _numpy_topk(sf_dir, spark)
    for qi, pairs in got.items():
        assert [c for _, c in sorted(pairs)] == expected[qi]


def test_ivf_matches_numpy_ball_topk(spark, sf_dir):
    """IVF result == an independent numpy replay of the documented
    semantics: sign-bit bucket over the first IVF_BITS dims, candidate
    ball = Hamming <= IVF_PROBE_HAMMING, cosine top-k with (-cos,
    cand_id) tiebreak.  (The previous spelling asserted only rnk
    contiguity + cos6 monotonicity -- properties the builder's own
    ROW_NUMBER guarantees for ANY output, so a wrong-bucket or
    wrong-score builder still passed.)"""
    from aws_cloudfront_realtime_monitoring_spark.plans.similarity import (
        IVF_BITS,
        IVF_PROBE_HAMMING,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r.vec_id for r in emb])
    from aws_cloudfront_realtime_monitoring_spark.functions.quantize import qvec_numpy

    mat = qvec_numpy([r.embedding for r in emb])
    norms = (mat * mat).sum(axis=1)
    buckets = {
        int(i): sum(1 << d for d in range(IVF_BITS) if v[d] >= 0)
        for i, v in zip(ids, np.array([r.embedding for r in emb]))
    }
    expected = {}
    for qi in range(N_QUERIES):
        q = mat[ids == qi][0]
        qn = (q * q).sum()
        cand = [
            (float((mat[j] @ q) / np.sqrt(norms[j]) / np.sqrt(qn)), int(ids[j]))
            for j in range(len(ids))
            if ids[j] != qi
            and bin(buckets[int(ids[j])] ^ buckets[qi]).count("1")
            <= IVF_PROBE_HAMMING
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        expected[qi] = cand[:3]  # the IVF row returns rnk <= 3

    got = {}
    for r in load_full()["ann_topk_ivf"].build(spark, sf_dir).collect():
        got.setdefault(r.query_id, []).append(r)
    assert set(got) == {qi for qi, c in expected.items() if c}
    for qi, rows in got.items():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
        assert [r.cand_id for r in rows] == [c for _, c in expected[qi]]
        for r, (cos, _) in zip(rows, expected[qi]):
            assert abs(r.cos6 - round(cos, 6)) <= 2e-6


def test_blocked_near_dup_equals_all_pairs(spark, sf_dir):
    """The block-partitioned matmul join must produce EXACTLY the all-pairs
    Catalyst result -- same pairs, same rounded cosines (block decomposition
    is a physical re-arrangement, not an approximation)."""
    from aws_cloudfront_realtime_monitoring_spark.plans import load_all
    from aws_cloudfront_realtime_monitoring_spark.plans.similarity import (
        embedding_near_dup,
    )

    reg = load_all()
    exact = {
        (r.vec_a, r.vec_b): r.cos6
        for r in embedding_near_dup(spark, sf_dir).collect()
    }
    blocked = {
        (r.vec_a, r.vec_b): r.cos6
        for r in reg["embedding_near_dup_blocked"].build(spark, sf_dir).collect()
    }
    assert blocked == exact


def test_blocked_near_dup_scaled_block_regime(spark, sf_dir, monkeypatch):
    """Force the corpus-scaled block count (r14: B doubles until a block
    holds <= ~NEAR_DUP_BLOCK_TARGET vectors; the fixed B=8 config grew a
    ~5 GB/task dense tile at 200k vectors) and pin that the result is
    STILL exactly the all-pairs relation -- B is a physical knob, the
    output is invariant to it. Also pins the params relation's value
    against an INDEPENDENT spelling of the contract (not the production
    bit-count loop, r14 review: a shared formula would make the pin
    tautological), and shrinks NEAR_DUP_CHUNK below the block size so
    the multi-chunk matmul branch actually executes under test."""
    import math

    from aws_cloudfront_realtime_monitoring_spark.plans import similarity
    from aws_cloudfront_realtime_monitoring_spark.plans.similarity import (
        NEAR_DUP_BLOCKS,
        _near_dup_params,
        embedding_near_dup,
    )

    # target=16 at the 500-vector fixture -> B = max(8, 32) = 32; chunk
    # 8 < ~16-row blocks -> every block pair runs >= 2 chunk iterations
    monkeypatch.setattr(similarity, "NEAR_DUP_BLOCK_TARGET", 16)
    monkeypatch.setattr(similarity, "NEAR_DUP_CHUNK", 8)
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    # independent expectation: smallest power of two with n/B <= target,
    # floored at NEAR_DUP_BLOCKS
    expect_b = NEAR_DUP_BLOCKS
    while expect_b * 16 < n:
        expect_b *= 2
    assert expect_b == max(
        NEAR_DUP_BLOCKS, 2 ** math.ceil(math.log2(n / 16)))
    assert expect_b > NEAR_DUP_BLOCKS, (
        "fixture too small to force the scaled regime")
    [(got_b,)] = _near_dup_params(emb).collect()
    assert got_b == expect_b

    reg = load_all()
    exact = {
        (r.vec_a, r.vec_b): r.cos6
        for r in embedding_near_dup(spark, sf_dir).collect()
    }
    blocked = {
        (r.vec_a, r.vec_b): r.cos6
        for r in reg["embedding_near_dup_blocked"].build(spark, sf_dir).collect()
    }
    assert blocked == exact


def test_stratified_sample_is_deterministic_subset(spark, sf_dir):
    """sample_stratified: same rows on every run, membership follows the
    per-stratum hash rule exactly, and realized rates are in the right
    ballpark (law-of-large-numbers loose bound)."""
    from aws_cloudfront_realtime_monitoring_spark.plans import load_all
    from aws_cloudfront_realtime_monitoring_spark.plans.sampling import (
        DEFAULT_RATE,
        STRATA_RATES,
    )

    reg = load_all()
    r1 = sorted((r.doc_id, r.lang) for r in reg["sample_stratified"].build(spark, sf_dir).collect())
    r2 = sorted((r.doc_id, r.lang) for r in reg["sample_stratified"].build(spark, sf_dir).collect())
    assert r1 == r2 and len(r1) > 0
    # membership rule: bucket < rate for every emitted row
    for row in reg["sample_stratified"].build(spark, sf_dir).collect():
        rate = STRATA_RATES.get(row.lang, DEFAULT_RATE)
        assert row.rate_per_mille == rate
        assert 0 <= row.bucket < rate


def test_semdedup_dominance_rule(spark, sf_dir):
    """Every dropped vector reports its SMALLEST same-bucket neighbor above
    the threshold, and kept vectors (absent from the relation) have no
    smaller-id neighbor at cos >= SEMDEDUP_COS in their bucket -- checked
    against an independent numpy recomputation."""
    import numpy as np

    from aws_cloudfront_realtime_monitoring_spark.plans.similarity import (
        IVF_BITS,
        QUANT,
        SEMDEDUP_COS,
        semdedup,
    )
    from aws_cloudfront_realtime_monitoring_spark.sources.tables import load_table

    out = {r.vec_id: r for r in semdedup(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}

    from aws_cloudfront_realtime_monitoring_spark.functions.quantize import qvec_numpy
    q = {i: qvec_numpy(v) for i, v in vecs.items()}
    bucket = {
        i: sum((1 << d) for d in range(IVF_BITS) if v[d] >= 0)
        for i, v in vecs.items()
    }
    expected = {}
    for b_id in sorted(vecs):
        for a_id in sorted(vecs):
            if a_id >= b_id or bucket[a_id] != bucket[b_id]:
                continue
            cos = float(
                q[a_id] @ q[b_id]
                / np.sqrt(q[a_id] @ q[a_id])
                / np.sqrt(q[b_id] @ q[b_id])
            )
            if cos >= SEMDEDUP_COS:
                expected[b_id] = a_id  # first hit in ascending a_id = smallest
                break
    assert {i: r.rep_id for i, r in out.items()} == expected
    assert all(r.rep_id < i for i, r in out.items())


def test_semdedup_nbits_clamped_to_embedding_dim(spark):
    """r11 ADVICE: bucket bits past the embedding length select nothing
    in either engine, so a corpus with dim < nbits would silently stop
    scaling its bucket count (quadratic in-bucket pair work). The
    params relation must clamp nbits to the dimensionality -- and must
    be computable lazily (no eager job at plan build)."""
    from pyspark.sql import functions as F

    from aws_cloudfront_realtime_monitoring_spark.plans.similarity import (
        IVF_BITS,
        _semdedup_params,
    )

    def corpus(n, dim):
        return spark.range(n).select(
            F.array(*[
                (F.col("id") * (d + 1) % 7 - 3).cast("float")
                for d in range(dim)
            ]).alias("embedding")
        )

    # 3000 rows: smallest B with 32*2^B >= 3000 is 7 (32*64=2048 < 3000)
    assert _semdedup_params(corpus(3000, 24)).first().nbits == 7
    # same count, 4-dim vectors: clamped to 4 (even below IVF_BITS=6)
    assert IVF_BITS == 6
    assert _semdedup_params(corpus(3000, 4)).first().nbits == 4
    # tiny corpus, wide vectors: the IVF_BITS floor holds
    assert _semdedup_params(corpus(10, 24)).first().nbits == IVF_BITS


def test_bucket_exprs_tolerate_short_embeddings(spark):
    """r11 review: under ANSI (the Spark 4 default) a plain element_at
    RAISES past the array length while the DuckDB oracle's list index
    yields NULL -> 0 -- a dim < IVF_BITS corpus would error on one
    engine and answer on the other. Both bucket spellings must compute
    the truncated sign pattern instead."""
    from pyspark.sql import functions as F

    from aws_cloudfront_realtime_monitoring_spark.plans.similarity import (
        _BUCKET_SPARK,
        _bucket_col,
    )

    df = spark.createDataFrame(
        [([1.0, -2.0, 3.0],)], "embedding array<float>"
    )
    want = 0b101  # bits 0 and 2 non-negative; bits 3..5 out of range
    assert df.select(_bucket_col().alias("b")).first().b == want
    assert df.selectExpr(f"{_BUCKET_SPARK} AS b").first().b == want


def test_probe_masks_enumerate_full_hamming_ball(monkeypatch):
    """r11 review: the mask enumeration hardcoded radius 1; raising the
    advertised IVF_PROBE_HAMMING knob must enumerate the FULL ball (the
    oracle's bit_count predicate does), not 7 of its 22 buckets."""
    from aws_cloudfront_realtime_monitoring_spark.plans import similarity as S

    assert sorted(S._probe_masks()) == sorted(
        [0] + [1 << d for d in range(S.IVF_BITS)]
    )
    monkeypatch.setattr(S, "IVF_PROBE_HAMMING", 2)
    masks = S._probe_masks()
    assert len(masks) == len(set(masks)) == 1 + 6 + 15
    assert all(bin(m).count("1") <= 2 for m in masks)


def test_semdedup_kmeans_matches_replica(spark, sf_dir):
    """The trained-centroid SemDeDup variant applies the identical
    dominance rule within k-means clusters: checked against a numpy
    recomputation over the fitted assignments (the k-means fit itself is
    bit-exact-pinned vs numpy in test_kmeans)."""
    import numpy as np

    from aws_cloudfront_realtime_monitoring_spark.operators.kmeans import fit_kmeans
    from aws_cloudfront_realtime_monitoring_spark.plans.similarity import (
        QUANT,
        SEMDEDUP_COS,
        semdedup_kmeans,
    )
    from aws_cloudfront_realtime_monitoring_spark.sources.tables import load_table

    dropped, n_iters = semdedup_kmeans(spark, sf_dir, k=8)
    assert n_iters >= 1
    out = {r.vec_id: r.rep_id for r in dropped.collect()}

    emb = load_table(spark, sf_dir, "embeddings")
    # the replica's assignments come from the auto fit — bit-identical
    # to semdedup_kmeans' internal full-corpus fit on this sub-target
    # corpus (pinned in test_kmeans), at ~1/10 the wall (r18 trim)
    _c, assigns, _n = fit_kmeans(emb, k=8, fit_fraction="auto")
    cluster = {r.vec_id: r.cluster for r in assigns.collect()}
    from aws_cloudfront_realtime_monitoring_spark.functions.quantize import qvec_numpy

    vecs = {
        r.vec_id: qvec_numpy(np.array(r.embedding, dtype=np.float64))
        for r in emb.select("vec_id", "embedding").collect()
    }
    expected = {}
    for b_id in sorted(vecs):
        for a_id in sorted(vecs):
            if a_id >= b_id or cluster[a_id] != cluster[b_id]:
                continue
            q_a, q_b = vecs[a_id], vecs[b_id]
            cos = float(q_a @ q_b / np.sqrt(q_a @ q_a) / np.sqrt(q_b @ q_b))
            if cos >= SEMDEDUP_COS:
                expected[b_id] = a_id
                break
    assert out == expected
    assert expected, "k-means SemDeDup found no duplicates -- test is vacuous"


def test_ann_ivf_recall_audit_and_multiprobe_floor(spark, sf_dir):
    """The recall audit row must reconcile exactly with its two sibling
    plans, 'ivf_only' neighbors can only arise from rank displacement
    (IVF scores a subset of the same exact cosines), and multi-probe
    (Hamming-1 ball) must strictly beat the single-probe quantizer --
    which had MEASURED recall@3 = 0 on this data -- with a pinned floor
    of >= 1 recovered true neighbor."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from aws_cloudfront_realtime_monitoring_spark.plans.similarity import (
        N_QUERIES,
        _bucket_col,
        cosine,
        dot,
        qnorm,
        qvec,
    )

    audit = load_full()["ann_ivf_recall"].build(spark, sf_dir).collect()
    assert {r.query_id for r in audit} == set(range(N_QUERIES))
    for r in audit:
        # per probe: both + exact_only = |exact top-3|, both + ivf_only =
        # |ivf top-3| (each <= 3; fewer only if the bucket held < 3 cands)
        assert r.n_both + r.n_exact_only == 3
        assert r.n_both + r.n_ivf_only <= 3
    multiprobe_recall = sum(r.n_both for r in audit)
    assert multiprobe_recall >= 1  # pinned floor (measured: 1 at sf0.001)

    # single-probe baseline recomputed inline: own-bucket candidates only
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", _bucket_col().alias("bucket"), qvec().alias("qe")
    ).withColumn("nrm", qnorm("qe"))
    queries = base.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("bucket").alias("qbucket"),
        F.col("qe").alias("qqe"), F.col("nrm").alias("qnrm"),
    )
    pairs = base.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("cand_id"),
        cosine(dot("qqe", "qe"), F.col("qnrm"), F.col("nrm")).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    single = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("query_id", "cand_id")
    )
    exact3 = {
        (r.query_id, r.cand_id)
        for r in REGISTRY["ann_topk_bruteforce"].build(spark, sf_dir)
        .where(F.col("rnk") <= 3).select("query_id", "cand_id").collect()
    }
    single_recall = len(
        {(r.query_id, r.cand_id) for r in single.collect()} & exact3
    )
    assert multiprobe_recall > single_recall


def test_sql_builds_match_dataframe_replicas(spark, sf_dir):
    """The r8 SQL-string rewrites of the three ANN builders (a plan-BUILD
    optimization: ~3,000 py4j round-trips -> ~20) must stay bit-identical
    to the Column-composition replicas they replaced -- same IEEE op
    order, same ranks, same rounding."""
    from aws_cloudfront_realtime_monitoring_spark.plans import similarity as S

    for name in ["ann_topk_bruteforce", "ann_topk_ivf", "ann_ivf_recall"]:
        got = sorted(tuple(r) for r in getattr(S, name)(spark, sf_dir).collect())
        ref = sorted(
            tuple(r) for r in getattr(S, name + "_df")(spark, sf_dir).collect()
        )
        assert got == ref, name


def test_trained_ann_beats_sign_lsh_recall(spark, sf_dir):
    """r15 (verdict #5): the TRAINED-quantizer ANN path is a production
    option with the ann_topk_ivf contract, and on this corpus its
    recall must be at least the sign-LSH path's (whose measured
    recall@3 is 3-5/15 -- the trained rescue exists because of it)."""
    from aws_cloudfront_realtime_monitoring_spark.plans import load_full
    from aws_cloudfront_realtime_monitoring_spark.plans.similarity import (
        ann_topk_trained,
        ann_trained_recall,
    )

    out = ann_topk_trained(spark, sf_dir)
    assert out.columns == ["query_id", "cand_id", "rnk", "cos6"]
    rows = out.collect()
    assert rows, "trained top-k returned nothing"
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rnk)
    for q, rnks in per_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), (q, rnks)

    trained = {r.query_id: r.n_both
               for r in ann_trained_recall(spark, sf_dir).collect()}
    sign = {r.query_id: r.n_both
            for r in load_full()["ann_ivf_recall"].build(
                spark, sf_dir).collect()}
    assert sum(trained.values()) >= sum(sign.values()), (trained, sign)


def test_trained_ann_accepts_pretrained_centroids(spark, sf_dir):
    """Train once, search many: passing the centroid relation must skip
    fitting and produce identical results to the in-call fit."""
    from aws_cloudfront_realtime_monitoring_spark.operators.kmeans import (
        fit_kmeans,
    )
    from aws_cloudfront_realtime_monitoring_spark.plans.similarity import (
        ann_topk_trained,
    )
    from aws_cloudfront_realtime_monitoring_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # auto fit (r18 suite-wall trim): bit-identical to the distributed
    # loop on this sub-target corpus (pinned in test_kmeans) and exactly
    # what the in-call fit runs, at ~1/10 the wall
    cents, _, _ = fit_kmeans(emb, k=16, max_iters=8, fit_fraction="auto")
    a = sorted(map(tuple, ann_topk_trained(
        spark, sf_dir, centroids=cents).collect()))
    b = sorted(map(tuple, ann_topk_trained(spark, sf_dir).collect()))
    assert a == b


def test_probe_clusters_fanout_and_guards(spark):
    import pytest as _pytest

    from aws_cloudfront_realtime_monitoring_spark.operators.kmeans import (
        probe_clusters,
    )

    df = spark.createDataFrame(
        [(1, [0, 0]), (2, [100, 100])], "vec_id BIGINT, qv ARRAY<BIGINT>")
    cents = [[0, 0], [100, 100], [50, 50]]
    got = {(r.vec_id, r.cluster)
           for r in probe_clusters(df, cents, nprobe=2).collect()}
    # nearest two centroids per probe, exact distances: (0,0) -> {0, 2};
    # (100,100) -> {1, 2}
    assert got == {(1, 0), (1, 2), (2, 1), (2, 2)}
    with _pytest.raises(ValueError, match="nprobe"):
        probe_clusters(df, cents, nprobe=0)
    with _pytest.raises(ValueError, match="nprobe"):
        probe_clusters(df, cents, nprobe=4)
    from pyspark.sql import functions as F

    with _pytest.raises(ValueError, match="cluster"):
        probe_clusters(df.withColumn("cluster", F.lit(1)), cents)


def test_pq_saturated_shortlist_equals_trained_path(spark, sf_dir):
    """r17 (r16 verdict #1): with the SAME coarse centroids and a
    shortlist wide enough to admit every probed candidate, IVF-PQ must
    return EXACTLY the uncompressed trained path's answer -- the probed
    lists are identical (same argmin/tie rules on both sides) and the
    exact re-rank scores every candidate, so ADC approximation decides
    nothing. Pins the whole PQ plumbing (coarse assignment, probe-list
    choice, ADC join shape, re-rank arithmetic) to the audited path."""
    from aws_cloudfront_realtime_monitoring_spark.operators.kmeans import (
        fit_kmeans,
    )
    from aws_cloudfront_realtime_monitoring_spark.plans.similarity import (
        ann_topk_pq,
        ann_topk_trained,
    )
    from aws_cloudfront_realtime_monitoring_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # auto fit: bit-identical on this sub-target corpus (see
    # test_trained_ann_accepts_pretrained_centroids), and the subject
    # here is the PQ plumbing given SOME shared coarse centroids
    cents, _, _ = fit_kmeans(emb, k=16, max_iters=8, fit_fraction="auto")
    trained = sorted(map(tuple, ann_topk_trained(
        spark, sf_dir, centroids=cents).collect()))
    pq = sorted(map(tuple, ann_topk_pq(
        spark, sf_dir, centroids=cents, shortlist_mult=10_000).collect()))
    assert pq == trained and len(pq) > 0


def test_pq_default_shortlist_subset_and_audit_shape(spark, sf_dir):
    """The default-budget PQ search: output contract, per-query dense
    ranks, and the recall audit's conservation law (n_both +
    n_exact_only == top-3 per query, since the exact side always has 3
    rows per probe)."""
    from aws_cloudfront_realtime_monitoring_spark.plans.similarity import (
        ann_pq_recall,
        ann_topk_pq,
    )

    out = ann_topk_pq(spark, sf_dir)
    assert out.columns == ["query_id", "cand_id", "rnk", "cos6"]
    rows = out.collect()
    assert rows
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rnk)
    for q, rnks in per_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), (q, rnks)
    audit = ann_pq_recall(spark, sf_dir).collect()
    assert audit
    for r in audit:
        assert r.n_both + r.n_exact_only == 3, tuple(r)
        assert r.n_both + r.n_pq_only <= 3, tuple(r)


def test_pq_encode_matches_numpy_replica_and_pool_flag(spark, monkeypatch):
    """encode_pq's codes replicated independently in numpy (quantize ->
    coarse argmin -> residual -> per-subspace argmin, first-min ties),
    plus the PQ_SCRATCH=False fresh-allocation arm's bit-identity and
    the code-range invariant."""
    import numpy as np

    from aws_cloudfront_realtime_monitoring_spark.operators import pq as pqm

    rows = [(i, [int((i * 13 + d * 5) % 17 - 8) * 250_000
                 for d in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, qv ARRAY<BIGINT>")
    cents = [[0] * 8, [1_500_000] * 8]
    cbs = pqm.fit_pq(df, cents, m=4, ksub=4, max_iters=6)
    assert len(cbs) == 4 and all(len(cb) <= 4 for cb in cbs)
    got = {r.vec_id: (r.cluster, list(r.codes))
           for r in pqm.encode_pq(df, cents, cbs).collect()}
    # independent replica
    x = np.array([v for _, v in rows], dtype=np.int64)
    cmat = np.array(cents, dtype=np.int64)
    cl = np.argmin(((x[:, None, :] - cmat[None]) ** 2).sum(2), axis=1)
    res = x - cmat[cl]
    want = {}
    for i, (vid, _) in enumerate(rows):
        codes = []
        for s, cb in enumerate(cbs):
            cbm = np.array(cb, dtype=np.int64)
            dd = ((res[i, s * 2:(s + 1) * 2][None, :] - cbm) ** 2).sum(1)
            codes.append(int(np.argmin(dd)))
        want[vid] = (int(cl[i]), codes)
    assert got == want
    for _, codes in got.values():
        assert all(0 <= c < 4 for c in codes)
    monkeypatch.setattr(pqm, "PQ_SCRATCH", False)
    fresh = {r.vec_id: (r.cluster, list(r.codes))
             for r in pqm.encode_pq(df, cents, cbs).collect()}
    assert fresh == got


def test_fit_pq_guards_and_determinism(spark):
    """fit_pq rejects a dim not divisible by m, empty inputs, and an
    oversized ksub; two fits of the same relation are integer-identical
    (the repo determinism contract -- no RNG anywhere)."""
    import pytest as _pytest

    from aws_cloudfront_realtime_monitoring_spark.operators.pq import fit_pq

    rows = [(i, [int((i * 3 + d) % 7 - 3) * 500_000 for d in range(6)])
            for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, qv ARRAY<BIGINT>")
    cents = [[0] * 6]
    with _pytest.raises(ValueError, match="divisible"):
        fit_pq(df, cents, m=4)
    with _pytest.raises(ValueError, match="non-empty"):
        fit_pq(df, [], m=2)
    with _pytest.raises(ValueError, match="16-bit"):
        fit_pq(df, cents, m=2, ksub=1 << 17)
    # the boundary is SIGNED int16: 32769 would wrap negative in the
    # int16 code buffer, so it must be rejected; 32768 itself is the
    # largest legal value (codes 0..32767)
    with _pytest.raises(ValueError, match="16-bit"):
        fit_pq(df, cents, m=2, ksub=32_769)
    empty = spark.createDataFrame([], "vec_id BIGINT, qv ARRAY<BIGINT>")
    with _pytest.raises(ValueError, match="empty"):
        fit_pq(empty, cents, m=2)
    a = fit_pq(df, cents, m=3, ksub=4)
    b = fit_pq(df, cents, m=3, ksub=4)
    assert a == b
    assert len(a) == 3 and all(len(row) == 2 for cb in a for row in cb)


def test_pq_codebook_save_load_roundtrip(spark, tmp_path):
    """Train-once/search-many for the PQ index: saved codebooks reload
    in (subspace, code) order and search identically; a shuffled or
    gapped relation is rejected, never silently remapped."""
    import pytest as _pytest

    from aws_cloudfront_realtime_monitoring_spark.operators.pq import (
        fit_pq,
        load_pq,
        save_pq,
    )

    rows = [(i, [int((i * 11 + d * 3) % 13 - 6) * 400_000
                 for d in range(6)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, qv ARRAY<BIGINT>")
    cbs = fit_pq(df, [[0] * 6], m=3, ksub=4)
    save_pq(spark, cbs, str(tmp_path / "pq"))
    assert load_pq(spark, str(tmp_path / "pq")) == cbs
    # a gapped code sequence must be rejected
    bad = spark.read.parquet(str(tmp_path / "pq")).where("code != 1")
    bad.write.mode("overwrite").parquet(str(tmp_path / "bad"))
    with _pytest.raises(ValueError, match="dense"):
        load_pq(spark, str(tmp_path / "bad"))


def test_pq_search_from_saved_index(spark, sf_dir, tmp_path):
    """The full production lifecycle: encode once, write the index +
    models to parquet, reload everything, search the STORED codes
    (index=...) — identical output to the self-contained fit+encode
    search; a wrong-shaped index relation is rejected."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from aws_cloudfront_realtime_monitoring_spark.functions.quantize import (
        qvec,
    )
    from aws_cloudfront_realtime_monitoring_spark.operators.kmeans import (
        fit_kmeans,
        load_centroids,
        save_centroids,
    )
    from aws_cloudfront_realtime_monitoring_spark.operators.pq import (
        encode_pq,
        fit_pq,
        load_pq,
        save_pq,
    )
    from aws_cloudfront_realtime_monitoring_spark.plans.similarity import (
        ann_topk_pq,
    )
    from aws_cloudfront_realtime_monitoring_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvecs = emb.select("vec_id", qvec().alias("qv"))
    cents, _, _ = fit_kmeans(emb, k=8, max_iters=4)
    cbs = fit_pq(qvecs, cents, m=8, ksub=16)
    save_centroids(spark, cents, str(tmp_path / "c"))
    save_pq(spark, cbs, str(tmp_path / "p"))
    encode_pq(qvecs, cents, cbs).write.parquet(str(tmp_path / "idx"))

    c2 = load_centroids(spark, str(tmp_path / "c"))
    p2 = load_pq(spark, str(tmp_path / "p"))
    idx = spark.read.parquet(str(tmp_path / "idx"))
    stored = sorted(map(tuple, ann_topk_pq(
        spark, sf_dir, centroids=c2, codebooks=p2, index=idx).collect()))
    fresh = sorted(map(tuple, ann_topk_pq(
        spark, sf_dir, centroids=cents, codebooks=cbs).collect()))
    assert stored == fresh and len(stored) > 0
    with _pytest.raises(ValueError, match="missing"):
        ann_topk_pq(spark, sf_dir, centroids=c2, codebooks=p2,
                    index=idx.drop("codes"))


def test_pq_adc_tables_reconstruction_property():
    """Property (hypothesis): for any small integer query/model, the ADC
    identity holds exactly — base[cluster] + sum_s lut[s][code_s] ==
    dot(q, centroid[cluster] + concat(codebook_s[code_s])) in int64.
    This is the arithmetic the Spark-side aggregate expression computes;
    pinning it driver-side means the JVM expression and the model build
    can only disagree if one of them changes shape."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_cloudfront_realtime_monitoring_spark.operators.pq import (
        adc_tables,
    )

    small = st.integers(-2_000_000, 2_000_000)

    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def check(data):
        m = data.draw(st.integers(1, 4))
        dsub = data.draw(st.integers(1, 4))
        k = data.draw(st.integers(1, 3))
        ksub = data.draw(st.integers(1, 4))
        dim = m * dsub
        q = data.draw(st.lists(small, min_size=dim, max_size=dim))
        cents = [data.draw(st.lists(small, min_size=dim, max_size=dim))
                 for _ in range(k)]
        cbs = [[data.draw(st.lists(small, min_size=dsub, max_size=dsub))
                for _ in range(ksub)] for _ in range(m)]
        base, lut = adc_tables(q, cents, cbs)
        c = data.draw(st.integers(0, k - 1))
        codes = [data.draw(st.integers(0, ksub - 1)) for _ in range(m)]
        recon = np.array(cents[c], dtype=np.int64)
        for s, j in enumerate(codes):
            recon[s * dsub:(s + 1) * dsub] += np.array(cbs[s][j], np.int64)
        want = int(np.array(q, np.int64) @ recon)
        got = base[c] + sum(lut[s][codes[s]] for s in range(m))
        assert got == want

    check()


def test_pq_lloyd_matches_pure_python_replica():
    """_lloyd_int pinned against an INDEPENDENT pure-Python-int Lloyd
    (the fit_kmeans numpy-replica discipline): same init (first ksub
    sample rows), first-min argmin tiebreak, half-away-from-zero
    integer means, integer-equality convergence — any drift in the
    rules is a cross-run determinism break."""
    import numpy as np

    from aws_cloudfront_realtime_monitoring_spark.operators.kmeans import (
        _round_div,
    )
    from aws_cloudfront_realtime_monitoring_spark.operators.pq import (
        _lloyd_int,
    )

    rng = np.random.RandomState(23)
    sub = rng.randint(-2_000_000, 2_000_001, size=(60, 3)).astype(np.int64)
    ksub, iters = 5, 7
    got = _lloyd_int(sub.copy(), ksub, iters)

    rows = [[int(v) for v in r] for r in sub]
    cb = [list(r) for r in rows[:ksub]]
    for _ in range(iters):
        assign = []
        for r in rows:
            best, best_d = 0, None
            for j, c in enumerate(cb):
                d = sum((x - y) ** 2 for x, y in zip(r, c))
                if best_d is None or d < best_d:  # strict <: first min
                    best, best_d = j, d
            assign.append(best)
        new_cb = [list(c) for c in cb]
        for j in range(ksub):
            members = [rows[i] for i, a in enumerate(assign) if a == j]
            if members:
                new_cb[j] = [
                    _round_div(sum(col), len(members))
                    for col in zip(*members)
                ]
        if new_cb == cb:
            break
        cb = new_cb
    assert [[int(v) for v in row] for row in got] == cb


def test_fit_pq_drops_dirty_rows_and_rejects_ragged(spark):
    """The fit_kmeans dirty-input discipline applied to fit_pq: NULL
    vectors and vectors with NULL elements are dropped before the
    sample collect (no opaque object-dtype numpy error), and ragged
    lengths are a clear ValueError."""
    import pytest as _pytest

    from aws_cloudfront_realtime_monitoring_spark.operators.pq import fit_pq

    rows = [(0, None), (1, [1_000_000, None]),
            (2, [500_000, -500_000]), (3, [250_000, 750_000])]
    df = spark.createDataFrame(rows, "vec_id BIGINT, qv ARRAY<BIGINT>")
    cbs = fit_pq(df, [[0, 0]], m=2, ksub=2)
    assert len(cbs) == 2 and all(cb for cb in cbs)
    ragged = spark.createDataFrame(
        [(0, [1_000_000]), (1, [1_000_000, 2_000_000])],
        "vec_id BIGINT, qv ARRAY<BIGINT>")
    with _pytest.raises(ValueError, match="inconsistent"):
        fit_pq(ragged, [[0]], m=1, ksub=2)


def test_encode_pq_rejects_dirty_vectors(spark):
    """encode_pq fails LOUDLY on dirty input (r17 review): the index
    build must not silently drop corpus rows (a dropped row is a
    document that can never be retrieved), so unlike fit_pq -- which
    FILTERS its training sample -- a NULL vector or NULL element is a
    clear ValueError, not an opaque executor numpy crash."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from aws_cloudfront_realtime_monitoring_spark.operators.pq import encode_pq

    cents = [[0, 0]]
    cbs = [[[0], [1_000_000]], [[0], [-1_000_000]]]
    whole_null = spark.createDataFrame(
        [(0, [500_000, -500_000]), (1, None)],
        "vec_id BIGINT, qv ARRAY<BIGINT>")
    with _pytest.raises(Exception) as ei:
        encode_pq(whole_null, cents, cbs).collect()
    assert "NULL qv vector" in str(ei.value)
    elem_null = spark.createDataFrame(
        [(0, [500_000, None])], "vec_id BIGINT, qv ARRAY<BIGINT>")
    with _pytest.raises(Exception) as ei:
        encode_pq(elem_null, cents, cbs).collect()
    assert "NULL elements or ragged" in str(ei.value)
    del Py4JJavaError  # imported for documentation; Spark wraps either way


def test_ann_topk_pq_rejects_bad_nprobe(spark, sf_dir):
    """Explicit nprobe outside [1, k] raises the probe_clusters guard
    message instead of silently returning empty (nprobe=0) or probing
    k-|n| lists (negative) -- r17 review parity with the uncompressed
    trained path."""
    import pytest as _pytest

    from aws_cloudfront_realtime_monitoring_spark.plans.similarity import ann_topk_pq

    cents = [[0] * 64, [1_000_000] * 64]
    cbs = [[[0] * 8, [500_000] * 8] for _ in range(8)]
    for bad in (0, -1, 3):
        with _pytest.raises(ValueError, match=r"nprobe must be in \[1, 2\]"):
            ann_topk_pq(spark, sf_dir, centroids=cents, codebooks=cbs,
                        nprobe=bad)


def test_trained_probe_fanout_matches_probe_clusters(spark, sf_dir):
    """r17: ann_topk_trained builds its probe->cluster fanout driver-side
    (numpy lexsort over the exact int64 distances, the ann_topk_pq
    shape). Pin it against the distributed probe_clusters spelling on
    the same centroids: identical (query_id, cluster) fanout rows for
    every nprobe."""
    import numpy as np
    from pyspark.sql import functions as F

    from aws_cloudfront_realtime_monitoring_spark.operators.kmeans import (
        fit_kmeans, probe_clusters)
    from aws_cloudfront_realtime_monitoring_spark.plans.similarity import (
        N_QUERIES, qvec)
    from aws_cloudfront_realtime_monitoring_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    centroids, _, _ = fit_kmeans(emb, k=8, max_iters=4, fit_fraction="auto")
    cmat = np.asarray(centroids, dtype=np.int64)
    probe_rows = emb.select("vec_id", qvec().alias("qv")).where(
        F.col("vec_id") < N_QUERIES).collect()
    for nprobe in (1, 2, 5):
        distributed = sorted(
            (r.query_id, r.cluster)
            for r in probe_clusters(
                emb.where(F.col("vec_id") < N_QUERIES).select(
                    F.col("vec_id").alias("query_id"),
                    qvec().alias("p_qv")),
                centroids, nprobe=nprobe, vec_col="p_qv",
            ).collect())
        local = []
        for r in probe_rows:
            q = np.asarray(list(r["qv"]), dtype=np.int64)
            d = np.einsum("ij,ij->i", cmat - q, cmat - q)
            for c in np.lexsort((np.arange(len(cmat)), d))[:nprobe]:
                local.append((r["vec_id"], int(c)))
        assert sorted(local) == distributed


def test_fit_pq_shared_sample_matches_own_collect(spark):
    """r17 optimization round: fit_pq(sample_rows=...) -- the rows
    fit_kmeans(fit_fraction="auto", return_sample=True) hands back when
    its capped probe proved the clean corpus complete -- must train
    BIT-IDENTICAL codebooks to fit_pq's own TakeOrdered collect (the
    driver-side (h60, id) sort replays the JVM orderBy exactly). Dirty
    rows are exercised: the shared sample is the CLEAN relation, same
    as fit_pq's own filter."""
    from aws_cloudfront_realtime_monitoring_spark.operators.kmeans import (
        fit_kmeans)
    from aws_cloudfront_realtime_monitoring_spark.operators.pq import fit_pq

    ints = [[(i * 7919) % 2_000_001 - 1_000_000,
             (i * 104729) % 2_000_001 - 1_000_000] for i in range(64)]
    emb_rows = [(i, [v / 1e6 for v in vec]) for i, vec in enumerate(ints)]
    emb_rows += [(64, None), (65, [0.5, None])]  # dirty rows both drop
    emb = spark.createDataFrame(
        emb_rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    cen, _, _, sample = fit_kmeans(
        emb, k=4, max_iters=6, fit_fraction="auto", return_sample=True)
    assert sample is not None and len(sample) == 64  # clean rows only
    qv_rows = [(i, vec) for i, vec in enumerate(ints)]
    qv_rows += [(64, None), (65, [1, None])]
    qv = spark.createDataFrame(qv_rows, "vec_id BIGINT, qv ARRAY<BIGINT>")
    own = fit_pq(qv, cen, m=2, ksub=4, max_iters=6)
    shared = fit_pq(qv, cen, m=2, ksub=4, max_iters=6, sample_rows=sample)
    assert own == shared

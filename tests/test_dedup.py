"""Semantic tests for the dedup family beyond oracle parity: MinHash-LSH
recall vs the exact path, SimHash separation, quantifying what each finds."""

from __future__ import annotations

from aws_cloudfront_realtime_monitoring_spark.plans import load_all

REGISTRY = load_all()


def _pairs(df):
    return {(r[0], r[1]) for r in df.collect()}


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    """LSH candidates + exact verify should recover (essentially all of)
    the exact n-gram Jaccard pairs; any candidate it keeps is exact-verified
    so precision is 1.0 by construction."""
    exact = _pairs(REGISTRY["dedup_ngram_jaccard"].build(spark, sf_dir))
    lsh = _pairs(REGISTRY["dedup_minhash_lsh"].build(spark, sf_dir))
    assert lsh <= exact  # no false positives (exact verification)
    # a regenerated corpus that stops planting near-dup pairs must fail
    # loudly, not turn the recall surface vacuous (r8 tests review)
    assert exact, "corpus plants no exact n-gram Jaccard pairs"
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall} too low"


def test_simhash_finds_planted_near_dups(spark, sf_dir):
    """SimHash at Hamming<=2 should find near-identical docs; pairs at
    distance 0 should substantially overlap the exact Jaccard pairs."""
    exact = _pairs(REGISTRY["dedup_ngram_jaccard"].build(spark, sf_dir))
    sim = REGISTRY["dedup_simhash"].build(spark, sf_dir)
    zero = {(r.doc_a, r.doc_b) for r in sim.collect() if r.hamming == 0}
    assert exact, "corpus plants no exact n-gram Jaccard pairs"
    assert zero & exact, "no overlap between SimHash-0 and exact near-dups"


def test_exact_dedup_partitions_consistent(spark, sf_dir):
    df = REGISTRY["dedup_exact"].build(spark, sf_dir)
    rows = df.collect()
    n_docs = len(rows)
    n_canonical = sum(r.is_canonical for r in rows)
    # canonical count == number of distinct texts
    from aws_cloudfront_realtime_monitoring_spark.sources.tables import load_table

    n_distinct = (
        load_table(spark, sf_dir, "documents").select("text").distinct().count()
    )
    assert n_canonical == n_distinct
    assert all(r.group_size >= 1 for r in rows)
    assert n_docs >= n_canonical


def test_simhash_banding_is_lossless_pigeonhole():
    """Pure pigeonhole property: any two 32-bit signatures within Hamming
    distance HAMMING_MAX share at least one of the SIMHASH_BANDS exactly --
    the banded equi-join loses NO qualifying pair (unlike probabilistic
    MinHash-LSH recall)."""
    import random

    from aws_cloudfront_realtime_monitoring_spark.plans.dedup import (
        HAMMING_MAX,
        SIMHASH_BANDS,
    )

    rng = random.Random(7)
    for _ in range(2000):
        a = rng.getrandbits(32)
        flips = rng.sample(range(32), rng.randint(0, HAMMING_MAX))
        b = a
        for bit in flips:
            b ^= 1 << bit
        shares_band = any(
            (a >> lo) & ((1 << n) - 1) == (b >> lo) & ((1 << n) - 1)
            for lo, n in SIMHASH_BANDS
        )
        assert shares_band, f"pair at distance {len(flips)} missed by banding"
    # bands tile the full 32 bits exactly
    assert sorted(
        bit for lo, n in SIMHASH_BANDS for bit in range(lo, lo + n)
    ) == list(range(32))


def test_dedup_clusters_properties(spark, sf_dir):
    """Connected-components invariants: every pair's endpoints share a
    cluster_rep, the rep is the component-min doc_id (and a member), sizes
    are consistent, exactly one canonical doc per cluster."""
    from aws_cloudfront_realtime_monitoring_spark.plans import load_all

    reg = load_all()
    pairs = [
        (r.doc_a, r.doc_b)
        for r in reg["dedup_simhash"].build(spark, sf_dir).collect()
    ]
    rows = reg["dedup_clusters"].build(spark, sf_dir).collect()
    rep = {r.doc_id: r.cluster_rep for r in rows}
    # every doc in a pair is labeled, and both endpoints agree
    for a, b in pairs:
        assert rep[a] == rep[b]
    # rep is a member of its own cluster and is the minimum member
    members: dict[int, list[int]] = {}
    for r in rows:
        members.setdefault(r.cluster_rep, []).append(r.doc_id)
    for c_rep, docs in members.items():
        assert c_rep == min(docs)
        assert rep[c_rep] == c_rep
    # size + canonical-flag consistency
    for r in rows:
        assert r.cluster_size == len(members[r.cluster_rep]) >= 2
        assert r.is_canonical == (1 if r.doc_id == r.cluster_rep else 0)
    # exactly one canonical per cluster
    n_canon = sum(r.is_canonical for r in rows)
    assert n_canon == len(members)


def test_connected_components_flat_star_early_exit(spark):
    """A star graph whose seed labels are already the fixpoint must exit
    without merge work and still return exact min-labels. As of r10 this
    pins the local finish's EMPTY-contracted-graph branch (every edge
    joins equal seed labels => the labeling is proven done); before r10
    it pinned the loop's observed-hook early exit."""
    from aws_cloudfront_realtime_monitoring_spark.operators.graph import (
        connected_components,
    )

    edges = [(1, 5), (1, 7), (1, 9), (20, 21)]
    df = spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")
    got = {r.node: r.lbl for r in connected_components(df).collect()}
    assert got == {1: 1, 5: 1, 7: 1, 9: 1, 20: 20, 21: 20}


def test_connected_components_local_finish_ascending_chain(spark):
    """Ascending chains through the LOCAL-FINISH path: the seed labeling
    {1:1, 2:1, 3:2, ...} is non-flat, so the driver union-find must merge
    the contracted label pairs ((1,2), (2,3), ...) transitively -- the
    same shape that broke the loop's round-1 early exit (r7). Also pins
    the mixed case: one non-flat chain plus one already-flat component in
    a single probe."""
    from aws_cloudfront_realtime_monitoring_spark.operators.graph import (
        connected_components,
    )

    for n in (3, 4, 7):
        df = spark.createDataFrame(
            [(i, i + 1) for i in range(1, n)], ["doc_a", "doc_b"]
        )
        got = {r.node: r.lbl for r in connected_components(df).collect()}
        assert got == {i: 1 for i in range(1, n + 1)}, (n, got)
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (50, 60), (50, 70)], ["doc_a", "doc_b"]
    )
    got = {r.node: r.lbl for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 50: 50, 60: 50, 70: 50}


def test_connected_components_drops_null_endpoint_edges(spark):
    """r11 review: a NULL endpoint used to leak through the seed groupBy
    as a spurious (null, lbl) output row while its edge was silently
    dropped by every equi-join -- wrong clusters on dirty input. Dirty
    edges are now dropped whole: the output contains no null node and no
    connectivity via the null edge, while clean edges are unaffected."""
    from aws_cloudfront_realtime_monitoring_spark.operators.graph import (
        connected_components,
    )

    df = spark.createDataFrame(
        [(1, 2), (2, None), (None, 7), (None, None), (8, 9)],
        "doc_a BIGINT, doc_b BIGINT",
    )
    got = {r.node: r.lbl for r in connected_components(df).collect()}
    # 7 appears ONLY in a dirty edge: it carries no connectivity, so it
    # is absent from the output entirely (not labeled, not null-joined)
    assert got == {1: 1, 2: 1, 8: 8, 9: 8}


import pytest


@pytest.mark.parametrize("path", ["local_finish", "broadcast_loop", "shuffle_loop"])
def test_connected_components_random_graph_vs_union_find(
    spark, monkeypatch, path
):
    """The distributed CC operator must agree exactly with a plain Python
    union-find on a seeded random graph (chains, cliques, isolated pairs --
    shapes the planted corpus doesn't cover). Parametrized over all THREE
    execution paths: the two-phase driver local finish (what any
    local-scale graph takes, r10), the broadcast-label hook/flatten loop
    (a <=2M-node graph whose CONTRACTED edge set overflows the local
    cap), and the plain shuffle loop (a >2M-node graph at cluster scale)
    -- no local dataset is big enough to select the last two naturally,
    so the thresholds are forced to 0 to keep the at-scale branches
    correctness-pinned."""
    import random

    from aws_cloudfront_realtime_monitoring_spark.operators import graph

    if path == "broadcast_loop":
        monkeypatch.setattr(graph, "LOCAL_FINISH_MAX_EDGES", 0)
    elif path == "shuffle_loop":
        monkeypatch.setattr(graph, "BROADCAST_MAX_NODES", 0)

    from aws_cloudfront_realtime_monitoring_spark.operators.graph import (
        connected_components,
    )

    rng = random.Random(13)
    edges = set()
    # long chain (stresses round count / pointer jumping)
    chain = rng.sample(range(1000, 2000), 400)
    edges.update(zip(chain, chain[1:]))
    # a few dense cliques
    for base in (0, 100, 200):
        members = rng.sample(range(base, base + 50), 12)
        edges.update(
            (a, b) for a in members for b in members if a < b and rng.random() < 0.4
        )
    # random sparse noise
    for _ in range(300):
        a, b = rng.sample(range(3000, 3500), 2)
        edges.add((min(a, b), max(a, b)))

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    # canonicalize: min member per root
    roots: dict[int, int] = {}
    for n, r in expected.items():
        roots[r] = min(roots.get(r, n), n)
    expected = {n: roots[find(n)] for n in parent}

    df = spark.createDataFrame(sorted(edges), "doc_a BIGINT, doc_b BIGINT")
    got = {r.node: r.lbl for r in connected_components(df).collect()}
    assert got == expected


def test_lsh_recall_audit_invariants(spark, sf_dir):
    """'lsh_only' can never appear (LSH candidates pass the same exact
    verify as the ground truth); on this corpus the banding achieves
    full recall, so the audit is a single 'both' row equal to the exact
    pair count."""
    from aws_cloudfront_realtime_monitoring_spark.plans.dedup import (
        dedup_lsh_recall,
        dedup_ngram_jaccard,
    )

    rows = {r.category: r.n_pairs for r in dedup_lsh_recall(spark, sf_dir).collect()}
    assert "lsh_only" not in rows, "LSH emitted a pair the exact verify rejects"
    n_exact = dedup_ngram_jaccard(spark, sf_dir).count()
    both = rows.get("both", 0)
    missed = rows.get("exact_only", 0)
    assert both + missed == n_exact
    # recall is probabilistic (4 bands x 4 rows): near-threshold pairs can
    # miss every band (sf0.1 measures 254/256). Bound the miss rate rather
    # than pinning zero -- a recall collapse is what this audit exists to
    # catch, not the occasional boundary pair.
    assert missed * 20 <= n_exact, f"LSH recall below 95%: {both}/{n_exact}"


def test_connected_components_ascending_chain_no_hook_round1(spark, monkeypatch):
    """Regression (r7 code review): on an ASCENDING chain the seed labels
    {1:1, 2:1, 3:2, ...} make round 1's hook a no-op (every hook target
    already holds its minimum) while the labeling is still wrong -- the
    round-1 hchg==0 early exit must NOT trust it. The fold that removed
    the standalone seed flatten originally returned here, splitting one
    chain into multiple components. Forces the loop path (the r10 local
    finish would otherwise absorb these tiny graphs before the caveat
    branch is reached)."""
    from aws_cloudfront_realtime_monitoring_spark.operators import graph
    from aws_cloudfront_realtime_monitoring_spark.operators.graph import (
        connected_components,
    )

    monkeypatch.setattr(graph, "LOCAL_FINISH_MAX_EDGES", 0)
    for n in (3, 4, 7):
        df = spark.createDataFrame(
            [(i, i + 1) for i in range(1, n)], ["doc_a", "doc_b"]
        )
        got = {r.node: r.lbl for r in connected_components(df).collect()}
        assert got == {i: 1 for i in range(1, n + 1)}, (n, got)
    # descending chain and a fork, same exit path
    df = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 9), (9, 8)], ["doc_a", "doc_b"]
    )
    got = {r.node: r.lbl for r in connected_components(df).collect()}
    assert got == {3: 3, 4: 3, 5: 3, 8: 3, 9: 3}


def test_connected_components_loop_stats_stay_bounded(spark, monkeypatch):
    """Regression (r13): Spark 4's ``localCheckpoint`` inherits the origin
    plan's Catalyst ``sizeInBytes`` (LogicalRDD.rewriteStatsAndConstraints),
    and chained loop rounds COMPOUND that BigInt hyper-exponentially --
    the 2M-node probe-oversize cc_scale cell stalled the driver 13+ min
    inside SizeInBytesOnlyStatsPlanVisitor's Toom-Cook multiplies around
    round 4, before any job was submitted. barrier()'s LC_CHAIN_MAX=1
    bounds every inherited stat at a single round's blow-up.

    A 40k-node chain forced onto the broadcast loop runs enough
    hook+flatten rounds to compound pre-fix (each round multiplied the
    bit length ~1000x); post-fix the whole run stays seconds-fast and the
    final label relation's inherited sizeInBytes stays far below the
    pre-fix trajectory. The exactness assert doubles as the usual
    all-paths pin."""
    from pyspark.sql import functions as F

    from aws_cloudfront_realtime_monitoring_spark.operators import graph
    from aws_cloudfront_realtime_monitoring_spark.operators.graph import (
        connected_components,
    )

    monkeypatch.setattr(graph, "LOCAL_FINISH_MAX_EDGES", 0)
    n = 40_000
    edges = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    labels = connected_components(edges)
    agg = labels.agg(
        F.count("*").alias("cnt"),
        F.countDistinct("lbl").alias("k"),
        F.max("lbl").alias("mx"),
    ).head()
    assert (agg.cnt, agg.k, agg.mx) == (n, 1, 0)
    # the inherited stat of the RESULT relation: one un-compounded round's
    # inflation at most (pre-fix this reached thousands of digits within
    # a round and grew ~1000x per round thereafter)
    bits = int(
        labels._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    ).bit_length()
    assert bits < 100_000, f"inherited sizeInBytes has {bits} bits"


def test_connected_components_small_graph_skips_seed_barrier(spark, caplog):
    """r16: a graph whose EDGE list fits the broadcast budget must take
    the unbarriered-seed local finish -- zero barrier writes (the log
    line is the behavioral pin; correctness is pinned by the
    union-find/random-graph tests, which now route through this path)."""
    import logging

    from aws_cloudfront_realtime_monitoring_spark.operators.graph import (
        connected_components,
    )

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["doc_a", "doc_b"])
    with caplog.at_level(logging.INFO,
                         logger="aws_cloudfront_realtime_monitoring_spark.operators.graph"):
        got = {r.node: r.lbl for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    msgs = [r.getMessage() for r in caplog.records
            if "converged" in r.getMessage()]
    assert msgs and "lazy-checkpointed seed" in msgs[0]
    assert "0 barrier writes" in msgs[0]


def test_connected_components_anchored_with_caller_checkpoint_dir(
        spark, tmp_path):
    """r16 ADVICE: the small-graph fast path returned an UNANCHORED lazy
    plan when the caller passed checkpoint_dir (finish() only
    localCheckpoints when own_tmp) -- every downstream action recomputed
    the seed aggregation from the unpersisted edge cache, and a
    non-deterministic `pairs` input could then disagree with the
    driver-collected union-find map. Pin: the result collects the exact
    min-labels REPEATEDLY after return (edges unpersisted, temp dir the
    caller's), i.e. the plan is anchored, not a live recompute of a
    dropped cache."""
    from aws_cloudfront_realtime_monitoring_spark.operators.graph import (
        connected_components,
    )

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (50, 60)], ["doc_a", "doc_b"]
    )
    out = connected_components(df, checkpoint_dir=str(tmp_path))
    want = {1: 1, 2: 1, 3: 1, 4: 1, 50: 50, 60: 50}
    for _ in range(2):  # repeat: each action re-executes an unanchored plan
        assert {r.node: r.lbl for r in out.collect()} == want


def test_cc_fast_path_result_survives_source_overwrite(spark, tmp_path):
    """r17: the fast path returns a LAZY plan whose only data leaf is the
    seed checkpoint the probe job materialized (no anchor job). Pin the
    anchoring structurally: OVERWRITE the parquet the edges were read
    from after connected_components returns — a plan that still
    referenced the source would see the new rows (or die on the changed
    file set); the anchored plan must keep collecting the original
    components."""
    from aws_cloudfront_realtime_monitoring_spark.operators import graph

    src = str(tmp_path / "pairs_parquet")
    spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (50, 60), (50, 70)], ["doc_a", "doc_b"]
    ).coalesce(1).write.mode("overwrite").parquet(src)
    want = {1: 1, 2: 1, 3: 1, 4: 1, 50: 50, 60: 50, 70: 50}
    out = graph.connected_components(spark.read.parquet(src))
    assert {r.node: r.lbl for r in out.collect()} == want
    # replace the source with a DIFFERENT graph; the returned relation
    # must be anchored off the materialized seed checkpoint, not live
    spark.createDataFrame(
        [(7, 8)], ["doc_a", "doc_b"]).coalesce(1).write.mode(
        "overwrite").parquet(src)
    for _ in range(2):
        assert {r.node: r.lbl for r in out.collect()} == want

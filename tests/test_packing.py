"""Shard packing invariants: capacity, completeness, determinism, fill
accounting, FFD efficiency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_cloudfront_realtime_monitoring_spark.operators.packing import (
    MAX_SHARDS,
    pack_shards,
)
from aws_cloudfront_realtime_monitoring_spark.plans.text import words_col
from aws_cloudfront_realtime_monitoring_spark.sources.tables import load_table

CAPACITY = 400


def _packed(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(words_col()).alias("n_tokens")
    )
    return docs, pack_shards(docs, capacity=CAPACITY, n_groups=8).collect()


def test_packing_capacity_and_completeness(spark, sf_dir):
    docs, rows = _packed(spark, sf_dir)
    n_docs = docs.count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    shards: dict[int, list] = {}
    for r in rows:
        shards.setdefault(r.shard_id, []).append(r)
    for shard_id, members in shards.items():
        total = sum(m.n_tokens for m in members)
        # shard_fill is the shard's final total, identical on every member
        assert {m.shard_fill for m in members} == {total}
        # same group for all members; shard id encodes the group
        assert {m.pack_group for m in members} == {shard_id // MAX_SHARDS}
        if any(m.oversize for m in members):
            # oversize docs sit alone in a dedicated shard
            assert len(members) == 1 and members[0].n_tokens > CAPACITY
        else:
            assert total <= CAPACITY


def test_packing_deterministic(spark, sf_dir):
    _, r1 = _packed(spark, sf_dir)
    _, r2 = _packed(spark, sf_dir)
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_packing_ffd_fill_efficiency(spark, sf_dir):
    """Every group needs at least ceil(group_tokens / capacity) shards; FFD
    must stay within a small factor of that lower bound."""
    import math

    _, rows = _packed(spark, sf_dir)
    by_group: dict[int, list] = {}
    for r in rows:
        if not r.oversize:
            by_group.setdefault(r.pack_group, []).append(r)
    for g, members in by_group.items():
        total = sum(m.n_tokens for m in members)
        n_shards = len({m.shard_id for m in members})
        lower = math.ceil(total / CAPACITY)
        assert n_shards <= max(2 * lower, lower + 1), (
            f"group {g}: {n_shards} shards vs lower bound {lower}"
        )


def test_packing_property_random_token_sizes(spark):
    """Hypothesis-style property sweep (fixed seeds, adversarial shapes):
    capacity, completeness, and fill accounting hold for uniform, skewed,
    all-oversize, and single-doc inputs."""
    import random

    cap = 100
    cases = {
        "uniform": [random.Random(1).randint(1, 99) for _ in range(200)],
        "skewed": [1] * 150 + [99] * 40 + [150] * 10,
        "all_oversize": [101, 500, 1000],
        "single": [42],
    }
    for name, sizes in cases.items():
        docs = spark.createDataFrame(
            [(i, s) for i, s in enumerate(sizes)], "doc_id BIGINT, n_tokens BIGINT"
        )
        rows = pack_shards(docs, capacity=cap, n_groups=4).collect()
        assert len(rows) == len(sizes), name
        shards: dict[int, list] = {}
        for r in rows:
            shards.setdefault(r.shard_id, []).append(r)
        for members in shards.values():
            total = sum(m.n_tokens for m in members)
            assert {m.shard_fill for m in members} == {total}, name
            if any(m.oversize for m in members):
                assert len(members) == 1 and members[0].n_tokens > cap, name
            else:
                assert total <= cap, name


def test_chunk_then_pack_end_to_end(spark, sf_dir):
    """The full training-example pipeline: chunk_documents' windows feed
    pack_shards as (chunk_key, chunk_words) -- every chunk lands in
    exactly one shard, no shard exceeds the token budget, and the fill
    accounting is conserved."""
    from pyspark.sql import functions as F

    from aws_cloudfront_realtime_monitoring_spark.operators.packing import pack_shards
    from aws_cloudfront_realtime_monitoring_spark.plans.text import (
        CHUNK_WORDS,
        chunk_documents,
    )

    chunks = chunk_documents(spark, sf_dir).select(
        # a stable scalar key per chunk (doc_id is not unique across chunks)
        (F.col("doc_id") * 10_000 + F.col("chunk_id")).alias("doc_id"),
        F.col("chunk_words").alias("n_tokens"),
    )
    capacity = CHUNK_WORDS * 4  # four full windows per shard
    packed = pack_shards(chunks, capacity=capacity, n_groups=8)
    rows = packed.collect()
    assert len(rows) == chunks.count()           # every chunk assigned once
    assert len({r.doc_id for r in rows}) == len(rows)
    fills = {}
    for r in rows:
        assert not r.oversize                     # chunk_words <= capacity always
        fills.setdefault((r.pack_group, r.shard_id), 0)
        fills[(r.pack_group, r.shard_id)] += r.n_tokens
    assert all(f <= capacity for f in fills.values())
    # FFD on full-width windows packs tightly: most shards hold 4 windows
    full = sum(1 for f in fills.values() if f >= capacity - CHUNK_WORDS)
    assert full >= len(fills) * 0.5


def test_packing_correct_across_arrow_batches(spark):
    """Regression (r7 code review): the iterator form of applyInPandas
    splits one pack group into multiple Arrow batches; packing must see
    the WHOLE group or shard ids collide across batches and shards
    silently exceed capacity. Force tiny batches and assert the global
    invariants hold."""
    from aws_cloudfront_realtime_monitoring_spark.operators.packing import (
        pack_shards,
    )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        docs = spark.createDataFrame(
            [(i, 60) for i in range(40)], "doc_id BIGINT, n_tokens BIGINT"
        )
        out = pack_shards(docs, capacity=100, n_groups=2).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert len(out) == 40
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard_id, []).append(r)
    for sid, rows in by_shard.items():
        total = sum(r.n_tokens for r in rows)
        assert total <= 100, (sid, total)  # capacity respected globally
        assert all(r.shard_fill == total for r in rows)
    # 40 docs x 60 tokens, 1 per 100-token shard -> exactly 40 shards
    assert len(by_shard) == 40


def test_first_fit_tree_matches_naive_probe():
    """The segment-tree leftmost-fit must produce assignments IDENTICAL
    to the naive linear first-fit probe, on random workloads including
    oversize docs."""
    import numpy as np

    from aws_cloudfront_realtime_monitoring_spark.operators.packing import (
        _FirstFitTree,
    )

    rng = np.random.RandomState(17)
    for trial in range(30):
        capacity = int(rng.randint(50, 500))
        toks = rng.randint(1, int(capacity * 1.3), size=rng.randint(1, 400))
        toks = sorted((int(t) for t in toks), reverse=True)
        # naive reference
        fills_n, assign_n = [], []
        for tok in toks:
            if tok > capacity:
                fills_n.append(tok)
                assign_n.append(len(fills_n) - 1)
                continue
            for j, fill in enumerate(fills_n):
                if fill + tok <= capacity:
                    fills_n[j] = fill + tok
                    assign_n.append(j)
                    break
            else:
                fills_n.append(tok)
                assign_n.append(len(fills_n) - 1)
        # tree under test
        fills_t, assign_t = [], []
        tree = _FirstFitTree()
        for tok in toks:
            if tok > capacity:
                tree.open(capacity - tok)
                fills_t.append(tok)
                assign_t.append(len(fills_t) - 1)
                continue
            j = tree.place(tok)
            if j < 0:
                j = tree.open(capacity - tok)
                fills_t.append(tok)
            else:
                fills_t[j] += tok
            assign_t.append(j)
        assert assign_t == assign_n and fills_t == fills_n, (trial, capacity)


def test_pack_shards_rejects_non_integral_ids(spark):
    import pytest

    df = spark.createDataFrame(
        [("a", 5)], "doc_uri STRING, n_tokens BIGINT"
    )
    with pytest.raises(ValueError, match="integral type"):
        pack_shards(df, 10, id_col="doc_uri")


def test_pack_shards_rejects_negative_tokens(spark):
    """A negative token count would match the segment tree's -1 sentinel
    on UNOPENED leaves and index past the open-shard list (IndexError
    deep in an executor task); it must surface as a schema violation
    instead (r9 advice)."""
    import pytest

    df = spark.createDataFrame(
        [(1, 5), (2, -3), (3, 7)], "doc_id BIGINT, n_tokens BIGINT"
    )
    with pytest.raises(Exception, match="negative token count"):
        pack_shards(df, 10, n_groups=1).collect()


def test_pack_shards_rejects_zero_groups(spark):
    df = spark.createDataFrame([(1, 10)], "doc_id BIGINT, n_tokens BIGINT")
    with pytest.raises(ValueError, match="n_groups"):
        pack_shards(df, capacity=100, n_groups=0)

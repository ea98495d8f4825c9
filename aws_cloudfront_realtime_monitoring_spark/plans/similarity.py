"""Similarity search over the ``embeddings`` table (``array<float>``
column): brute-force cosine top-k as the exactness baseline, an IVF-style
bucketed variant as the scale path, and an all-pairs near-duplicate scan.

Cross-engine determinism: embeddings are quantized to integers
(``round(x * 1e6)``) so dot products and norms are EXACT 64-bit sums in both
Spark and DuckDB; the cosine double then comes out bit-identical (same IEEE
ops in the same order), making ranks and rounded outputs hash-comparable.

Scale posture:
- quantized vectors/norms are computed map-side (array expressions, no UDF);
- brute-force joins broadcast the (small) query set against the corpus --
  the corpus never shuffles;
- the IVF variant equi-joins on a 6-bit sign-pattern bucket: at 100 TB the
  corpus is hash-partitioned by bucket, each probe touches ~1/64 of data.
  (Recall is approximate by construction -- that is the documented tradeoff;
  the oracle replicates the same bucketing so correctness is still exact.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.quantize import QUANT, qvec  # noqa: F401 (re-export)
from ..sources.tables import load_table
from . import EXTRAS, REGISTRY, register

N_QUERIES = 5     # vec_id < 5 are the probe vectors
TOP_K = 5
IVF_BITS = 6
NEAR_DUP_COS = 0.4
#: FLOOR block count for the block-partitioned near-dup join; the actual
#: count scales with the corpus (see _near_dup_params) so one block
#: (~N/B vectors) always fits an executor's memory
NEAR_DUP_BLOCKS = 8

#: target rows per near-dup block: the block count doubles until a block
#: holds at most ~this many vectors, bounding the per-task work at
#: ~TARGET^2 dots (sub-second tasks at dim 64) and -- with the chunked
#: matmul -- the dense cosine tile at CHUNK x ~TARGET (~33 MB). r14: the
#: fixed B=8 config's per-task pair count grows O((N/8)^2) with task
#: count pinned at 36 -- unbounded stragglers and 36-way max parallelism
#: on a 1000-executor cluster; the same fixed-parameter class as
#: semdedup's pre-r10 quadratic. The output is INVARIANT to B (exact
#: all-pairs either way), so scaling it changes no oracle and no
#: fixture result (B stays at the floor through sf0.1).
NEAR_DUP_BLOCK_TARGET = 4096
#: cap on the derived block-count exponent: blocks = 2^min(ceil(log2(
#: N / TARGET)), MAX_BITS). Beyond ~2^20 * TARGET ~= 4.3B vectors the
#: per-block row count (and so per-task pair count) resumes growing
#: with N (r15, bounded-resource residue). Acceptable because (a) the
#: chunked matmul bounds the DENSE tile at CHUNK x block regardless,
#: so memory stays flat and only task wall time grows, and (b) 2^20
#: one-row shuffle keys is already at the practical partition-count
#: ceiling -- past that scale the right move is sharding the corpus
#: upstream, not more blocks.
NEAR_DUP_MAX_BITS = 20

#: rows of the left block per dense matmul tile (module-level so tests
#: can shrink it and exercise the multi-chunk path at fixture scale --
#: r14 review: a function-local constant left the s>0 branch untested)
NEAR_DUP_CHUNK = 1024

#: snapshot into the block_pair closure at plan-build time: True uses
#: the per-worker scratch pool (operators/scratch.py, the r15
#: first-touch-fault mitigation), False allocates fresh tiles per group
#: (the pre-r15 behavior). Exists so tools/measure_scratch_ab.py can
#: INTERLEAVE the two spellings in one session and isolate the
#: allocation variable from memory-regime drift; values are
#: bit-identical either way (same ops, same order -- the oracle pins it).
SCRATCH_POOL = True

# ----------------------------------------------------------- shared exprs

_QVEC_SQL = (
    f"list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))"
)

#: CTE: (vec_id, label, qe BIGINT[], nrm BIGINT)
QUANT_CTE_SQL = f"""
    q AS (SELECT vec_id, label, {_QVEC_SQL} AS qe FROM embeddings),
    qn AS (SELECT vec_id, label, qe,
                  CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS nrm
           FROM q)
"""


def qnorm(qe: Column | str) -> Column:
    c = F.col(qe) if isinstance(qe, str) else qe
    return F.aggregate(c, F.lit(0).cast("bigint"), lambda acc, x: acc + x * x)


def dot(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def cosine(dot_c: Column, na: Column, nb: Column) -> Column:
    # same op order as the SQL oracle: dot / sqrt(na) / sqrt(nb)
    return (
        dot_c.cast("double") / F.sqrt(na.cast("double")) / F.sqrt(nb.cast("double"))
    )


_PAIR_COS_SQL = (
    "CAST(dp AS DOUBLE) / sqrt(CAST(na AS DOUBLE)) / sqrt(CAST(nb AS DOUBLE))"
)

# cos6 quantization: FLOOR(cos * 1e6 + 0.5) / 1e6 EVERYWHERE (SQL
# oracles, Column builders, the numpy block kernel) -- never
# ROUND(double, 6), which diverges between Spark (shortest-repr
# HALF_UP) and DuckDB (scaled-exact-double) on repr-tie rationals; the
# numpy path had already adopted the floor spelling, so the r13 sweep
# also removed a latent floor-vs-ROUND mismatch INSIDE the blocked
# near-dup row (tests/test_queries_oracle.py pins the tie battery).

# ---- Spark-SQL spellings of the same expressions (the ANN builders are
# SQL-string builds as of r8: the Column-composition forms cost ~3,000
# py4j round-trips per plan build, ~0.6 s of pure driver chatter at any
# data scale -- measured in tools/measure_build_split.py -- while one
# spark.sql call costs ~20; the DataFrame forms remain below, suffixed
# _df, pinned bit-identical by tests/test_similarity.py)

_QVEC_SPARK = (
    f"transform(embedding, x -> "
    f"CAST(ROUND(CAST(x AS DOUBLE) * {QUANT}, 0) AS BIGINT))"
)

#: same term order as _bucket_col: sum of when(e[d] >= 0, 1<<d).
#: try_element_at (r11 review): under ANSI (the Spark 4 default) a
#: plain element_at RAISES past the array length, while the DuckDB
#: oracle's embedding[d+1] yields NULL -> the ELSE 0 arm -- a corpus
#: with dim < IVF_BITS would error on one engine and answer on the
#: other. try_element_at's NULL matches the oracle exactly.
_BUCKET_SPARK = " + ".join(
    f"(CASE WHEN try_element_at(embedding, {d + 1}) >= 0 "
    f"THEN {1 << d} ELSE 0 END)"
    for d in range(IVF_BITS)
)


def _qnorm_sql(col: str) -> str:
    return (f"aggregate({col}, CAST(0 AS BIGINT), "
            "(acc, x) -> acc + x * x)")


def _dot_sql(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)")


def _cos_sql(dp: str, na: str, nb: str) -> str:
    # the cosine() op order exactly: dot / sqrt(na) / sqrt(nb)
    return (f"CAST({dp} AS DOUBLE) / sqrt(CAST({na} AS DOUBLE)) "
            f"/ sqrt(CAST({nb} AS DOUBLE))")


# ----------------------------------------------------- brute-force top-k

@register(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH {QUANT_CTE_SQL},
    ex AS (SELECT vec_id, unnest(qe) AS v,
                  unnest(generate_series(1, len(qe))) AS i
           FROM qn),
    dots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS cand_id, SUM(a.v * b.v) AS dp
      FROM ex a JOIN ex b ON a.i = b.i AND b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
      GROUP BY 1, 2),
    scored AS (
      SELECT query_id, cand_id, {_PAIR_COS_SQL} AS cos
      FROM (SELECT d.query_id, d.cand_id, d.dp, qa.nrm AS na, qb.nrm AS nb
            FROM dots d
            JOIN qn qa ON qa.vec_id = d.query_id
            JOIN qn qb ON qb.vec_id = d.cand_id)),
    ranked AS (
      SELECT query_id, cand_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, cand_id) AS BIGINT) AS rnk
      FROM scored)
    SELECT query_id, cand_id, rnk, FLOOR(cos * 1e6 + 0.5) / 1e6 AS cos6
    FROM ranked WHERE rnk <= {TOP_K}
    """,
    description=f"Brute-force cosine top-{TOP_K} for {N_QUERIES} probe "
                "vectors: broadcast probe set x corpus, integer-exact dot "
                "products, window rank. The exactness baseline for ANN.",
    tags=("similarity", "ann"),
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_bf_spark_sql())


def _bf_spark_sql() -> str:
    """Spark-SQL spelling of ann_topk_bruteforce_df (same plan: broadcast
    probe set x corpus BNLJ, integer-exact dots, window rank)."""
    return f"""
    WITH qn AS (SELECT vec_id, {_QVEC_SPARK} AS qe FROM embeddings),
    qnn AS (SELECT vec_id, qe, {_qnorm_sql('qe')} AS nrm FROM qn),
    probes AS (
      SELECT vec_id AS query_id, qe AS qqe, nrm AS qnrm
      FROM qnn WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT /*+ BROADCAST(p) */
             p.query_id, b.vec_id AS cand_id,
             {_cos_sql(_dot_sql('p.qqe', 'b.qe'), 'p.qnrm', 'b.nrm')} AS cos
      FROM qnn b JOIN probes p ON b.vec_id != p.query_id),
    ranked AS (
      SELECT query_id, cand_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, cand_id ASC) AS BIGINT) AS rnk
      FROM scored)
    SELECT query_id, cand_id, rnk, FLOOR(cos * 1e6 + 0.5) / 1e6 AS cos6
    FROM ranked WHERE rnk <= {TOP_K}
    """


def ann_topk_bruteforce_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-composition form (the r1-r7 build), kept as the SQL
    build's pinned-equal replica (tests/test_similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", qvec().alias("qe")).withColumn("nrm", qnorm("qe"))
    queries = base.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qe").alias("qqe"),
        F.col("nrm").alias("qnrm"),
    )
    pairs = base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        cosine(dot("qqe", "qe"), F.col("qnrm"), F.col("nrm")).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", "rnk", (F.floor(F.col("cos") * 1e6 + 0.5) / 1e6).alias("cos6"))
    )


# ------------------------------------------------------- IVF-style top-k

_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{d + 1}] >= 0 THEN {1 << d} ELSE 0 END)"
    for d in range(IVF_BITS)
)

#: multi-probe radius: a probe searches its own bucket plus every bucket
#: within this Hamming distance of it (1 -> 1 + IVF_BITS = 7 of 64
#: buckets, ~11% of the corpus). Radius 0 (probe-own-bucket-only) had
#: MEASURED recall@3 = 0/15 on the testdata (the ann_ivf_recall audit
#: row caught it): sign-LSH bits agree on a near-neighbor with
#: probability 1 - theta/pi < 1 per bit, so demanding all 6 match
#: discards most true neighbors. Radius 1 measured 5/15 at sf0.01 --
#: the standard multi-probe trade (Lv et al., VLDB'07): more recall per
#: probe WITHOUT growing the index.
IVF_PROBE_HAMMING = 1


def _bucket_col(bits: int = IVF_BITS) -> Column:
    out = None
    for d in range(bits):
        # try_element_at: NULL (not an ANSI error) past the embedding
        # length, matching the oracle's list index -- see _BUCKET_SPARK
        term = F.when(
            F.try_element_at("embedding", F.lit(d + 1)) >= 0, F.lit(1 << d)
        ).otherwise(0)
        out = term if out is None else out + term
    return out


def _probe_masks() -> list[int]:
    """XOR masks enumerating the FULL Hamming-<=IVF_PROBE_HAMMING ball
    (r11 review: the old form hardcoded radius 1, so raising the
    advertised tuning knob would have silently searched 7 of the
    radius-2 ball's 22 buckets while the oracle's bit_count predicate
    admitted all 22 -- an engine-vs-oracle divergence)."""
    from itertools import combinations

    masks = [0]
    for r in range(1, IVF_PROBE_HAMMING + 1):
        for bits in combinations(range(IVF_BITS), r):
            masks.append(sum(1 << b for b in bits))
    return masks


@register(
    "ann_topk_ivf",
    oracle=f"""
    WITH b AS (SELECT vec_id, {_BUCKET_SQL} AS bucket, {_QVEC_SQL} AS qe
               FROM embeddings),
    qn AS (SELECT vec_id, bucket, qe,
                  CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS nrm
           FROM b),
    ex AS (SELECT vec_id, bucket, unnest(qe) AS v,
                  unnest(generate_series(1, len(qe))) AS i
           FROM qn),
    dots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS cand_id, SUM(a.v * b.v) AS dp
      FROM ex a JOIN ex b ON a.i = b.i
                         AND bit_count(xor(a.bucket, b.bucket))
                               <= {IVF_PROBE_HAMMING}
                         AND b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
      GROUP BY 1, 2),
    scored AS (
      SELECT query_id, cand_id, {_PAIR_COS_SQL} AS cos
      FROM (SELECT d.query_id, d.cand_id, d.dp, qa.nrm AS na, qb.nrm AS nb
            FROM dots d
            JOIN qn qa ON qa.vec_id = d.query_id
            JOIN qn qb ON qb.vec_id = d.cand_id)),
    ranked AS (
      SELECT query_id, cand_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, cand_id) AS BIGINT) AS rnk
      FROM scored)
    SELECT query_id, cand_id, rnk, FLOOR(cos * 1e6 + 0.5) / 1e6 AS cos6
    FROM ranked WHERE rnk <= 3
    """,
    description=f"IVF/LSH-bucketed ANN: {IVF_BITS}-bit sign-pattern coarse "
                "quantizer with MULTI-PROBE (each probe searches its own "
                "bucket plus the Hamming-1 ball: the probe side explodes "
                f"to {IVF_BITS + 1} bucket codes and the corpus side "
                "stays an equi-join on bucket -> hash-partitionable, "
                f"~{IVF_BITS + 1}/64 of corpus touched per probe at "
                "scale). Approximate recall by design; single-probe "
                "measured recall@3 = 0 on this data (sign bits agree "
                "per-bit with prob 1 - theta/pi), which the "
                "ann_ivf_recall audit row quantifies -- multi-probe is "
                "the standard fix that buys recall without growing the "
                "index. Demoted in the r8 registry swap: this exact plan "
                "runs IN FULL as the IVF side of ann_ivf_recall (which "
                "took the driver slot), so its driver coverage is "
                "strictly subsumed; the pytest suite keeps running this "
                "row's own Spark-vs-DuckDB comparison.",
    tags=("similarity", "ann", "ivf"),
    driver_slot=False,
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_ivf_spark_sql())


def _ivf_spark_sql() -> str:
    """Spark-SQL spelling of ann_topk_ivf_df (same plan: probe-side
    Hamming-ball explode, broadcast probes, bucket equi-join)."""
    masks = ", ".join(str(m) for m in _probe_masks())
    return f"""
    WITH qn AS (
      SELECT vec_id, {_BUCKET_SPARK} AS bucket, {_QVEC_SPARK} AS qe
      FROM embeddings),
    qnn AS (SELECT vec_id, bucket, qe, {_qnorm_sql('qe')} AS nrm FROM qn),
    probes AS (
      SELECT query_id, qqe, qnrm, qbucket ^ mask AS pbucket
      FROM (SELECT vec_id AS query_id, qe AS qqe, nrm AS qnrm,
                   bucket AS qbucket
            FROM qnn WHERE vec_id < {N_QUERIES})
      LATERAL VIEW explode(array({masks})) m AS mask),
    scored AS (
      SELECT /*+ BROADCAST(p) */
             p.query_id, b.vec_id AS cand_id,
             {_cos_sql(_dot_sql('p.qqe', 'b.qe'), 'p.qnrm', 'b.nrm')} AS cos
      FROM qnn b JOIN probes p
        ON b.bucket = p.pbucket AND b.vec_id != p.query_id),
    ranked AS (
      SELECT query_id, cand_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, cand_id ASC) AS BIGINT) AS rnk
      FROM scored)
    SELECT query_id, cand_id, rnk, FLOOR(cos * 1e6 + 0.5) / 1e6 AS cos6
    FROM ranked WHERE rnk <= 3
    """


def ann_topk_ivf_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-composition form (the r1-r7 build), kept as the SQL
    build's pinned-equal replica (tests/test_similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", _bucket_col().alias("bucket"), qvec().alias("qe")
    ).withColumn("nrm", qnorm("qe"))
    queries = base.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket").alias("qbucket"),
        F.col("qe").alias("qqe"),
        F.col("nrm").alias("qnrm"),
    )
    # multi-probe expansion happens on the SMALL probe side: each probe
    # fans out to its Hamming-ball bucket codes and the (huge) corpus
    # side still joins on its single stored bucket -- the equi-join
    # stays hash-partitionable and every candidate pair appears exactly
    # once (distinct XOR masks produce distinct probe buckets)
    probes = queries.select(
        "query_id", "qqe", "qnrm",
        F.explode(F.array(*[F.lit(m) for m in _probe_masks()])).alias("mask"),
        "qbucket",
    ).select(
        "query_id", "qqe", "qnrm",
        F.col("qbucket").bitwiseXOR(F.col("mask")).alias("pbucket"),
    )
    pairs = base.join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("pbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        cosine(dot("qqe", "qe"), F.col("qnrm"), F.col("nrm")).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("query_id", "cand_id", "rnk", (F.floor(F.col("cos") * 1e6 + 0.5) / 1e6).alias("cos6"))
    )


# ------------------------------------------------- all-pairs near-dup scan

def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= NEAR_DUP_COS):
    all-pairs scan with integer-exact dots -- the quadratic GROUND-TRUTH
    sibling of the ``embedding_near_dup_blocked`` registry row.

    Not a registry entry (registry slot yielded to the streaming
    sliding-window equivalence row in r03): the blocked variant carries
    the identical output contract through the driver oracle, and
    tests/test_similarity.py pins blocked == this exact scan pair-for-pair
    and cosine-for-cosine, so the semantics stay double-verified."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", qvec().alias("qe")).withColumn("nrm", qnorm("qe"))
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("qe").alias("qa"), F.col("nrm").alias("na")
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("qe").alias("qb"), F.col("nrm").alias("nb")
    )
    pairs = a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
    scored = pairs.select(
        "vec_a",
        "vec_b",
        cosine(dot("qa", "qb"), F.col("na"), F.col("nb")).alias("cos"),
    )
    return scored.where(F.col("cos") >= NEAR_DUP_COS).select(
        "vec_a", "vec_b", (F.floor(F.col("cos") * 1e6 + 0.5) / 1e6).alias("cos6")
    )


def _near_dup_params(emb: DataFrame) -> DataFrame:
    """One-row (nblocks) params relation, computed IN-QUERY like
    ``_semdedup_params`` (zero plan-build-time jobs): nblocks is the
    smallest power of two >= N / NEAR_DUP_BLOCK_TARGET, floored at
    NEAR_DUP_BLOCKS -- integer comparisons only, COUNT(*) rides the
    parquet footers. Reads the module constants at call time so tests
    can force the scaled regime on small corpora."""
    cnt_df = emb.agg(F.count(F.lit(1)).alias("cnt"))
    target, floor_b = NEAR_DUP_BLOCK_TARGET, NEAR_DUP_BLOCKS
    grown = None
    for j in range(NEAR_DUP_MAX_BITS):
        term = F.when(F.col("cnt") > (target << j), 1).otherwise(0)
        grown = term if grown is None else grown + term
    # SQL-form shiftleft: the DataFrame API wrapper only takes a Python
    # int for numBits, the SQL function takes any integer expression
    return cnt_df.select(grown.alias("bits")).select(
        F.greatest(F.lit(floor_b), F.expr("shiftleft(1, bits)"))
        .cast("int").alias("nblocks")
    )


@register(
    "embedding_near_dup_blocked",
    oracle=f"""
    WITH {QUANT_CTE_SQL},
    ex AS (SELECT vec_id, unnest(qe) AS v,
                  unnest(generate_series(1, len(qe))) AS i
           FROM qn),
    dots AS (
      SELECT a.vec_id AS va, b.vec_id AS vb, SUM(a.v * b.v) AS dp
      FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2),
    scored AS (
      SELECT va, vb, {_PAIR_COS_SQL} AS cos
      FROM (SELECT d.va, d.vb, d.dp, qa.nrm AS na, qb.nrm AS nb
            FROM dots d
            JOIN qn qa ON qa.vec_id = d.va
            JOIN qn qb ON qb.vec_id = d.vb))
    SELECT va AS vec_a, vb AS vec_b, FLOOR(cos * 1e6 + 0.5) / 1e6 AS cos6
    FROM scored WHERE cos >= {NEAR_DUP_COS}
    """,
    description="Block-partitioned variant of embedding_near_dup: the corpus "
                "is hashed into B blocks (vec_id % B); each row is "
                "replicated once per partner block, grouped by the "
                "unordered block pair (b1 <= b2), and each group multiplies "
                "its two blocks with row-chunked exact int64 numpy matmuls "
                "inside applyInPandas. NOTHING is collected to the driver "
                "and no side exceeds a block in memory: total work is "
                "B(B+1)/2 block-pair tasks over B*N replicated rows -- the "
                "standard distributed all-pairs shape. r14: B actually "
                f"SCALES with the corpus (smallest power of two giving "
                f"<=~{NEAR_DUP_BLOCK_TARGET}-vector blocks, floor "
                f"{NEAR_DUP_BLOCKS}, via an in-query one-row params "
                "relation) and the matmul is chunked, so the per-task "
                "dense cosine tile is bounded at any N -- the fixed B=8 "
                "config's tile grew O((N/8)^2), ~5 GB/task at 200k "
                "vectors, and 36 tasks cap cluster parallelism. The "
                "output is invariant to B (exact all-pairs either way): "
                "pinned blocked == all-pairs both at fixture B and with "
                "the scaled regime forced.",
    tags=("similarity", "dedup", "pandas-udf"),
)
def embedding_near_dup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    params = _near_dup_params(emb)
    base = emb.crossJoin(F.broadcast(params)).select(
        "vec_id", qvec().alias("qe"), "nblocks",
        F.pmod(F.col("vec_id"), F.col("nblocks")).alias("blk"),
    )
    # replicate each row to every unordered block pair it belongs to:
    # row in block b joins groups (min(b,p), max(b,p)) for p in 0..B-1
    rep = base.select(
        "vec_id", "qe", "blk",
        F.explode(
            F.sequence(F.lit(0), F.col("nblocks") - 1)
        ).alias("p"),
    ).select(
        "vec_id", "qe", "blk",
        F.least("blk", "p").alias("g1"),
        F.greatest("blk", "p").alias("g2"),
    )

    # row-chunk the left block so the dense cosine tile is bounded at
    # CHUNK x |right| even if a block overshoots the target (r14);
    # snapshot the module constant HERE so the closure shipped to
    # executors carries the (possibly test-patched) value
    CHUNK = NEAR_DUP_CHUNK
    USE_POOL = SCRATCH_POOL

    def block_pair(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # every tile lives in the per-worker scratch pool
        # (operators/scratch.py): one task runs MANY block-pair groups,
        # and the r14 sweep isolated a first-touch-fault regime
        # (~10 MB/s in bad windows) where re-allocating ~100 MB of
        # fresh tiles per group costs integer factors of wall on an
        # identical plan; warm pages are reused instead. Values are
        # bit-identical to the fresh-allocation spelling (same dtypes,
        # same operation ORDER) -- the oracle hash pins it.
        if USE_POOL:
            from aws_cloudfront_realtime_monitoring_spark.operators import (
                scratch as _scratch_mod,
            )

            # re-assert worker-side (r16): a media-kernel A/B arm on a
            # REUSED worker may have left scratch.ENABLED=False; each
            # kernel's closure is authoritative for its own tasks, else
            # this kernel's measured 2.2x mitigation silently degrades
            # to fresh allocs after any such run in the session
            _scratch_mod.ENABLED = True
            scratch = _scratch_mod.scratch
        else:  # A/B instrumentation path (tools/measure_scratch_ab.py)
            def scratch(key_: str, shape: tuple, dtype) -> np.ndarray:
                return np.empty(shape, dtype=dtype)

        g1, g2 = key
        left = pdf[pdf["blk"] == g1] if g1 != g2 else pdf
        right = pdf[pdf["blk"] == g2] if g1 != g2 else pdf
        ids_a = left["vec_id"].to_numpy(dtype=np.int64)
        ids_b = right["vec_id"].to_numpy(dtype=np.int64)
        if len(ids_a) == 0 or len(ids_b) == 0:
            empty = np.array([], dtype=np.int64)
            return pd.DataFrame(
                {"vec_a": empty, "vec_b": empty, "cos6": empty.astype(np.float64)}
            )
        dim = len(left["qe"].iloc[0])
        mat_a = scratch("ndup.mat_a", (len(ids_a), dim), np.int64)
        np.stack(left["qe"].to_numpy(), axis=0, out=mat_a)
        if g1 == g2:
            mat_b = mat_a  # same block: one fill, one buffer
        else:
            mat_b = scratch("ndup.mat_b", (len(ids_b), dim), np.int64)
            np.stack(right["qe"].to_numpy(), axis=0, out=mat_b)
        # einsum: exact int64 row norms with no (n, dim) square temp
        nrm_a = np.einsum("ij,ij->i", mat_a, mat_a)
        nrm_b = nrm_a if g1 == g2 else np.einsum("ij,ij->i", mat_b, mat_b)
        sq_a, sq_b = np.sqrt(nrm_a), np.sqrt(nrm_b)
        out_lo, out_hi, out_cos = [], [], []
        for s in range(0, len(ids_a), CHUNK):
            m = min(CHUNK, len(ids_a) - s)
            dots = scratch("ndup.dots", (m, len(ids_b)), np.int64)
            np.matmul(mat_a[s:s + m], mat_b.T, out=dots)  # int64: exact
            # same operation ORDER as the all-pairs sibling (two
            # divisions): a reciprocal-multiply spelling rounds
            # differently and could flip a cos6 micro-quantization tie
            cos = scratch("ndup.cos", (m, len(ids_b)), np.float64)
            np.divide(dots, sq_a[s:s + m, None], out=cos)
            np.divide(cos, sq_b[None, :], out=cos)
            # within a block require a < b; across blocks every (a, b)
            # pair is valid and appears in exactly this one group --
            # orient the pair as (min, max) so the output keying matches
            # the all-pairs oracle
            keep = scratch("ndup.keep", (m, len(ids_b)), np.bool_)
            np.greater_equal(cos, NEAR_DUP_COS, out=keep)
            if g1 == g2:
                lt = scratch("ndup.lt", (m, len(ids_b)), np.bool_)
                np.less(ids_a[s:s + m, None], ids_b[None, :], out=lt)
                np.logical_and(keep, lt, out=keep)
            ii, jj = np.nonzero(keep)
            va, vb = ids_a[s + ii], ids_b[jj]
            out_lo.append(np.minimum(va, vb))
            out_hi.append(np.maximum(va, vb))
            # round half-away-from-zero on the (non-negative) kept
            # values, matching both engines' ROUND (np.round would tie
            # half-to-even)
            out_cos.append(np.floor(cos[ii, jj] * 1e6 + 0.5) / 1e6)
        return pd.DataFrame({
            "vec_a": np.concatenate(out_lo),
            "vec_b": np.concatenate(out_hi),
            "cos6": np.concatenate(out_cos),
        })

    return rep.groupBy("g1", "g2").applyInPandas(
        block_pair, "vec_a BIGINT, vec_b BIGINT, cos6 DOUBLE"
    )


# ------------------------------------------------- semantic dedup (SemDeDup)

#: cosine threshold above which two same-bucket embeddings are semantic
#: duplicates (SemDeDup, Abbas et al. 2023: cluster the embedding space,
#: then drop all-but-one of each within-cluster near-duplicate group)
SEMDEDUP_COS = 0.35

#: semdedup's bucket BIT COUNT scales with the corpus so within-bucket
#: pair work stays LINEAR: B = max(IVF_BITS, #{j < MAX_BITS :
#: TARGET_BUCKET * 2^j < N}) -- i.e. the smallest B with 2^B >=
#: N / TARGET_BUCKET, computed with integer comparisons so Spark and
#: DuckDB can never diverge on a log2 ulp. The r10 ~sf10 sweep caught
#: the previous FIXED 2^6-bucket config going quadratic (262x wall at
#: 100x vectors: constant bucket count => bucket size ~ N => in-bucket
#: pairs ~ N^2); with bucket count ~ N/32 the expected in-bucket pair
#: count is ~16N. Unchanged at sf0.01/sf0.1 (B stays 6 below 2049
#: vectors), so the driver-oracle rows' results are identical.
SEMDEDUP_TARGET_BUCKET = 32
SEMDEDUP_MAX_BITS = 24


#: dynamic-width sign-pattern bucket for the oracle: bit d participates
#: only when d < p.nbits (p = the params CTE below); out-of-range list
#: indexes yield NULL -> the ELSE 0 arm, matching Spark's
#: try_element_at (r11: plain element_at RAISES under ANSI)
_SEMDEDUP_BUCKET_SQL = "(" + " + ".join(
    f"(CASE WHEN {d} < p.nbits AND embedding[{d + 1}] >= 0"
    f" THEN {1 << d} ELSE 0 END)"
    for d in range(SEMDEDUP_MAX_BITS)
) + ")"

#: nbits = clamp(max(IVF_BITS, smallest B with 2^B >= N / TARGET),
#: dim): integer comparisons only, so Spark and DuckDB can never
#: diverge on a log2 ulp. The dim clamp (r11, ADVICE): bucket bits past
#: the embedding length contribute 0 in both engines, so without it a
#: corpus with dim < nbits would silently stop scaling its bucket count
#: -- quadratic in-bucket pair work with no warning. Clamping makes the
#: ceiling the embedding dimensionality itself, explicit in-plan.
_SEMDEDUP_PARAMS_SQL = (
    "SELECT LEAST(GREATEST(" + str(IVF_BITS) + ", "
    + " + ".join(
        f"(CASE WHEN cnt > {SEMDEDUP_TARGET_BUCKET << j} THEN 1 ELSE 0 END)"
        for j in range(SEMDEDUP_MAX_BITS)
    )
    + "), dim) AS nbits FROM (SELECT COUNT(*) AS cnt FROM embeddings),"
    " (SELECT len(embedding) AS dim FROM embeddings LIMIT 1)"
)


def _semdedup_params(emb: DataFrame) -> DataFrame:
    """The one-row (nbits) params relation, computed IN-QUERY (r11: no
    eager job at plan build -- the Spark analog of the oracle's params
    CTE, restoring the 'zero plan-build-time jobs' invariant that r10's
    ``emb.count()`` broke). COUNT(*) sizes the bucket count so
    in-bucket pair work stays linear (a zero-column scan: parquet row
    counts come off the footers, no data pages); the dim clamp reads
    ONE row via limit(1) rather than MIN over the corpus -- embedding
    dims are uniform by the corpus contract (every similarity operator
    assumes it), and the self-join duplicates this subtree, so a
    full-column MIN would cost two extra passes over the heaviest
    column at scale."""
    cnt_df = emb.agg(F.count(F.lit(1)).alias("cnt"))
    dim_df = emb.select(F.size("embedding").alias("dim")).limit(1)
    grown = None
    for j in range(SEMDEDUP_MAX_BITS):
        term = F.when(
            F.col("cnt") > (SEMDEDUP_TARGET_BUCKET << j), 1
        ).otherwise(0)
        grown = term if grown is None else grown + term
    return cnt_df.crossJoin(dim_df).select(
        F.least(F.greatest(F.lit(IVF_BITS), grown), F.col("dim"))
        .alias("nbits")
    )


def _bucket_col_dyn(nbits: Column) -> Column:
    """Sign-pattern bucket whose width is the runtime ``nbits`` column
    -- the Column spelling of ``_SEMDEDUP_BUCKET_SQL``."""
    out = None
    for d in range(SEMDEDUP_MAX_BITS):
        # the d < nbits conjunct already clamps to the dimensionality,
        # but try_element_at keeps the guard independent of And
        # evaluation order under ANSI (see _BUCKET_SPARK)
        term = F.when(
            (F.lit(d) < nbits)
            & (F.try_element_at("embedding", F.lit(d + 1)) >= 0),
            F.lit(1 << d),
        ).otherwise(0)
        out = term if out is None else out + term
    return out


@register(
    "semdedup",
    oracle=f"""
    WITH params AS ({_SEMDEDUP_PARAMS_SQL}),
    b AS (SELECT vec_id, {_SEMDEDUP_BUCKET_SQL} AS bucket, {_QVEC_SQL} AS qe
               FROM embeddings, params p),
    qn AS (SELECT vec_id, bucket, qe,
                  CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS nrm
           FROM b),
    ex AS (SELECT vec_id, bucket, unnest(qe) AS v,
                  unnest(generate_series(1, len(qe))) AS i
           FROM qn),
    dots AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id, SUM(a.v * b.v) AS dp
      FROM ex a JOIN ex b ON a.i = b.i AND a.bucket = b.bucket
                         AND a.vec_id < b.vec_id
      GROUP BY 1, 2),
    scored AS (
      SELECT b_id AS vec_id, a_id AS rep_cand, {_PAIR_COS_SQL} AS cos
      FROM (SELECT d.a_id, d.b_id, d.dp, qa.nrm AS na, qb.nrm AS nb
            FROM dots d
            JOIN qn qa ON qa.vec_id = d.a_id
            JOIN qn qb ON qb.vec_id = d.b_id)),
    ranked AS (
      SELECT vec_id, rep_cand, cos,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY rep_cand) AS rn
      FROM scored WHERE cos >= {SEMDEDUP_COS})
    SELECT vec_id, rep_cand AS rep_id, FLOOR(cos * 1e6 + 0.5) / 1e6 AS cos6
    FROM ranked WHERE rn = 1
    """,
    description="Semantic dedup over embeddings (the SemDeDup pipeline "
                "stage): cluster the space with the deterministic "
                "sign-pattern quantizer whose BIT COUNT scales with the "
                f"corpus (max({IVF_BITS}, bits for ~"
                f"{SEMDEDUP_TARGET_BUCKET}-vector buckets), clamped to "
                "the embedding dimensionality, integer-exact in both "
                "engines via an IN-QUERY one-row params relation (r11: "
                "broadcast scalar, no plan-build-time job) -- r10: the "
                "fixed-bucket config measured quadratic at the ~sf10 "
                "sweep, 262x wall at 100x vectors; scaled buckets keep "
                "in-bucket pair work linear), compare pairs only "
                "WITHIN a cluster "
                "(equi-join on bucket -- hash-partitionable, never "
                "all-pairs), and drop every vector with a smaller-id "
                f"neighbor at cos >= {SEMDEDUP_COS}, reporting its "
                "smallest such representative. The dominated-by-any-"
                "smaller-id rule is a deterministic single-pass keep "
                "policy (transitive chains collapse toward the smallest "
                "id; the kept set is ids absent from this relation) -- "
                "for the connected-component variant compose with "
                "operators.graph. Integer-exact dots; cluster sizes "
                "bound each join partition, trained k-means centroids "
                "(operators.kmeans) remain the swap-in for corpora "
                "whose sign-pattern buckets skew (semdedup_kmeans, "
                "numpy-replica-pinned). Promoted to a driver-oracle row "
                "in r6 (slot from semi_anti_membership, whose semi/anti "
                "coverage subquery_shapes keeps).",
    tags=("similarity", "dedup", "curation"),
)
def semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # the quantizer width is an IN-QUERY one-row broadcast (the Spark
    # analog of the oracle's params CTE): zero plan-build-time jobs,
    # and nbits is clamped to the embedding dimensionality so the
    # bucket count can never silently stop scaling (r11 ADVICE)
    params = F.broadcast(_semdedup_params(emb))
    base = emb.crossJoin(params).select(
        "vec_id",
        _bucket_col_dyn(F.col("nbits")).alias("bucket"),
        qvec().alias("qe"),
    ).withColumn("nrm", qnorm("qe"))
    return _dominance_dedup(base, "bucket")


def _dominance_dedup(base: DataFrame, key_col: str) -> DataFrame:
    """Within-cluster dominated-by-any-smaller-id dedup over a
    (vec_id, {key_col}, qe, nrm) relation -- the single implementation
    behind both the sign-pattern registry row and the trained-centroid
    variant (the dominance rule and cos6 contract must never diverge
    between them)."""
    a = base.select(
        F.col("vec_id").alias("a_id"), key_col,
        F.col("qe").alias("a_qe"), F.col("nrm").alias("a_nrm"),
    )
    b = base.select(
        F.col("vec_id").alias("b_id"), key_col,
        F.col("qe").alias("b_qe"), F.col("nrm").alias("b_nrm"),
    )
    pairs = a.join(b, key_col).where(F.col("a_id") < F.col("b_id"))
    scored = pairs.select(
        F.col("b_id").alias("vec_id"),
        F.col("a_id").alias("rep_cand"),
        cosine(dot("a_qe", "b_qe"), F.col("a_nrm"), F.col("b_nrm")).alias("cos"),
    ).where(F.col("cos") >= SEMDEDUP_COS)
    w = W.partitionBy("vec_id").orderBy(F.asc("rep_cand"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("rep_cand").alias("rep_id"),
                (F.floor(F.col("cos") * 1e6 + 0.5) / 1e6).alias("cos6"))
    )


def semdedup_kmeans(spark: SparkSession, sf_dir: str, k: int = 16):
    """SemDeDup with TRAINED clusters: the same
    dominated-by-any-smaller-id rule as the ``semdedup`` registry row,
    but clustered by k-means centroids (operators/kmeans.py) instead of
    the sign-pattern quantizer -- the production configuration, where
    cluster count is chosen ~ sqrt(N) (or larger) so within-cluster pair
    work stays bounded.

    Returns ``(dropped, n_iters)``: the dropped relation has the
    identical (vec_id, rep_id, cos6) schema as ``semdedup``. Not a
    registry row -- iterative model training is outside the SQL-oracle
    contract (the k-means precedent); pytest pins it against an
    independent numpy replica over the trained assignments."""
    from ..operators.kmeans import fit_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    _centroids, assigns, n_iters = fit_kmeans(emb, k=k)
    base = (
        emb.select("vec_id", qvec().alias("qe"))
        .withColumn("nrm", qnorm("qe"))
        .join(assigns.select("vec_id", "cluster"), "vec_id")
    )
    return _dominance_dedup(base, "cluster"), n_iters


# ------------------------------------------------------ ann_ivf_recall

def _ann_recall_oracle() -> str:
    # ann_topk_ivf lost its driver slot in the r8 swap (EXTRAS);
    # the brute-force ground truth keeps its driver row
    ivf = EXTRAS["ann_topk_ivf"].oracle
    exact = REGISTRY["ann_topk_bruteforce"].oracle
    return f"""
    WITH ivf AS (SELECT query_id, cand_id FROM ({ivf}) WHERE rnk <= 3),
    exact AS (SELECT query_id, cand_id FROM ({exact}) WHERE rnk <= 3),
    joined AS (
      SELECT COALESCE(i.query_id, e.query_id) AS query_id,
             CASE WHEN i.cand_id IS NOT NULL AND e.cand_id IS NOT NULL
                    THEN 1 ELSE 0 END AS is_both,
             CASE WHEN i.cand_id IS NOT NULL AND e.cand_id IS NULL
                    THEN 1 ELSE 0 END AS is_ivf_only,
             CASE WHEN e.cand_id IS NOT NULL AND i.cand_id IS NULL
                    THEN 1 ELSE 0 END AS is_exact_only
      FROM ivf i FULL OUTER JOIN exact e
        ON i.query_id = e.query_id AND i.cand_id = e.cand_id)
    SELECT query_id,
           CAST(SUM(is_both) AS BIGINT) AS n_both,
           CAST(SUM(is_ivf_only) AS BIGINT) AS n_ivf_only,
           CAST(SUM(is_exact_only) AS BIGINT) AS n_exact_only
    FROM joined GROUP BY query_id
    """


@register(
    "ann_ivf_recall",
    oracle=_ann_recall_oracle(),
    description="Recall audit of the IVF scale path against the "
                "brute-force ground truth, per probe: a FULL OUTER JOIN "
                "of the two top-3 relations on (query_id, cand_id) "
                "counts neighbors found by both, by IVF only, and by "
                "exact only -- quantifying the multi-probe bucket trade "
                "the IVF row documents (each probe searches its "
                f"Hamming-{IVF_PROBE_HAMMING} ball, ~{IVF_BITS + 1}/"
                f"{1 << IVF_BITS} of the corpus at radius 1, so "
                "recall@3 = n_both / 3 against that coverage) as a "
                "driver-checkable relation rather than prose, the "
                "dedup_lsh_recall pattern applied to the vector path. "
                "An 'ivf_only' neighbor at a rank where the exact side "
                "has none is impossible (IVF scores a subset of the "
                "same exact cosine scores), but ivf_only+exact_only "
                "pairs appear whenever the bucket filter pushes a true "
                "neighbor out of IVF's top-3 -- those rows ARE the "
                "recall loss. Runs the two audited sibling plans plus "
                "one join on K*N_QUERIES rows; at 100 TB this is the "
                "sampled-recall validation job a pipeline runs before "
                "trusting its quantizer. Promoted to a driver slot in "
                "the r8 registry swap (this row found and fixed the "
                "single-probe recall-0 bug in r7, the strongest kind of "
                "verification row); its slot came from ann_topk_ivf, "
                "which runs in full as this row's IVF side.",
    tags=("similarity", "ann", "validation"),
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(f"""
    WITH ivf AS (
      SELECT query_id AS i_q, cand_id AS i_c
      FROM ({_ivf_spark_sql()}) WHERE rnk <= 3),
    exact AS (
      SELECT query_id AS e_q, cand_id AS e_c
      FROM ({_bf_spark_sql()}) WHERE rnk <= 3),
    joined AS (
      SELECT COALESCE(i_q, e_q) AS query_id,
             CAST(i_c IS NOT NULL AND e_c IS NOT NULL AS INT) AS is_both,
             CAST(i_c IS NOT NULL AND e_c IS NULL AS INT) AS is_ivf_only,
             CAST(e_c IS NOT NULL AND i_c IS NULL AS INT) AS is_exact_only
      FROM ivf FULL OUTER JOIN exact
        ON i_q = e_q AND i_c = e_c)
    SELECT query_id,
           CAST(SUM(is_both) AS BIGINT) AS n_both,
           CAST(SUM(is_ivf_only) AS BIGINT) AS n_ivf_only,
           CAST(SUM(is_exact_only) AS BIGINT) AS n_exact_only
    FROM joined GROUP BY query_id
    """)


def recall_audit(approx: DataFrame, exact: DataFrame,
                 only_label: str) -> DataFrame:
    """The shared top-3 recall-audit shape (r17 review: this block was
    copy-pasted four times across the IVF/trained/PQ audits and the
    scale sweep). Both inputs carry the (query_id, cand_id, rnk) ANN
    contract; the output is one row per query with ``n_both`` /
    ``n_{only_label}_only`` / ``n_exact_only`` counts over the top-3
    cut — full-outer joined so the conservation law
    ``n_both + n_*_only = 3`` holds per side (pinned in tests)."""
    a = approx.where(F.col("rnk") <= 3).select(
        F.col("query_id").alias("i_q"), F.col("cand_id").alias("i_c")
    )
    e = exact.where(F.col("rnk") <= 3).select(
        F.col("query_id").alias("e_q"), F.col("cand_id").alias("e_c")
    )
    joined = a.join(
        e,
        (F.col("i_q") == F.col("e_q")) & (F.col("i_c") == F.col("e_c")),
        "full_outer",
    )
    return (
        joined.select(
            F.coalesce(F.col("i_q"), F.col("e_q")).alias("query_id"),
            (F.col("i_c").isNotNull() & F.col("e_c").isNotNull())
            .cast("int").alias("is_both"),
            (F.col("i_c").isNotNull() & F.col("e_c").isNull())
            .cast("int").alias("is_a_only"),
            (F.col("e_c").isNotNull() & F.col("i_c").isNull())
            .cast("int").alias("is_exact_only"),
        )
        .groupBy("query_id")
        .agg(
            F.sum("is_both").cast("bigint").alias("n_both"),
            F.sum("is_a_only").cast("bigint")
            .alias(f"n_{only_label}_only"),
            F.sum("is_exact_only").cast("bigint").alias("n_exact_only"),
        )
    )


def ann_ivf_recall_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-composition form (the r1-r7 build), kept as the SQL
    build's pinned-equal replica (tests/test_similarity.py)."""
    return recall_audit(
        ann_topk_ivf_df(spark, sf_dir),
        ann_topk_bruteforce_df(spark, sf_dir),
        "ivf",
    )


# --------------------------------------------- hybrid retrieval (r17)

#: reciprocal-rank-fusion constant (Cormack/Clarke/Buettcher 2009's
#: k=60 -- the standard dampener: rank-1 contributes 1/61, rank-5 1/65,
#: so no single list dominates the fusion)
RRF_K = 60
RRF_TOPK = 5

#: (BM25 query id, probe vec_id) pairs: the fixture pairing that makes
#: a text query and a vector probe one HYBRID query. One spelling for
#: both engines (a literal VALUES relation).
RRF_PAIRS = [("q_join", 0), ("q_stream", 1), ("q_scan", 2)]


def _rrf_oracle() -> str:
    from .text import _bm25_sql, _bm25_values, bm25_split_expr

    bm = _bm25_sql(bm25_split_expr("duck"), _bm25_values("duck"))
    ann = REGISTRY["ann_topk_bruteforce"].oracle
    pairs = ", ".join(f"('{q}', {v})" for q, v in RRF_PAIRS)
    return f"""
    WITH bm AS ({bm}),
    ann AS ({ann}),
    pairs(pair_id, vec_query) AS (VALUES {pairs}),
    t AS (SELECT p.pair_id, bm.doc_id, bm.rnk AS rt
          FROM bm JOIN pairs p ON bm.query_id = p.pair_id),
    v AS (SELECT p.pair_id, ann.cand_id AS doc_id, ann.rnk AS rv
          FROM ann JOIN pairs p ON ann.query_id = p.vec_query),
    f AS (SELECT COALESCE(t.pair_id, v.pair_id) AS pair_id,
                 COALESCE(t.doc_id, v.doc_id) AS doc_id,
                 (CASE WHEN rt IS NOT NULL
                       THEN 1000000000 // ({RRF_K} + rt) ELSE 0 END
                  + CASE WHEN rv IS NOT NULL
                         THEN 1000000000 // ({RRF_K} + rv) ELSE 0 END)
                   AS rrf_micro
          FROM t FULL OUTER JOIN v
            ON t.pair_id = v.pair_id AND t.doc_id = v.doc_id),
    r AS (SELECT pair_id, doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY pair_id
                   ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rnk
          FROM f)
    SELECT pair_id, doc_id, rrf_micro, rnk FROM r WHERE rnk <= {RRF_TOPK}
    """


@register(
    "hybrid_rrf_retrieval",
    oracle=_rrf_oracle(),
    description="Hybrid lexical+vector retrieval via reciprocal rank "
                f"fusion (RRF, k={RRF_K} -- Cormack et al. 2009, the "
                "standard score-free fusion modern RAG/curation "
                "pipelines run over a BM25 list and an ANN list): each "
                "fixture query pairs a BM25 term query with a probe "
                "vector, the two top-k relations FULL-OUTER join on "
                "(query, doc), and the fused score is the exact integer "
                f"sum of 10^9 div ({RRF_K} + rank) contributions -- "
                "rank-only fusion, so the incomparable BM25-micro and "
                "cosine score scales never meet, and integer division "
                "keeps both engines bit-identical. Scale shape: fuses "
                "two ALREADY-top-k relations (queries x k rows each), "
                "so the fusion itself is broadcast-sized at any corpus "
                "size; the cost is the two retrieval legs it composes, "
                "each audited on its own registry row. EXTRAS tier "
                "(driver budget full; same Spark-vs-DuckDB hash check "
                "via the pytest suite).",
    tags=("retrieval", "similarity", "bm25", "ann"),
    driver_slot=False,
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import bm25_topk

    bm = bm25_topk(spark, sf_dir).select(
        F.col("query_id").alias("t_q"), "doc_id",
        F.col("rnk").alias("rt"))
    ann = ann_topk_bruteforce(spark, sf_dir).select(
        F.col("query_id").alias("v_q"),
        F.col("cand_id").alias("doc_id"), F.col("rnk").alias("rv"))
    pairs = spark.createDataFrame(RRF_PAIRS, "pair_id STRING, vec_query BIGINT")
    t = bm.join(F.broadcast(pairs), F.col("t_q") == F.col("pair_id")).select(
        "pair_id", "doc_id", "rt")
    v = ann.join(F.broadcast(pairs), F.col("v_q") == F.col("vec_query")).select(
        "pair_id", "doc_id", "rv")
    f = (
        t.alias("t").join(
            v.alias("v"),
            (F.col("t.pair_id") == F.col("v.pair_id"))
            & (F.col("t.doc_id") == F.col("v.doc_id")),
            "full_outer")
        .select(
            F.coalesce(F.col("t.pair_id"), F.col("v.pair_id")).alias("pair_id"),
            F.coalesce(F.col("t.doc_id"), F.col("v.doc_id")).alias("doc_id"),
            (F.when(F.col("rt").isNotNull(),
                    F.expr(f"1000000000L div ({RRF_K} + rt)")).otherwise(0)
             + F.when(F.col("rv").isNotNull(),
                      F.expr(f"1000000000L div ({RRF_K} + rv)")).otherwise(0)
             ).cast("bigint").alias("rrf_micro"),
        )
    )
    w = W.partitionBy("pair_id").orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    return (
        f.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= RRF_TOPK)
        .select("pair_id", "doc_id", "rrf_micro", "rnk")
    )


# -------------------------------------------- trained-quantizer ANN (r15)
#
# r14 verdict #5: the sign-LSH quantizer's measured recall@3 is 3-5/15
# on this data and the kmeans rescue (recall@5 = 1.0, every inverted
# list < 30% of the corpus) existed only as a pytest microcosm. These
# two functions make the TRAINED coarse quantizer a production option
# with the exact output contract of the sign-LSH siblings, so the same
# recall audit runs against either index.

def ann_topk_trained(
    spark: SparkSession, sf_dir: str, k: int = 16, nprobe: int | None = None,
    max_iters: int = 8, top_k: int = 3,
    centroids: list[list[int]] | None = None,
    fit_fraction: float | str | None = "auto",
) -> DataFrame:
    """IVF top-k with a TRAINED coarse quantizer: k-means centroids
    (operators/kmeans.py, integer-exact Lloyd) replace the sign-pattern
    buckets; probes fan out to their ``nprobe`` nearest centroids (the
    IVF recall/cost knob — the trained analog of the sign path's
    Hamming-ball multi-probe) and candidates come from a broadcast
    equi-join on the cluster id, ranked by the exact integer cosine.
    Same (query_id, cand_id, rnk, cos6) contract as ``ann_topk_ivf``.

    ``nprobe=None`` pins the measured default ``max(2, k // 8)``: the
    r16 x100 recall-vs-nprobe sweep (SCALE.md trained-ANN table) put
    the recall knee at ~k/8 lists probed (recall@3 0.867 with sample-
    fit centroids at k=64/nprobe=8, vs 0.467 at nprobe=1), while below
    2 probes recall collapses at every k; candidate volume stays
    ~nprobe/k of the corpus, so the default scans ~12.5%. At k=16 the
    rule reproduces the pre-r16 default of 2 unchanged.

    Pass ``centroids`` to search with a pre-trained index (the
    production shape: train once, search many); otherwise the quantizer
    is fitted here with ``fit_fraction="auto"`` BY DEFAULT — the
    training set caps at FIT_SAMPLE_TARGET (20k) vectors, the measured
    5.8x fit amortization with recall at-or-above full-fit; sub-20k
    corpora (every registry sf) fit in full, unchanged. Pass
    ``fit_fraction=None`` to force a full-corpus fit, or a float to pin
    the sample. Scale note: centroids ride the
    plan as literals, so the assignment stage is a narrow map with k
    distance expressions — fine through k of a few hundred; past that
    the distance map belongs in a Pandas UDF (documented ceiling, same
    class as the kmeans driver-side k x dim model state)."""
    import numpy as np

    from ..operators.kmeans import assign_clusters_batches, fit_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    if centroids is None:
        centroids, _, _ = fit_kmeans(emb, k=k, max_iters=max_iters,
                                     fit_fraction=fit_fraction)
    if nprobe is None:
        # measured default (docstring): knee at ~k/8 probed lists,
        # floor of 2; never more lists than exist
        nprobe = min(len(centroids), max(2, len(centroids) // 8))
    # Arrow-batch assignment on the (big) corpus side: the Column form's
    # k-way when-chain join key sent constraint propagation into a
    # measured 200+ s combinatorial rebuild (see
    # kmeans.assign_clusters_batches); the batch form's cluster column
    # is a plain attribute
    corpus = assign_clusters_batches(
        emb.select("vec_id", qvec().alias("qv")), centroids, "qv"
    ).select(
        F.col("vec_id").alias("cand_id"), F.col("qv").alias("c_qv"),
        qnorm("qv").alias("c_nrm"), "cluster",
    )
    # probe models built DRIVER-side (r17, the ann_topk_pq shape): the
    # probe set is N_QUERIES rows by construction — a bounded
    # model-state collect — so the nprobe-nearest-centroid fanout is
    # one numpy pass instead of k ~200-node _sq_dist Catalyst trees +
    # array_sort/explode + the localCheckpoint barrier those trees
    # forced (the pre-r17 spelling; see probe_clusters for the
    # distributed form ivf_search still uses on unbounded probe sets).
    # The quantized vectors come back from the JVM's own qvec()
    # projection, distances use the pinned exact int64 expansion, and
    # ties break by lowest centroid index (np.lexsort minor key) —
    # identical rows to the old probe relation.
    cmat = np.asarray(centroids, dtype=np.int64)
    probe_rows = emb.select(
        "vec_id", qvec().alias("qv")
    ).where(F.col("vec_id") < N_QUERIES).collect()
    model_rows = []
    for r in sorted(probe_rows, key=lambda r: r["vec_id"]):
        if r["qv"] is None or any(v is None for v in r["qv"]):
            raise ValueError(
                f"ann_topk_trained: probe vector {r['vec_id']} is NULL "
                f"or has NULL elements")
        q = np.asarray(list(r["qv"]), dtype=np.int64)
        d = np.einsum("ij,ij->i", cmat - q, cmat - q)
        order = np.lexsort((np.arange(len(cmat)), d))[:nprobe]
        nrm = int(q @ q)
        for c in order:
            model_rows.append(
                ([int(v) for v in q], int(c), int(r["vec_id"]), nrm))
    probes = spark.createDataFrame(
        model_rows,
        "p_qv ARRAY<BIGINT>, cluster INT, query_id BIGINT, p_nrm BIGINT",
    )
    # corpus rows carry ONE (argmin) cluster and a probe's nprobe
    # clusters are distinct, so each (query, cand) pair joins at most
    # once — no dedup stage needed
    pairs = corpus.join(F.broadcast(probes), "cluster").where(
        F.col("cand_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", "cand_id",
        cosine(dot("p_qv", "c_qv"), F.col("p_nrm"), F.col("c_nrm"))
        .alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= top_k)
        .select("query_id", "cand_id", "rnk",
                (F.floor(F.col("cos") * 1e6 + 0.5) / 1e6).alias("cos6"))
    )


# ------------------------------------------------------- IVF-PQ (r17)
#
# r16 verdict #1: the trained IVF still ranked candidates on raw
# int-quantized embeddings — at 100 TB the corpus VECTORS are the
# memory/IO wall (512 B/row at dim 64). IVF-PQ stores M-byte-scale
# residual codes instead and scans those, with an exact re-rank of the
# short list. operators/pq.py holds the model ops; this is the search
# plan.

#: shortlist = PQ_SHORTLIST_MULT * top_k candidates survive the ADC
#: scan into the exact re-rank — the standard IVF-PQ refinement budget
#: knob (FAISS IndexRefineFlat's k_factor). MEASURED at sf0.1 (n=2000,
#: k=16): with ksub=256 codes, mult=16 recovers the uncompressed
#: trained path's recall@3 exactly at nprobe 2 AND 4 (9/15 and 10/15)
#: where mult=4 dropped one true neighbor; a 48-row re-rank fetch per
#: probe is noise at any corpus size, so the default buys the recall.
PQ_SHORTLIST_MULT = 16


def ann_topk_pq(
    spark: SparkSession, sf_dir: str, k: int = 16, nprobe: int | None = None,
    m: int = 8, ksub: int = 256, max_iters: int = 8, top_k: int = 3,
    shortlist_mult: int = PQ_SHORTLIST_MULT,
    centroids: list[list[int]] | None = None,
    codebooks: list[list[list[int]]] | None = None,
    index: DataFrame | None = None,
    fit_fraction: float | str | None = "auto",
) -> DataFrame:
    """IVF-PQ top-k: the trained-quantizer ANN path with a PRODUCT-
    QUANTIZED index (operators/pq.py — Jégou et al. 2011, the FAISS
    IVFPQ shape). Same (query_id, cand_id, rnk, cos6) contract as
    ``ann_topk_trained``; differs in WHAT the probed lists scan:

    1. the index relation is (cand_id, cluster, M codes) — residual
       codes, no vectors; at dim 64 / m=8 that is 8 smallint codes + an
       int vs 512 bytes of raw vector, the ~20-50x memory/IO win that
       makes a 100 TB corpus scannable;
    2. each probe carries its ADC model ON THE JOIN ROW (base_dot for
       the probed cluster + the M x ksub lookup table as an array
       literal): the candidate score
       ``base_dot + sum_s lut[s][code_s] = dot(q, reconstruction)`` is
       ONE Catalyst ``aggregate(transform(codes, ...))`` expression —
       exact int64, whole-stage-codegen, zero Python in the scan;
    3. the top ``shortlist_mult * top_k`` per probe by (ADC desc,
       cand_id) are re-ranked EXACTLY: one broadcast join fetches their
       raw vectors and the true integer cosine orders the final top-k —
       ADC approximation decides membership only, never the reported
       ranks or cos6 values.

    Training is corpus-size-independent: the coarse quantizer fits on
    the r16 auto-sample and the codebooks on fit_pq's h60-deterministic
    <= 20k sample. Pass ``centroids``/``codebooks`` to search with
    pre-trained models (train once, search many; save_centroids/
    save_pq persist them), and ``index`` to search a PRE-ENCODED
    (vec_id, cluster, codes) relation — the full production shape,
    where the encode pass ran once at ingest and each search scans the
    stored codes directly (at 100 TB the encoded index is what lives
    on disk; re-encoding per query would scan the raw vectors the
    index exists to avoid). The probe side
    (N_QUERIES rows) is collected driver-side to build the ADC models —
    a probe-set-sized collect, the documented model-state contract.

    Defaults are MEASURED (sf0.1 sweep, r17): ``ksub=256`` — the
    classical 8-bit PQ codebook — closed most of the gap 4-bit codes
    left to the uncompressed path (8/15 vs 4/15 recall@3 at nprobe=2,
    shortlist_mult=4), and ``PQ_SHORTLIST_MULT=16`` closed the rest
    (recall@3 equal to ann_topk_trained at every swept nprobe); the
    on-disk index measured 33x smaller than the raw quantized vectors
    at m=8 (parquet-encoded, SCALE.md)."""
    import numpy as np

    from ..operators.kmeans import fit_kmeans
    from ..operators.pq import adc_tables, encode_pq, fit_pq

    emb = load_table(spark, sf_dir, "embeddings")
    qvecs = emb.select("vec_id", qvec().alias("qv"))
    fit_sample = None
    if centroids is None:
        # return_sample (r17): when the auto-fit's capped probe proves
        # the clean corpus fits under FIT_SAMPLE_TARGET, the collected
        # rows are the complete clean relation — fit_pq trains on the
        # same deterministic sample, so handing it the rows saves its
        # TakeOrdered corpus collect (one Spark job per composed fit;
        # codebooks bit-identical, pinned in tests/test_similarity.py).
        centroids, _, _, fit_sample = fit_kmeans(
            emb, k=k, max_iters=max_iters, fit_fraction=fit_fraction,
            return_sample=True)
    if codebooks is None:
        codebooks = fit_pq(qvecs, centroids, m=m, ksub=ksub,
                           max_iters=max_iters, sample_rows=fit_sample)
    if nprobe is None:
        # the ann_topk_trained measured default: knee at ~k/8 lists
        nprobe = min(len(centroids), max(2, len(centroids) // 8))
    elif not 1 <= nprobe <= len(centroids):
        # mirror probe_clusters' guard: nprobe=0 would silently return
        # an EMPTY result (no probe model rows) and a negative value
        # would silently probe k-|nprobe| lists via the [:nprobe] slice
        raise ValueError(
            f"ann_topk_pq: nprobe must be in [1, {len(centroids)}], "
            f"got {nprobe}")
    if index is None:
        index = encode_pq(qvecs, centroids, codebooks)
    else:
        missing = {"vec_id", "cluster", "codes"} - set(index.columns)
        if missing:
            raise ValueError(
                f"ann_topk_pq: pre-encoded index is missing {sorted(missing)}")

    # probe models: nprobe nearest centroids per probe (the
    # probe_clusters (dist, idx) tie rule, in numpy: lexsort minor key
    # = centroid index) + per-(probe, cluster) ADC rows. N_QUERIES
    # vectors collected — bounded by the probe set, not the corpus.
    cmat = np.asarray(centroids, dtype=np.int64)
    probe_rows = qvecs.where(F.col("vec_id") < N_QUERIES).collect()
    model_rows = []
    rerank_rows = []
    for r in sorted(probe_rows, key=lambda r: r["vec_id"]):
        if r["qv"] is None or any(v is None for v in r["qv"]):
            # the fit_kmeans dirty-row discipline: a NULL probe vector
            # is the caller's skip case, not an opaque numpy cast error
            raise ValueError(
                f"ann_topk_pq: probe vector {r['vec_id']} is NULL or "
                f"has NULL elements")
        q = np.asarray(list(r["qv"]), dtype=np.int64)
        d = np.einsum("ij,ij->i", cmat - q, cmat - q)
        order = np.lexsort((np.arange(len(cmat)), d))[:nprobe]
        base, lut = adc_tables([int(v) for v in q], centroids, codebooks)
        for c in order:
            model_rows.append(
                (int(r["vec_id"]), int(c), int(base[c]), lut))
        # the exact-re-rank probe relation, from the SAME collected rows
        # (r18): qqe is the JVM's own qvec() projection handed back
        # verbatim and qnrm its exact int64 self-dot — identical values
        # to the pre-r18 `base_rel.where(vec_id < N_QUERIES)` subtree,
        # which cost one more corpus scan per run just to rebuild rows
        # this collect already fetched
        rerank_rows.append(
            (int(r["vec_id"]), [int(v) for v in q], int(q @ q)))
    probes = spark.createDataFrame(
        model_rows,
        "query_id BIGINT, cluster INT, base_dot BIGINT, "
        "lut ARRAY<ARRAY<BIGINT>>",
    )
    # the ADC scan: equi-join on cluster (hash-partitionable; probes
    # broadcast), score = one codegen'd aggregate over the codes array.
    # transform's 2-arg lambda supplies the subspace index s; +1s are
    # 1-based element_at.
    adc = F.expr(
        "base_dot + aggregate(transform(codes, (c, s) -> "
        "element_at(element_at(lut, s + 1), CAST(c AS INT) + 1)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    cand = (
        index.join(F.broadcast(probes), "cluster")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"),
                adc.alias("adc"))
    )
    sw = W.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("cand_id"))
    short = (
        cand.withColumn("srnk", F.row_number().over(sw))
        .where(F.col("srnk") <= shortlist_mult * top_k)
        .select("query_id", "cand_id")
    )
    # exact re-rank: fetch the shortlist's raw vectors (broadcast join —
    # queries x shortlist rows against the corpus scan) and order by the
    # true integer cosine, the shared exactness contract. The probe side
    # is a literal relation from the collected probe rows (r18) — the
    # ann_topk_trained shape — instead of a third corpus scan whose
    # pushed vec_id filter re-fetched the same N_QUERIES rows.
    base_rel = qvecs.withColumn("nrm", qnorm("qv"))
    probes_rel = spark.createDataFrame(
        rerank_rows, "query_id BIGINT, qqe ARRAY<BIGINT>, qnrm BIGINT")
    fetched = (
        base_rel.join(F.broadcast(short),
                      base_rel["vec_id"] == short["cand_id"])
        .join(F.broadcast(probes_rel), "query_id")
    )
    scored = fetched.select(
        "query_id", "cand_id",
        cosine(dot("qqe", "qv"), F.col("qnrm"), F.col("nrm")).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= top_k)
        .select("query_id", "cand_id", "rnk",
                (F.floor(F.col("cos") * 1e6 + 0.5) / 1e6).alias("cos6"))
    )


@register(
    "ann_pq_recall",
    oracle=None,  # iterative k-means + PQ codebook training is outside
                  # the SQL-oracle contract (the kmeans/ann_trained
                  # precedent) — rows-only check; exactness of the
                  # arithmetic is pinned by tests/test_similarity.py
                  # (numpy replica + determinism + recall floor)
    description="Recall audit of the IVF-PQ path (ann_topk_pq: trained "
                "coarse quantizer, product-quantized residual codes, "
                "JVM-side ADC scan, exact shortlist re-rank) against "
                "the brute-force ground truth — the ann_trained_recall "
                "shape applied to the compressed index, quantifying "
                "what the ~20-50x index shrink costs in recall@3 as a "
                "relation. Rows-only (no SQL oracle: Lloyd + codebook "
                "training are iterative); pytest pins PQ n_both against "
                "the uncompressed trained path on the same corpus and "
                "the scale sweep measures recall and compression at "
                "x100 (SCALE.md).",
    tags=("similarity", "ann", "validation", "pq"),
    driver_slot=False,
)
def ann_pq_recall(
    spark: SparkSession, sf_dir: str,
    centroids: list[list[int]] | None = None,
    codebooks: list[list[list[int]]] | None = None,
    nprobe: int | None = None,
    shortlist_mult: int = PQ_SHORTLIST_MULT,
) -> DataFrame:
    return recall_audit(
        ann_topk_pq(
            spark, sf_dir, centroids=centroids, codebooks=codebooks,
            nprobe=nprobe, shortlist_mult=shortlist_mult,
        ),
        ann_topk_bruteforce_df(spark, sf_dir),
        "pq",
    )


@register(
    "ann_pq_indexed_search",
    oracle=None,  # iterative k-means + PQ training (the ann_pq_recall
                  # precedent) — rows-only; arithmetic exactness is
                  # pinned by tests/test_similarity.py
    description="IVF-PQ search over a MATERIALIZED index — the r17 "
                "verdict's requested benchmark variant of the"
                " production shape (encode once at ingest, search the"
                " stored codes): the build fits the coarse quantizer"
                " and codebooks, encodes the corpus, EAGERLY"
                " checkpoints the (cand_id, cluster, codes) relation,"
                " and hands it to ann_topk_pq via the existing"
                " ``index=`` path, so the search plan scans stored"
                " codes instead of a live encode subtree. Every build"
                " still re-fits and re-encodes from the parquet inputs"
                " (no cross-run caching — the checkpoint lives and"
                " dies with the build); what the row isolates in the"
                " series is the search-over-stored-codes shape vs"
                " ann_pq_recall's recompute-per-reference plan plus"
                " audit join. Results are ann_topk_pq's own (same"
                " models, same search), pinned by the saved-index"
                " equality test.",
    tags=("similarity", "ann", "pq"),
    driver_slot=False,
)
def ann_pq_indexed_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kmeans import fit_kmeans
    from ..operators.pq import encode_pq, fit_pq

    emb = load_table(spark, sf_dir, "embeddings")
    qvecs = emb.select("vec_id", qvec().alias("qv"))
    centroids, _, _, sample = fit_kmeans(
        emb, k=16, max_iters=8, fit_fraction="auto", return_sample=True)
    codebooks = fit_pq(qvecs, centroids, m=8, ksub=256, max_iters=8,
                       sample_rows=sample)
    index = encode_pq(qvecs, centroids, codebooks).localCheckpoint(
        eager=True)
    return ann_topk_pq(spark, sf_dir, centroids=centroids,
                       codebooks=codebooks, index=index)


@register(
    "ann_trained_recall",
    oracle=None,  # iterative k-means training is outside the SQL-oracle
                  # contract (the documented kmeans/semdedup_kmeans
                  # precedent) — rows-only check; the recall CLAIM is
                  # pinned by tests/test_similarity.py against the
                  # sign-LSH audit on the same corpus
    description="Recall audit of the TRAINED-quantizer ANN path "
                "(ann_topk_trained: k-means centroids, nprobe nearest-"
                "centroid multi-probe) against the brute-force ground "
                "truth — the ann_ivf_recall shape applied to the "
                "learned index, quantifying what training buys over the "
                "sign-LSH buckets (measured 3-5/15 recall@3) as a "
                "relation. Rows-only (no SQL oracle: Lloyd iterations "
                "are iterative model training); the pytest suite "
                "asserts trained n_both >= sign-LSH n_both on the same "
                "corpus and the scale sweep measures its x100 cost.",
    tags=("similarity", "ann", "validation", "kmeans"),
    driver_slot=False,
)
def ann_trained_recall(
    spark: SparkSession, sf_dir: str,
    centroids: list[list[int]] | None = None,
) -> DataFrame:
    return recall_audit(
        ann_topk_trained(spark, sf_dir, centroids=centroids),
        ann_topk_bruteforce_df(spark, sf_dir),
        "trained",
    )

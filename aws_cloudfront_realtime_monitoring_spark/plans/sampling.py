"""Deterministic sampling operators (training-data-pipeline extensions):
hash-based stratified sampling for train/eval splits and per-stratum
down-sampling.

Random sampling (``df.sample``) is not reproducible across engines, retries,
or partitionings, so the sampler keys on the engine-portable md5-derived
h60 hash of the row id: a row is in the sample iff
``h60(doc_id) mod 1000 < rate_per_mille[stratum]``. That makes the sample

- a pure narrow map (no shuffle, no state, embarrassingly parallel),
- stable under re-partitioning, retries, and at-least-once replay, and
- consistent across engines -- the DuckDB oracle computes the identical
  predicate, so the driver hash-checks the exact sampled row set.

The same construction is what a 100 TB pipeline wants: the sample decision
rides with the row (any executor can evaluate it), and upstream operators
can push it down to the scan.

Micro-quantization caveat (applies here and to the ln/idf scores in
plans/text.py): the ``floor(f(x) * 1e6 + 0.5)`` discipline is bit-exact
across engines only for +,-,*,/,sqrt, where IEEE 754 mandates correct
rounding. ``pow`` and ``ln`` are library functions (Java Math is 1-ulp
accurate, libm is correctly rounded), so a value landing within ~1 ulp of
a .5 micro-unit boundary could quantize to adjacent integers on the two
engines. The exposure is one double per (language|term), not per row,
and a boundary hit needs the function value within ~2^-52 relative of an
exact .5e-6 grid point -- never observed across the fixture sweeps, and a
hit would surface loudly as a driver hash mismatch, not silently. The
fully-robust alternative (rational-only scoring) would forfeit the
mT5/BM25 formulas' standard form; this trade is documented rather than
hidden.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h60, h60_sql
from ..sources.tables import load_table
from . import register
from .text import _WORDS_SQL, words_col, words_spark_sql

#: per-language keep rates in per-mille (training mix: downsample the
#: majority language, keep more of the rare ones)
STRATA_RATES = {"en": 250, "es": 500, "fr": 500, "de": 750, "zh": 750}
#: rate for languages not listed above
DEFAULT_RATE = 100


def _case_sql(col: str, mapping: dict, default) -> str:
    """dict -> CASE expression (the one spelling; _case_col is its
    Column twin -- previously two copy-pasted pairs, r8 review). An
    EMPTY mapping degrades to the bare default: a WHEN-less CASE is a
    SQL syntax error, and the Column twin's fold crashed on
    None.otherwise (r13 review -- "uniform default only" is a
    configuration the module docstrings invite)."""
    if not mapping:
        return str(default)
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in mapping.items())
    return f"CASE {col} {whens} ELSE {default} END"


def _case_col(col: str, mapping: dict, default) -> Column:
    if not mapping:
        return F.lit(default)
    expr = None
    for k, v in mapping.items():
        branch = (F.col(col) == k, F.lit(v))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    return expr.otherwise(F.lit(default))


def _rate_case_sql() -> str:
    return _case_sql("lang", STRATA_RATES, DEFAULT_RATE)


def _rate_col() -> Column:
    return _case_col("lang", STRATA_RATES, DEFAULT_RATE)


@register(
    "sample_stratified",
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id, lang, n_chars,
             {_rate_case_sql()} AS rate_per_mille,
             {h60_sql("CAST(doc_id AS VARCHAR)")} % 1000 AS bucket
      FROM documents)
    SELECT doc_id, lang, n_chars, rate_per_mille, bucket
    FROM tagged
    WHERE bucket < rate_per_mille
    """,
    description="Deterministic stratified sample: per-language keep rates "
                "(per-mille), membership decided by h60(doc_id) mod 1000 -- "
                "a pure narrow map with no shuffle that is reproducible "
                "across engines, retries, and partitionings (unlike "
                "df.sample). The predicate is scan-pushable; at 100 TB the "
                "sample never materializes the rejected rows. The driver "
                "hash-checks the exact sampled row set against the "
                "identical DuckDB predicate.",
    tags=("sampling",),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(h60(F.col("doc_id").cast("string")), F.lit(1000))
    return (
        docs.select(
            "doc_id", "lang", "n_chars",
            _rate_col().alias("rate_per_mille"),
            bucket.alias("bucket"),
        )
        .where(F.col("bucket") < F.col("rate_per_mille"))
    )


# ------------------------------------------------------ domain_mix_tokens

#: target token budget per source domain (uniform default + overrides —
#: the "data mixture" a training run specifies, e.g. upweight curated
#: sources, cap web crawl)
MIX_DEFAULT_BUDGET = 800
MIX_BUDGET_OVERRIDES = {"src0": 400, "src1": 1200, "src2": 0}

# derived from text.py's ONE word-split fragment (r11 review: this was
# a re-spelling that had to track _WORDS_SQL byte-for-byte)
_TOKENS_SQL = f"len({_WORDS_SQL})"


def _budget_case_sql() -> str:
    return _case_sql("source", MIX_BUDGET_OVERRIDES, MIX_DEFAULT_BUDGET)


def _budget_col() -> Column:
    return _case_col("source", MIX_BUDGET_OVERRIDES, MIX_DEFAULT_BUDGET)


@register(
    "domain_mix_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST({_TOKENS_SQL} AS BIGINT) AS n_tokens,
             {h60_sql("CAST(doc_id AS VARCHAR)")} AS h
      FROM documents),
    runn AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM toks)
    SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM runn
    WHERE cum_tokens <= {_budget_case_sql()} AND n_tokens > 0
    """,
    description="Domain mixing to a per-source token budget -- the data-"
                "mixture step of a training pipeline (cap web crawl, "
                "upweight curated sources, zero out excluded ones). Docs "
                "are taken per source in deterministic h60(doc_id) order "
                "until the running token total fills that source's "
                "budget: one window shuffle on source, reproducible "
                "across engines/retries/partitionings (same guarantees "
                "as sample_stratified), and the greedy prefix is "
                "well-defined because the running sum is monotone; "
                "zero-token docs are excluded outright (r13: they cost "
                "no budget, so the cum <= budget cut alone kept them "
                "even from a zero-budget source). "
                "Verified Spark-vs-DuckDB by the test suite outside the "
                "50-row driver budget (driver_slot=False).",
    tags=("sampling", "curation"),
    driver_slot=False,
)
def domain_mix_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(words_col()).cast("bigint").alias("n_tokens"),
        h60(F.col("doc_id").cast("string")).alias("h"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        # n_tokens > 0: a zero-token (empty/whitespace) doc costs no
        # budget, so `cum <= budget` alone kept it even from a
        # ZERO-budget source -- and both engines agreed, so the oracle
        # hash could never catch the leak (r13 review). Empty docs
        # carry nothing a training mix wants; exclude them everywhere.
        .where((F.col("cum_tokens") <= _budget_col())
               & (F.col("n_tokens") > 0))
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


# ------------------------------------------------ lang_temperature_sample

#: temperature exponent for language-balanced sampling (the mT5/XLM-R
#: mixing rule: sample language l with probability proportional to
#: (n_l/N)^ALPHA, flattening the head and boosting the tail)
TEMP_ALPHA = 0.7
#: global budget: target the sample at half the corpus size
TEMP_BUDGET_FRAC = 0.5

#: the probability computation, written ONCE and used verbatim by both
#: engines (identical expression order => identical IEEE doubles; the
#: micro-quantized floor makes the compared value an exact BIGINT, the
#: same discipline as text_tfidf_topk's idf)
_TEMP_P_SQL = (
    f"LEAST(1000000, CAST(floor({TEMP_BUDGET_FRAC} * n"
    " * (CAST(w_micro AS DOUBLE) / CAST(z_micro AS DOUBLE))"
    " / n_l * 1e6 + 0.5) AS BIGINT))"
)
#: per-language weight, micro-quantized to BIGINT at 1e12 BEFORE the
#: normalizer sum: SUM over raw doubles is summation-order-dependent
#: (measured: the 120 orders of the sf0.1 weights produce 3 distinct z
#: doubles), and both engines' aggregation orders are unspecified -- an
#: ulp of z near a .5 boundary would flip p_micro (r8 review). Integer
#: sums are order-free; the quantization error (1e-12 per weight) is
#: ~1e6 times smaller than the p_micro resolution.
_TEMP_W_SQL = (
    f"CAST(floor(pow(CAST(n_l AS DOUBLE) / n, {TEMP_ALPHA}) * 1e12 + 0.5)"
    " AS BIGINT)"
)


#: histogram statement (corpus scanned ONCE); Spark barriers its tiny
#: result so the downstream probability algebra never re-derives it
_TEMP_HIST_SQL = (
    "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l FROM documents GROUP BY lang"
)


def _temp_p_sql(hist: str) -> str:
    """Per-language keep probability from a (lang, n_l) histogram relation."""
    return f"""
    WITH tot AS (SELECT CAST(SUM(n_l) AS DOUBLE) AS n FROM {hist}),
    w AS (SELECT lang, n_l, {_TEMP_W_SQL} AS w_micro
          FROM {hist} CROSS JOIN tot),
    z AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS z_micro FROM w)
    SELECT lang, {_TEMP_P_SQL} AS p_micro
    FROM w CROSS JOIN z CROSS JOIN tot
    """


def _temp_join_sql(p_rel: str, h60_doc: str) -> str:
    """Corpus join + keep decision over a (lang, p_micro) relation."""
    return f"""
    SELECT d.doc_id, d.lang, p.p_micro,
           CAST(CASE WHEN {h60_doc} % 1000000 < p.p_micro
                THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM documents d JOIN ({p_rel}) p ON d.lang = p.lang
    """


def _temp_sql(h60_doc: str) -> str:
    """The full temperature-sampling statement (single-statement form, used
    by the DuckDB oracle and oracle-composition callers); ``h60_doc`` is
    the engine's spelling of h60(doc_id), the only dialect-divergent
    fragment."""
    return _temp_join_sql(_temp_p_sql(f"({_TEMP_HIST_SQL})"), h60_doc)


@register(
    "lang_temperature_sample",
    oracle=_temp_sql(h60_sql("CAST(doc_id AS VARCHAR)")),
    description=f"Language-balanced temperature sampling (the mT5/XLM-R "
                f"mixing rule, alpha={TEMP_ALPHA}): per-language keep "
                "probabilities proportional to (n_l/N)^alpha, scaled to a "
                f"{TEMP_BUDGET_FRAC:.0%}-of-corpus budget and capped at 1 "
                "(rare languages keep everything, the majority language "
                "downsamples), membership decided by the deterministic "
                "h60(doc_id) threshold. The language histogram is a "
                "map-side-combined aggregate of ~10^2 rows that BROADCASTS "
                "back onto the corpus; the keep decision is then a pure "
                "narrow map -- reproducible across engines, retries, and "
                "partitionings. Probabilities are micro-quantized BIGINTs "
                "(identical formula text in both engines -> identical IEEE "
                "doubles -> exact comparison under the hash check).",
    tags=("sampling", "curation"),
    driver_slot=False,
)
def lang_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    # barrier the ~10^2-row histogram: SQL CTE inlining would otherwise
    # re-derive it for every downstream reference -- the plan audit showed
    # SIX corpus scans for what needs exactly two (histogram + final join)
    hist = spark.sql(_TEMP_HIST_SQL).localCheckpoint(eager=False)
    hist.createOrReplaceTempView("lang_hist_tmp")
    from ..functions.hashing import h60_spark_sql

    spark_h60 = h60_spark_sql("CAST(doc_id AS STRING)")
    return spark.sql(_temp_join_sql(_temp_p_sql("lang_hist_tmp"), spark_h60))


# --------------------------------------------------------- curriculum_stages

#: curriculum stages: quartiles of the difficulty proxy (token count) --
#: shorter docs first is the classic length-based curriculum
CURRICULUM_STAGES = 4


def _curriculum_sql(split_len_expr: str, hist_rel: str | None = None) -> str:
    """Stage assignment via exact rank-quantile boundaries, identical in
    both engines. No global row_number (a single-partition window at
    scale): boundaries come from the cumulative histogram of the TINY
    score domain (~10^2 distinct token counts), then broadcast back as
    `stage = count of boundaries strictly below my score`. Ties share a
    stage by construction -- deterministic under any partitioning.

    ``hist_rel``: a pre-materialized (score, c) histogram. Without it the
    hist CTE inlines into each consumer and the corpus re-scans per
    reference (audit: 4 scans); the Spark builder passes a checkpointed
    view so the corpus scans exactly twice (histogram + final map)."""
    k = CURRICULUM_STAGES
    quarts_rows = " UNION ALL ".join(
        f"SELECT {q} AS q" if q == 1 else f"SELECT {q}"
        for q in range(1, k)
    )
    hist_cte = (
        f"hist AS (SELECT * FROM {hist_rel})"
        if hist_rel
        else "hist AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS c"
             " FROM scored GROUP BY score)"
    )
    return f"""
    WITH scored AS (
      SELECT doc_id, CAST({split_len_expr} AS BIGINT) AS score FROM documents),
    {hist_cte},
    cum AS (
      SELECT score, SUM(c) OVER (ORDER BY score
                                 ROWS UNBOUNDED PRECEDING) AS cum_c
      FROM hist),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM hist),
    bounds AS (
      SELECT q, MIN(score) AS boundary
      FROM cum CROSS JOIN n,
           -- stage boundaries 1..k-1 derived from the constant
           -- (a frozen 1..3 list silently kept producing QUARTILE
           -- boundaries for any other CURRICULUM_STAGES, r8 review)
           ({quarts_rows}) quarts
      WHERE cum_c * {k} >= q * n_total
      GROUP BY q)
    SELECT s.doc_id, s.score,
           CAST((SELECT COUNT(*) FROM bounds b WHERE s.score > b.boundary)
                AS BIGINT) AS stage
    FROM scored s
    """


@register(
    "curriculum_stages",
    oracle=_curriculum_sql(_TOKENS_SQL),
    description=f"Length-based curriculum staging: every document lands in "
                f"one of {CURRICULUM_STAGES} rank-quartile stages of its "
                "token count (shortest first -- the classic curriculum "
                "order). Scale-correct by construction: NO global "
                "row_number/ntile (a single-partition window at 100 TB); "
                "stage boundaries derive from the cumulative histogram of "
                "the tiny score domain and broadcast back as three "
                "comparisons, so the assignment is a narrow map and ties "
                "deterministically share a stage under any partitioning. "
                "Verified by the test suite outside the 50-row driver "
                "budget (driver_slot=False).",
    tags=("sampling", "curation", "curriculum"),
    driver_slot=False,
)
def curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    score = f"size({words_spark_sql()})"  # the ONE tokenizer spelling
    hist = spark.sql(f"""
        SELECT CAST({score} AS BIGINT) AS score,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1
    """).localCheckpoint(eager=False)
    hist.createOrReplaceTempView("curriculum_hist_tmp")
    return spark.sql(_curriculum_sql(score, hist_rel="curriculum_hist_tmp"))

"""Training-data curation operators (driver-mandated LLM-pipeline
extensions): PII redaction and benchmark decontamination.

Both are standard stages of a production pre-training pipeline (the same
family as the dedup/quality operators in ``plans.dedup`` / ``plans.text``):

- **pii_redact**: scrub emails / phone numbers / IPv4 addresses before any
  text ships to training, and count what was scrubbed for audit. Pure
  Catalyst ``regexp_count`` + chained ``regexp_replace`` — a narrow map
  with ZERO shuffles whose predicates the scan can pipeline; at 100 TB
  this is a pass-through transform, never a join or aggregation.
- **decontaminate**: flag corpus documents that share word n-grams with a
  held-out benchmark set (test-set contamination removal, as described for
  public corpora such as C4/Dolma: n-gram overlap against the eval
  suites). The corpus side stays a narrow map (split + n-gram arrays built
  with ``zip_with``, exploded map-side); the benchmark n-gram set is tiny
  by construction (eval suites are ~10^5 n-grams vs 10^12 corpus rows) and
  BROADCASTS, so the only shuffle is the per-doc count of the (rare)
  matches — at 100 TB, shuffle volume ~ contamination volume, not corpus
  volume. Past broadcast size the same plan runs as a shuffle join
  unchanged.

The synthetic documents contain no real PII, so ``pii_redact``'s query
row deterministically plants PII derived from ``doc_id`` (identically in
Spark and the DuckDB oracle) before scrubbing — the operator's logic runs
on real strings flowing through the engine, and the hash check proves the
Java-regex and RE2 engines agree on every match and replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import register
from .text import _WORDS_SQL, adjacent_grams, words_col

# ------------------------------------------------------------- pii_redact

#: PII patterns, written to the common subset of Java regex (Spark) and
#: RE2 (DuckDB): character classes, bounded quantifiers, \b word
#: boundaries — no backrefs, no lookaround (RE2 has neither)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
IP_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

#: redaction order: emails first (their digits could otherwise feed the
#: numeric patterns), then phones, then IPs — the IP pattern must run last
#: because it is the loosest
REDACTIONS = [(EMAIL_RE, "[EMAIL]"), (PHONE_RE, "[PHONE]"), (IP_RE, "[IP]")]


def redact_pii(col: Column) -> Column:
    """Chained global regexp_replace over the three PII patterns."""
    out = col
    for pat, rep in REDACTIONS:
        out = F.regexp_replace(out, pat, rep)
    return out


def _planted_sql() -> str:
    """DuckDB expression for the deterministically planted PII text."""
    return (
        "text"
        " || CASE WHEN doc_id % 2 = 1 THEN ' reach me at user' ||"
        " CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END"
        " || CASE WHEN doc_id % 4 = 0 THEN ' call 555-' ||"
        " CAST(doc_id % 900 + 100 AS VARCHAR) || '-' ||"
        " CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END"
        " || CASE WHEN doc_id % 3 = 0 THEN ' from 10.' ||"
        " CAST(doc_id % 250 AS VARCHAR) || '.' ||"
        " CAST((doc_id // 7) % 250 AS VARCHAR) || '.' ||"
        " CAST(doc_id % 200 + 1 AS VARCHAR) ELSE '' END"
    )


def _planted_col() -> Column:
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    email = F.concat(
        F.lit(" reach me at user"), s(did), F.lit("@mail.example.com")
    )
    phone = F.concat(
        F.lit(" call 555-"), s(did % 900 + 100), F.lit("-"),
        s(did % 9000 + 1000),
    )
    ip = F.concat(
        F.lit(" from 10."), s(did % 250), F.lit("."),
        s(F.expr("(doc_id div 7) % 250")), F.lit("."), s(did % 200 + 1),
    )
    return F.concat(
        F.col("text"),
        F.when(did % 2 == 1, email).otherwise(F.lit("")),
        F.when(did % 4 == 0, phone).otherwise(F.lit("")),
        F.when(did % 3 == 0, ip).otherwise(F.lit("")),
    )


#: the pii_redact batch oracle — also the oracle for the streaming parity
#: row (plans.streaming_equiv.stream_pii_redact_equiv), since a stateless
#: narrow map must produce the identical relation either way
PII_ORACLE_SQL = f"""
    WITH planted AS (
      SELECT doc_id, {_planted_sql()} AS pii_text FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(pii_text, '{EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(pii_text, '{PHONE_RE}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(pii_text, '{IP_RE}')) AS BIGINT)
             AS n_ips,
           regexp_replace(regexp_replace(regexp_replace(pii_text,
             '{EMAIL_RE}', '[EMAIL]', 'g'),
             '{PHONE_RE}', '[PHONE]', 'g'),
             '{IP_RE}', '[IP]', 'g') AS redacted
    FROM planted
    """


def pii_projection(planted: DataFrame) -> DataFrame:
    """The count+redact projection over a (doc_id, pii_text) relation —
    shared by the batch row and the streaming parity row (identical
    expressions in both execution modes)."""
    return planted.select(
        "doc_id",
        F.regexp_count(F.col("pii_text"), F.lit(EMAIL_RE))
        .cast("bigint").alias("n_emails"),
        F.regexp_count(F.col("pii_text"), F.lit(PHONE_RE))
        .cast("bigint").alias("n_phones"),
        F.regexp_count(F.col("pii_text"), F.lit(IP_RE))
        .cast("bigint").alias("n_ips"),
        redact_pii(F.col("pii_text")).alias("redacted"),
    )


@register(
    "pii_redact",
    oracle=PII_ORACLE_SQL,
    description="PII scrub before training: count and redact emails / "
                "phone numbers / IPv4 addresses with patterns valid in "
                "both Java regex and RE2 (no backrefs/lookaround). Pure "
                "narrow map, zero shuffles, whole-stage codegen end to "
                "end. The synthetic corpus has no PII, so the row plants "
                "doc_id-derived PII identically in both engines first: "
                "odd ids get an email, % 4 == 0 a phone, % 3 == 0 an IP, "
                "and ids = 2 mod 4 with % 3 != 0 get none — so multi-hit, "
                "single-hit, and untouched documents are all exercised "
                "and hash-checked.",
    tags=("text", "curation"),
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select("doc_id", _planted_col().alias("pii_text"))
    return pii_projection(planted)


# ---------------------------------------------------------- decontaminate

#: word n-gram length for overlap detection (C4/Dolma-style pipelines use
#: 8-13 token n-grams on natural text; 4 fits this corpus' ~50-word docs
#: while keeping random collisions near zero)
DECON_N = 4
#: benchmark membership: every 13th doc stands in for a held-out eval set
DECON_MOD = 13
#: docs sharing at least this many distinct benchmark n-grams are flagged
#: as contaminated (1-2 shared grams can be phrase coincidence; sustained
#: overlap is a leaked eval document)
DECON_FLAG_MIN = 3

_G4_SQL = (
    "list_distinct(list_transform(range(1, len(ws) - 2), "
    "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))"
)


@register(
    "decontaminate",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    g AS (
      SELECT doc_id, {_G4_SQL} AS gg FROM w),
    ex AS (SELECT doc_id, unnest(gg) AS ng FROM g),
    bn AS (SELECT DISTINCT ng FROM ex WHERE doc_id % {DECON_MOD} = 0)
    SELECT ex.doc_id,
           CAST(count(*) AS BIGINT) AS shared_ngrams,
           CAST(CASE WHEN count(*) >= {DECON_FLAG_MIN} THEN 1 ELSE 0 END
                AS BIGINT) AS flagged
    FROM ex JOIN bn USING (ng)
    WHERE ex.doc_id % {DECON_MOD} <> 0
    GROUP BY ex.doc_id
    """,
    description="Benchmark decontamination: corpus docs sharing distinct "
                "word 4-grams with a held-out benchmark set (docs with "
                "doc_id % 13 == 0 stand in for an eval suite) are "
                "reported with their overlap count and a flagged bit at "
                ">= 3 shared grams. Corpus side is a narrow map (split + "
                "zip_with n-grams, exploded map-side); the benchmark "
                "n-gram set broadcasts (eval suites are tiny vs a 100 TB "
                "corpus), so the broadcast join filters on the map side "
                "and only MATCHED (doc, gram) rows — contamination "
                "volume, not corpus volume — shuffle into the per-doc "
                "count.",
    tags=("text", "curation", "dedup"),
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", words_col().alias("ws"))
    g = w.select(
        "doc_id", F.array_distinct(adjacent_grams(F.col("ws"), DECON_N)).alias("gg")
    )
    is_bench = F.col("doc_id") % DECON_MOD == 0
    bench_ngrams = (
        g.where(is_bench).select(F.explode("gg").alias("ng")).distinct()
    )
    corpus = g.where(~is_bench).select(
        "doc_id", F.explode("gg").alias("ng")
    )
    shared = F.count("*").cast("bigint")
    return (
        corpus.join(F.broadcast(bench_ngrams), "ng")
        .groupBy("doc_id")
        .agg(
            shared.alias("shared_ngrams"),
            F.when(shared >= DECON_FLAG_MIN, 1).otherwise(0)
            .cast("bigint").alias("flagged"),
        )
    )

r"""Text-analysis operators over the ``documents`` table (driver-mandated
training-data-pipeline extensions): token counting, language-ID heuristic,
quality scoring, winnowing fingerprints.

All hot-path logic is built-in Catalyst array/string expressions (no Python
UDFs): per-document work is a narrow map over the corpus, so the operators
scale embarrassingly -- no shuffle except the final (tiny) aggregations.
Hashing uses the engine-portable md5-derived h60 (functions.hashing) so every
query has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h60_sql
from ..sources.tables import load_table
from . import register

#: BPE-ish token pattern: letter runs, digit runs, single non-alnum glyphs
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "was", "a"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"],
}
#: deterministic tie-break priority
LANG_ORDER = ["en", "es", "fr", "de"]


def words_col(col: str = "text") -> Column:
    return F.filter(F.split(F.col(col), r"\s+"), lambda w: w != F.lit(""))


_WORDS_SQL = "list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')"


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len({_WORDS_SQL}) AS n_ws_tokens,
           len(regexp_extract_all(text, '{BPE_RE}')) AS n_bpe_tokens,
           length(text) AS n_chars
    FROM documents
    """,
    description="Token counting: whitespace tokens + BPE-ish regex tokens "
                "(letter runs / digit runs / punctuation glyphs). Pure "
                "codegen'd string ops, embarrassingly parallel.",
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(words_col()).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_RE), 0)).cast("bigint").alias("n_bpe_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


def _lang_score_sql(lang: str) -> str:
    arr = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({_WORDS_SQL}, w -> list_contains([{arr}], w)))"


def _langid_case_sql() -> str:
    # argmax with fixed priority order (ties resolve to the earlier language)
    best = "GREATEST(" + ", ".join(f"s_{l}" for l in LANG_ORDER) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'unknown' "
    for l in LANG_ORDER:
        case += f"WHEN s_{l} = {best} THEN '{l}' "
    return case + "END"


@register(
    "text_langid",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {", ".join(f"{_lang_score_sql(l)} AS s_{l}" for l in LANG_ORDER)}
      FROM documents)
    SELECT doc_id, lang AS labeled_lang,
           {_langid_case_sql()} AS pred_lang,
           GREATEST({", ".join(f"s_{l}" for l in LANG_ORDER)}) AS top_score
    FROM scored
    """,
    description="Language-ID heuristic: stopword-hit counts per language, "
                "deterministic argmax. n-gram/stopword LID in pure SQL.",
    tags=("text",),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = words_col()
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[
            F.size(
                F.filter(
                    w,
                    lambda x: F.array_contains(
                        F.array(*[F.lit(s) for s in STOPWORDS[l]]), x
                    ),
                )
            ).alias(f"s_{l}")
            for l in LANG_ORDER
        ],
    )
    best = F.greatest(*[F.col(f"s_{l}") for l in LANG_ORDER])
    pred = F.when(best == 0, "unknown")
    for l in LANG_ORDER:
        pred = pred.when(F.col(f"s_{l}") == best, l)
    return scored.select(
        "doc_id", "labeled_lang", pred.alias("pred_lang"), best.cast("bigint").alias("top_score")
    )


@register(
    "text_quality",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, length(text) AS n_chars,
             {_WORDS_SQL} AS words,
             len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
             {_lang_score_sql('en')} AS n_stop
      FROM documents)
    SELECT doc_id, n_chars,
           len(words) AS n_words,
           CAST(list_sum(list_transform(words, x -> length(x))) AS BIGINT) AS sum_word_len,
           n_punct, n_stop,
           CASE WHEN len(words) BETWEEN 10 AND 1000
                 AND n_stop * 20 >= len(words) THEN 1 ELSE 0 END AS quality_pass
    FROM w
    """,
    description="Quality scoring: length, punctuation count, stopword hits, "
                "word-length mass; integer-exact pass/fail gate (Gopher-rule "
                "style thresholds).",
    tags=("text",),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = words_col()
    en = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    base = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        w.alias("words"),
        F.size(F.regexp_extract_all("text", F.lit(r"[.,;:!?]"), 0)).cast("bigint").alias("n_punct"),
        F.size(F.filter(w, lambda x: F.array_contains(en, x))).cast("bigint").alias("n_stop"),
    )
    return base.select(
        "doc_id",
        "n_chars",
        F.size("words").cast("bigint").alias("n_words"),
        F.aggregate(
            F.col("words"), F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("sum_word_len"),
        "n_punct",
        "n_stop",
        F.when(
            F.size("words").between(10, 1000)
            & (F.col("n_stop") * 20 >= F.size("words")),
            1,
        )
        .otherwise(0)
        .alias("quality_pass"),
    )


#: polynomial rolling-hash parameters for 8-gram fingerprints: base 131,
#: modulus 2^31-1 (HASH_PRIME). codepoint < 2^21 and coefficient < 2^31, so
#: every product stays < 2^52 and the 8-term sum < 2^55 -- exact in int64 on
#: both engines, no md5 per position (the md5 variant measured ~4 s at sf0.1;
#: this is pure integer arithmetic).
FP_BASE = 131
_FP_COEF = [pow(FP_BASE, 7 - k, 2_147_483_647) for k in range(8)]
_FP_MOD = 2_147_483_647

_FP_HASH_SQL = (
    "("
    + " + ".join(
        f"CAST(ascii(substr(text, CAST(i + {k} AS INTEGER), 1)) AS BIGINT) * {c}"
        for k, c in enumerate(_FP_COEF)
    )
    + f") % {_FP_MOD}"
)


@register(
    "text_fingerprint",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - 7, 0))) AS i
      FROM documents),
    grams AS (
      SELECT doc_id, i, {_FP_HASH_SQL} AS h
      FROM pos),
    wins AS (
      SELECT doc_id, i,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
             COUNT(*) OVER (PARTITION BY doc_id) AS n
      FROM grams)
    SELECT doc_id, COUNT(DISTINCT mh) AS n_fp, MIN(mh) AS min_fp, MAX(mh) AS max_fp
    FROM wins WHERE i <= n - 3
    GROUP BY doc_id
    """,
    description="Document fingerprinting via winnowing (Schleimer et al.): "
                "char-8-gram polynomial rolling hashes (base 131 mod 2^31-1, "
                "engine-portable integer arithmetic -- no per-position md5), "
                "min over each 4-window, distinct mins. Array-expression "
                "implementation -- per-doc narrow map, no shuffle.",
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # codepoints materialized ONCE per row; the rand() barrier stops
    # CollapseProject from re-inlining the split into every F.get below
    codes = F.transform(F.split("text", ""), lambda ch: F.ascii(ch).cast("bigint"))
    chars = docs.where(F.length("text") >= 11).select(
        "doc_id", codes.alias("cs"), F.rand(7).alias("__b1")
    )

    def gram_hash(i):  # i = 0-based start index into cs
        s = None
        for k, c in enumerate(_FP_COEF):
            term = F.get("cs", i + F.lit(k)) * F.lit(c)
            s = term if s is None else s + term
        return s % F.lit(_FP_MOD)

    hashes = F.transform(F.sequence(F.lit(0), F.size("cs") - 8), gram_hash)
    grams = chars.select("doc_id", hashes.alias("hs"), F.rand(7).alias("__b2"))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("hs") - 3),
            lambda i: F.array_min(F.slice(F.col("hs"), i, 4)),
        )
    )
    return grams.select(
        "doc_id",
        F.size(fps).cast("bigint").alias("n_fp"),
        F.array_min(fps).alias("min_fp"),
        F.array_max(fps).alias("max_fp"),
    )

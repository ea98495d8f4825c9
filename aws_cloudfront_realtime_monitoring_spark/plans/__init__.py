"""Query registry: every supported query as (Spark DataFrame builder,
ANSI-SQL oracle) pair.

The driver contract (``__spark_entry__.py``) consumes this registry: each
entry's ``build`` runs on Spark and its ``oracle`` on DuckDB over the same
parquet tables; results must match on row count, column names, and
order-insensitive value hash. Queries whose semantics are not expressible in
portable SQL (custom stateful ops) set ``oracle=None`` and get a weaker
rows-only check.

Determinism rules used throughout (so hashes match across engines):
- double aggregates go through ``ROUND(x, k)`` then DECIMAL accumulation,
  cast back to DOUBLE -- exact and order-independent in both engines;
- every top-k / limit has a total deterministic ORDER BY with id tiebreaks;
- hashing uses the md5-derived 60-bit hash (``functions.hashing``), identical
  in Spark and DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, Query] = {}

#: Spark/oracle pairs verified by the test suite but deliberately kept OUT
#: of the <=50-entry driver registry (the driver records correctness rows
#: for the first 50 ``queries()`` entries only, so the registry is a
#: budget). Same Query shape, same Spark-vs-DuckDB comparison in
#: tests/test_queries_oracle.py -- just no driver slot.
EXTRAS: dict[str, Query] = {}


def register(name: str, oracle: str | None, description: str = "",
             tags: tuple[str, ...] = (), driver_slot: bool = True):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        target = REGISTRY if driver_slot else EXTRAS
        if name in REGISTRY or name in EXTRAS:
            # a copy-pasted @register block would silently shadow the
            # earlier query and its oracle check would vanish from the
            # suite with no error (r11 review) -- collide loudly
            raise ValueError(f"duplicate registry name {name!r}")
        target[name] = Query(name, fn, oracle, description, tags)
        return fn
    return deco


#: Names surfaced FIRST in the registry (insertion order of the dict the
#: driver iterates). CORRECTNESS_r01.json recorded rows for exactly the
#: first 50 queries() entries -- positions 50-52 (the UDF trio) got none --
#: so the registry is kept at <= 50 entries and queries whose verification
#: is new or recently changed lead, with the long-stable rows behind them.
PRIORITY = [
    "q1_hourly_measure_by_dim",   # flagship stays first (entry())
    "pixel_decode_real_stats",    # r15: decode OUTPUT oracle — full
                                  # pixel-sum check over BMP /
                                  # hierarchical-lossless JPEG /
                                  # tRNS-color-key PNG (slot from
                                  # scalar_functions, whose JVM scalar
                                  # coverage stays hash-checked via
                                  # load_demoted())
    "animated_frame_real_stats",  # r15: APNG compositing oracle —
                                  # per-frame composited channel means
                                  # through the real Porter-Duff path
                                  # (slot from text_fingerprint, kept
                                  # hash-checked via load_demoted())
    "image_audio_real_meta",      # r13: promoted the only row whose
                                  # oracle hash-checks REAL pixel/DSP
                                  # decode output (slot from
                                  # multimodal_pipeline, whose fake-path
                                  # plumbing container_audio_meta + the
                                  # golden-bytes suites keep; the
                                  # displaced row stays hash-checked via
                                  # load_demoted())
    "skew_salted_join",           # r10: promoted salted-join losslessness
                                  # (slot from pivot_status_by_priority,
                                  # whose B4 conditional-agg coverage
                                  # strict_compat_narrow + q1_narrow_form
                                  # keep): skew is the classic 100x-scale
                                  # failure mode and the skew family had
                                  # no driver row
    "stream_session_equiv",       # r9: promoted MERGING session-window
                                  # streaming equivalence (slot from
                                  # derivative_rate, whose lag-window
                                  # machinery interpolate_linear_fill +
                                  # window_frames_ranking keep)
    "dedup_lsh_recall",           # r9: promoted LSH recall audit (slot
                                  # from udtf_tokenize, an API-capability
                                  # row kept pass-x; audits earn driver
                                  # slots, as ann_ivf_recall proved)
    "ann_ivf_recall",             # r8: promoted recall-audit row (found
                                  # the r7 recall-0 bug; slot from
                                  # ann_topk_ivf, which runs in full as
                                  # this row's IVF side)
    "stream_stream_join_equiv",   # r8: promoted stream-stream interval
                                  # join (slot from q1_narrow_form, whose
                                  # B3/B4/B5 strict_compat_narrow +
                                  # pivot_status_by_priority keep)
    "curation_pipeline",          # r6b: promoted composition keep-list
                                  # (slot from sessionize, whose lag+cumsum
                                  # mechanics ARE the oracle of
                                  # session_window_agg + stream_session_equiv)
    "bm25_topk",                  # r6b: promoted retrieval row (slot from
                                  # sliding_window_counts, subsumed by
                                  # stream_sliding_equiv's identical oracle)
    "semdedup",                   # r6b: promoted semantic dedup (slot from
                                  # semi_anti_membership, whose semi/anti
                                  # coverage subquery_shapes keeps)
    "pii_redact",                 # r06: new curation row (slot from
                                  # rank_orders_window, whose ranking
                                  # coverage window_frames_ranking keeps)
    "decontaminate",              # r06: new curation row (slot from
                                  # lag_gap_analysis, whose lag mechanics
                                  # sessionize keeps)
    "text_repetition",            # r06: promoted from pytest-only (slot
                                  # from ago_filter_count, subsumed by q1)
    "hll_cube_range",             # r06: new 5-sigma in-query contract row
                                  # (slot from narrow_unpivot_agg, subsumed
                                  # by q1_narrow_form/strict_compat_narrow)
    "cf_parse_wire_roundtrip",    # r03: header K/V + names parse (A9/A10)
                                  # now flow through the oracle row
    "stats_profile",              # r03: + percentile_approx (GK sketch)
                                  # in-query rank-error contract
    "stream_sliding_equiv",       # r03: new row (promoted pytest; slot
                                  # from embedding_near_dup, whose blocked
                                  # sibling carries the same contract)
    "dedup_clusters",             # r03: fused hook/flatten barriers
    "dedup_simhash",              # r03: localCheckpoint signature barrier
    "dedup_minhash_lsh",          # r03: localCheckpoint signature barrier
    "text_tfidf_topk",            # new in r02
    "sample_stratified",          # new in r02
    "text_profile",               # merged query (token stats + langid +
                                  # quality in one pass)
    "revenue_by_region",          # agg-below-join rewrite in r02
    "pandas_udf_scalar",          # no driver row in r01 (position 50)
    "grouped_udaf_applyinpandas",  # no driver row in r01 (position 51)
    "approx_distinct_ips",        # oracle contract new in r02
    "strict_compat_narrow",       # new in r02
    "stream_hourly_bytes_equiv",  # new in r02
    "stream_dedup_equiv",         # new in r02
    "embedding_near_dup_blocked",  # block-join rewrite in r02
    "grouping_analytics",         # merged query
]


def load_all() -> dict[str, Query]:
    """Import every plan module so registration side effects run; order the
    registry so recently-changed/new verifications come first (see PRIORITY)."""
    from . import (  # noqa: F401
        core, relational, advanced, text, dedup, similarity, multimodal, udf,
        streaming_equiv, sampling, curation,
    )
    missing = [n for n in PRIORITY if n not in REGISTRY]
    if missing:
        # a typo'd or since-demoted PRIORITY name used to be silently
        # dropped, quietly shifting the newest-verification-first
        # ordering the 50-row driver budget depends on (r11 review)
        raise ValueError(f"PRIORITY names missing from REGISTRY: {missing}")
    ordered = {n: REGISTRY[n] for n in PRIORITY}
    for n, q in REGISTRY.items():
        ordered.setdefault(n, q)
    return ordered


def load_full():
    """Every oracle-verified query: the 50 driver rows plus the
    demoted/extra rows (driver rows win name conflicts). The one merge
    spelling the tools share -- bench, check_oracles, audit_plans, and
    the scale sweep previously hand-rolled it four ways (r7 review)."""
    full = dict(load_demoted())
    full.update(load_all())
    return full


def load_demoted() -> dict[str, Query]:
    """Spark/oracle pairs verified by the test suite outside the
    <=50-entry driver registry: rows that lost their driver slot in a
    registry swap (DEMOTED) plus rows born without one (EXTRAS)."""
    load_all()
    from .core import DEMOTED as core_demoted
    from .relational import DEMOTED as rel_demoted
    return {**EXTRAS, **core_demoted, **rel_demoted}

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
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, description: str = "",
             tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name, fn, oracle, description, tags)
        return fn
    return deco


def load_all() -> dict[str, Query]:
    """Import every plan module so registration side effects run."""
    from . import core, relational, advanced, text, dedup, similarity, multimodal, udf  # noqa: F401
    return REGISTRY

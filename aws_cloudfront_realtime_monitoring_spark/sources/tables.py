"""Parquet table loaders for the driver's testdata star schema.

``TESTDATA.md``: tables ``region nation customer supplier part orders
lineitem events documents embeddings`` live as one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``. At scale these would be
directory-partitioned datasets; the loaders take any path so the same code
reads a 100 TB partitioned layout unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries match the
    DuckDB oracle's pre-registered view names."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

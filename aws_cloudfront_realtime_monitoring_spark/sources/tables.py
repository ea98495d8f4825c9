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
from pyspark.sql import functions as F, types as T

#: columns stored as TIMESTAMP(NANOS) in the driver's parquet
_NANO_TS_COLUMNS = {"ts"}

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
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Nanosecond-precision parquet timestamps arrive as raw LongType nanos
    # (spark.sql.legacy.parquet.nanosAsLong); convert to TimestampType at
    # microsecond precision -- the same truncation DuckDB applies.
    for f in df.schema.fields:
        if isinstance(f.dataType, T.LongType) and f.name in _NANO_TS_COLUMNS:
            # integer `div`: float division would lose precision above 2^53 ns
            df = df.withColumn(
                f.name, F.timestamp_micros(F.expr(f"`{f.name}` div 1000"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries match the
    DuckDB oracle's pre-registered view names."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

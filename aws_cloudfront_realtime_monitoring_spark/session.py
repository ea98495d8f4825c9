"""SparkSession factory tuned for this engine.

Local-mode settings mirror what we would set on a real cluster where it
matters for plan shape (AQE, shuffle partitions, UTC, Arrow); memory knobs are
local-only. At 100 TB the same code runs unchanged -- only
``spark.sql.shuffle.partitions`` (or AQE auto-coalesce) and executor sizing
move.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: master of the session THIS factory created (None until then): the
#: truthful reuse detector -- see the comment inside get_spark
_CREATED_MASTER: str | None = None


def get_spark(app_name: str = "aws_cloudfront_realtime_monitoring_spark",
              cpus: str | int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    - AQE on (runtime coalesce + skew-join handling) -- our scale posture.
    - ``spark.sql.shuffle.partitions`` defaults to the core count locally; on
      a cluster AQE coalesces from a deliberately-high initial number.
    - Session timezone pinned UTC so timestamp semantics match the DuckDB
      oracle (naive-UTC parquet timestamps).
    - Arrow on for every pandas interchange (Pandas UDFs, toPandas).
    """
    cpus = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # the console progress bar interleaves \r fragments with tool stdout
        # (oracle-gate / bench lines become unparseable); logs stay clean
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # one task per cached-layout file: testdata tables are tiny on disk
        # but CPU-heavy per byte (hashing/parsing), so default 128 MB splits
        # + 4 MB open-cost packing would glue all files into one task. At
        # real scale these two go back to defaults.
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "4m")
        # testdata writes events.ts as TIMESTAMP(NANOS); Spark has no nanos
        # type, so read as long and convert in the loader (sources.tables).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # getOrCreate silently IGNORES creation-time confs (master core
    # count, driver memory) when a session already exists; a measurement
    # tool asking for local[2] must not believe it got one (r12 review)
    # -- warn loudly rather than mislead. The real master comes from
    # module state recorded at CREATION: every builder.getOrCreate
    # copies its spark.master option into the reused session's runtime
    # conf even though the actual master never changes, so the conf lies
    # after the first reuse, and sparkContext.master would grow the
    # classic-only API surface (CONNECT.md inventory).
    global _CREATED_MASTER
    active = SparkSession.getActiveSession()
    spark = builder.getOrCreate()
    want = f"local[{cpus}]"
    if active is None:
        _CREATED_MASTER = want
    elif _CREATED_MASTER and _CREATED_MASTER != want:
        import warnings

        warnings.warn(
            "get_spark: reusing the existing SparkSession on "
            f"{_CREATED_MASTER}; the requested {want} (and any sizing "
            "confs) were NOT applied", stacklevel=2,
        )
    spark.sparkContext.setLogLevel("WARN")
    return spark

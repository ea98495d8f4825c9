"""Registry-wide oracle parity at sf0.001 -- the same comparison the driver
runs at sf0.01 (tools/check_oracles mirrors __spark_entry__ semantics)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from check_oracles import canon, dtype_sig  # noqa: E402

from aws_cloudfront_realtime_monitoring_spark.plans import load_all, load_full
from aws_cloudfront_realtime_monitoring_spark.sources.tables import TABLES

# Demoted queries lost their driver slot in the r6 registry swaps but keep
# the identical Spark-vs-DuckDB verification here
REGISTRY = load_full()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    sdf = q.build(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(sdf) > 0, f"{name}: rows-only query returned empty"
        return
    odf = duck.execute(q.oracle).df()
    scols, srows = canon(sdf)
    ocols, orows = canon(odf)
    assert scols == ocols, f"{name}: column mismatch"
    assert dtype_sig(sdf) == dtype_sig(odf), (
        f"{name}: dtype mismatch {dtype_sig(sdf)} != {dtype_sig(odf)}"
    )
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} != {len(orows)}"
    assert srows == orows, f"{name}: value mismatch"


def test_driver_slot_budget():
    """The driver records correctness rows for the FIRST 50 queries()
    entries only (plans/__init__.py); a 51st driver_slot registration
    would silently lose its driver verification row (the r01 UDF-trio
    positions 50-52 hit exactly this).  Fail loudly instead."""
    assert len(load_all()) <= 50, (
        f"driver registry has {len(load_all())} rows; the driver only "
        "verifies the first 50 -- demote something (driver_slot=False)"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_floor_quantize_agrees_cross_engine_on_repr_ties(spark):
    """Regression pin for the r13 ROUND sweep (stats_profile percentiles/
    var/corr, window_frames_ranking cents + moving average,
    interpolate_locf): ROUND(double, n) diverges between Spark
    (shortest-decimal-repr HALF_UP) and DuckDB (scaled-exact-double
    round) on repr-tie rationals like 0.285 -> 0.28499999999999998. The
    portable spelling FLOOR(x*10^n + 0.5)/10^n is one identical IEEE
    expression on both engines; this pins that agreement on a battery of
    tie-shaped doubles, including the classic divergent ones."""
    import duckdb

    ties = [0.285, 0.125, 2.675, 0.005, 1.005, 0.015, 0.045,
            0.00125, 0.99985, 3.14155, -0.285, -0.005, 0.0, 7.0]
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(ties)],
                                "i long, x double")
    got_spark = {
        r.i: (r.q2, r.q4)
        # 1e2/1e4, not 100.0/10000.0: a bare decimal-point literal in a
        # Spark SQL STRING parses as DECIMAL and drags the division into
        # decimal arithmetic (the production rows use Column-API Python
        # floats, which are double literals already)
        for r in sdf.selectExpr(
            "i",
            "FLOOR(x * 1e2 + 0.5) / 1e2 AS q2",
            "FLOOR(x * 1e4 + 0.5) / 1e4 AS q4",
        ).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        "SELECT i, FLOOR(x * 100.0 + 0.5) / 100.0, "
        "FLOOR(x * 10000.0 + 0.5) / 10000.0 "
        "FROM (SELECT UNNEST(range(%d)) AS i, UNNEST(?) AS x)" % len(ties),
        [ties],
    ).fetchall()
    got_duck = {int(i): (a, b) for i, a, b in rows}
    assert got_spark == got_duck
    # and the documented divergence is REAL for plain ROUND -- if this
    # half ever starts passing, engines converged and ROUND is fine again
    s_round = {r.i: r.r2 for r in sdf.selectExpr(
        "i", "ROUND(x, 2) AS r2").collect()}
    d_round = {int(i): v for i, v in con.execute(
        "SELECT i, ROUND(x, 2) FROM (SELECT UNNEST(range(%d)) AS i, "
        "UNNEST(?) AS x)" % len(ties), [ties]).fetchall()}
    assert s_round != d_round, (
        "Spark and DuckDB ROUND(double,2) now agree on repr ties -- "
        "the FLOOR spelling is no longer load-bearing; revisit the r13 "
        "quantization notes"
    )

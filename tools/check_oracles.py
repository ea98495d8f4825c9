"""Local replica of the driver's correctness gate: run every registry query
on Spark AND its DuckDB oracle over the same parquet tables, compare row
count, column names, and an order-insensitive value multiset.

Usage: python tools/check_oracles.py [sf_dir] [query ...]

With no query names, EVERY oracle-verified row is checked -- driver rows
AND the demoted/extra rows (strictly more than the driver's 50-row gate;
a demoted failure still means a broken oracle pair even though it holds
no driver slot). Pass names to check a subset.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd


def normalize_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if math.isinf(v):
            return repr(v)  # int(inf) would raise and abort the gate
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        # element-wise, never str(): numpy's repr ELIDES elements past
        # 1000 and prints floats at ~8 significant digits, so two
        # genuinely different arrays could stringify identically and
        # record a false PASS (r11 review)
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    return str(v)


def canon(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [
        tuple(normalize_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


def dtype_sig(df: pd.DataFrame) -> list[str]:
    """Exact pandas dtype per (sorted) column -- strict schema comparison.
    DuckDB and Spark diverge silently here (HUGEINT sums, BIGINT ranks vs
    Spark INT), so the gate enforces dtype equality to mirror the strictest
    possible driver-side schema check. Timestamp unit (ns vs us) is
    normalized: both engines mean the same logical TIMESTAMP; only the
    pandas conversion differs."""
    out = []
    for c in sorted(df.columns):
        d = str(df[c].dtype)
        if d.startswith("datetime64"):
            d = "datetime64"
        out.append(d)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from aws_cloudfront_realtime_monitoring_spark.plans import load_full
    from aws_cloudfront_realtime_monitoring_spark.session import get_spark

    registry = load_full()
    only.discard("--all")  # legacy no-op flag: the default already checks all
    unknown = only - set(registry)
    if unknown:
        # a typo'd name used to be silently skipped, letting the gate
        # exit 0 having checked NOTHING (r11 review)
        print(f"FAIL  unknown query name(s): {sorted(unknown)}")
        return 1
    spark = get_spark("check_oracles", cpus=8)
    # ship the package to executor Python workers: pandas-UDF closures
    # pickle module functions by reference, so a run from another cwd
    # would otherwise die with ModuleNotFoundError mid-gate
    import __spark_entry__

    __spark_entry__._ship_package(spark)

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_fail = 0
    for name, q in registry.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.build(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if q.oracle is None:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{t_spark:.1f}s]")
            continue
        try:
            odf = con.execute(q.oracle).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} != {ocols}")
            n_fail += 1
        elif dtype_sig(sdf) != dtype_sig(odf):
            print(
                f"FAIL  {name}: dtypes {dtype_sig(sdf)} != {dtype_sig(odf)}"
            )
            n_fail += 1
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            n_fail += 1
        elif srows != orows:
            diffs = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
            print(f"FAIL  {name}: {len(diffs)} differing rows of {len(srows)}")
            for i in diffs[:3]:
                print(f"      spark : {srows[i]}")
                print(f"      oracle: {orows[i]}")
            n_fail += 1
        else:
            print(f"OK    {name}: {len(srows)} rows [{t_spark:.1f}s]")
    spark.stop()
    # 1/0, not the raw count: an exit code truncates modulo 256, so a
    # 256-failure sweep would report SUCCESS to the shell (r13 review;
    # unreachable at 78 rows today, silent-green trap as it grows)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

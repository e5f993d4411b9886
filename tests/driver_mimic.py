"""Mimic of the driver's Spark-vs-DuckDB compare: row count, column names,
order-insensitive value multiset. Used by test_driver_contract.py and as a
standalone tool:  python tests/driver_mimic.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _norm(v):
    if v is None:
        return "\x00__NULL__"
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare(spark, con, name: str, fn, sql: str | None, sf_dir=None, verbose=True):
    sdf = fn(spark, sf_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(_norm(r[c]) for c in scols) for r in sdf.collect()
    )
    result = {"name": name, "spark_rows": len(srows)}
    if sql is None:
        result["status"] = "rows-only"
        if verbose:
            print(f"{name}: rows-only, {len(srows)} rows")
        return result
    ddf = con.sql(sql)
    dcols_raw = ddf.columns
    dcols_order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
    dcols = sorted(dcols_raw)
    drows = sorted(
        tuple(_norm(row[i]) for i in dcols_order) for row in ddf.fetchall()
    )
    result["duck_rows"] = len(drows)
    if scols != dcols:
        result["status"] = f"SCHEMA MISMATCH spark={scols} duck={dcols}"
    elif len(srows) != len(drows):
        result["status"] = f"COUNT MISMATCH spark={len(srows)} duck={len(drows)}"
    elif srows != drows:
        diffs = [
            (a, b) for a, b in zip(srows, drows) if a != b
        ][:3]
        result["status"] = f"VALUE MISMATCH first_diffs={diffs}"
    else:
        result["status"] = "OK"
    if verbose:
        print(f"{name}: {result['status']} ({len(srows)} rows)")
    return result


def main():
    sys.path.insert(0, "/root/repo")
    from pipe_segment_spark.queries import ORACLES, QUERIES
    from pipe_segment_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)
    spark = build_session(cores=16)
    con = duck_con(sf_dir)
    failures = []
    for name in names:
        try:
            r = compare(spark, con, name, QUERIES[name], ORACLES.get(name), sf_dir)
            if r["status"] not in ("OK", "rows-only"):
                failures.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:500]}")
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} ok; failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

"""Local replica of the driver's correctness gate: run every ``queries()``
entry on Spark and its ``oracle_sql()`` twin on DuckDB at the same sf dir,
then compare row count, column names, and order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if isinstance(v, Decimal):
        # Exact numeric comparison, scale-insensitive: the driver hashes
        # values, so 1e-10 drift that float() would smooth over must FAIL here.
        return format(v.normalize(), "f")
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _sort_key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return [cols[i] for i in order], out


def compare(name, spark_df, oracle, con):
    t0 = time.time()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    t_spark = time.time() - t0
    t0 = time.time()
    res = con.sql(oracle)
    d_cols = res.columns
    d_rows = res.fetchall()
    t_duck = time.time() - t0

    sc, sr = normalize(s_rows, s_cols)
    dc, dr = normalize(d_rows, d_cols)
    status, detail = "PASS", ""
    if sc != [c.lower() for c in dc] and sc != dc:
        status, detail = "FAIL-COLS", f"spark={sc} duck={dc}"
    elif len(sr) != len(dr):
        status, detail = "FAIL-COUNT", f"spark={len(sr)} duck={len(dr)}"
    else:
        for i, (a, b) in enumerate(zip(sr, dr)):
            if a != b:
                # Exact comparison only — the driver hashes values, so any
                # bit-level difference is a FAIL there and must be one here.
                status = "FAIL-VALUES"
                detail = f"row {i}: spark={a} duck={b}"
                break
    print(f"{status:12s} {name:32s} rows={len(sr):7d} spark={t_spark:5.1f}s duck={t_duck:4.1f}s {detail[:220]}")
    return status == "PASS"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from dbt_decodable_spark.queries import load_all
    from dbt_decodable_spark.session import get_spark

    registry = load_all()
    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_skip = 0
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        if q.oracle is None:
            try:
                cnt = q.fn(spark, sf_dir).count()
                print(f"{'ROWS-ONLY':12s} {name:32s} rows={cnt:7d}")
                n_skip += 1
            except Exception as e:
                print(f"{'ERROR':12s} {name:32s} {type(e).__name__}: {str(e)[:180]}")
                n_fail += 1
            continue
        try:
            ok = compare(name, q.fn(spark, sf_dir), q.oracle, con)
            n_pass += ok
            n_fail += not ok
        except Exception as e:
            print(f"{'ERROR':12s} {name:32s} {type(e).__name__}: {str(e)[:180]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local replica of the driver's correctness gate: run every ``queries()``
entry on Spark and its ``oracle_sql()`` twin on DuckDB at the same sf dir,
then compare row count, column names, column *types*, and order-insensitive
values.

Type-strict by design (round-4 fix): the driver's value-hash encodes the
result *encoding*, not just the printable value — a DuckDB ``HUGEINT`` column
hashes differently from a Spark ``BIGINT`` even when every integer is equal
(CORRECTNESS_r03 ``stream_session_window``), and the same holds for
Decimal-vs-double and tz-aware-vs-naive timestamps. The round-3 version of
this tool smoothed all three over (tz-drop, Decimal/HUGEINT stringification),
so it said PASS on the driver's one FAIL. This version:

- flags any DuckDB ``HUGEINT``/``UHUGEINT`` output column as FAIL-TYPES
  (Spark cannot emit one; the oracle needs an explicit CAST);
- fails when exactly one side is DECIMAL, or one side float and the other
  integer (numeric *class* must match; int width is not enforced — the
  driver's hash is width-insensitive for plain ints, per rounds 1-3);
- keeps timezone info on timestamps (tz-aware vs naive is a value diff);
- tags every cell with its Python type class so ``1 == 1.0`` coercion can't
  mask an int-vs-float schema drift inside arrays/structs either;
- (round-6 fix) replays the DRIVER's canonicalization — ``pandas
  .sort_values`` over every output column — on the Spark result before
  comparing. The driver crashed on array-typed outputs twice (CORRECTNESS_r05
  ``embedding_quantize_int8``/``multimodal_features``: ``TypeError:
  unhashable type: 'list'``) while this replica's tuple-sort happily ordered
  them; now any output the driver cannot sort is FAIL-CANON locally,
  including for rows-only (``oracle=None``) queries, which the driver also
  canonicalizes.

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

# Bounded-error assertions for rows-only (oracle=None) queries whose output
# is an engine-specific ESTIMATE of a well-defined exact quantity (VERDICT
# r8 item 7): {query: (exact_sql, rel_tol)}. The exact SQL must emit the
# same column names; every numeric cell is compared within rel_tol. The
# driver row stays rows-only (driver protocol unchanged) — this is a
# local-gate-only quantitative check, reported as ROWS-ONLY(±tol) / FAIL-APPROX.
BOUNDED_ERROR: dict[str, tuple[str, float]] = {
    "agg_approx_distinct": (
        "SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS approx_parts "
        "FROM lineitem",
        # approx_count_distinct's default rsd=0.05 is ONE relative standard
        # deviation, not a ceiling (~32% of datasets land past 1 sigma) —
        # gate at 3 sigma so a correctly functioning estimator can't
        # spuriously fail on a new sf_dir (review r9)
        0.15,
    ),
}


def check_bounded_error(name, rows, cols, con) -> str | None:
    """Compare every numeric cell of a rows-only result to the exact-SQL
    twin within the registered relative tolerance. Returns an error string
    on violation (shape mismatch counts), None when within bounds."""
    exact_sql, tol = BOUNDED_ERROR[name]
    res = con.sql(exact_sql)
    e_rows, e_cols = res.fetchall(), res.columns
    if [c.lower() for c in e_cols] != [c.lower() for c in cols]:
        return f"approx-oracle cols {e_cols} != query cols {list(cols)}"
    if len(e_rows) != len(rows):
        return f"approx-oracle rows {len(e_rows)} != query rows {len(rows)}"
    for r_s, r_e in zip(sorted(map(tuple, rows)), sorted(map(tuple, e_rows))):
        for v_s, v_e in zip(r_s, r_e):
            if isinstance(v_e, (int, float)) and not isinstance(v_e, bool):
                if abs(v_s - v_e) > tol * max(abs(v_e), 1):
                    return (f"estimate {v_s} vs exact {v_e} exceeds "
                            f"±{tol:.0%} ({abs(v_s - v_e) / max(abs(v_e), 1):.1%})")
    return None


def _norm_cell(v):
    """Type-tagged normal form: equal only if type class AND value agree."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, Decimal):
        # raw string form — scale-SENSITIVE (1.50 != 1.5): the driver hashes
        # the encoded decimal, so a scale drift must fail here too
        return ("dec", str(v))
    if isinstance(v, float):
        return ("float", "NaN" if math.isnan(v) else v)
    if isinstance(v, datetime):
        # keep tzinfo: aware-vs-naive must FAIL (driver encodes the offset)
        return ("ts", v.isoformat())
    if isinstance(v, date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    return v


def _sort_key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def driver_canon_guard(rows, cols):
    """Replay the driver's canonicalization: load the result into a pandas
    frame and ``sort_values`` by every column. Returns an error string when
    that raises (e.g. ``TypeError: unhashable type: 'list'`` for array
    outputs) — exactly the crash the driver records as a red row — else
    None. Kept separate from the tuple-based normalize() so a canon crash is
    reported as FAIL-CANON, not masked as a pass."""
    import pandas as pd

    try:
        pd.DataFrame(rows, columns=list(cols)).sort_values(by=list(cols))
    except Exception as e:  # driver dies on any sort failure
        return f"{type(e).__name__}: {e}"
    return None


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return [cols[i] for i in order], out, order


def _numeric_class(type_str: str) -> str:
    """Coarse numeric class of a top-level column type (either engine)."""
    u = type_str.upper()
    if u in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if u.startswith(("DECIMAL", "NUMERIC", "DEC(")):
        return "decimal"
    if u in ("FLOAT", "DOUBLE", "REAL", "FLOAT4", "FLOAT8"):
        return "float"
    if u in ("TINYINT", "SMALLINT", "INTEGER", "INT", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
             "BYTE", "SHORT", "LONG"):
        return "int"
    return "other"


def _nested_classes(type_str: str) -> tuple[str, ...]:
    """Ordered numeric-class tokens appearing anywhere in a (possibly
    nested) type string — so LIST(DECIMAL(10,2)) vs array<double> is a
    type-level mismatch, not just a value-tag diff later."""
    import re

    out = []
    for tok in re.findall(r"[A-Za-z0-9_]+", type_str):
        c = _numeric_class(tok)
        if c != "other":
            out.append(c)
    return tuple(out)


def check_types(s_types, d_types, s_order, d_order):
    """Column-type strictness: HUGEINT anywhere (including nested inside a
    LIST/STRUCT/MAP type string), or a numeric-class mismatch between the
    name-aligned Spark and DuckDB columns — top-level OR nested — is a
    driver hash-fail even when every value prints identically."""
    for si, di in zip(s_order, d_order):
        sc, dc = _numeric_class(s_types[si]), _numeric_class(d_types[di])
        if dc == "hugeint" or "HUGEINT" in d_types[di].upper():
            return (f"oracle col type {d_types[di]} (HUGEINT class) has no "
                    f"Spark encoding — CAST it (spark side: {s_types[si]})")
        if {sc, dc} <= {"int", "float", "decimal"} and sc != dc:
            return f"numeric class mismatch: spark={s_types[si]} duck={d_types[di]}"
        if sc == "other" and dc == "other":
            # nested types: compare the full ordered numeric-class signature
            sn, dn = _nested_classes(s_types[si]), _nested_classes(d_types[di])
            if sn != dn:
                return (f"nested numeric class mismatch: "
                        f"spark={s_types[si]} ({sn}) duck={d_types[di]} ({dn})")
    return None


def compare(name, spark_df, oracle, con):
    t0 = time.time()
    s_cols = spark_df.columns
    s_types = [f.dataType.simpleString() for f in spark_df.schema.fields]
    s_rows = [tuple(r) for r in spark_df.collect()]
    t_spark = time.time() - t0
    t0 = time.time()
    res = con.sql(oracle)
    d_cols = res.columns
    d_types = [str(t) for t in res.types]
    d_rows = res.fetchall()
    t_duck = time.time() - t0

    sc, sr, s_order = normalize(s_rows, s_cols)
    dc, dr, d_order = normalize(d_rows, d_cols)
    status, detail = "PASS", ""
    type_err = check_types(s_types, d_types, s_order, d_order)
    canon_err = driver_canon_guard(s_rows, s_cols)
    if canon_err:
        status, detail = "FAIL-CANON", f"driver canon would crash: {canon_err}"
    elif sc != [c.lower() for c in dc] and sc != dc:
        status, detail = "FAIL-COLS", f"spark={sc} duck={dc}"
    elif type_err:
        status, detail = "FAIL-TYPES", type_err
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
                df = q.fn(spark, sf_dir)
                rows = [tuple(r) for r in df.collect()]
                # the driver canonicalizes rows-only results too (r5:
                # multimodal_features crashed in canon despite oracle=None)
                canon_err = driver_canon_guard(rows, df.columns)
                if canon_err:
                    print(f"{'FAIL-CANON':12s} {name:32s} rows={len(rows):7d} "
                          f"driver canon would crash: {canon_err[:160]}")
                    n_fail += 1
                elif name in BOUNDED_ERROR:
                    err = check_bounded_error(name, rows, df.columns, con)
                    if err:
                        print(f"{'FAIL-APPROX':12s} {name:32s} "
                              f"rows={len(rows):7d} {err[:180]}")
                        n_fail += 1
                    else:
                        tol = BOUNDED_ERROR[name][1]
                        print(f"{'ROWS-ONLY':12s} {name:32s} rows={len(rows):7d} "
                              f"estimate within ±{tol:.0%} of exact")
                        n_skip += 1
                else:
                    print(f"{'ROWS-ONLY':12s} {name:32s} rows={len(rows):7d}")
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

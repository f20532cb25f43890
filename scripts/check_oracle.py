"""Local stand-in for the driver's t2 correctness gate.

Runs every queries() entry at sf0.01 (or $SF_DIR) on Spark, runs the
matching oracle_sql() in DuckDB over the same parquet tables, and compares
row count + column names + an order-insensitive value hash (floats
stringified via repr after normalization; timestamps via isoformat).

Usage: python scripts/check_oracle.py [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    import __spark_entry__ as e
    from datapump_spark.session import get_session

    only = set(sys.argv[1:])
    qs, os_ = e.queries(), e.oracle_sql()
    # Locally also gate the pytest-verified extras (driver caps at 50 rows).
    from datapump_spark.oracles import EXTRA_ORACLES
    from datapump_spark.queries import EXTRA_QUERIES
    qs = {**qs, **EXTRA_QUERIES}
    os_ = {**os_, **EXTRA_ORACLES}

    spark = get_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in os_:
            print(f"{name:24s} (rows-only) ", end="", flush=True)
            try:
                n = fn(spark, sf_dir).count()
                print(f"OK rows={n}")
            except Exception as ex:
                print(f"ERROR {ex}")
                failed.append(name)
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            res = con.execute(os_[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
            problems = []
            # the driver's hash normalizer renders HUGEINT/DECIMAL
            # unlike Python int/float with NO local symptom — gate the
            # oracle's static output types on every run of this script,
            # not only in the pytest sweep (VERDICT r7 "wrong" #3)
            rel = con.sql(f"SELECT * FROM ({os_[name]}) LIMIT 0")
            for col, typ in zip(rel.columns, rel.types):
                t = str(typ)
                if t.startswith(("HUGEINT", "UHUGEINT", "DECIMAL")):
                    problems.append(f"banned oracle type {col}: {t}")
            if len(s_rows) != len(d_rows):
                problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
            if sorted(s_cols) != sorted(d_cols):
                problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            if not problems:
                hs, hd = table_hash(s_cols, s_rows), table_hash(d_cols, d_rows)
                if hs != hd:
                    problems.append("value-hash mismatch")
                    # show first differing line for debugging
                    order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                    order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                    ls = sorted("|".join(norm(r[i]) for i in order_s) for r in s_rows)
                    ld = sorted("|".join(norm(r[i]) for i in order_d) for r in d_rows)
                    for a, b in zip(ls, ld):
                        if a != b:
                            problems.append(f"  spark: {a}\n   duck: {b}")
                            break
            if problems:
                print(f"{name:24s} FAIL: " + "; ".join(problems))
                failed.append(name)
            else:
                print(f"{name:24s} OK rows={len(s_rows)}")
        except Exception as ex:
            print(f"{name:24s} ERROR {type(ex).__name__}: {str(ex)[:300]}")
            failed.append(name)
    print(f"\n{'FAILED: ' + ', '.join(failed) if failed else 'ALL OK'}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

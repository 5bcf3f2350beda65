#!/usr/bin/env python
"""Local mimic of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables, compare row count, column names, and an order-insensitive
value hash. Usage:

    python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # full precision: the driver's hash is float-sensitive to the
        # last ulp (domain_stats round-1 lesson) — the mimic must be too
        return f"{v:.17g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ").replace("+00:00", "")
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_signature(cols: list[str], rows: list[tuple]):
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return sorted(cols), len(rows), h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        rows = [tuple(r) for r in df.collect()]
        sig_s = frame_signature(df.columns, rows)
        dt = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows={sig_s[1]:<7d} ({dt:5.1f}s) [rows-only, no oracle]")
            if sig_s[1] == 0:
                print(f"    WARN {name}: empty result")
            continue
        cur = con.execute(oracles[name])
        cols = [d[0] for d in cur.description]
        sig_d = frame_signature(cols, cur.fetchall())
        ok = sig_s == sig_d
        status = "OK  " if ok else "FAIL"
        print(f"  {name:28s} rows={sig_s[1]:<7d} ({dt:5.1f}s) [{status}]")
        if not ok:
            failures += 1
            print(f"    spark: cols={sig_s[0]} n={sig_s[1]} h={sig_s[2][:12]}")
            print(f"    duck : cols={sig_d[0]} n={sig_d[1]} h={sig_d[2][:12]}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

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

    import numpy as np

    if isinstance(v, np.generic):
        # pandas/fetchdf rows carry numpy scalars; unwrap so int64/
        # float64/bool_ normalize identically to the Python values a
        # fetchall() row would hold.
        v = v.item()
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


def _spark_kind(dt) -> str:
    """Collapse a Spark type to a dtype kind comparable with pandas:
    'i' integral, 'f' float, 'b' bool, 'M' date/time, 'd' decimal,
    'o' other."""
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "i"
    if s in ("float", "double"):
        return "f"
    if s == "boolean":
        return "b"
    if s in ("date", "timestamp", "timestamp_ntz"):
        return "M"
    if s.startswith("decimal"):
        return "d"
    return "o"


def _pandas_kind(dtype) -> str:
    k = dtype.kind
    if k == "u":
        return "i"
    if k in ("i", "f", "b", "M"):
        return k
    return "o"


def dtype_divergences(spark_df, duck_pdf) -> list[str]:
    """The driver fetches the oracle via pandas, where DuckDB HUGEINT
    (e.g. sum of integers) coerces to float64 while Spark emits int64 —
    a guaranteed hash mismatch even on equal values (domain_stats
    rounds 1-3). Flag any int-vs-float kind split between the Spark
    schema and the oracle's fetchdf() dtypes."""
    sk = {f.name: _spark_kind(f.dataType) for f in spark_df.schema.fields}
    out = []
    for col in duck_pdf.columns:
        dk = _pandas_kind(duck_pdf[col].dtype)
        s = sk.get(col)
        if s is None:
            continue
        if {s, dk} == {"i", "f"}:
            out.append(f"{col}: spark={s} duck_fetchdf={dk}")
    return out


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
    # accept both `a b c` and `--only a,b,c`; a filter naming unknown
    # queries (or matching none) is an ERROR, never a vacuous ALL OK
    only = {
        n
        for a in sys.argv[2:]
        if a != "--only"
        for n in a.split(",")
        if n
    }

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
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"UNKNOWN query names in filter: {sorted(unknown)}")
            return 2
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
        # Single execution via fetchdf (how the driver fetches): the
        # same frame feeds both the value signature and the dtype check.
        duck_pdf = con.execute(oracles[name]).fetchdf()
        cols = list(duck_pdf.columns)
        sig_d = frame_signature(
            cols, list(duck_pdf.itertuples(index=False, name=None))
        )
        dtype_bad = dtype_divergences(df, duck_pdf)
        ok = sig_s == sig_d and not dtype_bad
        status = "OK  " if ok else "FAIL"
        print(f"  {name:28s} rows={sig_s[1]:<7d} ({dt:5.1f}s) [{status}]")
        if not ok:
            failures += 1
            print(f"    spark: cols={sig_s[0]} n={sig_s[1]} h={sig_s[2][:12]}")
            print(f"    duck : cols={sig_d[0]} n={sig_d[1]} h={sig_d[2][:12]}")
            for msg in dtype_bad:
                print(f"    DTYPE DIVERGENCE (driver-fatal): {msg}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

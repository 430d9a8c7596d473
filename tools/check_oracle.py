"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet, then compares
row count, sorted column names, and an order-insensitive value hash
(floats rounded to 6 decimals before hashing, mirroring the
determinism contract described in ``__spark_entry__``'s docstring).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(val):
    if val is None:
        return "\0"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{round(val, 6):.6f}"
    if isinstance(val, bool):
        return str(int(val))
    return str(val)


def _spark_typeclass(dt: str) -> str:
    dt = dt.lower()
    if dt in ("tinyint", "smallint", "int", "bigint", "long", "integer"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt.startswith("decimal"):
        return "decimal"
    if dt in ("string", "varchar"):
        return "str"
    if dt == "boolean":
        return "bool"
    if dt == "date":
        return "date"
    if dt.startswith("timestamp"):
        return "ts"
    if dt.startswith("array") or dt.startswith("map") or dt.startswith("struct"):
        return "nested"
    return dt


def _duck_typeclass(dt: str) -> str:
    dt = dt.upper()
    if dt == "HUGEINT":
        return "hugeint"  # int128: pandas renders as float64 → driver mismatch
    if dt in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UBIGINT", "UINTEGER",
              "USMALLINT", "UTINYINT"):
        return "int"
    if dt in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if dt.startswith("DECIMAL"):
        return "decimal"
    if dt == "VARCHAR":
        return "str"
    if dt == "BOOLEAN":
        return "bool"
    if dt == "DATE":
        return "date"
    if dt.startswith("TIMESTAMP"):
        return "ts"
    if "[]" in dt or dt.startswith("STRUCT") or dt.startswith("MAP"):
        return "nested"
    return dt.lower()


def dtype_problems(spark_dtypes, duck_desc):
    """Driver-canonicalizer hazards the plain value compare can't see:
    the driver diffs query and oracle through *pandas* frames, where
    HUGEINT becomes float64 ('123.0' vs '123') and array cells are
    unhashable (sort_values crash). Compare coarse type classes instead
    of trusting Python-object equality."""
    sd = {c: _spark_typeclass(t) for c, t in spark_dtypes}
    dd = {d[0]: _duck_typeclass(str(d[1])) for d in duck_desc}
    out = []
    for c, sc in sd.items():
        if sc == "nested":
            out.append(f"spark col {c!r} is nested ({sc}) — driver canon crashes on it")
        dc = dd.get(c)
        if dc is None:
            continue
        if dc == "hugeint":
            out.append(f"oracle col {c!r} is HUGEINT — cast to BIGINT in the SQL")
        elif dc != sc and not (sc == "int" and dc == "bool"):
            out.append(f"col {c!r} typeclass spark={sc} duck={dc}")
    return out


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("check_oracle")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # hard error: a typo'd name must not yield a vacuous green
        # "all queries match" over fewer queries than intended (r5
        # verdict item 7 — and round 6 hit exactly this, live)
        print(f"ERROR: unknown query name(s): {', '.join(sorted(unknown))}")
        sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sdtypes = sdf.dtypes
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            nested = [p for p in dtype_problems(sdtypes, []) if "nested" in p]
            tag = ("; " + "; ".join(nested)) if nested else ""
            print(f"ROWS  {name}: {len(srows)} rows (no oracle; rows-only check){tag}")
            if len(srows) == 0 or nested:
                failures.append(name)
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        problems.extend(dtype_problems(sdtypes, list(zip(dcols, dtypes))))
        if not problems:
            hs, hd = table_hash(scols, srows), table_hash(dcols, drows)
            if hs != hd:
                problems.append("value-hash mismatch")
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                set_s = {"\x01".join(canon(r[i]) for i in order_s) for r in srows}
                set_d = {"\x01".join(canon(r[i]) for i in order_d) for r in drows}
                for x in sorted(set_s - set_d)[:3]:
                    problems.append(f"  spark-only: {x!r}")
                for x in sorted(set_d - set_s)[:3]:
                    problems.append(f"  duck-only:  {x!r}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows  ({dt:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {', '.join(failures)}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()

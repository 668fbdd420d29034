"""Self-check harness mimicking the driver's CORRECTNESS gate:
runs each __spark_entry__ query via Spark AND its oracle SQL via
DuckDB on the same parquet tables, compares row count, column names,
and order-insensitive values. Usage:

    python tools/oracle_selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            # the driver's value hash is TYPED: a bigint column on one
            # side and float64 on the other hash-mismatch even when
            # every value is equal (the r4 a15/r2 red rows — uncast
            # DuckDB sum() exports HUGEINT as float64). Mirror that.
            ak, bk = np.asarray(av).dtype.kind, np.asarray(bv).dtype.kind
            if {ak, bk} <= {"i", "u", "f"} and ("f" in (ak, bk)) != (ak == bk == "f"):
                problems.append(
                    f"col {c}: dtype class mismatch spark={np.asarray(av).dtype}"
                    f" duck={np.asarray(bv).dtype} (driver's typed hash would differ"
                    " — CAST the oracle projection)"
                )
            if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(np.asarray(bv).dtype, np.floating):
                av = np.asarray(av, dtype=np.float64)
                bv = np.asarray(bv, dtype=np.float64)
                bad = ~(np.isclose(av, bv, rtol=0, atol=0, equal_nan=True))
                exact_bad = int(bad.sum())
                if exact_bad:
                    close_bad = int((~np.isclose(av, bv, rtol=1e-12, atol=1e-12, equal_nan=True)).sum())
                    problems.append(
                        f"col {c}: {exact_bad} exact mismatches ({close_bad} beyond 1e-12)"
                        f" e.g. {av[bad][:3]} vs {bv[bad][:3]}"
                    )
            else:
                bad = av != bv
                if bad.any():
                    problems.append(f"col {c}: {int(bad.sum())} mismatches e.g. {av[bad][:3]} vs {bv[bad][:3]}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from gtfs_to_geojson_spark.session import get_spark

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in sqls:
            print(f"ok   {name}: rows-only, {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(sqls[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match ({time.time()-t0:.1f}s)")

    # smoke the entry point
    if not only or "entry" in only:
        rows = entrymod.entry(spark).collect()
        print(f"entry(): {len(rows)} rows")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

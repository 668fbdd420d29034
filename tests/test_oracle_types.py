"""Lint over every oracle_sql() projection: the driver's value hash is
TYPED, so an oracle column whose DuckDB type exports to pandas as a
different dtype class than Spark's (HUGEINT -> float64, DECIMAL ->
object/float) hash-mismatches even when every value is equal.  That
was the ONLY red in round 4 (a15_zonal_stats / r2_raster_pyramid:
uncast sum(INTEGER) yields HUGEINT).  This test catches the whole
class statically: DuckDB's relation .types is resolved without
executing the query, so the check is cheap and runs over the FULL
registry, subqueries included — only the final projection's types
matter, which is exactly what the driver hashes.
"""

from __future__ import annotations

import duckdb
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.001"

# DuckDB logical types whose pandas export diverges from any Spark
# result dtype: HUGEINT/UHUGEINT -> float64 (but Spark has no 128-bit
# int, so the Spark side is bigint), DECIMAL -> float64/object.
_BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")


def test_oracle_projection_types_hashable():
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    offenders = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            rel = con.sql(sql)
        except Exception as e:  # noqa: BLE001 - surface as a lint failure
            offenders.append(f"{name}: oracle SQL failed to bind: {e}")
            continue
        for col, typ in zip(rel.columns, rel.types):
            if any(b in str(typ).upper() for b in _BAD):
                offenders.append(
                    f"{name}.{col}: {typ} (CAST the projection — uncast "
                    "sum()/avg() over integers is the usual culprit)"
                )
    assert not offenders, "\n".join(offenders)

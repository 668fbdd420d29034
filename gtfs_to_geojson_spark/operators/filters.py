"""Predicate / filter operators F1–F7 (SURVEY.md §2.2).

The reference threads a ``query`` object ``{service_id[], route_id,
direction_id, shape_id}`` through every table read
(src/lib/gtfs-to-geojson.ts:122-127,149-151,192-196). Here that is a
small composition of ``filter`` + broadcast left-semi joins built once
and reused — Catalyst pushes the equality predicates into the scans.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


@dataclass
class BaseQuery:
    """The reference's threaded query predicate (its only IR)."""

    service_ids: DataFrame | None = None  # F1 result, or None = no date filter
    eq: dict[str, object] = field(default_factory=dict)  # F3 equality keys

    def with_eq(self, **kv) -> "BaseQuery":
        merged = dict(self.eq)
        merged.update({k: v for k, v in kv.items() if v is not None})
        return BaseQuery(self.service_ids, merged)


def service_window(calendar: DataFrame, start_date: str | None, end_date: str | None) -> DataFrame | None:
    """F1 — interval-overlap service filter
    (reference src/lib/gtfs-to-geojson.ts:49-71):
    ``start_date <= :endDate AND end_date >= :startDate``, each side
    optional; lexicographic compare on fixed-width YYYYMMDD strings.
    Returns a DataFrame of matching service_id, or None when no window
    was requested (the reference skips the filter entirely)."""
    if start_date is None and end_date is None:
        return None
    df = calendar
    if end_date is not None:
        df = df.filter(F.col("start_date") <= F.lit(str(end_date)))
    if start_date is not None:
        df = df.filter(F.col("end_date") >= F.lit(str(start_date)))
    return df.select("service_id").distinct()


def apply_query(df: DataFrame, q: BaseQuery) -> DataFrame:
    """F2 (service semi-join) + F3 (equality keys) on any table that
    has the relevant columns — mirrors node-gtfs applying the threaded
    baseQuery to every read."""
    out = df
    for k, v in q.eq.items():
        if k in out.columns:
            out = out.filter(F.col(k) == F.lit(v))
    if q.service_ids is not None and "service_id" in out.columns:
        out = out.join(broadcast(q.service_ids), "service_id", "left_semi")
    return out


def used_stop_ids(stop_times: DataFrame, trips: DataFrame, q: BaseQuery) -> DataFrame:
    """F4 — "Only stops which are used in one or more routes will be
    output" (README.md:231; CHANGELOG v3.4.0). Distinct stop_ids of
    stop_times whose trips survive the query."""
    t = apply_query(trips, q).select("trip_id", "route_id", "direction_id")
    return (
        stop_times.join(t.select("trip_id"), "trip_id", "left_semi")
        .select("stop_id")
        .distinct()
    )


def filter_used_stops(stops: DataFrame, stop_times: DataFrame, trips: DataFrame, q: BaseQuery) -> DataFrame:
    """Stops restricted to used ones (F4), keeping parent stations whose
    children are used (observed in examples/stops.geojson: parent
    stations appear with empty routes)."""
    used = used_stop_ids(stop_times, trips, q)
    direct = stops.join(used, "stop_id", "left_semi")
    parents = stops.join(
        direct.select(F.col("parent_station").alias("stop_id")).where(F.col("stop_id").isNotNull()).distinct(),
        "stop_id",
        "left_semi",
    ).filter(F.col("location_type") == 1)
    return direct.unionByName(parents).dropDuplicates(["stop_id"])

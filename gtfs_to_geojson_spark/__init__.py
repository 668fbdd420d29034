"""gtfs_to_geojson_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch distributed re-expression of the query/data semantics of
BlinkTagInc/gtfs-to-geojson (reference at /root/reference, v3.8.7):
GTFS relational pipeline (filters, multi-way joins, grouped ordered
aggregation), geometry operators (envelope, convex hull, buffer,
dissolve, simplify, coordinate rounding), grouped GeoJSON sinks —
plus the engine-new distributed operator suite required at web scale:
hierarchical cell index, point-in-polygon / range / kNN spatial joins,
raster-tile→vector assignment of an image+caption table, dedup /
similarity / text-analysis operators, skew-salted repartitioning, and
checkpointed per-partition lineage.

Everything is idiomatic DataFrame API; geometry/pixel kernels are
vectorized numpy inside pandas/Arrow UDFs (no per-row Python).
"""

__version__ = "0.1.0"

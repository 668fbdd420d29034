"""Run configuration — the reference's config object re-expressed.

Defaults mirror setDefaultConfig (reference
src/lib/gtfs-to-geojson.ts:31-44): bufferSizeMeters=400,
outputType='agency', outputFormat='lines-and-stops';
coordinatePrecision unset means no rounding/simplify
(geojson-utils.ts:120-122).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class RunSpec:
    output_format: str = "lines-and-stops"
    output_type: str = "agency"  # 'agency' | 'route' | 'shape'
    buffer_size_meters: float = 400.0
    coordinate_precision: int | None = None
    start_date: str | None = None  # YYYYMMDD
    end_date: str | None = None
    out_dir: str | None = None
    zip_output: bool = False
    overwrite: bool = True

"""JFIF decode throughput rows (BENCH/JPEG.md).

Measures the from-scratch JFIF codec's decode paths on a deterministic
4096x4096 fixture (RGB gradient + seeded noise, 4:2:0, q85, DRI=4):

* lanes  — restart-interval-parallel numpy decoder (the default when
           the stream has restart intervals; images._jdecode_scan_seq_lanes)
* scalar — inlined LUT scalar path (images._jdecode_scan_seq), what a
           stream WITHOUT restart intervals gets

The r3 per-bit baseline (this suite's VERDICT r3 item 3 target) cannot
be imported from HEAD — its numbers were measured in the same session
against a worktree of commit 0b746ff with the identical fixture and
interleaved reps; they are recorded as constants below for the
comparison row and marked as such in the output.

Usage: python tools/jpeg_bench.py  [side length, default 4096]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from gtfs_to_geojson_spark import images  # noqa: E402

# measured 2026-08-18 against worktree @ 0b746ff (r3 tip), same fixture,
# interleaved best-of-3 (see BENCH/JPEG.md for the full table)
R3_PERBIT_SCAN_S = 5.753
R3_PERBIT_TOTAL_S = 14.862


def fixture(n: int) -> bytes:
    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:n, 0:n]
    px = np.stack(
        [(x // 2 + y // 3) % 256, (x // 3) % 256, (y // 2) % 256], axis=-1
    ).astype(np.uint8)
    px = np.clip(
        px.astype(np.int16) + rng.integers(-8, 8, px.shape), 0, 255
    ).astype(np.uint8)
    return images.encode_jfif(px, quality=85, subsample="420", restart_interval=4)


def timed_decode(data: bytes, use_lanes: bool, reps: int = 3):
    orig_scan = images._jdecode_scan
    acc = [0.0]

    def scan_timer(*a, **kw):
        t0 = time.perf_counter()
        r = orig_scan(*a, **kw)
        acc[0] += time.perf_counter() - t0
        return r

    if not use_lanes:
        keep = images._jdecode_scan_seq_lanes
        images._jdecode_scan_seq_lanes = lambda *a: None
    images._jdecode_scan = scan_timer
    best_scan, best_total = 9e9, 9e9
    try:
        for _ in range(reps):
            acc[0] = 0.0
            t0 = time.perf_counter()
            images.decode_jfif(data)
            best_total = min(best_total, time.perf_counter() - t0)
            best_scan = min(best_scan, acc[0])
    finally:
        images._jdecode_scan = orig_scan
        if not use_lanes:
            images._jdecode_scan_seq_lanes = keep
    return best_scan, best_total


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    data = fixture(n)
    mb = len(data) / 1e6
    rows = []
    for name, lanes in (("lanes", True), ("scalar", False)):
        sc, tot = timed_decode(data, lanes)
        rows.append((name, sc, tot))
        print(
            f"{name:7s}: scan={sc:.3f}s ({mb/sc:.2f} MB/s) "
            f"total={tot:.3f}s ({mb/tot:.2f} MB/s)"
        )
    if n == 4096:
        sc, tot = rows[0][1], rows[0][2]
        print(
            f"vs r3 per-bit (recorded @0b746ff): scan {R3_PERBIT_SCAN_S/sc:.1f}x, "
            f"total {R3_PERBIT_TOTAL_S/tot:.1f}x"
        )
    print(
        f'{{"metric": "jfif_decode", "bytes": {len(data)}, "n": {n}, '
        f'"lanes_total_sec": {rows[0][2]:.3f}, '
        f'"lanes_mb_per_sec": {mb/rows[0][2]:.3f}, '
        f'"scalar_total_sec": {rows[1][2]:.3f}}}'
    )


if __name__ == "__main__":
    main()

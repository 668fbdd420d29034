"""Checkpoint/lineage resume: a killed run must not recompute
completed buckets (SURVEY.md §7 step 10)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gtfs_to_geojson_spark.streaming.lineage import LineageManifest, run_bucketed


@pytest.fixture()
def work(spark):
    pdf = pd.DataFrame({"bucket": [i % 5 for i in range(100)], "v": range(100)})
    return spark.createDataFrame(pdf)


def test_resume_skips_completed(spark, work, tmp_path):
    manifest = LineageManifest(spark, str(tmp_path / "m"))
    processed = []

    def proc(df):
        n = df.count()
        processed.append(n)
        return n

    # simulate a run killed after 2 buckets
    class Killed(Exception):
        pass

    calls = {"n": 0}

    def proc_killing(df):
        if calls["n"] >= 2:
            raise Killed()
        calls["n"] += 1
        return proc(df)

    with pytest.raises(Killed):
        run_bucketed(spark, work, "bucket", proc_killing, manifest)
    assert len(processed) == 2
    done_before = {r[0] for r in manifest.completed_buckets().collect()}
    assert len(done_before) == 2

    # resume: only the remaining 3 buckets run
    n_proc, n_skip = run_bucketed(spark, work, "bucket", proc, manifest)
    assert n_proc == 3 and n_skip == 2
    assert len(processed) == 5
    assert sum(processed) == 100  # every row processed exactly once

    # idempotent second resume: nothing to do
    n_proc2, n_skip2 = run_bucketed(spark, work, "bucket", proc, manifest)
    assert n_proc2 == 0 and n_skip2 == 5


def test_pending_anti_join(spark, work, tmp_path):
    manifest = LineageManifest(spark, str(tmp_path / "m2"))
    manifest.mark_done([(0, 20, 1.0), (3, 20, 1.0)])
    pending = manifest.pending(work, "bucket")
    assert {r["bucket"] for r in pending.select("bucket").distinct().collect()} == {1, 2, 4}


def test_truncated_tmp_manifest_ignored(spark, work, tmp_path):
    """mark_done is write-then-rename: a kill mid-write leaves only a
    dot-prefixed ``.tmp`` file, which the resume read must ignore —
    even if the kill truncated it to garbage bytes."""
    man_dir = tmp_path / "m3"
    manifest = LineageManifest(spark, str(man_dir))
    manifest.mark_done([(0, 20, 1.0), (3, 20, 1.0)])
    # a kill mid-to_parquet: half-written temp file, never renamed
    (man_dir / ".manifest_999_1.parquet.tmp").write_bytes(b"PAR1\x00trunc")
    done = {r[0] for r in manifest.completed_buckets().collect()}
    assert done == {0, 3}
    pending = manifest.pending(work, "bucket")
    assert {r["bucket"] for r in pending.select("bucket").distinct().collect()} == {1, 2, 4}


def test_run_bucketed_waves_resume(spark, tmp_path):
    """Wave-mode lineage: kill between waves → resume processes only
    the remaining buckets (completed waves' outputs untouched)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.streaming.lineage import (
        LineageManifest,
        run_bucketed_waves,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 10).alias("bucket")
    )
    out = str(tmp_path / "wave_out")
    man_dir = str(tmp_path / "wave_manifest")

    # run 1: waves of 4 → process only the first wave, then "crash"
    m1 = LineageManifest(spark, man_dir)
    todo1, skipped1 = run_bucketed_waves(
        spark, df.filter(F.col("bucket") < 4), "bucket", out, m1, wave_size=4
    )
    assert (todo1, skipped1) == (4, 0)
    first_files = {
        f: os.path.getmtime(f) for f in glob.glob(f"{out}/bucket=*/part-*")
    }
    assert first_files

    # run 2 (restart): full input, waves of 4 → buckets 0-3 skipped
    m2 = LineageManifest(spark, man_dir)
    todo2, skipped2 = run_bucketed_waves(spark, df, "bucket", out, m2, wave_size=4)
    assert todo2 == 6 and skipped2 == 4
    # completed buckets' files untouched (dynamic partition overwrite)
    for f, mtime in first_files.items():
        assert os.path.getmtime(f) == mtime, f
    # all rows present exactly once
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.select("id").distinct().count() == 1000

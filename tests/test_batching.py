"""Grouped prefix scan, aspect-ratio bucketing, batch packing, and
cross-modal canonicalization — the image-training batch-layout family.

Every test checks the distributed result against an independent
serial reference (pandas groupby-cumsum, numpy argmin, or a
brute-force transitive closure), across partition counts that force
groups to span task boundaries."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gtfs_to_geojson_spark.operators import multimodal, scan


def _rand_grouped(seed: int, n: int, n_groups: int, weight_null_frac: float = 0.0):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, n_groups, n),
            "id": rng.permutation(n),
            "w": rng.integers(-5, 50, n).astype("int64"),
        }
    )
    if weight_null_frac:
        mask = rng.random(n) < weight_null_frac
        df["w"] = df["w"].astype("object")
        df.loc[mask, "w"] = None
    return df


def _serial_grouped_cumsum(pdf: pd.DataFrame) -> pd.Series:
    s = pdf.sort_values(["g", "id"]).copy()
    s["w_f"] = pd.to_numeric(s["w"]).fillna(0).astype("int64")
    s["rt"] = s.groupby("g")["w_f"].cumsum()
    return s.set_index("id")["rt"]


@pytest.mark.parametrize("n_parts", [1, 3, 13])
@pytest.mark.parametrize("n_groups", [1, 4, 40])
def test_grouped_running_total_matches_serial(spark, n_parts, n_groups):
    pdf = _rand_grouped(seed=n_parts * 100 + n_groups, n=500, n_groups=n_groups)
    df = spark.createDataFrame(pdf, schema="g long, id long, w long")
    out = scan.grouped_running_total(
        df, "g", "id", "w", out_col="rt", num_partitions=n_parts
    ).toPandas()
    expected = _serial_grouped_cumsum(pdf)
    got = out.set_index("id")["rt"]
    assert len(got) == len(expected)
    pd.testing.assert_series_equal(
        got.sort_index(), expected.sort_index(), check_names=False
    )


def test_grouped_running_total_null_weights(spark):
    pdf = _rand_grouped(seed=7, n=300, n_groups=5, weight_null_frac=0.2)
    df = spark.createDataFrame(pdf, schema="g long, id long, w long")
    out = scan.grouped_running_total(df, "g", "id", "w", out_col="rt", num_partitions=7).toPandas()
    expected = _serial_grouped_cumsum(pdf)
    got = out.set_index("id")["rt"]
    pd.testing.assert_series_equal(got.sort_index(), expected.sort_index(), check_names=False)


def test_grouped_running_total_string_groups(spark):
    pdf = _rand_grouped(seed=11, n=200, n_groups=6)
    pdf["g"] = pdf["g"].map(lambda v: f"bucket_{v}")
    df = spark.createDataFrame(pdf, schema="g string, id long, w long")
    out = scan.grouped_running_total(df, "g", "id", "w", out_col="rt", num_partitions=5).toPandas()
    expected = _serial_grouped_cumsum(pdf)
    got = out.set_index("id")["rt"]
    pd.testing.assert_series_equal(got.sort_index(), expected.sort_index(), check_names=False)


def test_grouped_running_total_max_groups_guard(spark):
    pdf = _rand_grouped(seed=3, n=100, n_groups=30)
    df = spark.createDataFrame(pdf, schema="g long, id long, w long")
    with pytest.raises(ValueError, match="max_groups"):
        scan.grouped_running_total(df, "g", "id", "w", max_groups=10)


def test_grouped_running_total_out_col_collision(spark):
    df = spark.createDataFrame(pd.DataFrame({"g": [1], "id": [1], "w": [1]}))
    with pytest.raises(ValueError, match="already exists"):
        scan.grouped_running_total(df, "g", "id", "w", out_col="w")


@pytest.mark.parametrize("batch_size", [1, 4, 7])
def test_pack_batches_matches_window(spark, batch_size):
    pdf = _rand_grouped(seed=batch_size, n=400, n_groups=6)
    df = spark.createDataFrame(pdf, schema="g long, id long, w long")
    out = scan.pack_batches(df, "g", "id", batch_size, num_partitions=9).toPandas()
    s = pdf.sort_values(["g", "id"]).copy()
    s["rk"] = s.groupby("g").cumcount()
    s["batch_id"] = s["rk"] // batch_size
    s["pos_in_batch"] = s["rk"] % batch_size
    merged = out.merge(s[["g", "id", "batch_id", "pos_in_batch"]], on=["g", "id"],
                       suffixes=("", "_exp"))
    assert len(merged) == len(pdf)
    assert (merged["batch_id"] == merged["batch_id_exp"]).all()
    assert (merged["pos_in_batch"] == merged["pos_in_batch_exp"]).all()


def _bucket_ref(w, h, buckets):
    scale = 1_000_000
    ar = (w * scale) // h
    dists = [abs(ar - (bw * scale) // bh) for bw, bh in buckets]
    return int(np.argmin(dists))  # argmin takes first on ties


def test_aspect_bucket_matches_reference(spark):
    rng = np.random.default_rng(42)
    pdf = pd.DataFrame(
        {
            "image_id": [f"i{k}" for k in range(300)],
            "w": rng.integers(64, 3000, 300).astype("int32"),
            "h": rng.integers(64, 3000, 300).astype("int32"),
        }
    )
    df = spark.createDataFrame(pdf)
    out = multimodal.aspect_bucket(df).toPandas().set_index("image_id")
    bks = multimodal.DEFAULT_ASPECT_BUCKETS
    for _, r in pdf.iterrows():
        i = _bucket_ref(int(r["w"]), int(r["h"]), bks)
        assert out.loc[r["image_id"], "bucket_id"] == i
        assert out.loc[r["image_id"], "bucket_w"] == bks[i][0]
        assert out.loc[r["image_id"], "bucket_h"] == bks[i][1]


def test_aspect_bucket_tie_breaks_to_first(spark):
    # two buckets with the SAME aspect ratio: the earlier index wins
    df = spark.createDataFrame(pd.DataFrame({"image_id": ["a"], "w": [100], "h": [100]}))
    out = multimodal.aspect_bucket(df, buckets=[(512, 512), (1024, 1024)]).collect()[0]
    assert out["bucket_id"] == 0 and out["bucket_w"] == 512


def test_bucketed_batches_homogeneous(spark):
    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            "image_id": [f"i{k:04d}" for k in range(500)],
            "w": rng.integers(64, 3000, 500).astype("int32"),
            "h": rng.integers(64, 3000, 500).astype("int32"),
        }
    )
    df = spark.createDataFrame(pdf)
    out = multimodal.bucketed_batches(df, batch_size=8, num_partitions=6).toPandas()
    assert len(out) == 500
    # every (bucket, batch) slice is shape-homogeneous and ≤ batch_size,
    # positions are 0..len-1, and only the LAST batch per bucket is ragged
    for (b, bat), grp in out.groupby(["bucket_id", "batch_id"]):
        assert grp["bucket_w"].nunique() == 1 and grp["bucket_h"].nunique() == 1
        assert len(grp) <= 8
        assert sorted(grp["pos_in_batch"]) == list(range(len(grp)))
        if len(grp) < 8:
            assert bat == out[out["bucket_id"] == b]["batch_id"].max()


def test_crossmodal_canonical_matches_brute_closure(spark):
    # planted phash groups: base hash per (k % 25), one bit flipped at
    # (k % 63) — within-group hamming ∈ {0, 2}, cross-group ~32
    rng = np.random.default_rng(5)
    n = 200
    base = {g: int(rng.integers(0, 2**63)) for g in range(25)}
    rows = []
    for k in range(n):
        ph = base[k % 25] ^ (1 << (k % 63))
        cap = "x" * int(rng.integers(1, 40))
        rows.append((k, ph, cap))
    pdf = pd.DataFrame(rows, columns=["image_id", "phash", "caption"])
    df = spark.createDataFrame(pdf, schema="image_id long, phash long, caption string")
    out = (
        multimodal.crossmodal_canonical(df, max_hamming=2, combos=2)
        .toPandas()
        .set_index("component")
        .sort_index()
    )

    # brute-force reference: all-pairs hamming ≤ 2 → union-find → argmax
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ph = pdf["phash"].to_numpy()
    for i in range(n):
        for j in range(i + 1, n):
            if bin(int(ph[i]) ^ int(ph[j])).count("1") <= 2:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for k in range(n):
        comp.setdefault(find(k), []).append(k)
    exp = {}
    for root, members in comp.items():
        best = max(members, key=lambda m: (len(pdf.loc[m, "caption"]), -m))
        exp[min(members)] = (best, len(pdf.loc[best, "caption"]), len(members))

    assert len(out) == len(exp)
    for c, (cid, clen, nm) in exp.items():
        row = out.loc[c]
        assert row["canonical_id"] == cid
        assert row["canonical_caption_len"] == clen
        assert row["n_members"] == nm


# ---- sorted fast path (assume_sorted=True: zero-shuffle plan) ----


@pytest.mark.parametrize("n_parts", [1, 7])
def test_grouped_running_total_sorted_path_matches_serial(spark, n_parts):
    n = 600
    ids = np.arange(n)
    pdf = pd.DataFrame(
        {
            "id": ids,
            "g": (ids * 7) % 5,          # groups interleave in natural order
            "w": (ids * 13) % 40 + 1,
        }
    )
    # spark.range is order-clustered by construction
    df = (
        spark.range(0, n, 1, n_parts)
        .select(
            F.col("id"),
            ((F.col("id") * 7) % 5).alias("g"),
            ((F.col("id") * 13) % 40 + 1).alias("w"),
        )
    )
    out = scan.grouped_running_total(
        df, "g", "id", "w", out_col="rt", assume_sorted=True
    ).toPandas()
    expected = _serial_grouped_cumsum(pdf)
    got = out.set_index("id")["rt"]
    pd.testing.assert_series_equal(got.sort_index(), expected.sort_index(), check_names=False)


def test_grouped_running_total_sorted_equals_shuffle_path(spark):
    n = 500
    df = (
        spark.range(0, n, 1, 6)
        .select(
            F.col("id"),
            ((F.col("id") * 11) % 7).alias("g"),
            ((F.col("id") * 3) % 20 + 1).alias("w"),
        )
    )
    fast = scan.grouped_running_total(df, "g", "id", "w", out_col="rt", assume_sorted=True).toPandas()
    slow = scan.grouped_running_total(df, "g", "id", "w", out_col="rt", num_partitions=5).toPandas()
    f = fast.sort_values("id").reset_index(drop=True)
    s = slow.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(f[["id", "g", "rt"]], s[["id", "g", "rt"]])


def test_grouped_running_total_sorted_rejects_unclustered_input(spark):
    # a round-robin repartition destroys order-clustering; the
    # per-partition range check must refuse, not silently miscount
    df = (
        spark.range(0, 400, 1, 4)
        .repartition(4)
        .select(F.col("id"), (F.col("id") % 3).alias("g"), F.lit(1).alias("w"))
    )
    with pytest.raises(Exception, match="overlapping|not ascending"):
        scan.grouped_running_total(df, "g", "id", "w", assume_sorted=True).collect()


def test_pack_batches_sorted_path(spark):
    df = (
        spark.range(0, 500, 1, 5)
        .select(F.col("id"), ((F.col("id") * 7) % 4).alias("g"))
    )
    out = scan.pack_batches(df, "g", "id", 8, assume_sorted=True).toPandas()
    s = out.sort_values(["g", "id"]).copy()
    s["rk"] = s.groupby("g").cumcount()
    assert (s["batch_id"] == s["rk"] // 8).all()
    assert (s["pos_in_batch"] == s["rk"] % 8).all()

"""Z-order clustering: key correctness vs a Python reference, and the
layout property the operator exists for — bbox locality in files."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.operators.zorder import (
    cluster_by_zorder,
    zorder_key,
)


def _ref_zkey(lat: float, lon: float, bits: int) -> int:
    cells = 1 << bits

    def q(v, lo, hi):
        c = int((v - lo) / (hi - lo) * cells)
        return max(0, min(cells - 1, c))

    qlat, qlon = q(lat, -90.0, 90.0), q(lon, -180.0, 180.0)
    z = 0
    for i in range(bits):
        z |= ((qlon >> i) & 1) << (2 * i)
        z |= ((qlat >> i) & 1) << (2 * i + 1)
    return z


@pytest.mark.parametrize("bits", [4, 16])
def test_zorder_key_matches_python_reference(spark, bits):
    pts = [
        (0.0, 0.0), (89.9999, 179.9999), (-90.0, -180.0), (90.0, 180.0),
        (31.77, -101.93), (-45.5, 170.2), (0.0001, -0.0001),
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = [
        r[0]
        for r in df.select(
            zorder_key(F.col("lat"), F.col("lon"), bits)
        ).collect()
    ]
    assert got == [_ref_zkey(lat, lon, bits) for lat, lon in pts]


def test_zorder_interleaving_bounds(spark):
    # key fits in 2*bits bits, and extreme corners map to all-zero /
    # all-one keys
    df = spark.createDataFrame(
        [(-90.0, -180.0), (90.0, 180.0)], "lat double, lon double"
    )
    lo, hi = [
        r[0]
        for r in df.select(zorder_key(F.col("lat"), F.col("lon"), 8)).collect()
    ]
    assert lo == 0
    assert hi == (1 << 16) - 1


def test_bbox_rows_concentrate_in_few_files(spark, sf_dir, tmp_path):
    """The point of the layout: after z-order clustering, a small-bbox
    query's rows live in few files; round-robin layout spreads them
    everywhere.  (With file-stat pruning manifests, 'few files' becomes
    'few files read'.)"""
    from pipeline_calculator_v3_spark.plans.synth import vertices_df

    pts = vertices_df(spark, sf_dir).select("lat", "lon")
    n_files = 16

    rr_dir = str(tmp_path / "roundrobin")
    pts.repartition(n_files).write.parquet(rr_dir)
    z_dir = str(tmp_path / "zorder")
    cluster_by_zorder(pts, "lat", "lon", n_files).write.parquet(z_dir)

    # bbox around the densest corner of the synthetic corridor data
    mid = pts.agg(
        F.avg("lat").alias("la"), F.avg("lon").alias("lo")
    ).collect()[0]
    bbox = (
        (F.col("lat").between(mid["la"] - 0.02, mid["la"] + 0.02))
        & (F.col("lon").between(mid["lo"] - 0.02, mid["lo"] + 0.02))
    )

    def files_touched(path: str) -> int:
        return (
            spark.read.parquet(path)
            .where(bbox)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    rr, zz = files_touched(rr_dir), files_touched(z_dir)
    n_rows = spark.read.parquet(z_dir).where(bbox).count()
    assert n_rows > 0, "bbox must select something for the test to mean anything"
    # round-robin smears the bbox across (essentially) every file
    assert rr >= n_files // 2, (rr, zz)
    # z-order concentrates it into a handful
    assert zz <= max(2, rr // 4), (rr, zz)


def test_null_and_nan_coordinates_yield_null_key(spark):
    df = spark.createDataFrame(
        [(None, 10.0), (10.0, None), (float("nan"), 0.0), (0.0, 0.0)],
        "lat double, lon double",
    )
    keys = [
        r[0]
        for r in df.select(zorder_key(F.col("lat"), F.col("lon"), 8)).collect()
    ]
    assert keys[0] is None and keys[1] is None and keys[2] is None
    assert keys[3] is not None


def test_infinite_coordinates_quarantined(spark):
    """Review r06: +-Infinity passed the NULL/NaN quarantine and parked in
    a valid corner tile, corrupting its file statistics."""
    from pyspark.sql import functions as F

    from pipeline_calculator_v3_spark.operators.zorder import zorder_key

    df = spark.createDataFrame(
        [(1, float("inf"), 10.0), (2, 10.0, float("-inf")), (3, 10.0, 10.0)],
        "id long, lat double, lon double",
    )
    got = {r.id: r.zk for r in df.select(
        "id", zorder_key(F.col("lat"), F.col("lon")).alias("zk")).collect()}
    assert got[1] is None and got[2] is None and got[3] is not None

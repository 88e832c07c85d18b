"""dataset.py::optimize_dataset — selective small-file compaction (the
Delta OPTIMIZE shape, staged r12): plan-driven partial rewrite with
hardlinked carry-over, content validation, z-order sorting within
rewritten files, the no-op early return, idempotence, and the
partition-local planning extension of operators/compaction.py."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.dataset import (
    optimize_dataset,
    validate_dataset,
    write_dataset,
)
from pipeline_calculator_v3_spark.operators.compaction import compaction_plan


def _files(out_dir):
    return sorted(
        os.path.relpath(os.path.join(d, n), out_dir)
        for d, _, names in os.walk(out_dir)
        for n in names
        if n.endswith(".parquet")
    )


@pytest.fixture()
def small_file_dataset(spark, tmp_path):
    """8 round-robin tasks x 2 partition values = 16 small files, the
    streaming-append small-file shape."""
    out = str(tmp_path / "ds")
    df = spark.range(400).select(
        (F.col("id") % 2).cast("string").alias("part"),
        F.col("id").alias("k"),
        (F.col("id") * 7 % 97).alias("v"),
    ).repartition(8)
    write_dataset(df, out, partition_by=["part"], key_cols=["k", "v"])
    return out


def test_partition_local_plan_never_spans_partitions(spark):
    # two partition dirs, ids interleaved: a GLOBAL cumsum would pack
    # files 0 and 1 together despite living in different directories
    rows = [
        (0, "part=a", 10), (1, "part=b", 10),
        (2, "part=a", 10), (3, "part=b", 10),
        (4, "part=a", 500),
    ]
    files = spark.createDataFrame(
        rows, "file_id bigint, part_dir string, bytes bigint"
    )
    plan = compaction_plan(
        files, target_bytes=100, partition_cols=["part_dir"]
    )
    got = {r.file_id: (r.part_dir, r.compact, r.group_id) for r in plan.collect()}
    # each partition packs its own files into its own group 0
    assert got[0] == ("part=a", True, 0) and got[2] == ("part=a", True, 0)
    assert got[1] == ("part=b", True, 0) and got[3] == ("part=b", True, 0)
    assert got[4][1] is False  # big file solo
    # groups keyed by (part_dir, group_id) are disjoint across partitions
    assert {(p, g) for p, c, g in got.values() if c} == {
        ("part=a", 0), ("part=b", 0)
    }


def test_optimize_merges_small_files(spark, small_file_dataset):
    out = small_file_dataset
    before = _files(out)
    assert len(before) == 16  # 8 per partition
    report = optimize_dataset(spark, out, target_bytes=1 << 30)
    assert report["files_before"] == 16
    assert report["rewritten_files"] == 16
    assert report["groups_rewritten"] == 2  # one pack group per partition
    assert report["files_after"] == 2
    assert report["validation"]["ok"]
    # content survived: the manifest still validates post-swap
    assert validate_dataset(spark, out)["ok"]
    rows = spark.read.parquet(out)
    assert rows.count() == 400
    assert rows.select(F.sum("v")).collect()[0][0] == sum(i * 7 % 97 for i in range(400))


def test_untouched_files_are_carried_by_link(spark, small_file_dataset):
    out = small_file_dataset
    before = _files(out)
    # target below every file size -> nothing is small -> early no-op
    report = optimize_dataset(spark, out, target_bytes=1)
    assert report["files_after"] == report["files_before"] == 16
    assert report["rewritten_files"] == 0
    assert _files(out) == before  # tree untouched
    assert validate_dataset(spark, out)["ok"]


def test_optimize_is_idempotent(spark, small_file_dataset):
    out = small_file_dataset
    optimize_dataset(spark, out, target_bytes=1 << 30)
    second = optimize_dataset(spark, out, target_bytes=1 << 30)
    # after convergence every partition holds one file; a second pass
    # finds no multi-file group and leaves the tree alone
    assert second["rewritten_files"] == 0
    assert second["files_after"] == 2
    assert validate_dataset(spark, out)["ok"]


def test_reoptimize_after_refragmentation(spark, small_file_dataset):
    """A previously optimized file can later be CARRIED (big/solo) while
    new appends form a fresh rewrite group in the same partition dir —
    the per-run filename token must keep the new group file from
    colliding with the carried one (review r12: a collision used to be
    masked by the copy fallback, silently erasing the rewritten rows)."""
    out = small_file_dataset
    optimize_dataset(spark, out, target_bytes=1 << 30)
    merged = _files(out)
    assert len(merged) == 2 and all("optimized-" in f for f in merged)
    extra = spark.range(400, 600).select(
        (F.col("id") % 2).cast("string").alias("part"),
        F.col("id").alias("k"),
        (F.col("id") * 7 % 97).alias("v"),
    ).repartition(8)
    write_dataset(extra, out, partition_by=["part"], key_cols=["k", "v"],
                  mode="append")
    # threshold between the merged files and the fresh fragments: the
    # merged generation carries, the fragments pack
    sizes = {f: os.path.getsize(os.path.join(out, f)) for f in _files(out)}
    thr = min(sizes[f] for f in merged)
    assert all(
        sizes[f] < thr for f in _files(out) if f not in merged
    ), "fixture drift: fragments must be smaller than the merged files"
    report = optimize_dataset(spark, out, target_bytes=thr)
    assert report["groups_rewritten"] >= 2
    assert validate_dataset(spark, out)["ok"]
    assert spark.read.parquet(out).count() == 600
    # the carried generation survives next to the new one, no collision
    after = _files(out)
    assert set(merged) <= set(after)
    assert len(after) == len(set(after))
    for part in ("part=0", "part=1"):
        assert len([f for f in after if f.startswith(part)]) >= 2


def test_optimize_sort_by_clusters_rows(spark, small_file_dataset):
    out = small_file_dataset
    optimize_dataset(spark, out, target_bytes=1 << 30, sort_by=["v"])
    # each rewritten file is internally sorted by v (z-order stand-in:
    # any clustering expression works the same way)
    for rel in _files(out):
        vals = [
            r.v
            for r in spark.read.parquet(os.path.join(out, rel)).collect()
        ]
        assert vals == sorted(vals), rel
    assert validate_dataset(spark, out)["ok"]


def test_partial_rewrite_mixes_linked_and_new_files(spark, tmp_path):
    """One partition already compacted (single big-ish file), one
    fragmented: only the fragmented one is rewritten; the other is
    hardlinked (same inode)."""
    out = str(tmp_path / "mix")
    # the big file dwarfs the four fragments COMBINED, so target_bytes =
    # big_size packs all fragments into one group and leaves the big solo
    big = spark.range(5000).select(
        F.lit("a").alias("part"), F.col("id").alias("k"),
        (F.col("id") % 11).alias("v"),
    ).coalesce(1)
    write_dataset(big, out, partition_by=["part"], key_cols=["k"])
    frag = spark.range(5000, 5200).select(
        F.lit("b").alias("part"), F.col("id").alias("k"),
        (F.col("id") % 11).alias("v"),
    ).repartition(4, F.col("id") % 4)
    write_dataset(frag, out, partition_by=["part"], key_cols=["k"],
                  mode="append")
    part_a = [f for f in _files(out) if f.startswith("part=a")]
    assert len(part_a) == 1
    inode_before = os.stat(os.path.join(out, part_a[0])).st_ino
    # size threshold between the big file and the fragments
    big_size = os.path.getsize(os.path.join(out, part_a[0]))
    report = optimize_dataset(spark, out, target_bytes=big_size)
    assert report["groups_rewritten"] == 1
    part_a_after = [f for f in _files(out) if f.startswith("part=a")]
    assert part_a_after == part_a
    assert os.stat(os.path.join(out, part_a_after[0])).st_ino == inode_before
    assert len([f for f in _files(out) if f.startswith("part=b")]) == 1
    assert validate_dataset(spark, out)["ok"]
    assert spark.read.parquet(out).count() == 5200

"""streaming/cdc.py — foreachBatch copy-on-write merge.

Gates: (1) sequential micro-batch folds == one batch upsert of the
concatenated updates; (2) redelivered update files are idempotent (a row
cannot out-version itself); (3) the swap leaves a valid dataset.py
manifest behind.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.dataset import (
    _read_raw,
    validate_dataset,
    write_dataset,
)
from pipeline_calculator_v3_spark.operators.cdc import upsert_latest
from pipeline_calculator_v3_spark.streaming.cdc import merge_stream_into_table

_SCHEMA = "k bigint, status string, version bigint, seq bigint"


def _frame(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _setup(spark, tmp_path):
    base = _frame(
        spark, [(i, "base", 1, 0) for i in range(40)]
    )
    u1 = _frame(spark, [(i, "x", 2, 1) for i in range(0, 40, 4)])
    u2 = _frame(spark, [(i, "y", 3, 2) for i in range(0, 40, 8)])
    table = str(tmp_path / "table")
    updates = str(tmp_path / "updates")
    os.makedirs(updates)
    write_dataset(base, table, ["status"], ["k", "version"])
    u1.coalesce(1).write.parquet(os.path.join(updates, "g0"))
    u2.coalesce(1).write.parquet(os.path.join(updates, "g1"))
    return base, u1, u2, table, updates


def _run(spark, table, updates):
    merge_stream_into_table(
        spark,
        updates + "/g*",
        _SCHEMA,
        table,
        key="k",
        version="version",
        tiebreak="seq",
        partition_by=["status"],
        key_cols=["k", "version"],
    )


def test_stream_fold_equals_batch_merge(spark, tmp_path):
    base, u1, u2, table, updates = _setup(spark, tmp_path)
    _run(spark, table, updates)
    got = {
        r["k"]: (r["status"], r["version"])
        for r in _read_raw(spark, table).collect()
    }
    expected = {
        r["k"]: (r["status"], r["version"])
        for r in upsert_latest(
            base, u1.unionByName(u2), key="k", version="version",
            tiebreak="seq",
        ).collect()
    }
    assert got == expected
    # spot semantics: k=0 hit both generations -> version 3 wins
    assert got[0] == ("y", 3)
    assert got[4] == ("x", 2)
    assert got[1] == ("base", 1)


def test_redelivered_updates_are_idempotent(spark, tmp_path):
    """At-least-once delivery: re-shipping generation 0 as a NEW file
    must not change the table (an old version cannot beat a newer one,
    and an equal (version, seq) re-delivery is latest-wins-stable)."""
    base, u1, u2, table, updates = _setup(spark, tmp_path)
    _run(spark, table, updates)
    before = sorted(
        (r["k"], r["status"], r["version"], r["seq"])
        for r in _read_raw(spark, table).collect()
    )
    u1.coalesce(1).write.parquet(os.path.join(updates, "g0_redelivered"))
    _run(spark, table, updates)  # same checkpoint: only the new file runs
    after = sorted(
        (r["k"], r["status"], r["version"], r["seq"])
        for r in _read_raw(spark, table).collect()
    )
    assert after == before


def test_merged_table_manifest_validates(spark, tmp_path):
    _, _, _, table, updates = _setup(spark, tmp_path)
    _run(spark, table, updates)
    report = validate_dataset(spark, table)
    assert report["ok"], report
    # no swap debris left behind
    assert not os.path.exists(table + ".__old__")
    assert not os.path.exists(table + ".__merge__")


def test_exactly_one_row_per_key(spark, tmp_path):
    _, _, _, table, updates = _setup(spark, tmp_path)
    _run(spark, table, updates)
    df = _read_raw(spark, table)
    assert df.count() == 40
    assert df.select("k").distinct().count() == 40
    assert df.groupBy("k").count().where(F.col("count") > 1).count() == 0


# ---------------------------------------------------------------------------
# partition-pruned copy-on-write (verdict r07 #1)
# ---------------------------------------------------------------------------


def _file_bytes(root):
    """{rel_path: bytes} for every parquet file under root."""
    out = {}
    for d, _, names in os.walk(root):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(d, n)
                with open(p, "rb") as f:
                    out[os.path.relpath(p, root)] = f.read()
    return out


def _setup_multi(spark, tmp_path):
    """Three-partition table (a/b/c); updates touch ONLY partition 'a'
    keys: one in-place bump, one key MOVED a -> b."""
    base = _frame(
        spark,
        [(i, "a", 1, 0) for i in range(10)]
        + [(i, "b", 1, 0) for i in range(10, 20)]
        + [(i, "c", 1, 0) for i in range(20, 30)],
    )
    u1 = _frame(spark, [(0, "a", 2, 1), (1, "b", 2, 1)])
    table = str(tmp_path / "table")
    updates = str(tmp_path / "updates")
    os.makedirs(updates)
    write_dataset(base, table, ["status"], ["k", "version"])
    u1.coalesce(1).write.parquet(os.path.join(updates, "g0"))
    return base, u1, table, updates


def test_untouched_partitions_byte_identical(spark, tmp_path):
    """The scale claim, directly: a merge touching partitions a and b
    leaves partition c's parquet FILES byte-identical (not rewritten,
    not re-encoded) and carries its manifest entry forward verbatim."""
    import json

    base, u1, table, updates = _setup_multi(spark, tmp_path)
    before_c = {
        k: v for k, v in _file_bytes(table).items() if k.startswith("status=c")
    }
    with open(os.path.join(table, "_manifest.json")) as f:
        entry_before = [
            e for e in json.load(f)["partitions"]
            if e["partition"] == {"status": "c"}
        ]
    _run(spark, table, updates)
    after_c = {
        k: v for k, v in _file_bytes(table).items() if k.startswith("status=c")
    }
    assert before_c and after_c == before_c
    with open(os.path.join(table, "_manifest.json")) as f:
        manifest = json.load(f)
    entry_after = [
        e for e in manifest["partitions"] if e["partition"] == {"status": "c"}
    ]
    assert entry_after == entry_before
    report = validate_dataset(spark, table)
    assert report["ok"], report


def test_moved_key_leaves_no_stale_row(spark, tmp_path):
    """An update that CHANGES the partition value must rewrite the key's
    old partition too — k=1 moves a -> b and must not be duplicated."""
    base, u1, table, updates = _setup_multi(spark, tmp_path)
    _run(spark, table, updates)
    df = _read_raw(spark, table)
    got = {r["k"]: (r["status"], r["version"]) for r in df.collect()}
    expected = {
        r["k"]: (r["status"], r["version"])
        for r in upsert_latest(
            base, u1, key="k", version="version", tiebreak="seq"
        ).collect()
    }
    assert got == expected
    assert got[1] == ("b", 2)
    assert df.where(F.col("k") == 1).count() == 1


def test_recovery_rolls_forward_committed_merge(spark, tmp_path):
    """A sibling dir carrying _COMMIT is a complete intent: the next
    entry applies it instead of discarding it — and applying twice from
    a mid-apply crash point is idempotent."""
    from pipeline_calculator_v3_spark.streaming.cdc import (
        _recover_interrupted_merge,
    )

    base, u1, table, updates = _setup_multi(spark, tmp_path)
    _run(spark, table, updates)
    want = sorted(
        (r["k"], r["status"], r["version"])
        for r in _read_raw(spark, table).collect()
    )
    # rebuild the same table, then stage a crash: run the merge but stop
    # it right after the _COMMIT rename by snapshotting the sibling
    import shutil

    shutil.rmtree(table)
    shutil.rmtree(table + ".__ckpt__")
    write_dataset(base, table, ["status"], ["k", "version"])
    # hand-stage the committed sibling exactly as the merge writes it:
    # run the real merge against a COPY, stealing its sibling is racy —
    # instead replay the protocol: merge in batch, write sibling + commit
    from pipeline_calculator_v3_spark.streaming.cdc import (
        _leaf_partition_dirs,
        _merge_dir,
    )
    import json

    touched = {("a",), ("b",)}
    current = _read_raw(spark, table)
    merged = upsert_latest(
        current.where(F.col("status").isin("a", "b")),
        u1,
        key="k",
        version="version",
        tiebreak="seq",
    )
    tmp = _merge_dir(table)
    merged.write.mode("overwrite").partitionBy("status").parquet(tmp)
    from pipeline_calculator_v3_spark.dataset import _manifest_entries

    tmp_entries = _manifest_entries(
        _read_raw(spark, tmp), ["status"], ["k", "version"]
    )
    with open(os.path.join(table, "_manifest.json")) as f:
        stored = json.load(f)
    entries = [
        e
        for e in stored["partitions"]
        if (e["partition"]["status"],) not in touched
    ] + tmp_entries
    entries.sort(key=lambda e: json.dumps(e["partition"], sort_keys=True))
    manifest = {
        **stored,
        "n_partitions": len(entries),
        "n_rows": sum(e["n_rows"] for e in entries),
        "partitions": entries,
    }
    with open(os.path.join(tmp, "_COMMIT"), "w") as f:
        json.dump(
            {
                "partition_by": ["status"],
                "remove_paths": [],
                "manifest": manifest,
            },
            f,
        )
    # crash point: commit written, nothing applied. Recovery rolls forward.
    _recover_interrupted_merge(table)
    assert not os.path.exists(tmp)
    got = sorted(
        (r["k"], r["status"], r["version"])
        for r in _read_raw(spark, table).collect()
    )
    assert got == want
    assert validate_dataset(spark, table)["ok"]
    # second recovery is a no-op
    _recover_interrupted_merge(table)
    assert got == sorted(
        (r["k"], r["status"], r["version"])
        for r in _read_raw(spark, table).collect()
    )
    assert _leaf_partition_dirs(table, 1) == [
        "status=a", "status=b", "status=c"
    ]


def test_recovery_rolls_back_uncommitted_merge(spark, tmp_path):
    """A sibling WITHOUT _COMMIT is an incomplete write: discarded, live
    table untouched."""
    from pipeline_calculator_v3_spark.streaming.cdc import (
        _merge_dir,
        _recover_interrupted_merge,
    )

    base, u1, table, updates = _setup_multi(spark, tmp_path)
    before = _file_bytes(table)
    tmp = _merge_dir(table)
    os.makedirs(os.path.join(tmp, "status=a"))
    with open(os.path.join(tmp, "status=a", "part-junk.parquet"), "wb") as f:
        f.write(b"incomplete")
    _recover_interrupted_merge(table)
    assert not os.path.exists(tmp)
    assert _file_bytes(table) == before


def test_partitions_immutable_skips_locate_scan(spark, tmp_path):
    """With partitions_immutable=True and updates that honor it, the
    fold still equals the batch merge (and only batch-named partitions
    are rewritten)."""
    base = _frame(
        spark,
        [(i, "a", 1, 0) for i in range(10)]
        + [(i, "b", 1, 0) for i in range(10, 20)],
    )
    u1 = _frame(spark, [(3, "a", 2, 1)])  # in-place, partition unchanged
    table = str(tmp_path / "table")
    updates = str(tmp_path / "updates")
    os.makedirs(updates)
    write_dataset(base, table, ["status"], ["k", "version"])
    u1.coalesce(1).write.parquet(os.path.join(updates, "g0"))
    before_b = {
        k: v for k, v in _file_bytes(table).items() if k.startswith("status=b")
    }
    merge_stream_into_table(
        spark,
        updates + "/g*",
        _SCHEMA,
        table,
        key="k",
        version="version",
        tiebreak="seq",
        partition_by=["status"],
        key_cols=["k", "version"],
        partitions_immutable=True,
    )
    after_b = {
        k: v for k, v in _file_bytes(table).items() if k.startswith("status=b")
    }
    assert after_b == before_b
    got = {
        r["k"]: (r["status"], r["version"])
        for r in _read_raw(spark, table).collect()
    }
    assert got[3] == ("a", 2) and got[13] == ("b", 1)
    assert validate_dataset(spark, table)["ok"]


def test_null_key_move_leaves_no_stale_row(spark, tmp_path):
    """A NULL-key row that changes its partition value: the moved-from
    discovery is a key semi-join, and a plain equi-join never matches
    NULL — the stale old-partition row survived (review r13).  The
    null-safe join must rewrite the old home too."""
    base = _frame(spark, [(None, "a", 1, 0), (5, "a", 1, 0)])
    u1 = _frame(spark, [(None, "b", 2, 1)])
    table = str(tmp_path / "table")
    updates = str(tmp_path / "updates")
    os.makedirs(updates)
    write_dataset(base, table, ["status"], ["k", "version"])
    u1.coalesce(1).write.parquet(os.path.join(updates, "g0"))
    _run(spark, table, updates)
    df = _read_raw(spark, table)
    got = {(r["k"], r["status"], r["version"]) for r in df.collect()}
    assert got == {(None, "b", 2), (5, "a", 1)}
    assert df.where(F.col("k").isNull()).count() == 1

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

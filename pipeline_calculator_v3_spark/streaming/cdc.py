"""Streaming CDC merge: continuous upsert of a change stream into a
materialized table — the ingestion pattern between a CDC feed (Debezium,
binlog tail, change files) and an analytics-readable table.

Spark shape: ``foreachBatch`` + copy-on-write.  Structured Streaming has
no MERGE sink, and the portable (no Delta/Iceberg in this container)
equivalent is exactly what those formats do under copy-on-write: each
micro-batch rewrites the table through the latest-wins merge
(operators/cdc.upsert_latest — union + one window rank on the key) and
swaps the result in atomically.  foreachBatch batches are sequential
within a query, so merge N sees the table produced by merge N-1; the
swap protocol (sibling-dir rewrite -> rename pair, recovery at every
entry) is dataset.py's — write_dataset heals an interrupted swap before
touching anything.

At 100 TB the rewrite cost is table-sized per batch — the documented
copy-on-write trade (real systems amortize with partition pruning /
merge-on-read; the partitionBy layout here prunes the same way).
State contract: nothing is held in the streaming state store at all —
the table IS the state, which is what makes the result restartable (a
resumed query re-merges only unprocessed files; upsert_latest is
idempotent over redelivered rows since a row cannot out-version itself).

Determinism: batch-vs-stream equivalence (the sequential fold of
upsert_latest equals one merge of the concatenated updates) holds when
every (key, version, tiebreak) is unique across the update stream —
the same uniqueness upsert_latest already requires WITHIN one call.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from .. import dataset as ds
from ..operators.cdc import upsert_latest


def merge_stream_into_table(
    spark: SparkSession,
    updates_dir: str,
    updates_schema: str,
    table_dir: str,
    key: str,
    version: str,
    tiebreak: str,
    partition_by: list[str],
    key_cols: list[str],
    max_files_per_trigger: int = 1,
) -> None:
    """Fold every update file under ``updates_dir`` into the dataset at
    ``table_dir`` (created beforehand via ``dataset.write_dataset``), one
    micro-batch at a time, and block until the stream drains.

    Each batch: read current table -> upsert_latest -> write the merged
    dataset to a ``.__merge__`` sibling (full manifest) -> validate is
    implicit in the manifest write -> rename-pair swap.  A crash in any
    window is healed by dataset.py's recovery on the next entry."""
    stream = (
        spark.readStream.schema(updates_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(updates_dir)
    )

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tmp = table_dir.rstrip("/") + ".__merge__"
        old = table_dir.rstrip("/") + ".__old__"
        ds._recover_interrupted_swap(table_dir)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        current = ds._read_raw(spark, table_dir)
        merged = upsert_latest(
            current, batch_df, key=key, version=version, tiebreak=tiebreak
        )
        ds.write_dataset(merged, tmp, partition_by, key_cols)
        # the compact_dataset swap protocol: both sides of the rename pair
        # are complete datasets, and an interruption between them is
        # recovered by _recover_interrupted_swap at every entry point
        os.rename(table_dir, old)
        os.rename(tmp, table_dir)
        shutil.rmtree(old, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", table_dir.rstrip("/") + ".__ckpt__")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

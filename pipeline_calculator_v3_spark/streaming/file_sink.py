"""Streaming file sink via foreachBatch — the production write path.

The memory sink is a test harness; real pipelines land micro-batches in
parquet (or a table format).  ``foreachBatch`` gives exactly-once-per-batch
semantics when the write is idempotent on the batch id: each micro-batch
writes to a batch-keyed subdirectory with overwrite, so replays after a
failure rewrite the same files instead of duplicating."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stream_to_parquet(
    transformed: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    query_name: str = "pcv3_file_sink",
):
    """Start a foreachBatch parquet writer: out_dir/batch_id=N/part-*."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")  # idempotent per batch id
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    return (
        transformed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .outputMode("update")
        .start()
    )


def read_sink(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read everything the sink has landed (all batch dirs)."""
    return spark.read.option("basePath", out_dir).parquet(f"{out_dir}/batch_id=*")

"""Sequence packing — concatenating curated documents into fixed
token-budget training examples, the last dataflow step before a tokenizer
sees the corpus.

Semantics: concat-and-slice packing (the standard pre-training layout).
Documents are laid end-to-end in a deterministic order and the stream is
cut every ``budget`` tokens; a document whose span crosses a cut belongs to
the example where it STARTS (so examples can run over budget by at most one
document's tail — bounded by the corpus max doc length, which chunking
upstream bounds by construction).  No RNG anywhere: the layout is a pure
function of (doc_id, token count), stable under repartitioning and retries.

Scale shape: a single global concatenation order would serialize one
reducer, so packing is per-shard — the same deterministic md5 shard
assignment as operators/chunking.py::shard_of — and the window cumsum runs
partitioned by shard.  At 100 TB each shard's window is an independent
sort + running sum over (doc_id, ntok) pairs (two smallints per doc, NOT
the text), and shards scale out with the cluster.  The token arrays never
move: ntok is computed scan-side and only the counts enter the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from .chunking import shard_of


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per packed training example: (shard, example_id, n_docs,
    n_tokens, first_doc, last_doc).  ``example_id`` restarts at 0 per shard;
    ``n_tokens`` is the sum of whole documents starting in the example."""
    if budget <= 0 or n_shards <= 0:
        raise ValueError("budget and n_shards must be positive")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        shard_of(F.col(id_col), n_shards),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("ntok"),
    ).where(F.col("ntok") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = base.select(
        "shard",
        "doc_id",
        "ntok",
        F.coalesce(F.sum("ntok").over(w), F.lit(0)).alias("start"),
    )
    return (
        placed.groupBy(
            "shard",
            F.floor(F.col("start") / budget).cast("bigint").alias("example_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("n_tokens"),
            # no cast: min/max keep id_col's own type, so string/UUID ids
            # work (review r06: the bigint cast NULLed or ANSI-raised on
            # any non-numeric id; the registered query's ids are already
            # bigint, so its schema is unchanged)
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )

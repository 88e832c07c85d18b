"""Document chunking + shard assignment — the two packing steps between a
curated corpus and training shards.

Chunking: overlapping sliding windows over the token sequence (max_len /
stride), the standard long-document treatment before tokenizer-budgeted
training.  One row per chunk, UDTF-shaped, but expressed entirely in Column
HOFs: sequence() generates the window starts, posexplode fans out, slice()
takes each window — no Python in the path, and the token array (from
functions/text.py's ``tokens``, the ONE tokenizer definition shared with
every text oracle) is computed in a projection BELOW the generator so it
runs once per document (the HOF-inlining trap documented in
functions/text.py cannot re-trigger across a Generate boundary).

Sharding: deterministic md5-prefix assignment (same engine-portable idiom as
operators/sampling.py) — identical shard sets on every run, partitioning,
and engine, so the assignment itself is oracle-checkable.  At 100 TB this is
a pure map-side computation; the only shuffle is the tiny per-shard stats
rollup (or the final partitionBy(shard) write, which is the point).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_tokens(
    docs: DataFrame,
    max_len: int = 32,
    stride: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per sliding token window: (id, chunk_idx, n_tokens,
    first_token, last_token).  Windows start at 0, stride, 2*stride, ...
    while the start is inside the document; the final window may be shorter
    than max_len.  Empty documents produce no chunks."""
    if stride <= 0 or max_len <= 0:
        raise ValueError("max_len and stride must be positive")
    base = docs.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("toks")
    ).where(F.size("toks") > 0)
    ex = base.select(
        id_col,
        "toks",
        F.posexplode(
            F.expr(f"sequence(0, size(toks) - 1, {stride})")
        ).alias("chunk_idx", "start"),
    )
    chunk = F.expr(f"slice(toks, start + 1, {max_len})")
    return ex.select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.element_at(chunk, 1).alias("first_token"),
        F.element_at(chunk, -1).alias("last_token"),
    )


def shard_of(key: Column, n_shards: int = 16) -> Column:
    """Deterministic shard id in [0, n_shards): first md5 hex byte mod n.

    Engine-portable (md5 + hex arithmetic exists verbatim in ANSI-ish SQL),
    RNG-free, stable under repartitioning and task retries — the properties
    a resumable 100 TB shard-writer needs."""
    hv = F.conv(F.substring(F.md5(key.cast("string")), 1, 2), 16, 10)
    return (hv.cast("bigint") % n_shards).alias("shard")

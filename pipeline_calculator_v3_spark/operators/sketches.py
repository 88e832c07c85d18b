"""Mergeable heavy-hitters sketch: Misra-Gries summaries + exact recount.

The two-pass heavy-hitters pattern for 100 TB frequency questions where a
full distinct aggregation is too wide to shuffle:

1. Each partition builds a bounded Misra-Gries summary (``capacity``
   counters) in one streaming pass — an Arrow-batched ``mapInPandas``
   kernel, the sanctioned imperative-sketch path (SURVEY §4) since the
   decrement-all update has no Column-expression form.  The exchange then
   carries at most ``capacity`` rows per partition, NOT one row per
   distinct value.
2. The merged summaries nominate candidates; a second pass recounts ONLY
   the candidates exactly (broadcast semi-restriction, map-side).

Misra-Gries guarantee: a partition summary undercounts any value by at
most n_p/capacity, and summing summaries keeps the bound additive — so
every value with true count > n/capacity survives to the candidate set
REGARDLESS of partitioning.  With capacity sized so the k-th true count
clears that bound, the final exact top-k is deterministic (the property
tests/test_sketches.py pins under adversarial repartitioning), which is
what makes the operator oracle-checkable despite the approximate middle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..shipping import ensure_pkg_shipped


def misra_gries_topk(
    df: DataFrame, col: str, k: int = 20, capacity: int = 256
) -> DataFrame:
    """Exact top-``k`` (value, n) of ``df[col]`` via MG candidates + exact
    recount.  Ties at the k-boundary break by value, so the result set is
    deterministic."""
    if k <= 0 or capacity <= k:
        raise ValueError("need capacity > k > 0")
    ensure_pkg_shipped(df.sparkSession)
    values = df.select(F.col(col).alias("value"))

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf["value"]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"value": list(counters.keys()), "est": list(counters.values())}
        )

    summaries = values.mapInPandas(mg, "value string, est bigint")
    candidates = (
        summaries.groupBy("value")
        .agg(F.sum("est").alias("est"))
        .orderBy(F.col("est").desc(), "value")
        .limit(4 * k)
        .select("value")
    )
    exact = (
        values.join(F.broadcast(candidates), "value")
        .groupBy("value")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return exact.orderBy(F.col("n").desc(), "value").limit(k)

"""Stream-static enrichment: a streaming fact joined against a batch
dimension — the standard "decorate events with reference data" operator.

Spark's unified model makes this one function: the SAME join+rollup applies
to a batch DataFrame (oracle-checkable) or a readStream DataFrame.  For the
streaming case Spark re-plans the static side per micro-batch, so dimension
updates between batches are picked up automatically — no watermark or state
store involved on the static side (only the downstream aggregate is
stateful, in complete/update mode).

Scale shape: the dimension broadcasts (reference data is small by
construction next to a 100 TB event stream), so the enrichment itself is
map-side on the stream — the only shuffle is the final (segment, type)
rollup, whose cardinality is bounded by the dimension domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_rollup(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Join events to the customer dimension on user_id and roll up value
    by (market segment, event type).  ``sum_value`` is rounded AFTER the
    aggregate (6 dp) to absorb cross-engine summation-order noise."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("value").alias("raw_sum"),
        )
        .select(
            "c_mktsegment",
            "event_type",
            "n",
            F.round("raw_sum", 6).alias("sum_value"),
        )
    )

"""Stream-stream interval join: correlate two live event streams by key
within an event-time window.

The canonical training-telemetry shape: match each event with the SAME
user's follow-up events inside 5 minutes (click→conversion, request→error,
doc-ingest→dedup-verdict).  Spark's stream-stream inner join emits a pair
as soon as both sides arrive; the per-side WATERMARKS plus the time-interval
predicate bound the join state (each side retains only rows younger than
watermark + interval) — without the interval bound, stream-stream join
state grows forever, the same unbounded-state failure class as streaming
dropDuplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FOLLOWUP_WINDOW = "5 minutes"
FOLLOWUP_US = 5 * 60 * 1_000_000


def _pairs(left, right, how):
    """One spelling of the interval self-join (review r06: the inner and
    outer forms had drifted into verbatim copies; a predicate fix applied
    to one would silently diverge the semantics the tests cross-check)."""
    a = left.select(
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
        F.col("event_type").alias("a_type"),
    )
    b = right.select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_type").alias("b_type"),
    )
    return a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {FOLLOWUP_WINDOW}")),
        how,
    )


def followup_pairs(left: DataFrame, right: DataFrame) -> DataFrame:
    """Pairs (a, b) with a.user_id == b.user_id and a.ts < b.ts <= a.ts+5min.

    Works identically on batch frames and on watermarked streaming frames —
    the streaming test proves batch == stream on identical input.  Inputs
    must carry (user_id, ts, event_type); sides are renamed to a_*/b_* so
    the self-join is unambiguous.
    """
    return _pairs(left, right, "inner")


def pair_type_counts(pairs: DataFrame) -> DataFrame:
    """Stable rollup of the join output: transitions by (a_type, b_type)."""
    return pairs.groupBy("a_type", "b_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


def followup_pairs_outer(left: DataFrame, right: DataFrame) -> DataFrame:
    """LEFT-OUTER interval join: every left event with its follow-ups, or
    NULL-padded when none arrive inside the window.

    Streaming semantics (the part the inner join doesn't exercise): matched
    pairs emit as soon as both sides arrive, but an UNMATCHED left row can
    only emit once the watermark passes ``a_ts + interval`` — before that, a
    matching right row could still show up.  Left rows whose horizon has
    not expired when the stream drains are withheld entirely (correct:
    their outcome is still unknown), so stream output == batch left join
    restricted to matched rows plus horizon-expired unmatched rows — the
    equivalence tests/test_streaming.py pins.  Same bounded state as the
    inner form: watermark + interval caps both sides' buffers."""
    return _pairs(left, right, "left_outer")


def outer_type_counts(pairs: DataFrame) -> DataFrame:
    """Rollup of the outer join output: (a_type, follow-up type or 'NONE').
    The 'NONE' bucket is the operator's point — abandoned sessions /
    requests with no conversion inside the horizon."""
    return pairs.groupBy(
        "a_type", F.coalesce(F.col("b_type"), F.lit("NONE")).alias("b_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))


def run_stream_outer_join_to_memory(spark, events_dir: str, name: str) -> DataFrame:
    """Drive the left-outer interval join as a REAL two-source stream-stream
    join (both sides watermarked) and return the raw append output — the
    caller compares matched rows and horizon-expired null rows against the
    batch face."""
    return _run_pairs_to_memory(spark, events_dir, name, followup_pairs_outer)


def run_stream_join_to_memory(spark, events_dir: str, name: str) -> DataFrame:
    """Drive the interval join as a REAL stream-stream join (two readStream
    sources over the same files, both watermarked) and return the
    transition counts of the append output."""
    # stream-stream joins emit in APPEND mode only: sink the raw pairs, roll
    # up batch-side from the memory table (inner-join pairs emit as soon as
    # both sides arrive, so the bounded drain holds every pair)
    return pair_type_counts(
        _run_pairs_to_memory(spark, events_dir, name, followup_pairs)
    )


def _run_pairs_to_memory(spark, events_dir: str, name: str, join_fn) -> DataFrame:
    """Shared two-source stream drive: both sides watermarked, append-mode
    memory sink, bounded drain (review r06: the inner and outer runners
    were copies)."""
    from .windows import stream_events

    from .drain import drain_to_memory

    left = stream_events(spark, events_dir, watermark="30 minutes")
    right = stream_events(spark, events_dir, watermark="30 minutes")
    return drain_to_memory(join_fn(left, right), name)

"""Streaming-window queries, batch-checked (SURVEY.md §2.B q_stream_*).

Each query applies the SAME transformation used by the readStream wrappers
(streaming/windows.py) to the batch events table, so the oracle gate checks
the streaming semantics without streaming nondeterminism (SURVEY.md §7).
tests/test_streaming.py proves batch == readStream on identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import events_t, query, t
from .streaming import windows


def _stage_batch_file(frame: DataFrame, path: str, mtime: float) -> None:
    """Stage one replay micro-batch as a single parquet file WITHOUT
    driver-side materialization (the r04 ``toPandas()`` here was the one
    full-table driver collect left in the repo — at 100x sf it OOMs the
    driver; the write below stays executor-side).  The single part file is
    moved to ``path`` and given a controlled mtime because the file stream
    source orders micro-batches by mtime.

    ``coalesce(1)`` is harness-correct, not a scale anti-pattern: the file
    stream source replays ONE file per trigger, so one output file per
    split is the contract.  Real deployments read an object-store prefix
    where each micro-batch is already its own file set."""
    import glob
    import os
    import shutil

    stage = path + ".stage"
    frame.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))
    assert len(part) == 1, part
    shutil.move(part[0], path)
    shutil.rmtree(stage, ignore_errors=True)
    os.utime(path, (mtime, mtime))


@query(
    "q_stream_tumbling",
    oracle="""
SELECT epoch_us(time_bucket(INTERVAL 5 MINUTES, ts)) AS window_start_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       SUM(value) AS sum_value
FROM events
GROUP BY window_start_us, event_type
""",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window aggregation (epoch-aligned on both engines)."""
    return windows.tumbling_counts(events_t(spark, sf_dir))


def _ohlc_oracle() -> str:
    # late import: queries_analytics is a sibling registered by
    # queries.py's module sweep; binding at decoration time (module import)
    # is safe, but the function form keeps the top-of-file import list
    # acyclic-by-construction like the _SIG_BAND_CTES import below
    from .queries_analytics import OHLC_ORACLE

    return OHLC_ORACLE


@query("q_ohlc_candles", oracle=_ohlc_oracle())
def q_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLC candles, batch-checked (streaming/windows.py::
    ohlc_candles — staged r09, faced per VERDICT r09 #2): the SAME
    function the readStream path runs — ``F.window(ts, 1 hour)`` buckets
    with min_by/max_by open/close riding ONE streaming-compatible
    aggregation — applied to the batch events table, sharing the
    q_resample_ohlc oracle text verbatim (window.start equals the batch
    operator's integer ``ts - pmod(ts, w)`` edge for epoch-aligned widths
    on positive timestamps).  tests/test_stream_ohlc.py proves
    batch == readStream == batch-operator on identical input.

    Scale shape: one (event_type, window)-keyed aggregate whose
    min_by/max_by partials merge through streaming state exactly as
    through the batch partial-merge tree — no per-bucket sort in either
    mode, state bounded by live windows x event types."""
    return windows.ohlc_candles(events_t(spark, sf_dir)).withColumn(
        "mean_value", F.round("mean_value", 6)
    )


@query(
    "q_stream_sliding",
    oracle="""
WITH shifted AS (
    SELECT epoch_us(time_bucket(INTERVAL 5 MINUTES, ts)) - off.o AS window_start_us,
           value
    FROM events
    CROSS JOIN (VALUES (0::BIGINT), (300000000::BIGINT)) AS off(o)
)
SELECT window_start_us,
       CAST(COUNT(*) AS BIGINT) AS n,
       AVG(value) AS avg_value
FROM shifted
GROUP BY window_start_us
""",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding by 5: every event belongs to exactly two
    windows — the oracle replays that as two shifted tumbling buckets."""
    return windows.sliding_counts(events_t(spark, sf_dir))


@query(
    "q_stream_session",
    oracle="""
WITH flagged AS (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 300000000
                  OR lag(epoch_us(ts)) OVER w IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
    -- event_id tiebreak mirrors the flagged window (review r06: without
    -- it, timestamp-tied rows could order the is_new=1 row after its
    -- tied sibling in the running sum, splitting a session Spark merges)
    SELECT user_id, ts_us,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged
)
SELECT user_id,
       MIN(ts_us) AS session_start_us,
       CAST(COUNT(*) AS BIGINT) AS n
FROM sess
GROUP BY user_id, sid
""",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window with a 5-minute gap.  Spark merges events whose window
    [ts, ts+gap) overlaps the previous one, i.e. a NEW session starts when
    the inter-event gap is >= the gap duration — the oracle replays exactly
    that rule as gaps-and-islands."""
    return windows.session_counts(events_t(spark, sf_dir))


_STATEFUL_RUNS = [0]


@query(
    "q_stream_stateful",
    oracle="""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       SUM(value) AS total_value,
       MAX(epoch_us(ts)) AS last_ts_us
FROM events
GROUP BY user_id
""",
)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): runs a REAL
    Structured Streaming query over the events file inside the call (memory
    sink, update mode) and returns the final per-user state — which must
    equal the batch aggregate the oracle computes."""
    import os
    import shutil
    import tempfile

    from .streaming.stateful import run_stateful_to_memory

    # Harness-only driver-side copy: the file stream source needs a directory
    # it can list; at real scale the events land in their own object-store
    # prefix and this copy does not exist.
    d = tempfile.mkdtemp(prefix="pcv3_stateful_")
    try:
        shutil.copy(
            os.path.join(sf_dir, "events.parquet"), os.path.join(d, "events.parquet")
        )
        _STATEFUL_RUNS[0] += 1
        return run_stateful_to_memory(
            spark, d, f"pcv3_stateful_{os.getpid()}_{_STATEFUL_RUNS[0]}"
        )
    finally:
        # the memory sink holds the results; the source dir is disposable as
        # soon as the bounded stream has drained (run_stateful_to_memory
        # returns only after processAllAvailable + stop)
        shutil.rmtree(d, ignore_errors=True)


_DEDUP_RUNS = [0]


@query(
    "q_stream_dedup",
    oracle="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
""",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup-on-ingest (streaming/dedup.py): the events file is
    delivered TWICE as separate micro-batches; dropDuplicatesWithinWatermark
    keeps each event_id's first arrival, so the per-type counts of the
    append output equal the batch counts of the single file — which is the
    oracle.  State is watermark-bounded (the 100 TB-stream-safe form;
    unbounded dropDuplicates state would OOM)."""
    import os
    import shutil
    import tempfile

    from .streaming.dedup import run_dedup_to_memory

    # Harness-only driver-side copies (see q_stream_stateful): two identical
    # files simulate at-least-once redelivery across micro-batches.
    d = tempfile.mkdtemp(prefix="pcv3_dedup_")
    try:
        src = os.path.join(sf_dir, "events.parquet")
        shutil.copy(src, os.path.join(d, "events_a.parquet"))
        shutil.copy(src, os.path.join(d, "events_b.parquet"))
        _DEDUP_RUNS[0] += 1
        return run_dedup_to_memory(
            spark, d, f"pcv3_dedup_{os.getpid()}_{_DEDUP_RUNS[0]}"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


_SESS_RUNS = [0]


@query(
    "q_stream_session_timeout",
    oracle="""
WITH flagged AS (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 300000000
                  OR lag(epoch_us(ts)) OVER w IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
    SELECT user_id, ts_us,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged
),
agg AS (
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM sess GROUP BY user_id, sid
),
wm AS (
    -- final watermark in MILLISECONDS (Spark tracks event-time stats at ms):
    -- floor(max_us/1000) - 30min
    SELECT epoch_us(max(ts)) // 1000 - 1800000 AS wms FROM events
),
marked AS (
    SELECT a.*,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY session_start_us DESC) AS rn
    FROM agg a
)
SELECT user_id, session_start_us, session_end_us, n
FROM marked, wm
-- timer fires only when the watermark STRICTLY exceeds the ms-truncated
-- timeout timestamp (measured, see docstring): floor(end/1000)+gap < wm
WHERE rn > 1 OR session_end_us // 1000 + 300000 < wm.wms
""",
)
def q_stream_session_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful session windows closed by EVENT-TIME TIMEOUT
    (streaming/sessions.py, applyInPandasWithState + EventTimeTimeout) —
    the pattern built-in session_window cannot express: a session must
    finalize by TIMER when its user goes quiet, not only when a later event
    closes the gap.  The events file is split at 2024-01-16 into two
    micro-batches, so open sessions carry across the batch boundary through
    the state store before the timer closes them.

    The emitted set is exactly SQL-replayable: every gaps-and-islands
    session except each user's last, plus the last where the timer fired —
    closed in-batch by a gap-exceeding successor, or closed by the timeout
    once the watermark passed.  Timer semantics measured empirically on
    this Spark build (r04): the timeout fires only when the watermark is
    STRICTLY greater than the ms-truncated timeout timestamp (equality does
    NOT fire) — the oracle replays that comparison at ms precision.  State
    is bounded: one (start, last, n) triple per ACTIVE user, evicted on
    every close — the 100 TB-stream-safe shape."""
    import os
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from .streaming.sessions import run_sessions_to_memory

    ev = events_t(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="pcv3_sess_")
    try:
        now = _time.time()
        for fname, frame, mtime in [
            ("a_first.parquet", ev.where(F.col("ts") < "2024-01-16"), now - 60),
            ("b_second.parquet", ev.where(F.col("ts") >= "2024-01-16"), now),
        ]:
            _stage_batch_file(
                frame.select(
                    "event_id", "ts", "user_id", "event_type", "value", "props"
                ),
                os.path.join(d, fname),
                mtime,
            )
        _SESS_RUNS[0] += 1
        return run_sessions_to_memory(
            spark, d, f"pcv3_sess_{os.getpid()}_{_SESS_RUNS[0]}"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


_LATE_RUNS = [0]

# The late/on-time split point and the watermark delay — shared by the query
# and its oracle.  Events before the cutoff arrive in a SECOND micro-batch,
# after the first batch has pushed the watermark ~27 days past them.
_LATE_CUTOFF = "2024-01-03"
_LATE_WATERMARK = "30 minutes"


@query(
    "q_stream_late_data",
    oracle="""
WITH wm AS (
    -- Spark tracks event time / watermark at MILLISECOND truncation
    -- (review r06: the full-microsecond form could admit a window whose
    -- end the ms-truncated watermark has not reached; the
    -- session-timeout oracle already models this)
    SELECT (epoch_us(max(ts)) // 1000) * 1000 - 1800000000 AS w_us FROM events
)
SELECT epoch_us(time_bucket(INTERVAL 5 MINUTES, ts)) AS window_start_us,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events, wm
WHERE epoch_us(time_bucket(INTERVAL 5 MINUTES, ts)) + 300000000 <= wm.w_us
GROUP BY window_start_us
""",
)
def q_stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics in append-mode aggregation, value-checked against
    what Spark 4.1 ACTUALLY does (measured, tests/test_watermark.py): the
    events table is delivered as TWO micro-batches — everything from the
    cutoff onward first, then the ~27-days-older rows.

    Empirical Spark 4.1 contract this encodes: late input rows are ADMITTED
    into aggregation state (even when their window was never in state) and
    finalize at the next watermark check with complete counts; the
    watermark's append-mode role is FINALIZATION — windows whose end is
    still above max(event time) - delay are withheld.  The oracle replays
    that exactly: all events, windows with end <= max(ts) - 30min (the
    trailing on-time windows are the withheld ones; every late window sits
    far below the watermark and emits).  Hard input REJECTION by watermark
    lives in the bounded-state operators — dropDuplicatesWithinWatermark
    (q_stream_dedup) and the interval-bounded stream-stream join
    (q_stream_join)."""
    import os
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from .streaming.windows import stream_events

    ev = events_t(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="pcv3_late_")
    try:
        now = _time.time()
        for fname, frame, mtime in [
            ("a_ontime.parquet", ev.where(F.col("ts") >= _LATE_CUTOFF), now - 60),
            ("b_late.parquet", ev.where(F.col("ts") < _LATE_CUTOFF), now),
        ]:
            _stage_batch_file(
                frame.select(
                    "event_id", "ts", "user_id", "event_type", "value", "props"
                ),
                os.path.join(d, fname),
                mtime,
            )

        src = stream_events(
            spark, d, watermark=_LATE_WATERMARK, max_files_per_trigger=1
        )
        agg = (
            src.groupBy(F.window("ts", windows.TUMBLE).alias("w"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select(
                F.unix_micros(F.col("w.start")).alias("window_start_us"), "n"
            )
        )
        _LATE_RUNS[0] += 1
        name = f"pcv3_late_{os.getpid()}_{_LATE_RUNS[0]}"
        from .streaming.drain import drain_to_memory

        return drain_to_memory(agg, name)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "q_stream_join",
    oracle="""
WITH e AS (
    SELECT user_id, epoch_us(ts) AS tu, event_type FROM events
)
SELECT a.event_type AS a_type,
       b.event_type AS b_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM e a
JOIN e b ON a.user_id = b.user_id
        AND b.tu > a.tu
        AND b.tu <= a.tu + 300000000
GROUP BY a_type, b_type
""",
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join semantics (streaming/joins.py), batch-
    checked: same-user follow-up events within 5 minutes, rolled up to
    transition counts.  tests/test_streaming.py proves the REAL two-source
    stream-stream join (watermarked both sides, state bounded by
    watermark + interval) produces identical counts."""
    from .streaming.joins import followup_pairs, pair_type_counts

    ev = events_t(spark, sf_dir)
    return pair_type_counts(followup_pairs(ev, ev))


@query(
    "q_stream_outer_join",
    oracle="""
WITH e AS (
    SELECT user_id, epoch_us(ts) AS tu, event_type FROM events
)
SELECT a.event_type AS a_type,
       COALESCE(b.event_type, 'NONE') AS b_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM e a
LEFT JOIN e b ON a.user_id = b.user_id
             AND b.tu > a.tu
             AND b.tu <= a.tu + 300000000
GROUP BY a_type, COALESCE(b.event_type, 'NONE')
""",
)
def q_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream interval join semantics
    (streaming/joins.py::followup_pairs_outer), batch-checked: every event
    paired with its same-user follow-ups within 5 minutes, with a 'NONE'
    bucket for events that never get one — the abandoned-session /
    no-conversion measurement the inner join cannot express.
    tests/test_streaming.py proves the REAL two-source streaming execution
    (watermarks both sides, null emission gated on horizon expiry, tail
    withheld) matches this batch face under the documented equivalence.

    Scale shape: identical to q_stream_join — one user-keyed exchange per
    side, state bounded by watermark + interval on both."""
    from .streaming.joins import followup_pairs_outer, outer_type_counts

    ev = events_t(spark, sf_dir)
    return outer_type_counts(followup_pairs_outer(ev, ev))


@query(
    "q_stream_static_join",
    oracle="""
SELECT c.c_mktsegment, e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(e.value), 6) AS sum_value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
GROUP BY c.c_mktsegment, e.event_type
""",
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (streaming/enrich.py): events
    decorated with the customer dimension, rolled up by (segment, type).
    The batch face is the oracle gate; tests/test_streaming.py proves the
    REAL readStream execution (static side re-planned per micro-batch,
    stateful aggregate in complete mode) produces identical results on a
    two-file split of the same events.

    Scale shape: the dimension broadcasts — the enrichment is map-side on
    the stream, and the only shuffle is the bounded (segment, type)
    rollup."""
    from .streaming.enrich import enrich_rollup

    return enrich_rollup(
        events_t(spark, sf_dir), t(spark, sf_dir, "customer")
    )


@query(
    "q_stream_cdc_merge",
    oracle="""
WITH merged AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 21 = 0 THEN 'Y'
                WHEN o_orderkey % 7 = 0 THEN 'X'
                ELSE o_orderstatus END AS status,
           CASE WHEN o_orderkey % 21 = 0 THEN 3
                WHEN o_orderkey % 7 = 0 THEN 2
                ELSE 1 END AS version
    FROM orders
)
SELECT status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MAX(version) AS BIGINT) AS max_version
FROM merged
GROUP BY status
""",
)
def q_stream_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC merge (streaming/cdc.py): a two-file change stream
    (version-2 'X' flips for every 7th order, then version-3 'Y' flips
    for every 21st) folds into a materialized orders table through
    foreachBatch PARTITION-PRUNED copy-on-write upserts — each
    micro-batch merges via operators/cdc.upsert_latest and commits via
    the redo-log intent protocol, rewriting only the partition dirs the
    batch touches.  This RUNS the real stream (sequential micro-batches,
    real manifest writes and commits); the oracle replays the
    two-generation merge declaratively, so the fold's final state is
    value-gated.

    The final per-status rollup is materialized before the temp table is
    torn down (bounded: one row per status).

    Scale shape: the stream holds NO state-store state — the table is
    the state; per-batch cost is the touched-partition rewrite plus (the
    partition column is mutable here: a flip moves the row) one
    column-pruned key-locating semi-join scan — never a full-table
    rewrite (tests/test_stream_cdc.py proves untouched partition files
    stay byte-identical)."""
    import os
    import shutil
    import tempfile

    from .dataset import _read_raw
    from .dataset import write_dataset
    from .streaming.cdc import merge_stream_into_table

    o = t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.lit(1).cast("bigint").alias("version"),
        F.lit(0).cast("bigint").alias("seq"),
    )
    u1 = base.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        F.lit(2).cast("bigint").alias("version"),
        F.lit(1).cast("bigint").alias("seq"),
    )
    u2 = base.where(F.col("o_orderkey") % 21 == 0).select(
        "o_orderkey",
        F.lit("Y").alias("o_orderstatus"),
        F.lit(3).cast("bigint").alias("version"),
        F.lit(2).cast("bigint").alias("seq"),
    )
    d = tempfile.mkdtemp(prefix="pcv3_cdc_")
    try:
        table_dir = os.path.join(d, "table")
        updates_dir = os.path.join(d, "updates")
        os.makedirs(updates_dir)
        write_dataset(
            base, table_dir, ["o_orderstatus"], ["o_orderkey", "version"]
        )
        # one file per generation => one micro-batch per generation (the
        # harness-only driver-side staging every q_stream_* query uses)
        for i, u in enumerate((u1, u2)):
            u.coalesce(1).write.parquet(os.path.join(updates_dir, f"g{i}"))
        merge_stream_into_table(
            spark,
            updates_dir + "/g*",
            "o_orderkey bigint, o_orderstatus string, "
            "version bigint, seq bigint",
            table_dir,
            key="o_orderkey",
            version="version",
            tiebreak="seq",
            partition_by=["o_orderstatus"],
            key_cols=["o_orderkey", "version"],
        )
        rolled = (
            _read_raw(spark, table_dir)
            .groupBy(F.col("o_orderstatus").alias("status"))
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                F.max("version").cast("bigint").alias("max_version"),
            )
        )
        # materialize before the temp table is deleted (bounded rows)
        return spark.createDataFrame(rolled.collect(), rolled.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# Streaming near-dup-gated ingest: the continuous-crawl front door.  Two
# document generations stream into a corpus seeded with the doc_id%3==0
# third; each micro-batch is admitted only where it near-duplicates
# neither the standing index nor a lower-id doc in its own batch.  The
# md5 signature family makes the ENTIRE fold value-replayable: the oracle
# derives every band key once (the SAME shared sig/band CTE chain the
# self-join and bipartite dedup oracles use), then replays generation 1
# against the base and generation 2 against base+admitted-1.
from .queries_textml import _MD5_SIG_BAND_CTES as _SIG_BAND_CTES  # noqa: E402


@query(
    "q_stream_ingest_dedup",
    oracle=f"""
WITH {_SIG_BAND_CTES},
jac AS (
    SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
    FROM bands a JOIN bands b ON a.key = b.key AND a.doc_id <> b.doc_id
),
good AS (
    SELECT c.id1, c.id2
    FROM jac c
    JOIN toks sa ON sa.doc_id = c.id1
    JOIN toks sb ON sb.doc_id = c.id2
    WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5
),
rej1 AS (
    SELECT DISTINCT id1 AS doc_id FROM good
    WHERE id1 % 3 = 1
      AND (id2 % 3 = 0 OR (id2 % 3 = 1 AND id2 < id1))
),
acc1 AS (
    SELECT doc_id FROM documents
    WHERE doc_id % 3 = 1
      AND doc_id NOT IN (SELECT doc_id FROM rej1)
),
rej2 AS (
    SELECT DISTINCT id1 AS doc_id FROM good
    WHERE id1 % 3 = 2
      AND (id2 % 3 = 0
           OR (id2 % 3 = 1 AND id2 IN (SELECT doc_id FROM acc1))
           OR (id2 % 3 = 2 AND id2 < id1))
),
acc2 AS (
    SELECT doc_id FROM documents
    WHERE doc_id % 3 = 2
      AND doc_id NOT IN (SELECT doc_id FROM rej2)
)
SELECT doc_id, CAST(doc_id % 3 AS BIGINT) AS gen
FROM (
    SELECT doc_id FROM documents WHERE doc_id % 3 = 0
    UNION ALL SELECT doc_id FROM acc1
    UNION ALL SELECT doc_id FROM acc2
)
""",
)
def q_stream_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup-gated corpus ingest (streaming/ingest.py): the
    doc_id%3==0 third of `documents` seeds an on-disk LSH index; the
    other two thirds stream in as two micro-batch generations, each
    admitted only if it near-duplicates (md5 MinHash-LSH candidates +
    exact Jaccard >= 0.5) neither the index nor a lower-id batchmate
    (greedy lowest-id-wins).  RUNS the real stream — foreachBatch
    bipartite band joins against the growing index, generation-keyed
    idempotent appends — and returns the admitted membership (doc_id,
    gen), which the oracle replays declaratively.

    Scale shape: the corpus never self-joins and its text is never
    re-scanned — per-batch cost is the batch's signatures plus a
    band-key lookup against the index (bucketable by key at 100 TB)."""
    import os
    import shutil
    import tempfile

    from .streaming.ingest import ingest_stream_dedup, read_admitted

    d = t(spark, sf_dir, "documents")
    gen = (F.col("doc_id") % 3).cast("bigint")
    docs = d.select("doc_id", "text", gen.alias("gen"))
    base = docs.where(F.col("gen") == 0)
    work = tempfile.mkdtemp(prefix="pcv3_ingest_")
    try:
        updates_dir = os.path.join(work, "updates")
        os.makedirs(updates_dir)
        # the two replay files are independent writes over disjoint
        # slices — stage them as concurrent jobs (guide §2.6), same as
        # the index writes inside the stream's foreachBatch
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            for f in [
                pool.submit(
                    _stage_batch_file,
                    docs.where(F.col("gen") == i),
                    os.path.join(updates_dir, f"g{i}.parquet"),
                    1_700_000_000.0 + i,
                )
                for i in (1, 2)
            ]:
                f.result()
        ingest_stream_dedup(
            spark,
            updates_dir + "/g*.parquet",
            "doc_id bigint, text string, gen bigint",
            base,
            os.path.join(work, "corpus"),
            min_jaccard=0.5,
        )
        out = read_admitted(spark, os.path.join(work, "corpus")).select(
            "doc_id", "gen"
        )
        # materialize before the temp dirs are deleted — a registry-face
        # artifact only: the PRODUCTION path is the on-disk corpus/index
        # the stream wrote (never collected); this driver-side copy exists
        # because the harness result must outlive the tempdir, and it is
        # membership rows (doc_id, gen), not text or pair counts.  At
        # 100 TB a caller reads the written dataset instead.  Arrow both
        # ways (toPandas + createDataFrame(pdf)): the collect()/Row-list
        # spelling re-pickles every row through 32 Python tasks when the
        # local frame is next materialized (~1.8 s at sf0.1); the Arrow
        # local relation costs ~0.06 s (guide §6, Arrow driver transfers).
        return spark.createDataFrame(out.toPandas(), out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)

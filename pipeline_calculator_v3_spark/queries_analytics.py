"""Event-analytics operators: sequence models, outlier detection, smoothing,
statistical profiling, and data-quality rules.

These round out the behavioral-analytics family (funnel / attribution /
retention in queries_rel.py and queries_spatial.py cousins) with the
*statistical* layer a production event pipeline runs next: first-order
Markov transition matrices over user journeys, per-segment z-score outlier
flagging, finite-kernel exponential smoothing, and declarative
data-quality rule evaluation.

Every query here is oracle-checkable: the math is written once as plain
arithmetic over deterministic inputs (md5-derived uniforms, exact binary
kernel weights) and replayed verbatim in the DuckDB SQL, so values — not
just shapes — are gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import query, events_t, t


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over user event sequences
# ---------------------------------------------------------------------------
@query(
    "q_markov_transitions",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ) AS prev_type
    FROM events
), c AS (
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
           / SUM(n_transitions) OVER (PARTITION BY prev_type) AS p_transition
FROM c
""",
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov chain over per-user event sequences: for every
    ordered (prev, next) event-type pair, the transition count and the
    row-normalized probability P(next | prev).

    The sequence order is (ts_us, event_id) — the shared session contract
    (same tie-break as sessionize/funnel/attribution), so simultaneous
    events order identically in Spark and DuckDB.

    Scale shape: ONE wide shuffle (the per-user lag window; users are the
    natural partition key and sequences are short).  The transition rollup
    reduces to |event_types|^2 rows, and the normalizing window runs on
    that tiny aggregate — cost is the user window, everything after is
    map-scale."""
    ev = events_t(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    counts = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )
    wp = Window.partitionBy("prev_type")
    return counts.withColumn(
        "p_transition",
        F.col("n_transitions").cast("double")
        / F.sum("n_transitions").over(wp),
    )


# ---------------------------------------------------------------------------
# Per-segment z-score outlier detection
# ---------------------------------------------------------------------------
@query(
    "q_anomaly_zscore",
    oracle="""
WITH st AS (
    SELECT event_type, value,
           avg(value)        OVER (PARTITION BY event_type) AS mu,
           stddev_pop(value) OVER (PARTITION BY event_type) AS sd
    FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN abs((value - mu) / sd) > 3.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       MAX(abs((value - mu) / sd)) AS max_abs_z
FROM st
GROUP BY event_type
""",
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score outlier flagging per event type: every value is
    scored against its segment's (mu, sigma_pop); the rollup reports how
    many rows exceed |z| > 3 and the worst offender per segment.

    Scale shape: the stats are computed with an unbounded window over
    event_type — ONE shuffle keyed on the (low-cardinality, potentially
    skewed) segment; AQE skew-split handles a hot type.  The final groupBy
    is on the SAME key, so the exchange is reused — the whole query is one
    shuffle end-to-end.  No join-back: the window form keeps the row and
    its segment stats co-located."""
    ev = events_t(spark, sf_dir)
    w = Window.partitionBy("event_type")
    scored = ev.select(
        "event_type",
        (
            F.abs(
                (F.col("value") - F.avg("value").over(w))
                / F.stddev_pop("value").over(w)
            )
        ).alias("abs_z"),
    )
    return scored.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("abs_z") > 3.0).cast("bigint")).alias("n_anomalies"),
        F.max("abs_z").alias("max_abs_z"),
    )


# ---------------------------------------------------------------------------
# Finite-kernel exponential smoothing (8-tap FIR EWMA)
# ---------------------------------------------------------------------------
# alpha = 0.5: every kernel weight 0.5^(k+1) is an exact binary double, so
# Spark and DuckDB compute bit-identical weighted sums (no libm involved).
_EWMA_TAPS = 8


def _ewma_terms(lag_fmt: str) -> tuple[str, str]:
    """(numerator, denominator) SQL fragments for the 8-tap kernel.

    ``lag_fmt`` renders the k-th lagged value (k=0 is the current row) —
    the caller supplies the engine's window syntax; the arithmetic shape is
    shared verbatim so both engines sum in the same order."""
    num = " + ".join(
        f"coalesce({lag_fmt.format(k=k)}, 0.0) * {0.5 ** (k + 1)!r}"
        for k in range(_EWMA_TAPS)
    )
    den = " + ".join(
        f"(CASE WHEN {lag_fmt.format(k=k)} IS NOT NULL"
        f" THEN {0.5 ** (k + 1)!r} ELSE 0.0 END)"
        for k in range(_EWMA_TAPS)
    )
    return num, den


_EWMA_NUM_DUCK, _EWMA_DEN_DUCK = _ewma_terms(
    "lag(value, {k}) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)"
)
_EWMA_NUM_SPARK, _EWMA_DEN_SPARK = _ewma_terms(
    "lag(value, {k}) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)"
)


@query(
    "q_ewma_smooth",
    oracle=f"""
WITH sm AS (
    SELECT user_id, value,
           ({_EWMA_NUM_DUCK}) / ({_EWMA_DEN_DUCK}) AS ewma,
           row_number() OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC
           ) AS rn
    FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(CASE WHEN rn = 1 THEN ewma END) AS ewma_last,
       AVG(ewma) AS ewma_mean
FROM sm
GROUP BY user_id
""",
)
def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of event values per user — an
    8-tap FIR kernel (alpha=0.5, weights renormalized over the taps that
    exist near sequence start), reported as the per-user trailing value and
    mean smoothed level.

    A finite kernel is the scale-honest form of EWMA on an engine without
    ordered per-row recursion: the infinite-horizon recurrence needs either
    a sequential scan per key or pow() terms that overflow at sequence
    length ~10^3, while the 8-tap truncation (residual weight 0.5^8 < 0.4%)
    is a bounded ROWS-frame computation any engine executes as one window
    pass.  alpha=0.5 makes every weight an exact binary double — the two
    engines' weighted sums are bit-identical, not merely close.

    Scale shape: one shuffle (per-user window); both row_number and the 8
    lags share the same window spec, so it is a single sort within the
    exchange.  The per-user rollup reuses the partitioning."""
    ev = events_t(spark, sf_dir)
    sm = ev.select(
        "user_id",
        (F.expr(_EWMA_NUM_SPARK) / F.expr(_EWMA_DEN_SPARK)).alias("ewma"),
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                F.col("ts_us").desc(), F.col("event_id").desc()
            )
        )
        .alias("rn"),
    )
    return sm.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max(F.when(F.col("rn") == 1, F.col("ewma"))).alias("ewma_last"),
        F.avg("ewma").alias("ewma_mean"),
    )


# ---------------------------------------------------------------------------
# Declarative data-quality rule evaluation
# ---------------------------------------------------------------------------
@query(
    "q_data_quality",
    oracle="""
WITH a AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
           CAST(SUM(CASE WHEN l_extendedprice <= 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
           CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_flag,
           CAST(SUM(CASE WHEN l_shipdate <  TIMESTAMP '1992-01-01'
                           OR l_shipdate >= TIMESTAMP '1999-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_ship,
           CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
                AS BIGINT) AS v_dup
    FROM lineitem
), fk AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS v_fk
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
), r AS (
    SELECT 'quantity_in_range'  AS rule_name, a.n, a.v_qty   AS v FROM a
    UNION ALL SELECT 'discount_in_range',  a.n, a.v_disc  FROM a
    UNION ALL SELECT 'price_positive',     a.n, a.v_price FROM a
    UNION ALL SELECT 'returnflag_domain',  a.n, a.v_flag  FROM a
    UNION ALL SELECT 'shipdate_window',    a.n, a.v_ship  FROM a
    UNION ALL SELECT 'line_key_unique',    a.n, a.v_dup   FROM a
    UNION ALL SELECT 'order_fk_exists',    a.n, fk.v_fk   FROM a, fk
)
SELECT rule_name, n AS n_checked, v AS n_violations,
       CAST(v AS DOUBLE) / n AS violation_rate
FROM r
""",
)
def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality rule evaluation over ``lineitem``: seven
    rules (range, domain, positivity, date-window, key-uniqueness and
    referential-integrity checks) reported as one row each with checked /
    violation counts and the violation rate.

    The expectation-suite shape (a la deequ/great-expectations): rules are
    declared as predicates, and the engine's job is to fold ALL of them
    into as few passes as possible rather than one scan per rule.

    Scale shape: the six predicate rules and the duplicate-key rule fold
    into ONE aggregation over one lineitem scan (the distinct-count adds an
    Expand, still a single shuffle-reduce); referential integrity is a
    LEFT ANTI join to orders (shuffle-keyed on l_orderkey, AQE-eligible)
    reduced to a single count.  The two 1-row aggregates cross-join (free)
    and ``stack`` unpivots to rule rows — 7 rows out, so everything after
    the two aggregates is driver-trivial."""
    li = t(spark, sf_dir, "lineitem")
    od = t(spark, sf_dir, "orders")

    def viol(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    a = li.agg(
        F.count("*").alias("n"),
        viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias(
            "v_qty"
        ),
        viol(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
        ).alias("v_disc"),
        viol(F.col("l_extendedprice") <= 0).alias("v_price"),
        viol(~F.col("l_returnflag").isin("A", "N", "R")).alias("v_flag"),
        viol(
            (F.col("l_shipdate") < F.lit("1992-01-01").cast("timestamp"))
            | (
                F.col("l_shipdate")
                >= F.lit("1999-01-01").cast("timestamp")
            )
        ).alias("v_ship"),
        (
            F.count("*")
            - F.count_distinct(F.col("l_orderkey"), F.col("l_linenumber"))
        )
        .cast("long")
        .alias("v_dup"),
    )
    fk = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"], "left_anti")
        .agg(F.count("*").cast("long").alias("v_fk"))
    )
    rules = a.crossJoin(fk).selectExpr(
        """stack(7,
            'quantity_in_range', v_qty,
            'discount_in_range', v_disc,
            'price_positive',    v_price,
            'returnflag_domain', v_flag,
            'shipdate_window',   v_ship,
            'line_key_unique',   v_dup,
            'order_fk_exists',   v_fk
        ) AS (rule_name, n_violations)""",
        "n AS n_checked",
    )
    return rules.select(
        "rule_name",
        "n_checked",
        "n_violations",
        (F.col("n_violations").cast("double") / F.col("n_checked")).alias(
            "violation_rate"
        ),
    )

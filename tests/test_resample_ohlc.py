"""operators/resample.py::ohlc_downsample — one-aggregate OHLC buckets.

Planted fixture with shared timestamps (exercises the (ts, tiebreak)
struct determinism) + a DuckDB arg_min/arg_max replay (pre-proving the
r09 oracle face)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pipeline_calculator_v3_spark.operators.resample import ohlc_downsample

BUCKET = 60_000_000  # 1 minute in epoch-us
# (event_id, user_id, ts_us, value) — bucket 0 has a shared-ts pair at the
# open (ids 2 < 5 tie-break) and at the close; bucket 1 is a single row;
# user 9 isolates the key grouping.
ROWS = [
    (2, 1, 10, 4.0),
    (5, 1, 10, 9.0),   # same ts as id 2: open must pick id 2's 4.0
    (3, 1, 30, 1.0),
    (7, 1, 59_999_999, 6.0),
    (6, 1, 59_999_999, 2.0),  # same ts as id 7: close must pick id 7's 6.0
    (8, 1, 60_000_000, 5.0),
    (9, 9, 20, 7.0),
    # pre-epoch timestamp: floor semantics put it in bucket -60_000_000;
    # naive // (truncate toward zero) would wrongly bucket it at 0
    (10, 9, -1, 3.0),
]


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(
        ROWS, "event_id long, user_id long, ts_us long, value double"
    )
    out = ohlc_downsample(
        df, "ts_us", "value", BUCKET,
        key_cols=["user_id"], tiebreak_col="event_id",
    ).collect()
    return {
        (r.user_id, r.bucket_start_us): (
            r.open, r.high, r.low, r.close, r.n_rows, r.mean_value
        )
        for r in out
    }


def test_buckets_and_values(result):
    assert result[(1, 0)] == (4.0, 9.0, 1.0, 6.0, 5, pytest.approx(4.4))
    assert result[(1, BUCKET)] == (5.0, 5.0, 5.0, 5.0, 1, 5.0)
    assert result[(9, 0)] == (7.0, 7.0, 7.0, 7.0, 1, 7.0)
    assert result[(9, -BUCKET)] == (3.0, 3.0, 3.0, 3.0, 1, 3.0)
    assert len(result) == 4


def test_bucket_guard(spark):
    df = spark.createDataFrame(ROWS, "event_id long, user_id long, ts_us long, value double")
    with pytest.raises(ValueError):
        ohlc_downsample(df, "ts_us", "value", 0)


def test_single_aggregate_plan(spark):
    df = spark.createDataFrame(
        ROWS, "event_id long, user_id long, ts_us long, value double"
    )
    # tie-broken form: one exchange, map-side partials, no window/join —
    # the struct ordering key makes it a SortAggregate (documented trade)
    plan = (
        ohlc_downsample(df, "ts_us", "value", BUCKET, key_cols=["user_id"],
                        tiebreak_col="event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "partial_min_by" in plan
    for bad in ("Window", "Join"):
        assert bad not in plan
    # primitive ordering key (no tie-break): the SAME code must stay a
    # HashAggregate — the regression this test exists to catch
    plan2 = (
        ohlc_downsample(df, "ts_us", "value", BUCKET, key_cols=["user_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan2.count("Exchange") == 1
    assert "HashAggregate" in plan2
    assert "SortAggregate" not in plan2


def test_duckdb_replay_agrees(result):
    """The exact SQL intended as the r09 registry oracle."""
    con = duckdb.connect()
    con.register(
        "ev",
        pd.DataFrame(ROWS, columns=["event_id", "user_id", "ts_us", "value"]),
    )
    # ts - ((ts % w + w) % w) is floor-aligned for negative ts too —
    # DuckDB's // and % truncate toward zero, Spark's pmod floors; this
    # spelling agrees with the operator over the full BIGINT range
    sql = f"""
WITH ranked AS (
    SELECT user_id,
           CAST(ts_us - ((ts_us % {BUCKET} + {BUCKET}) % {BUCKET})
                AS BIGINT) AS bucket_start_us,
           value,
           first_value(value) OVER w AS open,
           last_value(value) OVER
               (w RANGE BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS close
    FROM ev
    WINDOW w AS (PARTITION BY user_id,
                 ts_us - ((ts_us % {BUCKET} + {BUCKET}) % {BUCKET})
                 ORDER BY ts_us, event_id)
)
SELECT user_id, bucket_start_us,
       any_value(open) AS open,
       max(value) AS high,
       min(value) AS low,
       any_value(close) AS close,
       CAST(count(*) AS BIGINT) AS n_rows,
       avg(value) AS mean_value
FROM ranked GROUP BY 1, 2
"""
    oracle = {
        (int(r[0]), int(r[1])): tuple(
            float(x) if isinstance(x, float) else int(x) for x in r[2:]
        )
        for r in con.execute(sql).fetchall()
    }
    assert set(oracle) == set(result)
    for k, v in oracle.items():
        assert v == pytest.approx(result[k])


# ---------------------------------------------------------------------------
# Randomized property: for ANY small event set (shared timestamps likely,
# negative timestamps included), the operator equals a naive single-process
# reference — bucket flooring, (ts, id) tie-breaks, aggregates.
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_TS = st.integers(-3, 3).map(lambda k: k * 20_000_000)  # collision-heavy
_VAL = st.sampled_from([1.0, 2.5, -3.0, 7.25])
_KEY = st.sampled_from(["a", "b"])
_ROW = st.tuples(_TS, _VAL, _KEY)


@given(rows=st.lists(_ROW, min_size=1, max_size=12))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_property_equals_naive(spark, rows):
    data = [(i, k, ts, v) for i, (ts, v, k) in enumerate(rows)]
    expect: dict[tuple, list] = {}
    for i, k, ts, v in data:
        # floor-aligned bucket edge (Python % already floors like pmod)
        b = ts - ((ts % BUCKET) + BUCKET) % BUCKET
        cell = expect.setdefault((k, b), [])
        cell.append((ts, i, v))
    want = {}
    for key, cell in expect.items():
        cell.sort()
        vals = [v for _, _, v in cell]
        want[key] = (
            cell[0][2], max(vals), min(vals), cell[-1][2],
            len(cell), sum(vals) / len(cell),
        )
    df = spark.createDataFrame(
        data, "event_id long, user_id string, ts_us long, value double"
    )
    got = {
        (r.user_id, r.bucket_start_us): (
            r.open, r.high, r.low, r.close, r.n_rows, r.mean_value
        )
        for r in ohlc_downsample(
            df, "ts_us", "value", BUCKET,
            key_cols=["user_id"], tiebreak_col="event_id",
        ).collect()
    }
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key])

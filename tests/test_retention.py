"""operators/retention.py — cohort retention matrix (staged r11):
hand-computed planted cohorts, the offset-0 == 1.0 invariant, NULL
exclusion, max_offset truncation, and the events-table oracle replay."""

from __future__ import annotations

import datetime as dt

import pytest

from pipeline_calculator_v3_spark.operators.retention import cohort_retention

# The intended face oracle over events (day cohorts).
RETENTION_ORACLE = """
WITH active AS (
    SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
cohorts AS (SELECT u, min(day) AS cohort_day FROM active GROUP BY u),
sizes AS (
    SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_cohort
    FROM cohorts GROUP BY 1
),
cells AS (
    SELECT c.cohort_day,
           CAST(date_diff('day', c.cohort_day, a.day) AS BIGINT)
               AS day_offset,
           CAST(count(DISTINCT a.u) AS BIGINT) AS n_active
    FROM active a JOIN cohorts c USING (u)
    GROUP BY 1, 2
)
SELECT cells.cohort_day, day_offset, n_active, sizes.n_cohort,
       round(CAST(n_active AS DOUBLE) / sizes.n_cohort, 6) AS retention
FROM cells JOIN sizes USING (cohort_day)
ORDER BY cohort_day, day_offset
"""


def _ts(day: int, hour: int = 9) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


PLANTED = [
    # cohort Jan 1: users 1, 2, 3.  Day 1 (offset 0): all.  Jan 2
    # (offset 1): users 1, 2.  Jan 3 (offset 2): user 1 (twice — dedup).
    (1, _ts(1)), (2, _ts(1)), (3, _ts(1, 23)),
    (1, _ts(2)), (2, _ts(2)),
    (1, _ts(3)), (1, _ts(3, 22)),
    # cohort Jan 2: user 4 only; never returns.
    (4, _ts(2)),
    # NULL rows: excluded entirely
    (None, _ts(1)), (5, None),
]


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(PLANTED, "user_id long, ts timestamp")


def test_planted_matrix(planted):
    got = {
        (str(r.cohort_day), r.day_offset): (r.n_active, r.n_cohort,
                                            r.retention)
        for r in cohort_retention(planted).collect()
    }
    assert got == {
        ("2024-01-01", 0): (3, 3, 1.0),
        ("2024-01-01", 1): (2, 3, round(2 / 3, 6)),
        ("2024-01-01", 2): (1, 3, round(1 / 3, 6)),
        ("2024-01-02", 0): (1, 1, 1.0),
    }
    # user 5 (NULL ts) identified no cohort: only users 1-4 counted
    assert sum(v[1] for k, v in got.items() if k[1] == 0) == 4


def test_offset_zero_is_always_full(planted):
    rows = cohort_retention(planted).where("day_offset = 0").collect()
    assert rows and all(
        r.retention == 1.0 and r.n_active == r.n_cohort for r in rows
    )


def test_max_offset_truncates(planted):
    got = cohort_retention(planted, max_offset=1)
    assert got.where("day_offset > 1").count() == 0
    assert got.count() == 3


def test_events_oracle_replay(spark, duck, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = [
        (str(r.cohort_day), r.day_offset, r.n_active, r.n_cohort,
         r.retention)
        for r in cohort_retention(ev).collect()
    ]
    want = [
        (str(r[0]), r[1], r[2], r[3], r[4])
        for r in duck.execute(RETENTION_ORACLE).fetchall()
    ]
    assert got == want and len(got) > 10


def test_plan_lints(planted):
    plan = (
        cohort_retention(planted)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # cohort sizes broadcast back

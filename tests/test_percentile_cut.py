"""operators/classifier.py::percentile_cut_per_group — CCNet-style per-group
quality gate (planted scores + DuckDB replay, staged for r09)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pipeline_calculator_v3_spark.operators.classifier import (
    percentile_cut_per_group,
)

# (doc_id, source, score): web has 5 docs (keep_frac=0.4 -> ceil(2.0)=2),
# books has 3 (ceil(1.2)=2), wiki has 1 (ceil(0.4)=1 — small groups never
# empty out); doc 3/4 tie on score -> lower id wins the last slot
ROWS = [
    (0, "web", 9.0), (1, "web", 7.0), (2, "web", 5.0),
    (3, "web", 5.0), (4, "web", 1.0),
    (10, "books", 2.0), (11, "books", 8.0), (12, "books", 2.0),
    (20, "wiki", 0.5),
]
FRAC = 0.4


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, source string, score double")
    rows = percentile_cut_per_group(df, ["source"], "score", FRAC, "doc_id")
    return {r.doc_id: (r.keep, r.group_rank, r.group_n) for r in rows.collect()}


def test_keep_decisions(result):
    kept = {i for i, (k, _, _) in result.items() if k}
    # web: top-2 by (score desc, id) = 0 (9.0), 1 (7.0)
    # books: 11 (8.0) then the 2.0 tie -> lower id 10
    # wiki: its single doc survives (ceil never rounds a group to zero)
    assert kept == {0, 1, 11, 10, 20}


def test_ranks_and_counts(result):
    assert result[0] == (True, 1, 5)
    assert result[2][1:] == (3, 5)   # 5.0 tie: id 2 ranks above id 3
    assert result[3][1:] == (4, 5)
    assert result[20] == (True, 1, 1)


def test_frac_guard(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, source string, score double")
    with pytest.raises(ValueError):
        percentile_cut_per_group(df, ["source"], "score", 0.0, "doc_id")
    with pytest.raises(ValueError):
        percentile_cut_per_group(
            df.withColumnRenamed("score", "keep"), ["source"], "keep", 0.5,
            "doc_id",
        )


def test_single_exchange(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, source string, score double")
    plan = (
        percentile_cut_per_group(df, ["source"], "score", FRAC, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # both windows (rank + count) ride ONE source-keyed exchange
    assert plan.count("Exchange") == 1


def test_duckdb_replay_agrees(result):
    """The exact SQL intended as the r09 registry oracle."""
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(ROWS, columns=["doc_id", "source", "score"]))
    sql = f"""
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY source
                               ORDER BY score DESC, doc_id) AS BIGINT)
           AS group_rank,
       CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS group_n
FROM docs
"""
    oracle = {}
    for r in con.execute(sql).fetchall():
        rank, n = int(r[1]), int(r[2])
        import math
        # quantize before ceiling — the operator's advice-r08 contract
        oracle[int(r[0])] = (rank <= math.ceil(round(FRAC * n, 9)), rank, n)
    assert oracle == result


def test_exact_fraction_boundary_not_inflated(spark):
    # advice r08: 0.3 * 10 = 3.0000000000000004 in doubles -> naive ceil
    # keeps 4; the quantized contract keeps exactly 3
    rows = [(i, "s", float(100 - i)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = percentile_cut_per_group(df, ["source"], "score", 0.3, "doc_id")
    assert sum(r.keep for r in out.collect()) == 3


# ---------------------------------------------------------------------------
# percentile_gate_approx — the 100 TB swap documented in the exact face:
# per-group approx_percentile thresholds broadcast back, no per-group sort.
# Staged r09 as infra (an r10 registry face needs a driver-window slot).
# ---------------------------------------------------------------------------
from pipeline_calculator_v3_spark.operators.classifier import (
    percentile_gate_approx,
)


def test_approx_budget_and_top_set(spark):
    # 200 distinct scores in one group + a small group: with accuracy >> n
    # the GK sketch is rank-exact, so the approx gate's kept count may
    # differ from ceil(keep_frac * n) only by the threshold-inclusion
    # boundary (score >= threshold keeps the threshold row itself) — a
    # budget within +-1 — and the kept set must be a TOP set: every kept
    # score >= every dropped score inside its group (guaranteed by the
    # threshold form; rank windows can split ties, thresholds cannot).
    rows = [(i, "big", float(i)) for i in range(200)] + [
        (1000 + i, "small", float(1000 + i)) for i in range(13)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = percentile_gate_approx(df, ["source"], "score", 0.25).collect()
    import math
    for src, n in (("big", 200), ("small", 13)):
        grp = [r for r in out if r.source == src]
        assert len(grp) == n
        want = math.ceil(round(0.25 * n, 9))
        got = sum(1 for r in grp if r.keep)
        assert abs(got - want) <= 1, (src, got, want)
        kept_min = min(r.score for r in grp if r.keep)
        dropped_max = max((r.score for r in grp if not r.keep), default=-1e18)
        assert kept_min >= dropped_max
        # one threshold per group, echoed on every row
        assert len({r.threshold for r in grp}) == 1


def test_approx_plan_has_no_window_or_sort(spark):
    rows = [(i, "s", float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    plan = (
        percentile_gate_approx(df, ["source"], "score", 0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the whole point of the swap: one aggregate + broadcast join, the
    # corpus never sorts and never window-shuffles
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Sort" not in plan.replace("SortAggregate", "")


def test_approx_guards(spark):
    df = spark.createDataFrame(
        [(1, "s", 1.0)], "doc_id long, source string, score double"
    )
    with pytest.raises(ValueError):
        percentile_gate_approx(df, ["source"], "score", 0.0)
    with pytest.raises(ValueError):
        percentile_gate_approx(
            df.withColumnRenamed("score", "keep"), ["source"], "keep", 0.5
        )


def test_approx_null_scores_quarantine_false(spark):
    """Advice r09: approx_percentile ignores NULL scores, so a NULL-scored
    row is invisible to the budget — keep must coalesce to False, not ride
    through as SQL NULL in a BOOLEAN gate."""
    rows = [(0, "s", 9.0), (1, "s", 5.0), (2, "s", 1.0), (3, "s", None)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = {r.doc_id: r.keep for r in
           percentile_gate_approx(df, ["source"], "score", 0.5).collect()}
    assert out[3] is False
    assert out[0] is True and all(k is not None for k in out.values())


def test_approx_null_group_rows_survive(spark):
    """A NULL group key gets its own threshold from groupBy, but the
    old on-names join-back never matched it — NULL-lang rows VANISHED
    from the gate's output (r14 null-unsafe-join audit; fails pre-fix)."""
    from pipeline_calculator_v3_spark.operators.classifier import (
        percentile_gate_approx,
    )

    rows = [(1, "en", 0.9), (2, "en", 0.1), (3, None, 0.8),
            (4, None, 0.2), (5, None, 0.5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
    out = percentile_gate_approx(df, ["lang"], "s", keep_frac=0.5)
    assert out.count() == len(rows)
    got = {r.doc_id: r.keep for r in out.collect()}
    # NULL-lang group thresholds against ITS OWN distribution: the
    # p=0.5 cut of {0.8, 0.2, 0.5} is 0.5, so 0.2 drops and 0.8 keeps
    assert got[3] is True and got[4] is False

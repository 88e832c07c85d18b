"""q_zorder_pruned_scan — the bbox file-skipping consumer of the Morton
tile statistics (r11, VERDICT r10 #6): the superset contract (pruning
never loses a match), the actual skip (surviving tiles << tile universe),
and the broadcast plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# load the registry first: queries_spatial imported as the ENTRY module
# re-enters itself through queries.py's bottom import block (circular)
import pipeline_calculator_v3_spark.queries  # noqa: F401
from pipeline_calculator_v3_spark.queries_spatial import (
    _PRUNE_LAT_HI,
    _PRUNE_LAT_LO,
    _PRUNE_LON_HI,
    _PRUNE_LON_LO,
    _ZBITS,
    _ZTILE_SHIFT,
    q_zorder_pruned_scan,
)


def _points(spark, sf_dir):
    from pipeline_calculator_v3_spark.queries import t

    o = t(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("k"),
        (((F.col("o_orderkey") * 37) % 18000) / 100.0 - 90.0).alias("lat"),
        (((F.col("o_orderkey") * 101) % 36000) / 100.0 - 180.0).alias("lon"),
    )


@pytest.fixture(scope="module")
def result(spark, sf_dir):
    return q_zorder_pruned_scan(spark, sf_dir).collect()


def test_superset_contract(spark, sf_dir, result):
    """No bbox match is ever lost to pruning: the per-tile manifest
    min/max are TRUE bounds, so the exact full-scan count must equal the
    sum of matches inside surviving tiles."""
    exact = (
        _points(spark, sf_dir)
        .where(
            (F.col("lat") >= _PRUNE_LAT_LO) & (F.col("lat") <= _PRUNE_LAT_HI)
            & (F.col("lon") >= _PRUNE_LON_LO) & (F.col("lon") <= _PRUNE_LON_HI)
        )
        .count()
    )
    assert exact > 0, "fixture bbox must actually match something"
    assert sum(r.n_matched for r in result) == exact


def test_pruning_actually_skips(spark, sf_dir, result):
    """The point of the layout: the bbox touches a small corner of the
    tile universe, so most tiles are never read.  The bbox covers ~1.7%
    of the lat/lon plane; Morton tiles are compact, so surviving tiles
    must stay far below the populated-tile count."""
    from pipeline_calculator_v3_spark.operators.zorder import zorder_key

    total_tiles = (
        _points(spark, sf_dir)
        .select(
            F.shiftright(
                zorder_key(F.col("lat"), F.col("lon"), _ZBITS), _ZTILE_SHIFT
            ).alias("tile")
        )
        .distinct()
        .count()
    )
    assert len(result) < 0.15 * total_tiles, (len(result), total_tiles)
    # rows scanned (post-prune) also stay well under the full table
    n_rows = _points(spark, sf_dir).count()
    assert sum(r.n_scanned for r in result) < 0.25 * n_rows


def test_matches_never_exceed_scans(result):
    for r in result:
        assert 0 <= r.n_matched <= r.n_scanned, r


def test_plan_broadcasts_the_manifest(spark, sf_dir):
    """The prune result must come back as a broadcast join (the manifest
    is <= 1024 rows by construction) — a shuffled join here would move
    the corpus to the manifest, inverting the pruning economics."""
    from tests.compare import assert_no_plan_antipatterns

    df = q_zorder_pruned_scan(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "BroadcastHashJoin" in plan, plan
    assert_no_plan_antipatterns(df)

"""Cache/checkpoint lifecycle: nothing the engine persists may outlive
``release_caches`` (VERDICT r02 'What's wrong' #1) — and session confs set
by readers must not leak (#2)."""

from __future__ import annotations

import math

from pipeline_calculator_v3_spark import release_caches
from pipeline_calculator_v3_spark.caching import _persistent_ids
from pipeline_calculator_v3_spark.functions.geodesy import EARTH_RADIUS_M
from pipeline_calculator_v3_spark.plans.overlap import analyze_pipelines
from pipeline_calculator_v3_spark.queries import QUERIES, events_t

DEG_PER_M_LAT = 180.0 / (math.pi * EARTH_RADIUS_M)
T1_SCHEMA = (
    "pipeline_id bigint, name string, "
    "geometry array<struct<lon:double, lat:double>>"
)


def test_dedup_clusters_releases_everything(spark, sf_dir):
    release_caches(spark)  # start from a clean slate (other tests may pin)
    df = QUERIES["q_dedup_clusters"](spark, sf_dir)
    n = df.count()  # final materialization
    assert n > 0
    assert _persistent_ids(spark), "expected pinned state before release"
    release_caches(spark)
    assert _persistent_ids(spark) == set(), "dangling cached RDDs after release"


def test_overlap_e2e_releases_everything(spark):
    release_caches(spark)
    pipes = spark.createDataFrame(
        [
            (1, "A", [{"lon": -100.0, "lat": 40.0},
                      {"lon": -100.0, "lat": 40.0 + 400 * DEG_PER_M_LAT}]),
            (2, "B", [{"lon": -100.0 + 1e-5, "lat": 40.0},
                      {"lon": -100.0 + 1e-5, "lat": 40.0 + 400 * DEG_PER_M_LAT}]),
        ],
        T1_SCHEMA,
    )
    results = analyze_pipelines(pipes)
    # materialize the full envelope (the driver/sinks would)
    for name in ("lengths", "totals", "sections", "per_pipeline_overlap",
                 "effective", "summary"):
        results[name].collect()
    assert _persistent_ids(spark), "expected pinned segments/hits before release"
    release_caches(spark)
    assert _persistent_ids(spark) == set(), "dangling cached RDDs after release"


def test_minhash_releases_staged(spark, sf_dir):
    release_caches(spark)
    QUERIES["q_dedup_minhash"](spark, sf_dir).count()
    release_caches(spark)
    assert _persistent_ids(spark) == set()


def test_nanos_conf_scoped(spark, sf_dir):
    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key, None)
    ev = events_t(spark, sf_dir)
    assert spark.conf.get(key, None) == before, "events_t leaked the conf"
    # the frame still reads nanos-as-long after the conf was restored
    row = ev.select("ts_ns", "ts_us").limit(1).collect()[0]
    assert isinstance(row.ts_ns, int) and row.ts_us == row.ts_ns // 1000
    # a fresh inference-based read on the same session keeps default
    # behavior: without the legacy nanosAsLong conf, Spark 4.1 infers
    # TIMESTAMP(NANOS) as a (micro-truncated) timestamp type; with the conf
    # leaked it would come back LongType.
    inferred = spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType
    assert inferred.typeName() != "long", (
        f"post-events_t session infers nanos as {inferred} — legacy conf leaked"
    )

"""Sink roundtrip tests (reference ops 23-26)."""

from __future__ import annotations

import json
import math
import os

import pytest

from pipeline_calculator_v3_spark.functions.geodesy import EARTH_RADIUS_M
from pipeline_calculator_v3_spark.plans.overlap import analyze_pipelines
from pipeline_calculator_v3_spark.sinks import (
    write_corridor_kml,
    write_csv,
    write_json,
    write_txt_summary,
)

DEG_PER_M_LAT = 180.0 / (math.pi * EARTH_RADIUS_M)


@pytest.fixture(scope="module")
def results(spark):
    lon_off = 10.0 / (111320.0 * math.cos(math.radians(31.5)))
    pipes = spark.createDataFrame(
        [
            (1, "A", [{"lon": -103.5, "lat": 31.5},
                      {"lon": -103.5, "lat": 31.5 + 400.01 * DEG_PER_M_LAT}]),
            (2, "B", [{"lon": -103.5 - lon_off, "lat": 31.5},
                      {"lon": -103.5 - lon_off, "lat": 31.5 + 400.01 * DEG_PER_M_LAT}]),
        ],
        "pipeline_id bigint, name string, geometry array<struct<lon:double, lat:double>>",
    )
    return analyze_pipelines(pipes)


def test_csv_sink_single_file(results, tmp_path):
    write_csv(results, str(tmp_path), single_file=True)
    assert os.path.exists(tmp_path / "pipelines.csv")
    assert os.path.exists(tmp_path / "pipelines_overlaps.csv")
    header = (tmp_path / "pipelines.csv").read_text().splitlines()[0]
    assert "length_m" in header and "length_mi" in header


def test_csv_sink_distributed_default(results, tmp_path, spark):
    """The DEFAULT path writes executor-side part files per table."""
    write_csv(results, str(tmp_path))
    lengths = spark.read.option("header", True).csv(
        str(tmp_path / "pipelines")
    )
    assert lengths.count() == 2
    assert {"pipeline_id", "name", "length_m", "length_mi"} <= set(
        lengths.columns
    )
    overlaps = spark.read.option("header", True).csv(
        str(tmp_path / "pipelines_overlaps")
    )
    assert overlaps.count() == 1


def test_json_sink(results, tmp_path):
    p = tmp_path / "results.json"
    write_json(results, str(p))
    env = json.loads(p.read_text())
    assert len(env["pipelines"]) == 2
    assert len(env["overlap_analysis"]["bundled_sections"]) == 1
    sec = env["overlap_analysis"]["bundled_sections"][0]
    assert len(sec["corridor_polygon"]) >= 4


def test_txt_sink(results, tmp_path):
    p = tmp_path / "summary.txt"
    write_txt_summary(results, str(p))
    lines = p.read_text().splitlines()
    assert len(lines) == 4
    assert lines[0] == "Total pipelines: 2"


def test_kml_sink(results, tmp_path):
    sec = results["sections"].collect()[0]
    p = tmp_path / "corridor.kml"
    write_corridor_kml(sec, str(p))
    body = p.read_text()
    assert "<Polygon>" in body and "<coordinates>" in body
    # ring closed: first coordinate == last
    coords = [
        line.strip() for line in body.splitlines()
        if line.strip() and "," in line and "<" not in line
    ]
    assert coords[0] == coords[-1]
    assert len(coords) >= 5


def test_json_distributed_sink(results, tmp_path, spark):
    from pipeline_calculator_v3_spark.sinks import write_json_distributed

    out = str(tmp_path / "dist")
    write_json_distributed(results, out)
    # per-table JSONL directories written by executors, not the driver
    lengths = spark.read.json(os.path.join(out, "lengths"))
    assert lengths.count() == 2
    assert {"pipeline_id", "name", "length_m", "length_mi"} <= set(lengths.columns)
    sections = spark.read.json(os.path.join(out, "sections"))
    assert sections.count() == 1
    row = sections.collect()[0]
    assert len(row.corridor_polygon) >= 4  # nested geometry survives JSON
    # small summary stays a single driver file, same values as the envelope
    summary = json.loads((tmp_path / "dist" / "summary.json").read_text())
    assert len(summary) == 1 and summary[0]["total_m"] > 0


def test_kml_sink_output_survives_our_own_source(results, tmp_path, spark):
    """Sink->source consistency: the corridor KML we write is valid KML
    our reader scans without error.  The reference's coordinate-count
    fallback (src/pipeline_calculator_v3.py:110-128) treats ANY
    multi-coordinate Placemark as a polyline feature, so the faithful
    outcome is ONE feature whose geometry is the corridor's closed ring
    — parsed, not crashed, ring closure preserved through the round
    trip."""
    from pipeline_calculator_v3_spark.sources.kml import read_pipelines

    sec = results["sections"].collect()[0]
    p = tmp_path / "corridor.kml"
    write_corridor_kml(sec, str(p))
    pipes = read_pipelines(spark, str(p)).collect()
    assert len(pipes) == 1
    ring = pipes[0]["geometry"]
    assert len(ring) >= 5
    # the sink writes a CLOSED ring and the parser preserves it verbatim
    assert ring[0] == ring[-1]


def test_txt_summary_handles_empty_input(spark, tmp_path):
    """Review r12: zero valid pipelines leaves the SUM aggregates NULL;
    the report writes zeros instead of crashing the format spec on None."""
    from pyspark.sql import functions as F

    empty = spark.createDataFrame([], "pipeline_id bigint, length_m double")
    totals = empty.agg(
        F.count(F.lit(1)).alias("n_pipelines"),
        F.sum("length_m").alias("total_m"),
        (F.sum("length_m") / 1609.347218694).alias("total_mi"),
    )
    summary = empty.agg(
        F.sum("length_m").alias("effective_m"),
        F.lit(None).cast("double").alias("savings_pct"),
    )
    p = tmp_path / "summary.txt"
    write_txt_summary({"totals": totals, "summary": summary}, str(p))
    text = p.read_text()
    assert "Total pipelines: 0" in text
    assert "Total length (m): 0.00" in text
    assert "savings 0.0%" in text

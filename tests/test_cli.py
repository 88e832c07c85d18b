"""__main__.py — the reference's GUI workflow as a command: analyze a
small parallel-pair KML end-to-end (parse -> ops 1-22 -> stdout tables ->
every export format) through the real argparse entry point."""

from __future__ import annotations

import json
import os

import pytest

from pipeline_calculator_v3_spark.__main__ import main

# two due-north lines ~9 m apart for ~1.1 km: one bundled section under
# the default 15 m / 200 m parameters
_N_PTS = 24


def _coords(lon0: float) -> str:
    return " ".join(f"{lon0},{31.0 + i * 0.0004},0" for i in range(_N_PTS))


_KML = f"""<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2">
<Document>
  <Placemark><name>West</name>
    <LineString><coordinates>{_coords(-100.0)}</coordinates></LineString>
  </Placemark>
  <Placemark><name>East</name>
    <LineString><coordinates>{_coords(-99.9999)}</coordinates></LineString>
  </Placemark>
</Document>
</kml>
"""


@pytest.fixture(scope="module")
def analyzed(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("cli_src") / "pair.kml"
    src.write_text(_KML)
    out = tmp_path_factory.mktemp("cli_out")
    rc = main([
        "analyze", str(src), "--out-dir", str(out),
        "--single-file", "--top", "5",
    ])
    return rc, str(out)


def test_exit_code_zero(analyzed):
    assert analyzed[0] == 0


def test_all_export_formats_written(analyzed):
    _, out = analyzed
    for f in ("pipelines.csv", "pipelines_overlaps.csv",
              "analysis.json", "summary.txt"):
        assert os.path.exists(os.path.join(out, f)), f
    kmls = os.listdir(os.path.join(out, "corridors"))
    assert len(kmls) == 1 and kmls[0].endswith(".kml")


def test_envelope_contents(analyzed):
    _, out = analyzed
    env = json.load(open(os.path.join(out, "analysis.json")))
    assert {p["name"] for p in env["pipelines"]} == {"West", "East"}
    secs = env["overlap_analysis"]["bundled_sections"]
    assert len(secs) == 1 and secs[0]["n_hits"] >= 40
    lines = open(os.path.join(out, "summary.txt")).read().splitlines()
    assert lines[0] == "Total pipelines: 2"


def test_missing_input_is_a_clean_error(tmp_path, capsys):
    rc = main(["analyze", str(tmp_path / "nope.kml")])
    assert rc == 2
    assert "no such input" in capsys.readouterr().err


def test_distributed_exports_and_multi_input(spark, tmp_path):
    """The 100 TB export path: part-file CSV/JSON (no driver collect of
    the big tables), summary still a single small file; plus multi-file
    input (pipeline ids stay unique across files)."""
    a, b = tmp_path / "a.kml", tmp_path / "b.kml"
    a.write_text(_KML)
    b.write_text(_KML.replace("West", "North").replace("East", "South"))
    out = tmp_path / "out"
    rc = main([
        "analyze", str(a), str(b), "--out-dir", str(out),
        "--distributed-json", "--no-kml",
    ])
    assert rc == 0
    # distributed CSV: a directory of part files per table
    assert any(
        f.startswith("part-")
        for f in os.listdir(out / "pipelines")
    )
    # distributed JSON: part files for the big tables, one summary.json
    assert any(
        f.startswith("part-")
        for f in os.listdir(out / "json" / "sections")
    )
    summary = json.load(open(out / "json" / "summary.json"))
    assert len(summary) == 1
    assert not os.path.exists(out / "corridors")
    names = {
        r.name
        for r in spark.read.option("header", True)
        .csv(str(out / "pipelines"))
        .collect()
    }
    assert names == {"West", "East", "North", "South"}


def test_query_subcommand(spark, tmp_path, capsys):
    rc = main([
        "query", "q_tpch_q6_forecast_revenue",
        "--sf-dir", os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001"),
        "--limit", "5", "--out", str(tmp_path / "res"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "rows: 1" in out and "revenue" in out
    assert spark.read.parquet(str(tmp_path / "res")).count() == 1


def test_query_subcommand_list_and_unknown(capsys):
    assert main(["query", "list"]) == 0
    assert "q_geodesic_length" in capsys.readouterr().out
    assert main(["query", "q_nope"]) == 2
    assert "unknown query" in capsys.readouterr().err

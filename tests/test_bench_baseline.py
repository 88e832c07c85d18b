"""bench.py::_last_recorded_timings — the straggler-baseline resolver
(pure Python, no Spark): later rounds override earlier, LOCAL overrides
the driver capture of the same round, escaped driver tails still parse,
and the BENCH_ISOLATED.json overlay (r10, VERDICT r09 #6) floors the
baseline at the lowest credible recorded cost."""

from __future__ import annotations

import json

import pytest

import bench


@pytest.fixture()
def repo(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_repo_dir", lambda: str(tmp_path))
    return tmp_path


def _write(repo, name, obj):
    (repo / name).write_text(
        obj if isinstance(obj, str) else json.dumps(obj)
    )


def test_later_rounds_override(repo):
    _write(repo, "BENCH_r01.json", {"queries": {"q_x": 5.0}})
    _write(repo, "BENCH_r02.json", {"queries": {"q_x": 7.0}})
    assert bench._last_recorded_timings()["q_x"] == 7.0


def test_local_overrides_driver_same_round(repo):
    _write(repo, "BENCH_r03.json", {"queries": {"q_x": 9.0}})
    _write(repo, "BENCH_LOCAL_r03.json", {"queries": {"q_x": 4.0}})
    assert bench._last_recorded_timings()["q_x"] == 4.0


def test_escaped_driver_tail_parses(repo):
    # the r09 advice finding: a raw capture keeps quotes escaped
    _write(
        repo,
        "BENCH_r04.json",
        '{"n": 1, "rc": 0, "tail": "\\"q_x\\": 3.25, \\"q_y\\": 1.5"}',
    )
    got = bench._last_recorded_timings()
    assert got["q_x"] == 3.25 and got["q_y"] == 1.5


def test_isolated_overlay_floors_the_baseline(repo):
    _write(repo, "BENCH_r05.json", {"queries": {"q_x": 8.0, "q_y": 2.0}})
    _write(
        repo,
        "BENCH_ISOLATED.json",
        {"queries": {"q_x": 5.5, "q_z": 1.0}},
    )
    got = bench._last_recorded_timings()
    assert got["q_x"] == 5.5, "isolated min must floor the round value"
    assert got["q_y"] == 2.0, "absent from isolated -> round value stands"
    assert got["q_z"] == 1.0, "isolated-only queries still get a baseline"


def test_isolated_overlay_never_raises_the_baseline(repo):
    _write(repo, "BENCH_r06.json", {"queries": {"q_x": 3.0}})
    _write(repo, "BENCH_ISOLATED.json", {"queries": {"q_x": 4.5}})
    # a stale (inflated) isolated record must not weaken the check
    assert bench._last_recorded_timings()["q_x"] == 3.0


def test_unreadable_isolated_record_is_ignored(repo):
    _write(repo, "BENCH_r07.json", {"queries": {"q_x": 2.0}})
    _write(repo, "BENCH_ISOLATED.json", "not json {")
    assert bench._last_recorded_timings()["q_x"] == 2.0


def test_measure_isolated_slowest_selection(repo, monkeypatch):
    """scripts/measure_isolated.py --slowest N picks the N highest recorded
    timings that are still registered queries (renamed/retired queries in
    old bench artifacts must not be selected)."""
    import importlib

    mi = importlib.import_module("scripts.measure_isolated")
    _write(
        repo,
        "BENCH_r08.json",
        {"queries": {"q_slow": 9.0, "q_mid": 5.0, "q_fast": 1.0,
                     "q_retired": 99.0}},
    )
    assert mi.select_slowest(2, {"q_slow", "q_mid", "q_fast"}) == [
        "q_slow", "q_mid",
    ]
    assert mi.OUT.endswith("BENCH_ISOLATED.json")

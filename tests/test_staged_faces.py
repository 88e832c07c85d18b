"""Driver-grade dress rehearsal for every r15 face candidate in
queries_staged.py: the Spark result and the DuckDB oracle compare under
the SAME normalization the driver hash applies (tests/compare.py) —
schema set, row count, dtype-strict typed values.  A face that passes
here lands hash-green when r15 registers it; a face that fails here is
fixed BEFORE it costs a window slot."""

from __future__ import annotations

import pytest

from pipeline_calculator_v3_spark.queries_staged import staged_queries
from tests.compare import assert_frames_match

STAGED = staged_queries()


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_face_matches_oracle(name, spark, duck, sf_dir):
    fn, oracle = STAGED[name]
    got = fn(spark, sf_dir).toPandas()
    assert len(got) > 0, f"{name}: empty result"
    if oracle is None:
        return
    want = duck.execute(oracle).df()
    assert_frames_match(got, want)


def test_staged_faces_not_registered():
    """The r14 window is frozen at exactly 50 slots — a staged face
    leaking into the registry would silently evict the keep-list tail
    (the r06 window-arithmetic rule)."""
    import __spark_entry__ as mod

    registered = set(mod.queries())
    assert not (set(STAGED) & registered)


def test_staged_faces_plan_lint(spark, sf_dir):
    """The registry-wide plan bars apply to future faces too — except
    q_dataset_diff_rows, whose plan hangs off freshly WRITTEN temp
    files (building it here just to lint costs a full store build; its
    operator plans are linted in tests/test_dataset_versions.py)."""
    from tests.compare import assert_no_plan_antipatterns

    for name, (fn, _) in sorted(STAGED.items()):
        if name == "q_dataset_diff_rows":
            continue
        assert_no_plan_antipatterns(fn(spark, sf_dir))

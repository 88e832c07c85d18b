"""Driver-style comparison of a Spark result vs a DuckDB oracle result.

Mirrors the driver's contract: row-count + column-name set + order-insensitive
value comparison (columns sorted by name, rows sorted by all columns).  Floats
compare with relative tolerance to absorb summation-order / libm-ulp noise.
"""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    # Sort on exact-typed columns first; float columns participate via a
    # rounded key so ulp-level noise cannot reorder rows across systems.
    exact = [c for c in df.columns if not pd.api.types.is_float_dtype(df[c])]
    floats = [c for c in df.columns if pd.api.types.is_float_dtype(df[c])]
    for c in floats:
        df[f"__r_{c}"] = df[c].round(4)
    sort_cols = exact + [f"__r_{c}" for c in floats]
    out = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    return out[[c for c in out.columns if not c.startswith("__r_")]]


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                        rel_tol: float = 1e-8, abs_tol: float = 1e-9) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"column mismatch: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        # Dtype-strict gate: the driver's value-hash is TYPED, so an int64
        # column on one side vs float64 on the other diverges even when every
        # value is numerically identical (this is exactly how the
        # q_curation_e2e uncast-HUGEINT oracle slipped past pytest in r05).
        # The only legitimate int-vs-float split is pandas' nullable-int
        # representation, recognisable by NaN actually present on the float
        # side — anything else must fail here, before value comparison.
        int_a = pd.api.types.is_integer_dtype(av)
        int_b = pd.api.types.is_integer_dtype(bv)
        if int_a != int_b:
            fv = bv if int_a else av
            side = "oracle" if int_a else "spark"
            assert pd.api.types.is_float_dtype(fv) and fv.isna().any(), (
                f"{c}: dtype split — spark={av.dtype} vs oracle={bv.dtype} "
                f"with no NaN on the {side} side; the driver's typed hash "
                f"will flag this (cast the oracle explicitly, e.g. "
                f"CAST(... AS BIGINT) in every UNION ALL branch)"
            )
        # Nullable int columns surface as float64 in pandas; if both sides are
        # integral, compare exactly — tolerance on epoch-scale ints would hide
        # real precision bugs (it did: ns-vs-us truncation).
        if (
            pd.api.types.is_float_dtype(av)
            and pd.api.types.is_float_dtype(bv)
            and av.dropna().apply(float.is_integer).all()
            and bv.dropna().apply(float.is_integer).all()
        ):
            mism = (av != bv) & ~(av.isna() & bv.isna())
            assert not mism.any(), (
                f"{c}: integral mismatch at row {mism.idxmax()}: "
                f"{av[mism.idxmax()]!r} vs {bv[mism.idxmax()]!r}"
            )
        elif pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            for i, (x, y) in enumerate(zip(av.astype(float), bv.astype(float))):
                nx, ny = pd.isna(x), pd.isna(y)
                assert nx == ny, f"{c}[{i}]: NaN mismatch {x} vs {y}"
                if not nx:
                    assert math.isclose(x, y, rel_tol=rel_tol, abs_tol=abs_tol), (
                        f"{c}[{i}]: {x} != {y}"
                    )
        else:
            mism = (av != bv) & ~(av.isna() & bv.isna())
            assert not mism.any(), (
                f"{c}: first mismatch at row {mism.idxmax()}: "
                f"{av[mism.idxmax()]!r} vs {bv[mism.idxmax()]!r}"
            )


def assert_no_plan_antipatterns(df) -> None:
    """Physical-plan lint for every registry query: a CartesianProduct is
    never acceptable in this engine (the legitimate tiny-side cross joins
    broadcast, planning as BroadcastNestedLoopJoin; a CartesianProduct
    means a join lost its keys or its broadcast and would all-pairs at
    100 TB).  Swept clean across all 185 registry plans at r08 — this
    keeps it that way.  Checkpointed frames hide their build-time
    subtrees; those operators carry their own plan gates in
    tests/test_plans.py."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "CartesianProduct" not in plan, (
        "CartesianProduct in physical plan — a join lost its keys or its "
        "broadcast:\n" + plan
    )
    # Row-at-a-time Python UDFs are never acceptable in a registry plan
    # (r10: the 'UDFs are the slow path' rule enforced mechanically, not
    # by audit): scalar Python work must go through Arrow — @pandas_udf
    # (ArrowEvalPython), mapInPandas, applyInPandas.  The negative
    # lookahead excludes BatchEvalPythonUDTF: the Python-UDTF surface
    # probe (q_udtf_surface) legitimately plans that node and is itself
    # the declared exception.
    import re as _re

    assert not _re.search(r"BatchEvalPython(?!UDTF)", plan), (
        "row-at-a-time Python UDF (BatchEvalPython) in physical plan — "
        "use a pandas UDF / mapInPandas instead:\n" + plan
    )


def assert_scalar_output_schema(df, name: str) -> None:
    """Registry-wide schema gate for ORACLE-BACKED queries (VERDICT r08 #1):
    the correctness driver hashes result rows as Python tuples, so any
    ArrayType/MapType/StructType output column raises 'unhashable type'
    and turns a perfectly-planned query into an ERR verdict (r08:
    q_embed_project).  The repo's own rule — q_array_funcs's 'scalar
    outputs only' note — enforced mechanically: flatten arrays to named
    scalar columns (proj_0..proj_7 style) on both faces."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: oracle-backed queries must emit scalar-only schemas "
        f"(the driver hasher dies on lists) — non-scalar columns: {bad}"
    )


def driver_canon_hash(pdf) -> int:
    """The ONE spelling of the driver-style value canon (shared with
    scripts/preflight_window.py): float columns quantize to 6 significant
    digits ('%.6g' — raw-double queries have hash-greened with the real
    driver for eight rounds despite last-ulp engine divergence, so
    exact-value hashing false-flags them), then columns sort by name,
    rows sort by value, and the frame hashes to one integer."""
    import pandas as pd

    pdf = pdf.copy()
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("float"):
            pdf[c] = pdf[c].map(
                lambda x: "nan" if pd.isna(x) else f"{x:.6g}"
            )
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return int(pd.util.hash_pandas_object(pdf, index=False).sum())


def assert_driver_hash_match(spark_pdf, oracle_pdf, name: str) -> None:
    """Driver-bar value identity (r09): assert_frames_match tolerates
    small float noise the driver's quantized-exact hash would not, so a
    query could pass pytest and still red the round.  Proven clean for
    all 172 oracle-backed queries at sf0.001 AND sf0.01 before being
    gated here.  Dtype families are aligned first (int32 vs int64 hash
    differently; values are what matter)."""
    s, o = spark_pdf.copy(), oracle_pdf.copy()
    for c in s.columns:
        if c in o.columns and str(s[c].dtype) != str(o[c].dtype):
            try:
                s[c] = s[c].astype("float64")
                o[c] = o[c].astype("float64")
            except (TypeError, ValueError):
                pass
    assert driver_canon_hash(s) == driver_canon_hash(o), (
        f"{name}: driver-style quantized value hash mismatch (the "
        f"float-tolerant matcher passed, so the divergence sits past "
        f"assert_frames_match's tolerance but inside the driver's "
        f"quantized-exact bar)"
    )

"""Pins the tokenization/normalization equivalence the curation funnel
relies on (r05 advice, operators/dedup.py tokens_col contract):

    tokens(lower(text)) == tokens(normalized_text(text))

holds ONLY because ``tokens`` splits on ``\\s+`` and drops empty tokens,
which makes normalized_text's trim + whitespace-collapse a no-op under
tokenization.  If either side changes (tokenizer regex, normalization
strategy), the curation funnel's pre-tokenized fast path silently desyncs
from the standalone dedup queries — this test makes that loud."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.functions.text import (
    normalized_text,
    tokens,
)

# whitespace-heavy alphabet: every char class that could distinguish the
# two derivations (mixed-case words, tabs/newlines/CRs, runs of spaces,
# leading/trailing whitespace, punctuation stuck to words, unicode)
_TEXT = st.text(
    alphabet=st.sampled_from(list("aAbB zZ.,!\t\n\r ") + ["é", "世"]),
    max_size=40,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_TEXT, min_size=1, max_size=25))
def test_tokens_normalization_equivalence(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = df.select(
        tokens(F.lower(F.col("text"))).alias("fast"),
        tokens(normalized_text(F.col("text"))).alias("canonical"),
    ).collect()
    for r in out:
        assert r.fast == r.canonical, (r.fast, r.canonical)


def test_whitespace_collapse_is_noop_under_tokenization(spark):
    # the exact shapes that would diverge if tokens() ever stopped dropping
    # empties or splitting on full \s+
    cases = ["  A  b\t\tC \n", "\r\na B\r", "x", "", "   ", "a b"]
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    out = df.select(
        tokens(F.lower(F.col("text"))).alias("fast"),
        tokens(normalized_text(F.col("text"))).alias("canonical"),
    ).collect()
    for r in out:
        assert r.fast == r.canonical, (r.fast, r.canonical)


def test_token_count_survives_empty_text(spark, tmp_path):
    """Review r06: an empty-text document made chars_per_bpe evaluate
    0.0/0 — Spark's default ANSI mode aborts the job where DuckDB NULLs.
    The nullif guard must yield NULL on BOTH engines."""
    import duckdb

    from pipeline_calculator_v3_spark.queries import ORACLE_SQL, QUERIES

    docs = spark.createDataFrame(
        [(1, "hello world", "en", 11), (2, "", "en", 0)],
        "doc_id long, text string, lang string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r.chars_per_bpe for r in
           QUERIES["q_token_count"](spark, str(tmp_path)).collect()}
    assert got[2] is None and got[1] is not None
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    o = {r[0]: r[3] for r in
         con.execute(ORACLE_SQL["q_token_count"]).fetchall()}
    import math
    assert o[2] is None or (isinstance(o[2], float) and math.isnan(o[2]))

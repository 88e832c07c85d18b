"""Python UDTF surface: the LATERAL table function must emit IDENTICAL
rows to the pure-HOF chunking expansion (operators/chunking.py) — the
JVM-vs-Python agreement gate q_udf_surface applies to scalar UDFs,
extended to user-defined expansions."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.operators.chunking import chunk_tokens
from pipeline_calculator_v3_spark.queries import QUERIES


def test_udtf_matches_hof_expansion(spark, sf_dir):
    udtf_rows = sorted(
        (r.doc_id, r.chunk_idx, r.n_tokens, r.first_token)
        for r in QUERIES["q_udtf_surface"](spark, sf_dir).collect()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hof_rows = sorted(
        (r.doc_id, r.chunk_idx, r.n_tokens, r.first_token)
        for r in chunk_tokens(docs, max_len=32, stride=16).collect()
    )
    assert udtf_rows == hof_rows

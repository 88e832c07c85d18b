"""Semantic recall/precision contract for benchmark decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.queries import QUERIES


def _run_counts(spark, docs, tmp_path):
    """Run the q_contamination dataflow on an in-memory corpus by writing it
    to a parquet dir shaped like the testdata."""
    d = str(tmp_path / "corpus")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = QUERIES["q_contamination"](spark, d).collect()
    return {r.source: (r.n_train, r.n_flagged) for r in out}


def test_planted_copy_is_flagged_and_clean_is_not(spark, tmp_path):
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    rows = [
        # doc 10: benchmark member (doc_id % 10 == 0)
        (10, base + " kilo lima", "en", "bench_src", 60),
        # doc 11: train doc sharing an 8-gram window with the benchmark -> flagged
        (11, "XX " + base + " YY", "en", "dirty_src", 64),
        # doc 12: train doc with entirely different text -> clean
        (12, "one two three four five six seven eight nine ten eleven twelve",
         "en", "clean_src", 60),
        # doc 13: shares only a 5-gram (sub-threshold) -> clean
        (13, "alpha bravo charlie delta echo nope nope nope nope nope",
         "en", "short_overlap_src", 55),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = _run_counts(spark, docs, tmp_path)
    assert got["dirty_src"] == (1, 1), got
    assert got["clean_src"] == (1, 0), got
    assert got["short_overlap_src"] == (1, 0), got
    assert "bench_src" not in got  # benchmark rows are not train rows

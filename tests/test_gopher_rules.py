"""Planted-text gates for q_gopher_rules: the synthetic corpus contains no
'#' or '...' and no sub-threshold mean word lengths, so the oracle-parity
run never exercises the symbol-ratio or mean-length branches — these
fixtures do, on BOTH faces (Spark vs DuckDB over the same planted rows)."""

from __future__ import annotations

import duckdb
import pytest

# registry first (import-order contract, see test_stream_ingest.py)
from pipeline_calculator_v3_spark.queries import QUERIES  # noqa: I001
from pipeline_calculator_v3_spark.queries_textml import _gopher_oracle

from .compare import assert_frames_match

# (doc_id, text, lang, source, n_chars) rows engineered per rule branch:
#  1: long clean English prose          -> keep
#  2: symbol wall (# and ...)           -> r_symbol fails
#  3: two-letter words (mean len < 3)   -> r_mean_len fails
#  4: numeric dump (no alpha tokens)    -> r_alpha (and stopwords) fail
#  5: short doc                         -> r_word_count fails
_CLEAN = ("the quick brown fox jumps over the lazy dog and then walks "
          "down this long winding road with a friend of his from town "
          "while they talk about many small things that happened to them "
          "during the past week and what they hope to see next ") * 2
_ROWS = [
    (1, _CLEAN, "en", "s0"),
    (2, "### broken ### markup ... trailing ... dots ### " * 12, "en", "s0"),
    (3, "ab cd ef gh ij kl mn op qr st uv wx yz " * 8, "en", "s0"),
    (4, "1234 5678 9012 3456 7890 " * 16, "en", "s0"),
    (5, "too short to pass the gate", "en", "s0"),
]


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    pq = str(tmp_path_factory.mktemp("gopher") / "documents.parquet")
    df = spark.createDataFrame(
        [(i, t, l, s, len(t)) for (i, t, l, s) in _ROWS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(pq)
    return pq


def test_rule_branches_fire(spark, planted):
    import os

    rows = {
        r.doc_id: r
        for r in QUERIES["q_gopher_rules"](
            spark, os.path.dirname(planted)
        ).collect()
    }
    assert rows[1].keep
    assert not rows[2].r_symbol and rows[2].symbol_ratio > 0.1
    assert not rows[3].r_mean_len and rows[3].mean_word_len < 3
    assert not rows[4].r_alpha and rows[4].alpha_frac == 0.0
    assert not rows[5].r_word_count
    assert [rows[i].keep for i in (2, 3, 4, 5)] == [False] * 4


def test_both_faces_agree_on_planted_text(spark, planted):
    import os

    spdf = QUERIES["q_gopher_rules"](
        spark, os.path.dirname(planted)
    ).toPandas()
    con = duckdb.connect()
    # Spark writes a part-file directory; DuckDB needs the glob
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{planted}/*.parquet')"
    )
    odf = con.execute(_gopher_oracle()).df()
    assert_frames_match(spdf, odf)

"""sources/formats.py::read_jsonl_quarantined gates: quarantine
semantics and round-trip fidelity on the inputs JSON actually mangles —
unicode, newlines, quotes, nulls, empty strings.  (Complements
tests/test_formats.py, which gates the underlying read_jsonl.)"""

from __future__ import annotations

import os

import pytest

from pipeline_calculator_v3_spark.sources.formats import (
    read_jsonl_quarantined,
    write_jsonl,
)

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)

ROWS = [
    (1, 'quotes " and \\ backslash', "en", "s1", 24),
    (2, "newline\nand\ttab", "en", "s1", 15),
    (3, "unicode: café 中文 \U0001f600", "zh", "s2", 12),
    (4, "", "en", "s2", 0),       # empty string must NOT become null
    (5, None, None, "s3", None),  # nulls must survive as nulls
]


@pytest.fixture(scope="module")
def tripped(spark, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("jsonl"))
    df = spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, source string, n_chars long"
    )
    write_jsonl(df, work)
    with open(os.path.join(work, "junk.json"), "w") as f:
        f.write('{"doc_id": oops}\nnot json at all\n')
    parsed, quarantined = read_jsonl_quarantined(spark, work, DOCS_SCHEMA)
    return (
        {r.doc_id: (r.text, r.lang, r.source, r.n_chars) for r in parsed.collect()},
        sorted(r.raw for r in quarantined.collect()),
    )


def test_roundtrip_preserves_values(tripped):
    parsed, _ = tripped
    for doc_id, text, lang, source, n_chars in ROWS:
        assert parsed[doc_id] == (text, lang, source, n_chars), doc_id


def test_corrupt_lines_quarantined_verbatim(tripped):
    parsed, quarantined = tripped
    assert len(parsed) == len(ROWS), "corrupt lines must not become rows"
    assert quarantined == ["not json at all", '{"doc_id": oops}']

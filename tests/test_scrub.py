"""PII scrub cascade: rule semantics, cascade-order accounting, SQL helper
identity, and the curation-funnel wiring (VERDICT r06 #6)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.functions.scrub import (
    PII_RULES,
    scrub_sql,
    scrub_text,
    scrub_with_counts,
)


def _scrub_one(spark, text: str):
    df = spark.createDataFrame([(text,)], "t0 string")
    clean, counts = scrub_with_counts(F.col("t0"))
    row = df.select(
        clean.alias("clean"),
        *[c.alias(n) for n, c in counts.items()],
    ).first()
    return row.clean, {n: row[n] for n, _, _ in PII_RULES}


def test_all_three_rules_redact_and_count(spark):
    clean, n = _scrub_one(
        spark,
        "mail bob.smith+x@sub.example.org or 10.1.2.3 or 415-555-0042 end",
    )
    assert clean == "mail <EMAIL> or <IP> or <PHONE> end"
    assert n == {"email": 1, "ip": 1, "phone": 1}


def test_multiple_hits_per_rule_all_replaced(spark):
    """DuckDB regexp_replace is first-match-only by default — the 'g' flag
    in scrub_sql and Spark's replace-all must agree on EVERY occurrence."""
    clean, n = _scrub_one(spark, "a@b.co c@d.org e@f.io")
    assert clean == "<EMAIL> <EMAIL> <EMAIL>"
    assert n["email"] == 3


def test_cascade_counts_each_span_once(spark):
    """An IP's dotted digit runs must not ALSO count as a phone: counts are
    taken on each rule's stage input (already IP-scrubbed)."""
    clean, n = _scrub_one(spark, "from 192.168.123.45 x")
    assert n["ip"] == 1 and n["phone"] == 0
    assert "<IP>" in clean and "<PHONE>" not in clean


def test_email_scrubbed_before_digit_rules(spark):
    clean, n = _scrub_one(spark, "user415-555-0042@example.com")
    assert clean == "<EMAIL>"
    assert n == {"email": 1, "ip": 0, "phone": 0}


def test_no_pii_is_identity(spark):
    text = "plain text with numbers 12 34 and words"
    clean, n = _scrub_one(spark, text)
    assert clean == text
    assert n == {"email": 0, "ip": 0, "phone": 0}


def test_sql_helper_matches_column_path(spark):
    """Oracle-helper identity: scrub_sql's cascade over DuckDB equals the
    Column cascade over Spark on adversarial inputs."""
    texts = [
        "a@b.co c@d.org",
        "ip 1.2.3.4 phone 415-555-0042 both",
        "user415-555-0042@example.com trailing 10.0.0.1",
        "dots 192.168.123.4567 four-digit octet (not an IP; the dotted"
        " phone form bites its prefix — engine-identical either way)",
        "nothing here",
        "415.555.0042 dotted phone and 999.999.999.999 fake ip",
    ]
    clean_sql, count_sql = scrub_sql("t0")
    con = duckdb.connect()
    for text in texts:
        got_clean, got_counts = _scrub_one(spark, text)
        q = text.replace("'", "''")
        exp = con.execute(
            f"SELECT {clean_sql} AS clean, "
            f"{count_sql['email']} AS email, {count_sql['ip']} AS ip, "
            f"{count_sql['phone']} AS phone "
            f"FROM (SELECT '{q}' AS t0)"
        ).fetchone()
        assert got_clean == exp[0], text
        assert (got_counts["email"], got_counts["ip"], got_counts["phone"]) \
            == exp[1:], text


def test_funnel_scrub_stage_wiring(spark):
    """curation_stages_from(scrub=True): the scrubbed stage sits between
    quality and exact_dedup, downstream stages consume REDACTED text (no
    rule matches anything after the stage), and doc survival is unchanged
    (redaction rewrites spans, never drops documents)."""
    # registry reorder runs at the end of `queries`; importing a sibling
    # query module first from a fresh process trips its placement assert
    from pipeline_calculator_v3_spark import queries  # noqa: F401
    from pipeline_calculator_v3_spark.queries_pipeline import (
        curation_stages_from,
    )

    filler = " ".join(f"w{i}" for i in range(30))
    rows = [
        (1, f"{filler} mail me a@b.co"),
        (2, f"{filler} call 415-555-0042"),
        (3, f"{filler} host 10.0.0.1"),
        (4, filler),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    stages = dict(curation_stages_from(d, scrub=True))
    names = [n for n, _ in curation_stages_from(d, scrub=True)]
    assert names == [
        "raw", "quality", "scrubbed", "exact_dedup", "near_dedup",
        "decontaminated", "sampled",
    ]
    assert stages["scrubbed"].count() == stages["quality"].count()
    # every downstream text is fully redacted
    clean, counts = scrub_with_counts(F.col("text"))
    leftovers = stages["exact_dedup"].select(
        sum(counts.values()).alias("hits")
    ).agg(F.sum("hits")).first()[0]
    assert leftovers == 0
    redacted = {
        r.doc_id: r.text for r in stages["scrubbed"].collect()
    }
    assert redacted[1].endswith("mail me <EMAIL>")
    assert redacted[2].endswith("call <PHONE>")
    assert redacted[3].endswith("host <IP>")
    # default funnel is unchanged: no scrub stage, text untouched
    plain = dict(curation_stages_from(d))
    assert "scrubbed" not in plain
    assert {r.doc_id: r.text for r in plain["quality"].collect()}[1] \
        .endswith("a@b.co")

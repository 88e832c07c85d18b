"""PII redaction as a pure-Column regexp_replace cascade — the standard
curation stage between quality filtering and packing that the funnel
previously lacked (VERDICT r06 #6).

Every rule is a regex shared verbatim by Spark (Java regex) and DuckDB
(RE2): no lookarounds, no backreferences, only classes/quantifiers/word
boundaries both engines implement identically — so the whole cascade
value-replays in the q_scrub_pii oracle (the oracle-helper pattern:
``scrub_sql`` emits the SQL from the SAME rule table the Column path
uses, and the two cannot drift apart).

Cascade order matters and is part of the contract: emails first (their
local parts contain digits a later rule could mangle), then IP literals,
then phones (the NANP pattern could otherwise bite into a dotted octet
run).  Each rule's hit count is taken on ITS stage input — the text as
already scrubbed by the previous rules — so a span is counted by exactly
one rule.

Scale shape: scan-side Column expressions only (regexp_extract_all +
regexp_replace inside whole-stage codegen), no shuffle, no UDF — the
cost is one linear pass per rule over the text bytes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (rule name, pattern, replacement) — ordered; see module docstring.
# Patterns are deliberately conservative core forms (the production knob
# is ADDING rules, not widening these): a permissive phone rule would
# start eating dates and ids.
PII_RULES: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ip",
        r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
        "<PHONE>",
    ),
]


def scrub_with_counts(col: Column) -> tuple[Column, dict[str, Column]]:
    """(scrubbed text, {rule: hit count}) over one text Column.  Counts are
    bigint (matching DuckDB ``len()``) and taken on each rule's stage
    input per the cascade contract."""
    counts: dict[str, Column] = {}
    cur = col
    for name, pat, repl in PII_RULES:
        counts[name] = (
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("bigint")
        )
        cur = F.regexp_replace(cur, pat, repl)
    return cur, counts


def scrub_text(col: Column) -> Column:
    """Scrubbed text only — the funnel-stage form."""
    cleaned, _ = scrub_with_counts(col)
    return cleaned


def _sql_quote(pat: str) -> str:
    return pat.replace("'", "''")


def scrub_sql(expr: str) -> tuple[str, dict[str, str]]:
    """The SAME cascade as SQL text over column expression ``expr`` —
    (scrubbed expr, {rule: count expr}).  DuckDB ``regexp_replace``
    defaults to first-match-only, so the global flag is explicit."""
    counts: dict[str, str] = {}
    cur = expr
    for name, pat, repl in PII_RULES:
        q = _sql_quote(pat)
        counts[name] = (
            f"CAST(len(regexp_extract_all({cur}, '{q}')) AS BIGINT)"
        )
        # the replacement is interpolated into a SQL literal too — an added
        # rule whose replacement contains a quote must not break (or
        # inject into) every oracle built from this cascade (review r12)
        cur = f"regexp_replace({cur}, '{q}', '{_sql_quote(repl)}', 'g')"
    return cur, counts

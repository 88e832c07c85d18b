"""Byte-pair-encoding merge steps over a word-frequency vocabulary — the
tokenizer-TRAINING primitive (Sennrich 2016): count adjacent symbol pairs
weighted by word frequency, merge the most frequent pair left-to-right
non-overlapping, repeat.

Scale shape: BPE training never touches the corpus after one
explode+aggregate builds the (token, tf) vocabulary — every iteration
runs on the vocab table (orders of magnitude smaller than a 100 TB
corpus) with HOF array expressions, and the chosen pair is a ONE-ROW
broadcast.  No Python in the loop, no driver-side vocab state.

The merge itself rides on ``replace()``'s left-to-right non-overlapping
scan — identical semantics in Spark (Java indexOf loop) and DuckDB — via
a separator encoding that makes a pair match exact-symbol-only:

    symbols [x, ab, c]  ->  '\\x1fx\\x1f' '\\x1fab\\x1f' '\\x1fc\\x1f'

A pair (a, b) becomes the pattern ``\\x1fa\\x1f\\x1fb\\x1f`` -> replacement
``\\x1fab\\x1f``: a symbol merely ENDING in 'a' (e.g. 'xa') cannot match
(its encoding is ``\\x1fxa\\x1f``), and consecutive occurrences
('a b a b' -> 'ab ab') merge correctly because each replacement rebuilds
the boundary the next match needs.  Tokens containing the separator byte
are excluded up front (both engines, same predicate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"


def chars(token_col: str) -> Column:
    """Initial symbol sequence: one single-character symbol per char.
    Takes a column NAME (composed via F.expr — substring needs a column
    position, which the Python DSL doesn't accept)."""
    return F.expr(
        f"transform(sequence(1, length({token_col})), "
        f"i -> substring({token_col}, i, 1))"
    )


def adjacent_pairs(syms: Column) -> Column:
    """Adjacent symbol pairs as 'p1<SEP>p2' strings (empty for < 2
    symbols — the Spark sequence() counts DOWN when end < start, so the
    guard is mandatory)."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat(
                F.element_at(syms, i), F.lit(SEP), F.element_at(syms, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def encode(syms: Column) -> Column:
    """Symbol array -> separator-encoded string (see module docstring)."""
    return F.concat_ws(
        "", F.transform(syms, lambda x: F.concat(F.lit(SEP), x, F.lit(SEP)))
    )


def merge_pair(syms: Column, pair: Column) -> Column:
    """Merge every left-to-right non-overlapping occurrence of ``pair``
    ('p1<SEP>p2') in the symbol array."""
    pat = F.concat(
        F.lit(SEP),
        F.replace(pair, F.lit(SEP), F.lit(SEP + SEP)),
        F.lit(SEP),
    )
    rep = F.concat(F.lit(SEP), F.replace(pair, F.lit(SEP), F.lit("")), F.lit(SEP))
    merged = F.replace(encode(syms), pat, rep)
    # strip the outer separators, split symbols on the doubled boundary
    # (split takes a regex; \x1f has no metacharacter meaning)
    return F.split(F.btrim(merged, F.lit(SEP)), SEP + SEP)


def top_pair(vocab: DataFrame, syms_col: str, tf_col: str) -> DataFrame:
    """One-row frame (pair, weight): the most frequent adjacent pair,
    ties broken on the pair string — broadcast by callers."""
    return (
        vocab.select(
            F.explode(adjacent_pairs(F.col(syms_col))).alias("pair"),
            F.col(tf_col).alias("tf"),
        )
        .groupBy("pair")
        .agg(F.sum("tf").cast("bigint").alias("weight"))
        .orderBy(F.desc("weight"), "pair")
        .limit(1)
    )


def bpe_merge_step(vocab: DataFrame, syms_col: str, tf_col: str) -> DataFrame:
    """One BPE training step: pick the top pair, merge it everywhere.
    Returns ``vocab`` with ``syms_col`` rewritten plus the chosen
    ``merge_pair``/``merge_weight`` columns (constant — the one-row
    winner broadcast onto every row)."""
    best = top_pair(vocab, syms_col, tf_col)
    return vocab.crossJoin(F.broadcast(best)).select(
        *[c for c in vocab.columns if c != syms_col],
        merge_pair(F.col(syms_col), F.col("pair")).alias(syms_col),
        F.col("pair").alias("merge_pair"),
        F.col("weight").alias("merge_weight"),
    )

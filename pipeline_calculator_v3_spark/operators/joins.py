"""Big-big join strategies: sort-merge/shuffle-hash (no broadcast) and
salted joins for skewed keys.

At 100 TB a fact-fact join can't broadcast; it shuffles both sides on the
key.  Two failure modes matter: (a) Spark picking a broadcast plan that OOMs
the driver at real scale — pin the strategy with hints; (b) skewed keys
serializing one reducer — pre-split the hot keys with a salt, replicating
the other side per salt value.  AQE's skew-join handles moderate skew at
runtime; explicit salting is the deterministic tool for known-pathological
keys (the salt count is a static choice, visible in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_join(left: DataFrame, right: DataFrame, on: list[str],
               how: str = "inner") -> DataFrame:
    """Force a sort-merge join (both sides shuffle + sort on the key)."""
    return left.hint("merge").join(right.hint("merge"), on, how)


def shuffle_hash_join(left: DataFrame, right: DataFrame, on: list[str],
                      how: str = "inner") -> DataFrame:
    """Force a shuffled hash join — cheaper than SMJ when one side fits a
    per-partition hash table (skips both sorts)."""
    return left.join(right.hint("shuffle_hash"), on, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the (large, skewed) left side gets a uniform
    random-free salt derived from a row-stable hash of its other columns;
    the (smaller) right side is replicated once per salt value.

    Join key becomes (key, salt): a hot key's rows spread over ``n_salts``
    reducers instead of one.  Deterministic — the salt is a hash, not rand().
    """
    lcols = [c for c in left.columns if c != key]
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in lcols]) if lcols else F.xxhash64(F.col(key)),
               F.lit(n_salts))
        .cast("int")
        .alias("__salt")
    )
    l = left.withColumn("__salt", salt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l.join(r, [key, "__salt"], how).drop("__salt")

"""CDC upsert: merge a base snapshot with a change stream, latest version
per key wins — the incremental-refresh primitive (SCD-1 / MERGE INTO
semantics) expressed as union + window rank, which is the engine-portable
form when the table format has no native MERGE.

Scale shape: one shuffle on the key (the window partition); at 100 TB the
win is pairing this with a key-partitioned layout so the window reuses the
table's bucketing.  Ties on version are broken by the `tiebreak` column so
the merge is DETERMINISTIC — a nondeterministic latest-wins is how
incremental pipelines silently fork from their backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_latest(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    version: str,
    tiebreak: str,
) -> DataFrame:
    """Union base + updates and keep exactly one row per key: highest
    ``version``, ties broken by descending ``tiebreak``, and a FULL tie
    (same version AND tiebreak on both sides — e.g. a corrected payload
    re-delivered under the same version/sequence) resolved in favor of
    ``updates``.  Without that last rule the winner depends on shuffle
    arrival order, and the incremental pipeline forks from its backfill —
    exactly the nondeterminism this operator exists to prevent (review
    r06).  Schemas must match by name (unionByName)."""
    reserved = {"_src", "_rn"}
    clash = reserved & (set(base.columns) | set(updates.columns))
    if clash:
        raise ValueError(f"input frames already carry reserved columns {clash}")
    merged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(key).orderBy(
        F.desc(version), F.desc(tiebreak), F.desc("_src")
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )

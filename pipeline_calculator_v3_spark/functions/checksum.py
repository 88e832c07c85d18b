"""Commutative digest-residue checksum building blocks.

Two users with deliberately DIFFERENT row-digest canonicalizations:

- ``q_table_checksum`` (queries_pipeline.py): '|'-joined CAST strings over
  fixed, non-null key columns — chosen because it replays verbatim in the
  DuckDB oracle.  Safe there by contract (int/char columns, no NULLs).
- ``dataset.py``: ``md5(to_json(struct(cols)))`` — NULL-distinguishing and
  injection-safe for arbitrary user columns (JSON escapes delimiters and
  renders null explicitly), at the cost of not being oracle-replayed.

Both share the residue arithmetic below: 48-bit digest prefix, per-row
``% 1e9+7`` so a group's SUM stays far inside int64 (~9e9 rows/group), and
summation is commutative — the checksum is invariant to row order, file
layout, partitioning, and retries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RESIDUE_MOD = 1_000_000_007

# Version of the ``row_digest_generic`` formula, stamped into dataset
# manifests (dataset.py) so a formula change is distinguishable from real
# data drift (advice r06).  History:
#   1 — to_json under the SESSION conf ``ignoreNullFields`` (digest of
#       NULL-bearing rows depended on cluster config; never stamped —
#       manifests without a ``digest_version`` field are treated as v1);
#   2 — ``ignoreNullFields`` pinned to false per-call (run-invariant).
# Bump this whenever the byte stream under the md5 changes for ANY input;
# validate_dataset then degrades to counts-only until a re-stamp instead
# of flagging every NULL-bearing partition as drifted.
DIGEST_VERSION = 3


def digest_residue(digest_hex: Column) -> Column:
    """48-bit prefix of an md5 hex digest as a bounded bigint residue."""
    return (
        F.conv(F.substring(digest_hex, 1, 12), 16, 10).cast("bigint")
        % RESIDUE_MOD
    )


def row_digest_generic(cols: list[Column]) -> Column:
    """NULL-distinguishing, delimiter-safe row digest for arbitrary columns:
    md5 over the canonical JSON of a struct.  ('x', NULL) and (NULL, 'x')
    digest differently, and values containing the would-be delimiter cannot
    collide across columns.

    ``ignoreNullFields`` is pinned per-call (review r06): without it the
    rendering follows the session conf ``spark.sql.jsonGenerator.
    ignoreNullFields``, so the same data would digest differently on
    differently-configured clusters — a spurious drift alarm that defeats
    the checksum's run-invariance purpose.  Pinned to ``false`` so nulls
    render explicitly ({"b":null}), matching the documented claim.
    Compatibility note: manifests written by the pre-pin code under the
    default conf (true) digest NULL-bearing rows differently; datasets
    with no NULL key columns are unaffected.

    ``timeZone`` is pinned for the same reason (review r12, verified
    live): to_json renders TIMESTAMP key columns in the SESSION timezone
    ("...T04:05:06.000Z" under UTC vs "...T13:05:06.000+09:00" under
    Asia/Tokyo), so a dataset written on one cluster would flag every
    partition as drifted when validated on a differently-configured one
    — the exact run-variance class these pins exist to close.  Datasets
    whose key_cols contain no TIMESTAMP are unaffected; stale-version
    manifests re-stamp through the standard restamp_manifest path."""
    return F.md5(
        F.to_json(
            F.struct(*cols),
            {"ignoreNullFields": "false", "timeZone": "UTC"},
        )
    )

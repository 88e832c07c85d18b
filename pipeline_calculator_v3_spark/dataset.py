"""Partitioned dataset sink with a validation manifest — the last step of
a curation pipeline: write the curated corpus as hive-partitioned parquet
plus a tiny ``_manifest.json`` holding per-partition row counts and
order-independent content checksums, so any later copy / re-shard / engine
migration can be validated by comparing aggregates instead of rows.

The checksum is the same commutative digest-residue scheme as
``q_table_checksum`` (md5 over a '|'-joined canonical key string, 48-bit
prefix, per-row ``% 1000000007``, summed): invariant to row order, file
layout, and partition count within a partition value — exactly what
survives a distcp-style copy or a Spark re-write with different
parallelism.

Scale shape: the manifest computation is one map-side digest + one hash
aggregate keyed on the partition columns — |partitions| rows ever reach
the driver, never data.  The write itself is a plain distributed
``df.write.partitionBy(...)``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_manifest.json"
_MOD = 1_000_000_007


def _partition_checksums(
    df: DataFrame, partition_by: list[str], key_cols: list[str]
) -> DataFrame:
    """(partition values..., n_rows, checksum) — one row per partition."""
    digest = F.md5(
        F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    )
    residue = F.conv(F.substring(digest, 1, 12), 16, 10).cast("bigint") % _MOD
    return df.groupBy(*partition_by).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(residue).cast("bigint").alias("checksum"),
    )


def write_dataset(
    df: DataFrame,
    out_dir: str,
    partition_by: list[str],
    key_cols: list[str],
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` as parquet partitioned by ``partition_by`` and a
    ``_manifest.json`` with per-partition (n_rows, checksum) over
    ``key_cols``.  Returns the manifest dict."""
    if not partition_by:
        raise ValueError("partition_by must name at least one column")
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    df.write.mode(mode).partitionBy(*partition_by).parquet(out_dir)
    entries = [
        {
            "partition": {c: row[c] for c in partition_by},
            "n_rows": row["n_rows"],
            "checksum": row["checksum"],
        }
        for row in _partition_checksums(df, partition_by, key_cols).collect()
    ]
    entries.sort(key=lambda e: json.dumps(e["partition"], sort_keys=True))
    manifest = {
        "partition_by": partition_by,
        "key_cols": key_cols,
        "n_partitions": len(entries),
        "n_rows": sum(e["n_rows"] for e in entries),
        "partitions": entries,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def validate_dataset(spark: SparkSession, out_dir: str) -> dict:
    """Re-read a dataset written by :func:`write_dataset`, recompute the
    per-partition checksums from the parquet actually on disk, and diff
    against the stored manifest.

    Returns ``{"ok": bool, "mismatches": [...], "missing": [...],
    "unexpected": [...]}`` where mismatches carry both sides' counts and
    checksums.  The comparison is aggregate-vs-aggregate: |partitions|
    rows, no data movement beyond the recompute scan."""
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    partition_by = manifest["partition_by"]
    key_cols = manifest["key_cols"]
    actual = {
        json.dumps({c: row[c] for c in partition_by}, sort_keys=True): (
            row["n_rows"],
            row["checksum"],
        )
        for row in _partition_checksums(
            spark.read.parquet(out_dir), partition_by, key_cols
        ).collect()
    }
    expected = {
        json.dumps(e["partition"], sort_keys=True): (
            e["n_rows"],
            e["checksum"],
        )
        for e in manifest["partitions"]
    }
    mismatches = [
        {
            "partition": json.loads(k),
            "expected": {"n_rows": expected[k][0], "checksum": expected[k][1]},
            "actual": {"n_rows": actual[k][0], "checksum": actual[k][1]},
        }
        for k in sorted(expected.keys() & actual.keys())
        if expected[k] != actual[k]
    ]
    missing = sorted(expected.keys() - actual.keys())
    unexpected = sorted(actual.keys() - expected.keys())
    return {
        "ok": not mismatches and not missing and not unexpected,
        "mismatches": mismatches,
        "missing": [json.loads(k) for k in missing],
        "unexpected": [json.loads(k) for k in unexpected],
    }

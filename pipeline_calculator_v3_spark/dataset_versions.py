"""Versioned dataset snapshots — time travel for the parquet write path
(the Delta/Iceberg snapshot model re-expressed over plain directories).

dataset.py's tables are single-version: every compaction/merge swaps the
one live tree.  A training-data pipeline additionally needs SNAPSHOTS —
"read the corpus exactly as epoch 3 saw it", "diff what the last ingest
changed", "roll back a bad curation pass" — without paying a full copy
per version.  This module layers that on dataset.py's own machinery:

- layout: ``out_dir/v{N}/`` holds version N's COMPLETE hive tree;
  ``out_dir/_versions/{N}.json`` its manifest (same per-partition
  (n_rows, checksum) entries as dataset.py, so :func:`diff_versions` is
  dataset.diff_manifests verbatim); ``out_dir/_latest`` the committed
  pointer.
- copy-on-write: :func:`upsert_version` rewrites ONLY the partitions the
  update touches (including partitions rows move OUT of — the moved-row
  class streaming/cdc.py patched in r13) and HARDLINKS every untouched
  file from the parent version — O(1) per carried file, zero data copy,
  and safe because versions never mutate files in place.  Untouched
  partitions' manifest entries carry over verbatim (hardlinks cannot
  change bytes); only touched partitions are re-checksummed.
- crash safety: a version becomes visible ONLY when ``_versions/{N}.json``
  lands (``.part`` + ``os.replace``), and current only when ``_latest``
  swaps — both single-file atomic renames.  A crash mid-commit leaves an
  orphan ``v{N}`` directory that no reader ever consults;
  :func:`vacuum_versions` removes it.

At 100 TB: data moves once per touched partition and never for carries;
manifests are one small JSON per version; time-travel reads are plain
partition-pruned parquet scans of a frozen tree.  Staged r14 for an r15
registry face (tests/test_dataset_versions.py).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dataset import (
    DIGEST_VERSION,
    _manifest_entries,
    _read_raw,
    diff_manifests,
)
from .operators.cdc import upsert_latest
from .streaming.cdc import _decode_rel, _leaf_partition_dirs

_LATEST = "_latest"
_VERSIONS = "_versions"


def _vdir(out_dir: str, n: int) -> str:
    return os.path.join(out_dir, f"v{n}")


def _vjson(out_dir: str, n: int) -> str:
    return os.path.join(out_dir, _VERSIONS, f"{n}.json")


def _atomic_write(path: str, payload: dict) -> None:
    part = path + ".part"
    with open(part, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(part, path)


def latest_version(out_dir: str) -> int | None:
    """The committed current version, or None for an empty store.  Only
    the ``_latest`` pointer decides — orphan ``v{N}`` dirs from an
    interrupted commit are invisible by construction."""
    p = os.path.join(out_dir, _LATEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def list_versions(out_dir: str) -> list[dict]:
    """Committed versions, oldest first: {version, parent, n_rows,
    n_partitions} per entry (vacuumed versions disappear)."""
    vdir = os.path.join(out_dir, _VERSIONS)
    if not os.path.isdir(vdir):
        return []
    out = []
    for name in sorted(os.listdir(vdir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(vdir, name)) as f:
            meta = json.load(f)
        out.append(
            {
                "version": meta["version"],
                "parent": meta["parent"],
                "n_rows": meta["manifest"]["n_rows"],
                "n_partitions": meta["manifest"]["n_partitions"],
            }
        )
    out.sort(key=lambda m: m["version"])
    return out


def _load_meta(out_dir: str, n: int) -> dict:
    with open(_vjson(out_dir, n)) as f:
        return json.load(f)


def _finalize(out_dir: str, n: int, parent: int | None, manifest: dict) -> int:
    """Publish version ``n``: manifest json first (atomic — the commit
    point), then the ``_latest`` pointer (atomic — the currency point)."""
    os.makedirs(os.path.join(out_dir, _VERSIONS), exist_ok=True)
    _atomic_write(
        _vjson(out_dir, n),
        {"version": n, "parent": parent, "manifest": manifest},
    )
    part = os.path.join(out_dir, _LATEST + ".part")
    with open(part, "w") as f:
        f.write(str(n))
    os.replace(part, os.path.join(out_dir, _LATEST))
    return n


def commit_version(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    partition_by: list[str],
    key_cols: list[str],
) -> int:
    """Write ``df`` as the next full snapshot and return its number.
    The first commit creates version 1; later commits must keep the
    store's partition/key spelling (manifest comparability)."""
    if not partition_by or not key_cols:
        raise ValueError("partition_by and key_cols must be non-empty")
    parent = latest_version(out_dir)
    if parent is not None:
        pmeta = _load_meta(out_dir, parent)["manifest"]
        if pmeta["partition_by"] != partition_by or (
            pmeta["key_cols"] != key_cols
        ):
            raise ValueError(
                "partition_by/key_cols must match the store "
                f"({pmeta['partition_by']}, {pmeta['key_cols']})"
            )
    n = 1 if parent is None else parent + 1
    vdir = _vdir(out_dir, n)
    if os.path.exists(vdir):  # orphan from an interrupted commit
        shutil.rmtree(vdir)
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(vdir)
    entries = _manifest_entries(
        _read_raw(spark, vdir), partition_by, key_cols
    )
    # partition values live ONLY in directory names, so their types must
    # be recorded here: hive inference is lossy ("01" re-infers as int 1)
    # and read_version restores the declared type by cast instead
    types = {
        f.name: f.dataType.simpleString()
        for f in df.schema.fields
        if f.name in partition_by
    }
    manifest = {
        "partition_by": partition_by,
        "partition_types": types,
        "key_cols": key_cols,
        "digest_version": DIGEST_VERSION,
        "n_partitions": len(entries),
        "n_rows": sum(e["n_rows"] for e in entries),
        "partitions": entries,
    }
    return _finalize(out_dir, n, parent, manifest)


def read_version(
    spark: SparkSession, out_dir: str, version: int | None = None
) -> DataFrame:
    """The frozen tree of ``version`` (default: latest) as a DataFrame —
    a partition-pruned parquet scan.  Partition columns read as the
    LITERAL directory strings (inference off — "01" must not re-infer as
    int 1) and then cast to the types the committing DataFrame declared,
    so values round-trip losslessly through the dir names."""
    n = latest_version(out_dir) if version is None else version
    if n is None:
        raise ValueError(f"no committed versions under {out_dir}")
    if not os.path.exists(_vjson(out_dir, n)):
        raise ValueError(f"version {n} does not exist (or was vacuumed)")
    meta = _load_meta(out_dir, n)
    df = _read_raw(spark, _vdir(out_dir, n))
    for c, typ in meta["manifest"].get("partition_types", {}).items():
        if typ != "string":
            df = df.withColumn(c, F.col(c).cast(typ))
    return df


def _partition_tuple_col(partition_by: list[str]):
    return F.struct(*[F.col(c).cast("string").alias(c) for c in partition_by])


def upsert_version(
    spark: SparkSession,
    updates: DataFrame,
    out_dir: str,
    key: str,
    version_col: str,
    tiebreak: str,
) -> int:
    """Copy-on-write merge: apply ``updates`` to the latest snapshot
    through operators/cdc.upsert_latest (highest ``version_col`` wins,
    ``tiebreak`` then update-side on full ties) and commit the result as
    a new version, rewriting ONLY touched partitions.

    Touched = partitions any update row lands in, PLUS partitions that
    currently hold a base row whose key the update carries — a row whose
    partition column changes must vanish from its OLD partition, and a
    hardlinked carry would strand it (the moved-row class).  NULL keys
    are dropped from updates first: a NULL never equi-joins, so it could
    neither merge nor be tracked (the streaming/cdc.py r13 rule)."""
    parent = latest_version(out_dir)
    if parent is None:
        raise ValueError("upsert_version needs an existing snapshot")
    meta = _load_meta(out_dir, parent)
    manifest = meta["manifest"]
    partition_by = manifest["partition_by"]
    key_cols = manifest["key_cols"]
    updates = updates.where(F.col(key).isNotNull())
    # inference OFF for the internal base read (the _read_raw rule):
    # with inference ON a zero-padded numeric partition value (month=01)
    # reads back as int 1, so the touched set desyncs from _decode_rel's
    # literal dir strings (carry/rewrite decisions go to the wrong
    # partitions) AND the rewrite renames the directory to month=1 —
    # silent divergence.  The string-typed partition column round-trips
    # through dir names only, so user-facing read_version still infers
    # the original type.
    base = _read_raw(spark, _vdir(out_dir, parent))

    pt = _partition_tuple_col(partition_by)
    upd_keys = updates.select(key).distinct()
    # the moved-key probe is a column-pruned scan (key + partition cols
    # only) — far cheaper than dragging the full base through the merge
    touched_rows = (
        updates.select(pt.alias("_p"))
        .unionByName(
            base.join(upd_keys, key, "left_semi").select(pt.alias("_p"))
        )
        .distinct()
        .collect()
    )
    touched = {
        tuple(r["_p"][c] for c in partition_by) for r in touched_rows
    }

    n = parent + 1
    vdir = _vdir(out_dir, n)
    if os.path.exists(vdir):
        shutil.rmtree(vdir)
    os.makedirs(vdir)
    # 1. hardlink every untouched partition's files from the parent tree
    pdir = _vdir(out_dir, parent)
    depth = len(partition_by)
    carried_rels = []
    for rel in _leaf_partition_dirs(pdir, depth):
        if _decode_rel(rel) in touched:
            continue
        carried_rels.append(rel)
        src, dst = os.path.join(pdir, rel), os.path.join(vdir, rel)
        os.makedirs(dst, exist_ok=True)
        for fn in os.listdir(src):
            if fn.endswith(".parquet"):
                os.link(os.path.join(src, fn), os.path.join(dst, fn))
    # 2. rewrite the touched partitions from the merged frame (an OR of
    #    per-tuple AND predicates — a concatenated-string membership test
    #    would collide ("ab","c") with ("a","bc"); touched is bounded by
    #    the partition count, so the predicate stays small)
    def _tuple_pred(t: tuple):
        pred = F.lit(True)
        for c, v in zip(partition_by, t):
            col = F.col(c).cast("string")
            pred = pred & (col.isNull() if v is None else (col == F.lit(v)))
        return pred

    in_touched = F.lit(False)
    for t in sorted(touched, key=lambda x: tuple("" if v is None else v
                                                 for v in x)):
        in_touched = in_touched | _tuple_pred(t)
    # the merge reads ONLY touched partitions: every base row the update
    # can affect lives there by construction of `touched`, so the
    # predicate prunes hive directories at the SCAN (a post-merge filter
    # cannot push below upsert_latest's key-partitioned window, and
    # would drag the whole snapshot through the merge at 100 TB)
    merged = upsert_latest(
        base.where(in_touched), updates, key, version_col, tiebreak
    )
    merged.write.mode("append").partitionBy(*partition_by).parquet(vdir)
    # 3. manifest: carried entries verbatim (hardlinks cannot change
    #    bytes), touched entries re-checksummed from the new tree only
    carried_vals = {_decode_rel(rel) for rel in carried_rels}

    def _entry_tuple(e: dict) -> tuple:
        return tuple(
            None if e["partition"][c] is None else str(e["partition"][c])
            for c in partition_by
        )

    carried_entries = [
        e for e in manifest["partitions"] if _entry_tuple(e) in carried_vals
    ]
    new_leaf = [
        rel for rel in _leaf_partition_dirs(vdir, depth)
        if _decode_rel(rel) not in carried_vals
    ]
    touched_entries = []
    if new_leaf:
        # inference OFF, the _read_raw rule: manifest partition values
        # must stay the literal hive dir strings across versions or
        # diff_versions would flag phantom changes (month=01 vs 1)
        from .session import scoped_conf

        with scoped_conf(
            spark,
            "spark.sql.sources.partitionColumnTypeInference.enabled",
            "false",
        ):
            scan = spark.read.option("basePath", vdir).parquet(
                *[os.path.join(vdir, rel) for rel in new_leaf]
            )
        touched_entries = _manifest_entries(scan, partition_by, key_cols)
    entries = carried_entries + touched_entries
    entries.sort(key=lambda e: json.dumps(e["partition"], sort_keys=True))
    new_manifest = {
        "partition_by": partition_by,
        "partition_types": manifest.get("partition_types", {}),
        "key_cols": key_cols,
        "digest_version": DIGEST_VERSION,
        "n_partitions": len(entries),
        "n_rows": sum(e["n_rows"] for e in entries),
        "partitions": entries,
    }
    return _finalize(out_dir, n, parent, new_manifest)


def diff_versions(out_dir: str, a: int, b: int) -> dict:
    """Which partitions were added / removed / changed / unchanged going
    from version ``a`` to version ``b`` — pure manifest arithmetic
    (dataset.diff_manifests under the hood), no data scan.  ``changed``
    entries carry both sides' (n_rows, checksum); the other three lists
    hold partition dicts."""
    ma = _load_meta(out_dir, a)["manifest"]
    mb = _load_meta(out_dir, b)["manifest"]
    raw = diff_manifests(ma, mb["partitions"])
    changed_keys = {
        json.dumps(m["partition"], sort_keys=True) for m in raw["mismatches"]
    }
    gone_or_new = changed_keys | {
        json.dumps(p, sort_keys=True)
        for p in raw["missing"] + raw["unexpected"]
    }
    unchanged = [
        e["partition"]
        for e in mb["partitions"]
        if json.dumps(e["partition"], sort_keys=True) not in gone_or_new
    ]
    return {
        "ok": raw["ok"],
        "changed": raw["mismatches"],
        "removed": raw["missing"],
        "added": raw["unexpected"],
        "unchanged": unchanged,
    }


def vacuum_versions(out_dir: str, keep_last: int = 2) -> list[int]:
    """Drop committed versions older than the newest ``keep_last`` and
    any orphan ``v{N}`` directory an interrupted commit left.  Hardlinked
    files shared with surviving versions keep their data alive (the
    filesystem frees bytes only at link count zero).  Returns the
    removed version numbers."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    committed = [m["version"] for m in list_versions(out_dir)]
    cut = committed[:-keep_last] if len(committed) > keep_last else []
    for n in cut:
        shutil.rmtree(_vdir(out_dir, n), ignore_errors=True)
        os.remove(_vjson(out_dir, n))
    known = set(committed)
    for name in os.listdir(out_dir):
        if (
            name.startswith("v") and name[1:].isdigit()
            and int(name[1:]) not in known
        ):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
            cut.append(int(name[1:]))
    return sorted(cut)


def diff_rows(
    spark: SparkSession, out_dir: str, a: int, b: int, key: str
) -> DataFrame:
    """Row-level change feed between two snapshots — what a Delta/Iceberg
    CDF read gives you, reconstructed from the version trees WITHOUT any
    logged change data: one row per ``key`` whose content differs between
    version ``a`` and version ``b``, ``change`` in
    {'added', 'removed', 'changed'}, plus each side's row count for the
    key (the store does not enforce key uniqueness — multiplicity changes
    are content changes).

    The 100 TB property is the MANIFEST PRUNING: partitions whose
    (n_rows, checksum) entries match between the two manifests provably
    hold identical content (the checksum is an order-independent digest
    over the key columns), so neither side's scan reads them — the a-side
    reads only changed+removed partitions, the b-side only changed+added,
    and both predicates prune hive directories at the source (the
    upsert_version rule; gated by a test that corrupts an unchanged
    partition's files on disk and diffs anyway).  Cost scales with the
    CHANGE, not the table.

    Content equality per key is the md5 of the sorted multiset of
    whole-row JSON digests (schema equality across versions is the store
    contract, so field order is fixed); NULL keys are excluded (the
    upsert_version rule — they identify nothing)."""
    for n in (a, b):
        if not os.path.exists(_vjson(out_dir, n)):
            raise ValueError(f"version {n} does not exist (or was vacuumed)")
    meta_a = _load_meta(out_dir, a)["manifest"]
    partition_by = meta_a["partition_by"]
    d = diff_versions(out_dir, a, b)
    changed = [m["partition"] for m in d["changed"]]
    side_a_parts = changed + d["removed"]
    side_b_parts = changed + d["added"]

    def _pred(parts: list[dict]):
        pred = F.lit(False)
        for p in parts:
            tp = F.lit(True)
            for c in partition_by:
                col = F.col(c).cast("string")
                v = p[c]
                tp = tp & (col.isNull() if v is None else (col == F.lit(str(v))))
            pred = pred | tp
        return pred

    def _keyed(version: int, parts: list[dict]) -> DataFrame:
        raw = _read_raw(spark, _vdir(out_dir, version))
        rows = raw.where(_pred(parts)).where(F.col(key).isNotNull())
        dig = F.md5(
            F.to_json(F.struct(*[F.col(c) for c in sorted(raw.columns)]))
        )
        return rows.select(F.col(key).alias("_k"), dig.alias("_d")).groupBy(
            "_k"
        ).agg(
            F.md5(F.concat_ws(",", F.array_sort(F.collect_list("_d")))).alias(
                "_sig"
            ),
            F.count(F.lit(1)).cast("bigint").alias("_n"),
        )
    ka = _keyed(a, side_a_parts)
    kb = _keyed(b, side_b_parts)
    j = ka.select(
        F.col("_k").alias("_ka"), F.col("_sig").alias("_sa"),
        F.col("_n").alias("n_rows_a"),
    ).join(
        kb.select(
            F.col("_k").alias("_kb"), F.col("_sig").alias("_sb"),
            F.col("_n").alias("n_rows_b"),
        ),
        F.col("_ka") == F.col("_kb"),
        "full_outer",
    )
    return (
        j.select(
            F.coalesce(F.col("_ka"), F.col("_kb")).alias(key),
            F.when(F.col("_ka").isNull(), F.lit("added"))
            .when(F.col("_kb").isNull(), F.lit("removed"))
            .when(F.col("_sa") != F.col("_sb"), F.lit("changed"))
            .alias("change"),
            F.coalesce("n_rows_a", F.lit(0)).alias("n_rows_a"),
            F.coalesce("n_rows_b", F.lit(0)).alias("n_rows_b"),
        )
        .where(F.col("change").isNotNull())
    )

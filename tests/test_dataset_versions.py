"""dataset_versions.py — versioned snapshots / time travel (staged r14
for an r15 face): commit/read round trips, copy-on-write upsert with
hardlink carry (inode-verified), moved-row partition handling, manifest
diff between versions, crash-orphan invisibility, and vacuum."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.dataset_versions import (
    commit_version,
    diff_versions,
    latest_version,
    list_versions,
    read_version,
    upsert_version,
    vacuum_versions,
)

V1 = [
    # (id, part, payload, seq)
    (1, "a", "one", 1), (2, "a", "two", 1),
    (3, "b", "three", 1), (4, "c", "four", 1),
]
SCHEMA = "id long, part string, payload string, seq long"


@pytest.fixture()
def store(spark, tmp_path):
    out = str(tmp_path / "versioned")
    # checksums hash the full row (key_cols = all non-partition columns)
    # so diff_versions sees payload-only changes, not just key churn
    commit_version(
        spark, spark.createDataFrame(V1, SCHEMA), out, ["part"],
        ["id", "payload", "seq"],
    )
    return out


def _rows(spark, out, version=None):
    return {
        (r.id, r.part, r.payload, r.seq)
        for r in read_version(spark, out, version).collect()
    }


def test_commit_and_read_round_trip(spark, store):
    assert latest_version(store) == 1
    assert _rows(spark, store) == set(V1)
    vs = list_versions(store)
    assert [v["version"] for v in vs] == [1]
    assert vs[0]["n_rows"] == 4 and vs[0]["n_partitions"] == 3


def test_upsert_creates_new_version_old_readable(spark, store):
    updates = spark.createDataFrame(
        [(2, "a", "two-v2", 2), (5, "b", "five", 2)], SCHEMA
    )
    n = upsert_version(spark, updates, store, "id", "seq", "seq")
    assert n == 2 and latest_version(store) == 2
    assert _rows(spark, store, 2) == {
        (1, "a", "one", 1), (2, "a", "two-v2", 2),
        (3, "b", "three", 1), (5, "b", "five", 2), (4, "c", "four", 1),
    }
    # time travel: version 1 is byte-frozen
    assert _rows(spark, store, 1) == set(V1)


def test_untouched_partition_is_hardlinked_not_copied(spark, store):
    updates = spark.createDataFrame([(2, "a", "two-v2", 2)], SCHEMA)
    upsert_version(spark, updates, store, "id", "seq", "seq")
    v1c = os.path.join(store, "v1", "part=c")
    v2c = os.path.join(store, "v2", "part=c")
    f1 = sorted(f for f in os.listdir(v1c) if f.endswith(".parquet"))
    f2 = sorted(f for f in os.listdir(v2c) if f.endswith(".parquet"))
    assert f1 == f2 and f1
    for fn in f1:
        assert os.path.samefile(
            os.path.join(v1c, fn), os.path.join(v2c, fn)
        ), "untouched partition must carry over as hardlinks"
    # the touched partition was rewritten: distinct inodes
    v2a = os.path.join(store, "v2", "part=a")
    v1a = os.path.join(store, "v1", "part=a")
    inodes1 = {os.stat(os.path.join(v1a, f)).st_ino
               for f in os.listdir(v1a) if f.endswith(".parquet")}
    inodes2 = {os.stat(os.path.join(v2a, f)).st_ino
               for f in os.listdir(v2a) if f.endswith(".parquet")}
    assert not (inodes1 & inodes2)


def test_moved_row_vanishes_from_old_partition(spark, store):
    # id 4 moves c -> a: partition c must be rewritten (to empty), not
    # hardlink-carried with the stale row
    updates = spark.createDataFrame([(4, "a", "four-moved", 2)], SCHEMA)
    upsert_version(spark, updates, store, "id", "seq", "seq")
    got = _rows(spark, store)
    assert (4, "a", "four-moved", 2) in got
    assert all(not (r[0] == 4 and r[1] == "c") for r in got)
    assert len(got) == 4
    # and the manifest agrees: partition c gone or empty
    meta = json.load(open(os.path.join(store, "_versions", "2.json")))
    parts = {
        e["partition"]["part"]: e["n_rows"]
        for e in meta["manifest"]["partitions"]
    }
    assert parts.get("c", 0) == 0


def test_diff_versions_flags_only_touched(spark, store):
    updates = spark.createDataFrame([(2, "a", "two-v2", 2)], SCHEMA)
    upsert_version(spark, updates, store, "id", "seq", "seq")
    d = diff_versions(store, 1, 2)
    changed = {e["partition"]["part"] for e in d["changed"]}
    unchanged = {p["part"] for p in d["unchanged"]}
    assert changed == {"a"} and unchanged == {"b", "c"}
    assert not d["added"] and not d["removed"]


def test_null_key_updates_dropped(spark, store):
    updates = spark.createDataFrame(
        [(None, "a", "ghost", 9), (2, "a", "two-v2", 2)], SCHEMA
    )
    upsert_version(spark, updates, store, "id", "seq", "seq")
    got = _rows(spark, store)
    assert all(r[0] is not None for r in got)
    assert (2, "a", "two-v2", 2) in got and len(got) == 4


def test_orphan_vdir_is_invisible_and_vacuumed(spark, store):
    # simulate a crash: data dir exists, no _versions json, stale _latest
    os.makedirs(os.path.join(store, "v9", "part=a"))
    assert latest_version(store) == 1
    assert [v["version"] for v in list_versions(store)] == [1]
    with pytest.raises(ValueError, match="does not exist"):
        read_version(spark, store, 9)
    removed = vacuum_versions(store, keep_last=5)
    assert removed == [9] and not os.path.exists(os.path.join(store, "v9"))


def test_vacuum_keeps_last_and_hardlinks_survive(spark, store):
    for seq in (2, 3):
        upsert_version(
            spark,
            spark.createDataFrame([(2, "a", f"two-v{seq}", seq)], SCHEMA),
            store, "id", "seq", "seq",
        )
    removed = vacuum_versions(store, keep_last=2)
    assert removed == [1]
    assert [v["version"] for v in list_versions(store)] == [2, 3]
    with pytest.raises(ValueError):
        read_version(spark, store, 1)
    # v2/v3 still fully readable: their hardlinked carries survive v1's
    # deletion (link count, not path, keeps the bytes alive)
    assert (2, "a", "two-v3", 3) in _rows(spark, store, 3)
    assert (3, "b", "three", 1) in _rows(spark, store, 2)


def test_commit_rejects_spelling_drift(spark, store):
    df = spark.createDataFrame(V1, SCHEMA)
    with pytest.raises(ValueError, match="must match"):
        commit_version(spark, df, store, ["payload"], ["id"])
    with pytest.raises(ValueError, match="needs an existing"):
        upsert_version(
            spark, df, str(store) + "_nowhere", "id", "seq", "seq"
        )


def test_upsert_is_partition_pruned_scan(spark, store):
    # the rewrite reads the merged frame filtered to touched partitions;
    # prove the written tree only re-materialized partition a (b/c file
    # names identical to v1's)
    updates = spark.createDataFrame([(1, "a", "one-v2", 2)], SCHEMA)
    upsert_version(spark, updates, store, "id", "seq", "seq")
    for part in ("b", "c"):
        f1 = set(os.listdir(os.path.join(store, "v1", f"part={part}")))
        f2 = set(os.listdir(os.path.join(store, "v2", f"part={part}")))
        assert {f for f in f1 if f.endswith(".parquet")} == {
            f for f in f2 if f.endswith(".parquet")
        }


def test_zero_padded_partition_values_survive_upsert(spark, tmp_path):
    """month=01 must stay month=01: the internal base read runs with
    partition-type inference OFF, else the value reads back as int 1,
    the touched set desyncs from the literal dir names, and the rewrite
    renames the directory (found in r14 self-review, fails pre-fix)."""
    out = str(tmp_path / "padded")
    rows = [(1, "01", "jan", 1), (2, "02", "feb", 1)]
    schema = "id long, month string, payload string, seq long"
    commit_version(
        spark, spark.createDataFrame(rows, schema), out, ["month"],
        ["id", "payload", "seq"],
    )
    upsert_version(
        spark,
        spark.createDataFrame([(1, "01", "jan-v2", 2)], schema),
        out, "id", "seq", "seq",
    )
    v2 = os.path.join(out, "v2")
    assert sorted(
        d for d in os.listdir(v2) if d.startswith("month=")
    ) == ["month=01", "month=02"]
    got = {
        (r.id, r.month, r.payload)
        for r in read_version(spark, out).collect()
    }
    assert got == {(1, "01", "jan-v2"), (2, "02", "feb")}
    # untouched month=02 carried as hardlinks
    for fn in os.listdir(os.path.join(out, "v1", "month=02")):
        if fn.endswith(".parquet"):
            assert os.path.samefile(
                os.path.join(out, "v1", "month=02", fn),
                os.path.join(v2, "month=02", fn),
            )


def test_typed_partition_column_round_trips(spark, tmp_path):
    # an int-typed partition column reads back as int (the recorded-type
    # cast), not as the literal dir string
    out = str(tmp_path / "typed")
    rows = [(1, 7, "x", 1), (2, 11, "y", 1)]
    schema = "id long, bucket bigint, payload string, seq long"
    commit_version(
        spark, spark.createDataFrame(rows, schema), out, ["bucket"],
        ["id", "payload", "seq"],
    )
    upsert_version(
        spark, spark.createDataFrame([(1, 7, "x2", 2)], schema),
        out, "id", "seq", "seq",
    )
    kinds = dict(read_version(spark, out).dtypes)
    assert kinds["bucket"] == "bigint"
    got = {(r.id, r.bucket, r.payload)
           for r in read_version(spark, out).collect()}
    assert got == {(1, 7, "x2"), (2, 11, "y")}


def test_randomized_upsert_sequence_matches_reference_model(spark, tmp_path):
    """Model-based gate: a seeded random sequence of upsert batches
    (cross-partition key moves, stale updates, NULL partition values)
    must leave every intermediate snapshot equal to a plain-Python
    latest-wins reference.  This is the strongest de-risk for the COW
    touched-partition logic — any partition the rewrite wrongly carries
    or strands shows up as a row diff."""
    import random

    rng = random.Random(14)
    months = ["01", "02", "10", None]
    out = str(tmp_path / "model")
    schema = "id long, month string, payload string, seq long"

    def rand_rows(n, seq_start):
        return [
            (
                rng.randrange(8),
                rng.choice(months),
                f"p{rng.randrange(1000)}",
                seq_start + i,
            )
            for i in range(n)
        ]

    seq = 1
    init = rand_rows(12, seq)
    seq += len(init)
    commit_version(
        spark, spark.createDataFrame(init, schema), out,
        ["month"], ["id", "payload", "seq"],
    )
    # reference: latest-wins per id (seqs are unique, so no tie logic)
    model = {}
    for r in init:
        if model.get(r[0], (None, None, -1))[2] < r[3] or r[0] not in model:
            model[r[0]] = (r[1], r[2], r[3])

    for _ in range(5):
        n = rng.randrange(1, 7)
        batch = rand_rows(n, seq)
        seq += n
        # make a third of the rows STALE (lower seq than anything live);
        # stale seqs stay UNIQUE (-s) — two stale rows sharing a key and
        # an equal seq would full-tie inside one batch, where the winner
        # is legitimately arbitrary and the model could not predict it
        batch = [
            (i, m, p, -s if rng.random() < 0.33 else s)
            for (i, m, p, s) in batch
        ]
        upsert_version(
            spark, spark.createDataFrame(batch, schema), out,
            "id", "seq", "seq",
        )
        for (i, m, p, s) in batch:
            cur = model.get(i)
            # updates win full ties (seq == cur seq); stale seq 0 loses
            # to any live row but seeds absent keys
            if cur is None or s >= cur[2]:
                model[i] = (m, p, s)
        got = {
            r.id: (r.month, r.payload, r.seq)
            for r in read_version(spark, out).collect()
        }
        assert got == model, f"diverged at version {latest_version(out)}"


def _store_with_two_versions(spark, tmp_path):
    out = str(tmp_path / "cdf")
    schema = "id long, month string, payload string, seq long"
    v1 = [(1, "01", "a", 1), (2, "01", "b", 1), (3, "02", "c", 1),
          (4, "03", "d", 1)]
    commit_version(spark, spark.createDataFrame(v1, schema), out,
                   ["month"], ["id", "payload", "seq"])
    # v2: update 1 in place, move 3 to month=01, add 5; 4 untouched
    upd = [(1, "01", "a2", 2), (3, "01", "c", 2), (5, "02", "e", 2)]
    upsert_version(spark, spark.createDataFrame(upd, schema), out,
                   "id", "seq", "seq")
    return out, schema


def test_diff_rows_change_feed(spark, tmp_path):
    from pipeline_calculator_v3_spark.dataset_versions import diff_rows

    out, _ = _store_with_two_versions(spark, tmp_path)
    got = {r.id: (r.change, r.n_rows_a, r.n_rows_b)
           for r in diff_rows(spark, out, 1, 2, "id").collect()}
    # 1 updated, 3 moved partitions (content changed: month differs),
    # 5 added; 2 and 4 untouched -> absent
    assert got == {
        1: ("changed", 1, 1),
        3: ("changed", 1, 1),
        5: ("added", 0, 1),
    }


def test_diff_rows_removed_via_full_recommit(spark, tmp_path):
    from pipeline_calculator_v3_spark.dataset_versions import (
        diff_rows,
        read_version,
    )

    out, schema = _store_with_two_versions(spark, tmp_path)
    v3 = read_version(spark, out).where(F.col("id") != 4)
    commit_version(spark, v3, out, ["month"], ["id", "payload", "seq"])
    got = {r.id: r.change
           for r in diff_rows(spark, out, 2, 3, "id").collect()}
    assert got == {4: "removed"}


def test_diff_rows_never_reads_unchanged_partitions(spark, tmp_path):
    """The manifest-pruning proof: corrupt every parquet file of the
    UNTOUCHED partition (month=03) in BOTH trees — a scan that touched
    them would throw; the diff must not notice."""
    from pipeline_calculator_v3_spark.dataset_versions import diff_rows

    out, _ = _store_with_two_versions(spark, tmp_path)
    for v in ("v1", "v2"):
        pdir = os.path.join(out, v, "month=03")
        for fn in os.listdir(pdir):
            if fn.endswith(".parquet"):
                # hardlinked between trees: unlink FIRST so the write
                # only clobbers this tree's entry... both are corrupted
                # anyway, which is the stronger proof
                with open(os.path.join(pdir, fn), "wb") as f:
                    f.write(b"not parquet at all")
    got = {r.id: r.change
           for r in diff_rows(spark, out, 1, 2, "id").collect()}
    assert set(got) == {1, 3, 5}


def test_diff_rows_multiplicity_is_content(spark, tmp_path):
    from pipeline_calculator_v3_spark.dataset_versions import diff_rows

    out = str(tmp_path / "multi")
    schema = "id long, month string, payload string, seq long"
    commit_version(
        spark,
        spark.createDataFrame([(1, "01", "a", 1)], schema),
        out, ["month"], ["id", "payload", "seq"],
    )
    commit_version(
        spark,
        spark.createDataFrame([(1, "01", "a", 1), (1, "01", "a", 1)], schema),
        out, ["month"], ["id", "payload", "seq"],
    )
    got = {r.id: (r.change, r.n_rows_a, r.n_rows_b)
           for r in diff_rows(spark, out, 1, 2, "id").collect()}
    assert got == {1: ("changed", 1, 2)}


def test_diff_rows_vacuumed_version_raises_cleanly(spark, tmp_path):
    from pipeline_calculator_v3_spark.dataset_versions import diff_rows

    out, _ = _store_with_two_versions(spark, tmp_path)
    with pytest.raises(ValueError, match="does not exist"):
        diff_rows(spark, out, 1, 7, "id")

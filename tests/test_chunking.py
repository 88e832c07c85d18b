"""Chunk-geometry and shard-assignment invariants (operators/chunking.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.operators.chunking import chunk_tokens, shard_of


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_chunk_geometry_golden(spark):
    # 40 tokens, max_len 32, stride 16 -> starts 0/16/32, lengths 32/24/8
    text = " ".join(f"w{i}" for i in range(40))
    rows = sorted(
        chunk_tokens(_docs(spark, [text]), max_len=32, stride=16).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [(r.chunk_idx, r.n_tokens, r.first_token, r.last_token) for r in rows] == [
        (0, 32, "w0", "w31"),
        (1, 24, "w16", "w39"),
        (2, 8, "w32", "w39"),
    ]


def test_chunk_edge_cases(spark):
    got = chunk_tokens(
        _docs(spark, ["", "   ", "single", " ".join(["x"] * 16)]),
        max_len=32,
        stride=16,
    ).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 0 not in by_doc and 1 not in by_doc  # empty/whitespace: no chunks
    assert [(r.n_tokens, r.first_token) for r in by_doc[2]] == [(1, "single")]
    # exactly max_len=stride boundary: one chunk, no degenerate second
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_tokens == 16


def test_chunks_cover_every_token(spark, sf_dir):
    """Union of [start, start+len) windows covers [0, n_tokens) per doc."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = chunk_tokens(docs, max_len=32, stride=16)
    per_doc = chunks.groupBy("doc_id").agg(
        F.max(F.col("chunk_idx") * 16 + F.col("n_tokens")).alias("covered"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    toks = docs.select(
        "doc_id",
        F.size(F.expr(r"filter(split(lower(text), '\\s+'), x -> x <> '')")).alias("n"),
    ).where(F.col("n") > 0)
    joined = toks.join(per_doc, "doc_id", "left")
    bad = joined.where(
        F.col("covered").isNull() | (F.col("covered") != F.col("n"))
    )
    assert bad.count() == 0


def test_shard_of_range_and_determinism(spark):
    df = spark.range(0, 1000).select(F.col("id"), shard_of(F.col("id"), 16))
    stats = df.agg(
        F.min("shard"), F.max("shard"), F.countDistinct("shard")
    ).collect()[0]
    assert stats[0] >= 0 and stats[1] <= 15 and stats[2] == 16
    # repartitioning must not change any assignment
    a = {r.id: r.shard for r in df.collect()}
    b = {r.id: r.shard for r in df.repartition(7).collect()}
    assert a == b


def test_interval_bin_join_matches_naive(spark):
    from pyspark.sql import functions as F

    from pipeline_calculator_v3_spark.operators.intervals import interval_bin_join

    pts = spark.range(0, 500).select((F.col("id") * 7.3).alias("v"))
    iv = spark.range(0, 30).select(
        F.col("id").alias("ivid"),
        (F.col("id") * 111.0).alias("lo"),
        (F.col("id") * 111.0 + 130.0).alias("hi"),
    )
    got = sorted(
        (r.v, r.ivid)
        for r in interval_bin_join(pts, iv, "v", "lo", "hi", 50.0).collect()
    )
    naive = sorted(
        (r.v, r.ivid)
        for r in pts.join(
            iv, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    )
    assert got == naive and len(got) > 0


def test_upsert_latest_deterministic(spark):
    from pyspark.sql import functions as F

    from pipeline_calculator_v3_spark.operators.cdc import upsert_latest

    base = spark.createDataFrame(
        [(1, "a", 1, 0), (2, "b", 1, 0)], "k int, val string, version int, seq int"
    )
    ups = spark.createDataFrame(
        [(1, "a2", 2, 1), (1, "a3", 2, 2), (3, "c", 1, 0)],
        "k int, val string, version int, seq int",
    )
    got = {r.k: r.val for r in upsert_latest(base, ups, "k", "version", "seq").collect()}
    # same version twice for k=1: higher seq wins deterministically
    assert got == {1: "a3", 2: "b", 3: "c"}


def test_shard_of_covers_and_balances_nondivisor_counts(spark):
    """Review r06: the old 1-byte digest prefix made n_shards > 256
    permanently empty and skewed any n not dividing 256 by up to 50%.
    With the 32-bit prefix, every shard receives rows and the load is
    near-uniform."""
    from pyspark.sql import functions as F

    from pipeline_calculator_v3_spark.operators.chunking import shard_of

    n = 10_000
    df = spark.range(n).select(shard_of(F.col("id"), 300))
    counts = {r.shard: r.n for r in
              df.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == set(range(300))  # no empty shard
    avg = n / 300
    assert max(counts.values()) < 2 * avg  # no 50%-class imbalance


def test_shard_of_rejects_absurd_counts(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pipeline_calculator_v3_spark.operators.chunking import shard_of

    with _pytest.raises(ValueError, match="n_shards"):
        shard_of(F.col("id"), 0)
    with _pytest.raises(ValueError, match="n_shards"):
        shard_of(F.col("id"), 1 << 21)


def test_shard_sql_matches_shard_of(spark):
    """The oracle text helper and the Column implementation must agree
    row-for-row — this is the anti-drift gate for every shard oracle."""
    from pyspark.sql import functions as F

    from pipeline_calculator_v3_spark.operators.chunking import (
        shard_of,
        shard_sql,
    )

    df = spark.range(500).select(
        shard_of(F.col("id"), 13),
        F.expr(shard_sql("CAST(id AS STRING)", 13)).alias("sql_shard"),
    )
    assert df.where(F.col("shard") != F.col("sql_shard")).count() == 0


def test_upsert_full_tie_prefers_updates_deterministically(spark):
    """Review r06: a base row and an update re-delivered under the SAME
    version and tiebreak used to race on shuffle arrival order; the update
    (corrected payload) must win, on every run and partitioning."""
    from pipeline_calculator_v3_spark.operators.cdc import upsert_latest

    base = spark.createDataFrame(
        [(1, 5, 2, "stale")], "k long, version long, seq long, val string"
    )
    updates = spark.createDataFrame(
        [(1, 5, 2, "corrected")], "k long, version long, seq long, val string"
    )
    for _ in range(3):  # repeated runs: same winner every time
        got = upsert_latest(base, updates, "k", "version", "seq").collect()
        assert [(r.k, r.val) for r in got] == [(1, "corrected")]
    # and the reserved working columns are guarded
    import pytest as _pytest

    poisoned = base.withColumn("_src", base.val)
    with _pytest.raises(ValueError, match="reserved"):
        upsert_latest(poisoned, updates, "k", "version", "seq")


def test_interval_join_rejects_colliding_columns(spark):
    """Review r06: shared column names produced ambiguous duplicate output
    columns, and a pre-existing '_bin' was silently destroyed."""
    import pytest as _pytest

    from pipeline_calculator_v3_spark.operators.intervals import (
        interval_bin_join,
    )

    pts = spark.createDataFrame([(1, 5.0)], "id long, v double")
    ivs = spark.createDataFrame([(1, 0.0, 10.0)], "id long, lo double, hi double")
    with _pytest.raises(ValueError, match="share column names"):
        interval_bin_join(pts, ivs, "v", "lo", "hi", 10.0)
    ivs2 = spark.createDataFrame(
        [(2, 0.0, 10.0, 0)], "iid long, lo double, hi double, _bin int"
    )
    with _pytest.raises(ValueError, match="reserved"):
        interval_bin_join(pts, ivs2, "v", "lo", "hi", 10.0)

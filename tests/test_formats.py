"""ORC + raw-text source round-trip contracts (sources/formats.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.sources.formats import (
    read_orc,
    read_text_lines,
    read_text_whole,
    write_orc,
)


def test_orc_round_trip_exact(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dest = str(tmp_path / "orders_orc")
    write_orc(src, dest)
    back = read_orc(spark, dest)
    assert back.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_orc_partitioned_write_prunes(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dest = str(tmp_path / "orders_part")
    write_orc(src, dest, partition_by=["o_orderstatus"])
    statuses = [r[0] for r in src.select("o_orderstatus").distinct().collect()]
    assert all(
        os.path.isdir(os.path.join(dest, f"o_orderstatus={s}")) for s in statuses
    )
    back = read_orc(spark, dest)
    one = back.where(F.col("o_orderstatus") == statuses[0])
    # partition pruning: the filtered physical plan reads only one dir
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert back.count() == src.count()
    expected = src.where(F.col("o_orderstatus") == statuses[0]).count()
    assert one.count() == expected
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or (
        "o_orderstatus" in plan
    )


def test_orc_predicate_pushdown(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dest = str(tmp_path / "orders_push")
    write_orc(src, dest)
    q = read_orc(spark, dest).where(F.col("o_orderkey") < 100).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)]" in plan
    # column pruning reaches the scan
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan


def test_text_lines_identity_is_partitioning_stable(spark, tmp_path):
    docs = tmp_path / "corpus"
    docs.mkdir()
    for i in range(3):
        (docs / f"doc{i}.txt").write_text(
            "\n".join(f"file{i} line{j}" for j in range(50)) + "\n"
        )
    df = read_text_lines(spark, str(docs))
    assert df.count() == 150
    rows = df.collect()
    for r in rows:
        fi = int(r.value.split()[0][4:])
        lj = int(r.value.split()[1][4:])
        assert r.path.endswith(f"doc{fi}.txt")
        assert r.line_no == lj + 1, (r.value, r.line_no)


def test_text_whole_one_row_per_file(spark, tmp_path):
    docs = tmp_path / "whole"
    docs.mkdir()
    (docs / "a.txt").write_text("alpha\nbeta\n")
    (docs / "b.txt").write_text("gamma\n")
    df = read_text_whole(spark, str(docs))
    got = {os.path.basename(r.path): r.value for r in df.collect()}
    assert got == {"a.txt": "alpha\nbeta\n", "b.txt": "gamma\n"}


def test_jsonl_round_trip_and_corrupt_capture(spark, sf_dir, tmp_path):
    from pipeline_calculator_v3_spark.sources.formats import read_jsonl, write_jsonl

    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dest = str(tmp_path / "docs_jsonl")
    write_jsonl(src, dest)
    # inject malformed lines alongside the good part files
    with open(os.path.join(dest, "bad.json"), "w") as f:
        f.write('{"doc_id": 1, "text": "unterminated\n')
        f.write("not json at all\n")
        f.write('{"doc_id": 99999999, "text": "fine", "lang": "en", '
                '"source": "s", "n_chars": 4}\n')
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    # corrupt-column-only queries on raw json are disallowed — materialize
    back = read_jsonl(spark, dest, schema).cache()
    good = back.where(F.col("_corrupt").isNull())
    bad = back.where(F.col("_corrupt").isNotNull())
    assert bad.count() == 2  # the two malformed lines, captured not fatal
    assert good.count() == src.count() + 1  # originals + the valid extra line
    # value fidelity on the round-tripped originals
    a = sorted(map(tuple, src.collect()))
    b = sorted(
        map(tuple, good.where(F.col("doc_id") != 99999999)
            .select(*src.columns).collect())
    )
    assert a == b


def test_jsonl_explicit_schema_no_inference_pass(spark, sf_dir, tmp_path):
    from pipeline_calculator_v3_spark.sources.formats import read_jsonl, write_jsonl

    src = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    dest = str(tmp_path / "docs_schema")
    write_jsonl(src, dest)
    df = read_jsonl(spark, dest, "doc_id bigint, lang string, n_chars bigint").cache()
    # schema is exactly the declared contract (+ corrupt column), no inference
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "lang", "n_chars", "_corrupt"
    ]
    assert df.where(F.col("_corrupt").isNotNull()).count() == 0


def test_csv_round_trip_and_corrupt_capture(spark, sf_dir, tmp_path):
    """CSV corpus contract: explicit schema round-trips exactly (quoted
    fields with embedded separators/newlines included), and malformed rows
    land whole in the corrupt column instead of failing or vanishing."""
    from pipeline_calculator_v3_spark.sources.formats import (
        read_csv_corpus,
        write_csv_corpus,
    )

    src = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    dest = str(tmp_path / "docs_csv")
    write_csv_corpus(src, dest)
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    back = read_csv_corpus(spark, dest, schema, multiline=True).cache()
    # (cached first: corrupt-only queries on raw files are disallowed —
    # the restriction the reader's docstring documents)
    assert back.where(F.col("_corrupt").isNotNull()).count() == 0
    a = src.orderBy("doc_id").collect()
    b = back.drop("_corrupt").orderBy("doc_id").collect()
    assert a == b
    back.unpersist()

    # hand-written file with a malformed row: bad arity/type -> corrupt col
    bad_dir = tmp_path / "bad_csv"
    bad_dir.mkdir()
    (bad_dir / "part.csv").write_text(
        "doc_id,text,lang,source,n_chars\n"
        '1,"hello, world",en,src0,12\n'
        "not_a_number,oops,xx,src1,zz\n"
        '2,"multi\nline text",de,src2,15\n'
    )
    parsed = read_csv_corpus(spark, str(bad_dir), schema, multiline=True).cache()
    good = parsed.where(F.col("_corrupt").isNull())
    bad = parsed.where(F.col("_corrupt").isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert "not_a_number" in bad.collect()[0]["_corrupt"]
    # the quoted embedded comma and newline survive exactly
    texts = {r.doc_id: r.text for r in good.collect()}
    assert texts[1] == "hello, world" and texts[2] == "multi\nline text"
    parsed.unpersist()


def test_csv_empty_string_vs_null_round_trip(spark, tmp_path):
    """Empty string and NULL are different values and must survive the
    write->read cycle distinctly (the default reader collapses both to
    null — the silent-mutation class a corpus reader cannot have)."""
    from pipeline_calculator_v3_spark.sources.formats import (
        read_csv_corpus,
        write_csv_corpus,
    )

    df = spark.createDataFrame(
        [(1, "x"), (2, ""), (3, None)], "id bigint, v string"
    )
    dest = str(tmp_path / "empties")
    write_csv_corpus(df, dest)
    back = read_csv_corpus(spark, dest, "id bigint, v string").cache()
    got = {r.id: r.v for r in back.collect()}
    assert got == {1: "x", 2: "", 3: None}
    back.unpersist()


def test_parquet_schema_evolution_round_trip(spark, tmp_path):
    """Files written before a column existed read back null-filled under
    both the mergeSchema sweep and the explicit-contract path."""
    from pipeline_calculator_v3_spark.sources.formats import (
        read_parquet_evolving,
    )

    out = str(tmp_path / "evolving")
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, name string"
    )
    v1.write.parquet(out)
    v2 = spark.createDataFrame(
        [(3, "c", 0.5)], "id bigint, name string, score double"
    )
    v2.write.mode("append").parquet(out)

    merged = read_parquet_evolving(spark, out)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert len(rows) == 3
    assert rows[1]["score"] is None and rows[3]["score"] == 0.5

    explicit = read_parquet_evolving(
        spark, out, schema="id bigint, name string, score double"
    )
    rows2 = {r["id"]: r for r in explicit.collect()}
    assert rows2[2]["score"] is None and rows2[3]["score"] == 0.5
    # plain read without mergeSchema may miss the late column — that is
    # the trap the helper exists to close (footer of one file wins)


def test_text_lines_rejects_files_larger_than_split_size(spark, tmp_path):
    """Review r06: a file above maxPartitionBytes is read as multiple
    splits whose order does not follow file position, so line_no would be
    silently wrong — the reader must fail loudly instead."""
    import pytest as _pytest

    from pipeline_calculator_v3_spark.sources.formats import read_text_lines

    p = tmp_path / "big.txt"
    p.write_text("\n".join(f"line-{i}" for i in range(2000)))
    from pipeline_calculator_v3_spark.session import scoped_conf

    with scoped_conf(spark, "spark.sql.files.maxPartitionBytes", "1024b"):
        with _pytest.raises(Exception, match="maxPartitionBytes"):
            read_text_lines(spark, str(p)).collect()
    # and under the normal conf the same file reads fine with correct ids
    df = read_text_lines(spark, str(p))
    rows = {r.line_no: r.value for r in df.collect()}
    assert rows[1] == "line-0" and rows[2000] == "line-1999"


def test_bytes_conf_fractional_units(spark):
    """Review r12: the unit multiplier must apply before truncation
    ('1.5g' is 1.5 GiB, not 1 GiB — reachable through unvalidated custom
    keys; Spark's own byte-conf setter rejects fractions) and the 'p'/'pb'
    units Spark accepts must parse instead of raising."""
    from pipeline_calculator_v3_spark.session import scoped_conf
    from pipeline_calculator_v3_spark.sources.formats import _bytes_conf

    key = "spark.graft.test.bytes"
    for raw, want in [
        ("1.5g", int(1.5 * (1 << 30))),
        ("128mb", 128 << 20),
        ("2pb", 2 << 50),
        ("134217728b", 128 << 20),
        ("4096", 4096),
    ]:
        spark.conf.set(key, raw)
        try:
            assert _bytes_conf(spark, key) == want, raw
        finally:
            spark.conf.unset(key)
    # the real maxPartitionBytes path still round-trips integer forms
    with scoped_conf(spark, "spark.sql.files.maxPartitionBytes", "64m"):
        assert _bytes_conf(spark, "spark.sql.files.maxPartitionBytes") == 64 << 20


# ---------------------------------------------------------------------------
# native XML datasource (Spark 4 merged spark-xml upstream) — staged r14.
# ---------------------------------------------------------------------------
def test_xml_round_trip(spark, tmp_path):
    from pipeline_calculator_v3_spark.sources.formats import (
        read_xml,
        write_xml,
    )

    rows = [(1, "alpha", 1.5), (2, "beta", None), (3, "gam<ma>", 0.25)]
    df = spark.createDataFrame(rows, "id long, name string, score double")
    out = str(tmp_path / "xml_rt")
    write_xml(df, out, row_tag="doc")
    back = read_xml(spark, out, row_tag="doc",
                    schema="id long, name string, score double")
    got = {(r.id, r.name, r.score) for r in back.collect()}
    # NULL fields are OMITTED on write and read back as NULL under the
    # explicit schema — the documented asymmetry; markup in values must
    # be escaped and restored exactly
    assert got == set(rows)


def test_xml_attributes_and_nesting(spark, tmp_path):
    from pipeline_calculator_v3_spark.sources.formats import read_xml

    p = tmp_path / "feed.xml"
    p.write_text(
        "<feed>"
        "<entry lang=\"en\"><id>1</id><meta><src>a</src></meta></entry>"
        "<entry lang=\"de\"><id>2</id><meta><src>b</src></meta></entry>"
        "</feed>"
    )
    df = read_xml(spark, str(p), row_tag="entry")
    got = {(r._lang, r.id, r.meta.src) for r in df.collect()}
    assert got == {("en", 1, "a"), ("de", 2, "b")}


def test_xml_explicit_schema_skips_inference(spark, tmp_path):
    from pipeline_calculator_v3_spark.sources.formats import read_xml

    p = tmp_path / "typed.xml"
    p.write_text("<rows><r><k>007</k></r><r><k>011</k></r></rows>")
    # inference would re-type zero-padded strings as bigint; the declared
    # schema is the contract
    df = read_xml(spark, str(p), row_tag="r", schema="k string")
    assert {r.k for r in df.collect()} == {"007", "011"}
    inferred = read_xml(spark, str(p), row_tag="r")
    assert dict(inferred.dtypes)["k"] == "bigint"

"""JSONL (newline-delimited JSON) document source/sink — the de-facto
interchange format of pre-training corpora (C4 / The Pile / RedPajama
style dumps ship as .jsonl shards).

Read contract: PERMISSIVE parsing with an explicit quarantine — a line
that fails to parse lands, verbatim, in ``_corrupt_record`` instead of
killing the job or being silently dropped (a 100 TB crawl ALWAYS
contains malformed lines; the pipeline decision is quarantine-and-count,
never fail-the-shard).  ``read_documents_jsonl`` splits the scan into
(parsed rows, quarantined raw lines) from ONE pass; both sides are plain
DataFrames.

Schema is explicit, never inferred: inference is a full extra pass over
the data at scale and makes the pipeline's schema a function of the
corpus (one bad shard flips a column type).  Spark's JSON writer emits
one JSON object per line, so write->read is the identity on the typed
columns — q_jsonl_roundtrip value-gates exactly that, byte-for-byte on
text, against the parquet originals.

Scale shape: line-delimited JSON splits by newline, so a shard parses in
parallel; parsing is JVM-side Jackson inside the scan (no UDF); the
quarantine split reuses one cached scan rather than re-reading.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_JSONL_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, "
    "n_chars bigint, _corrupt_record string"
)


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write one JSON object per row (Spark's JSON sink IS JSONL)."""
    df.write.mode("overwrite").json(path)


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: str = DOCUMENTS_JSONL_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """(parsed, quarantined) from one permissive scan of ``path``.

    ``parsed`` carries the typed document columns for lines that parsed;
    ``quarantined`` is (raw line,) for lines that did not.  The split
    predicate is `_corrupt_record IS NULL` — Spark leaves the column
    null exactly when the whole line parsed under the explicit schema."""
    from ..caching import persist_tracked

    # persisted for two reasons: the split reads the scan twice, and
    # Spark disallows querying only `_corrupt_record` straight off a raw
    # JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    # caching the parsed result is the documented contract
    raw = persist_tracked(
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    parsed = raw.where(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    quarantined = raw.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw")
    )
    return parsed, quarantined

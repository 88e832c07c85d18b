"""operators/phash.py — perceptual image hashing (staged r11): the
DuckDB oracle replay of the full PNG-encode -> decode -> aHash pipeline
over the synth corpus, planted near-duplicate recovery, banding
completeness at Hamming <= 3 (pigeonhole), malformed-blob degradation,
and the pure-map plan gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.operators.multimodal import synth_png_media
from pipeline_calculator_v3_spark.operators.phash import ahash64, ahash_pairs

# the registry must finish loading BEFORE any queries_* module is imported
# directly — entering queries_multimodal first leaves it partially
# initialized when queries.py's reorder asserts the full registry
import pipeline_calculator_v3_spark.queries  # noqa: E402,F401
from pipeline_calculator_v3_spark.queries_multimodal import (  # noqa: E402
    _PAYLOAD_BYTES_CTE,
)

# The intended face oracle: pixels re-derived from the document text hex
# (the q_multimodal_decode_png CTE), nearest-neighbor 8x8 sampling on
# integer indices, integer mean-threshold, two BIGINT halves.
AHASH_ORACLE = f"""
WITH {_PAYLOAD_BYTES_CTE},
dims AS (SELECT doc_id, n, frame // 8 AS w FROM m),
cells AS (
    SELECT d.doc_id, r.r, j.j,
           (r.r * d.w + (j.j * d.w) // 8) AS idx
    FROM dims d
    CROSS JOIN (SELECT unnest(range(8)) AS r) r
    CROSS JOIN (SELECT unnest(range(8)) AS j) j
),
sampled AS (
    SELECT c.doc_id, c.r, c.j, COALESCE(b.b, 0) AS s
    FROM cells c
    LEFT JOIN bytes b ON b.doc_id = c.doc_id AND b.i = c.idx
),
bits AS (
    SELECT doc_id, r, j,
           CASE WHEN 64 * s > SUM(s) OVER (PARTITION BY doc_id)
                THEN 1 ELSE 0 END AS bit
    FROM sampled
)
SELECT doc_id AS media_id,
       CAST(SUM(CASE WHEN r >= 4 THEN bit * (1::BIGINT << ((r - 4) * 8 + j))
                ELSE 0 END) AS BIGINT) AS ahash_hi,
       CAST(SUM(CASE WHEN r < 4 THEN bit * (1::BIGINT << (r * 8 + j))
                ELSE 0 END) AS BIGINT) AS ahash_lo
FROM bits GROUP BY doc_id
"""


def test_synth_corpus_matches_duckdb(spark, duck, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r.media_id: (r.ahash_hi, r.ahash_lo)
        for r in ahash64(synth_png_media(docs)).collect()
    }
    want = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in duck.execute(AHASH_ORACLE).fetchall()
    }
    assert len(got) == len(want) > 100
    assert got == want
    # halves stay non-negative (the two's-complement trap the split avoids)
    assert all(hi >= 0 and lo >= 0 for hi, lo in got.values())


@pytest.fixture(scope="module")
def planted_media(spark):
    # 200-char texts -> w = 200 % 64 + 1 = 9, so the 9x8 image consumes
    # exactly the first 72 bytes (fully filled, no zero-padding
    # degeneracy).  Sampled flat indexes are r*9 + (j*9)//8 = r*9 + j,
    # i.e. the first 8 bytes of each 9-wide row — byte 8 of row 0 (flat
    # index 8) is NOT sampled, so docs 1 and 2 (differing only there)
    # hash identically; doc 3 reverses the byte pattern, flipping which
    # sampled cells sit above the mean.
    base = ("abcdefghi" * 23)[:200]
    tweak = base[:8] + "Z" + base[9:]
    other = ("ihgfedcba" * 23)[:200]
    rows = [(1, base), (2, tweak), (3, other)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", "text", F.length("text").alias("n_chars")
    )
    return synth_png_media(docs)


def test_unsampled_change_is_invisible(planted_media):
    got = {
        r.media_id: (r.ahash_hi, r.ahash_lo, r.width)
        for r in ahash64(planted_media).collect()
    }
    assert got[1][2] == 9
    assert got[1][:2] == got[2][:2]
    assert got[1][:2] != got[3][:2]


def test_planted_pair_recovered(planted_media):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in ahash_pairs(ahash64(planted_media)).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_banding_complete_at_hamming_3(spark):
    # unit-level banding check on hand-built hashes: flip 3 bits spread
    # over three DIFFERENT bands (worst spread short of pigeonhole
    # failure) — the pair MUST be found; 4 bits over all four bands at
    # max_hamming=4 is the documented miss mode.
    h0_hi, h0_lo = 0x12345678, 0x0ABCDEF0
    h3_hi = h0_hi ^ (1 << 1) ^ (1 << 17)   # bands 2 and 3
    h3_lo = h0_lo ^ (1 << 5)               # band 0
    h4_hi = h0_hi ^ (1 << 1) ^ (1 << 17)
    h4_lo = h0_lo ^ (1 << 5) ^ (1 << 21)   # all four bands touched
    rows = [
        (1, h0_hi, h0_lo, True), (2, h3_hi, h3_lo, True),
        (3, h4_hi, h4_lo, True),
    ]
    hashes = spark.createDataFrame(
        rows, "media_id long, ahash_hi long, ahash_lo long, valid boolean"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in ahash_pairs(hashes, max_hamming=4).collect()
    }
    assert got[(1, 2)] == 3          # pigeonhole-guaranteed
    assert (1, 3) not in got         # 4 flips straddling all 4 bands: missed
    assert got[(2, 3)] == 1          # they share 3 bands, differ by 1 bit


def test_malformed_blob_degrades(spark, planted_media):
    bad = spark.createDataFrame(
        [(99, bytearray(b"not a png"))], "media_id long, content binary"
    )
    rows = {
        r.media_id: r.valid
        for r in ahash64(planted_media.unionByName(bad)).collect()
    }
    assert rows[99] is False and rows[1] is True
    pairs = ahash_pairs(
        ahash64(planted_media.unionByName(bad))
    ).where("id_a = 99 or id_b = 99")
    assert pairs.count() == 0


def test_hash_pass_is_pure_map(planted_media):
    plan = ahash64(planted_media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


# ---------------------------------------------------------------------------
# dHash (difference hash) — the gradient sibling
# ---------------------------------------------------------------------------
DHASH_ORACLE = f"""
WITH {_PAYLOAD_BYTES_CTE},
dims AS (SELECT doc_id, n, frame // 8 AS w FROM m),
cells AS (
    SELECT d.doc_id, r.r, j.j,
           (r.r * d.w + (j.j * d.w) // 9) AS idx
    FROM dims d
    CROSS JOIN (SELECT unnest(range(8)) AS r) r
    CROSS JOIN (SELECT unnest(range(9)) AS j) j
),
sampled AS (
    SELECT c.doc_id, c.r, c.j, COALESCE(b.b, 0) AS s
    FROM cells c
    LEFT JOIN bytes b ON b.doc_id = c.doc_id AND b.i = c.idx
),
bits AS (
    SELECT l.doc_id, l.r, l.j,
           CASE WHEN l.s > rt.s THEN 1 ELSE 0 END AS bit
    FROM sampled l
    JOIN sampled rt ON rt.doc_id = l.doc_id AND rt.r = l.r
                   AND rt.j = l.j + 1
    WHERE l.j < 8
)
SELECT doc_id AS media_id,
       CAST(SUM(CASE WHEN r >= 4 THEN bit * (1::BIGINT << ((r - 4) * 8 + j))
                ELSE 0 END) AS BIGINT) AS ahash_hi,
       CAST(SUM(CASE WHEN r < 4 THEN bit * (1::BIGINT << (r * 8 + j))
                ELSE 0 END) AS BIGINT) AS ahash_lo
FROM bits GROUP BY doc_id
"""


def test_dhash_matches_duckdb(spark, duck, sf_dir):
    from pipeline_calculator_v3_spark.operators.phash import dhash64

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r.media_id: (r.ahash_hi, r.ahash_lo)
        for r in dhash64(synth_png_media(docs)).collect()
    }
    want = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in duck.execute(DHASH_ORACLE).fetchall()
    }
    assert len(got) == len(want) > 100
    assert got == want
    assert all(hi >= 0 and lo >= 0 for hi, lo in got.values())


def test_dhash_brightness_invariance(spark, planted_media):
    """The property dHash exists for: a global brightness shift moves
    every aHash cell relative to the mean but leaves GRADIENT signs
    unchanged.  Build two images whose pixel rows differ by a constant
    offset via text bytes and assert dhash-equal, ahash-different."""
    from pipeline_calculator_v3_spark.operators.phash import dhash64

    # 'abcdefghi' vs 'nopqrstuv': each char shifted by +13 — gradients
    # identical, absolute levels differ
    base = ("abcdefghi" * 23)[:200]
    shifted = ("nopqrstuv" * 23)[:200]
    docs = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id long, text string"
    ).select("doc_id", "text", F.length("text").alias("n_chars"))
    media = synth_png_media(docs)
    d = {r.media_id: (r.ahash_hi, r.ahash_lo) for r in dhash64(media).collect()}
    # the load-bearing assertion: the gradient fingerprint survives the
    # shift exactly (aHash may or may not — its cells moved relative to
    # the mean, and rank order happens to be preserved on this plant)
    assert d[1] == d[2]

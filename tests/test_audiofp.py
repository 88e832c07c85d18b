"""operators/audiofp.py — acoustic fingerprinting (staged r12 for an
r13 registry face): the DuckDB oracle replay of the full WAV-encode ->
decode -> fingerprint pipeline over the synth corpus, gain-invariance
and planted-pair recovery, short/malformed degradation, and the
pure-map plan gate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.operators.audiofp import (
    audio_fingerprint64,
    audio_fp_pairs,
)
from pipeline_calculator_v3_spark.operators.multimodal import synth_wav_media

# The intended face oracle: PCM16 samples re-derived from doc_id (the
# synth_wav_media contract, shared with WAV_FEATURES_ORACLE), integer
# frame split k*33//n, per-frame energy/zero-crossing sums, strict-'>'
# consecutive-frame gradient bits, two non-negative BIGINT words.
AUDIOFP_ORACLE = """
WITH m AS (
    SELECT doc_id, CAST(64 + doc_id % 64 AS BIGINT) AS n FROM documents
),
s AS (
    SELECT doc_id, n, k,
           (doc_id * 7919 + k * 104729) % 65536 - 32768 AS v
    FROM (SELECT doc_id, n, unnest(range(n)) AS k FROM m)
),
fr AS (
    SELECT doc_id, n, k, v, (k * 33) // n AS f,
           CASE WHEN k > 0 AND (v >= 0) <>
                     (lag(v) OVER (PARTITION BY doc_id ORDER BY k) >= 0)
                THEN 1 ELSE 0 END AS xing
    FROM s
),
fe AS (
    SELECT doc_id, f, SUM(v * v) AS energy, SUM(xing) AS zc
    FROM fr GROUP BY 1, 2
),
bits AS (
    SELECT a.doc_id, a.f,
           CASE WHEN a.energy > b.energy THEN 1 ELSE 0 END AS ebit,
           CASE WHEN a.zc > b.zc THEN 1 ELSE 0 END AS zbit
    FROM fe a
    JOIN fe b ON b.doc_id = a.doc_id AND b.f = a.f + 1
    WHERE a.f < 32
)
SELECT doc_id AS media_id,
       CAST(SUM(zbit * (1::BIGINT << f)) AS BIGINT) AS fp_hi,
       CAST(SUM(ebit * (1::BIGINT << f)) AS BIGINT) AS fp_lo
FROM bits GROUP BY doc_id
"""


def test_synth_corpus_matches_duckdb(spark, duck, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r.media_id: (r.fp_hi, r.fp_lo)
        for r in audio_fingerprint64(synth_wav_media(docs)).collect()
    }
    want = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in duck.execute(AUDIOFP_ORACLE).fetchall()
    }
    assert len(got) == len(want) > 100
    assert got == want
    # both words are 32-bit non-negative (no two's-complement spelling)
    assert all(0 <= hi < 2**32 and 0 <= lo < 2**32 for hi, lo in got.values())


def _blob_df(spark, rows):
    from pipeline_calculator_v3_spark.operators.wavcodec import encode_wav

    data = [
        (mid, bytearray(encode_wav(np.asarray(s, dtype=np.int16), 8000)))
        for mid, s in rows
    ]
    return spark.createDataFrame(data, "media_id long, content binary")


@pytest.fixture(scope="module")
def planted_media(spark):
    # base: a 128-sample ramp-ish signal with varying per-frame energy and
    # crossings; doubled: every sample * 2 (no clipping — max 8k) —
    # gain-scaled copy, gradients preserved; other: the reversed signal.
    rng = np.arange(128)
    base = ((rng * 37) % 257 - 128) * 32
    return _blob_df(
        spark,
        [(1, base), (2, base * 2), (3, base[::-1].copy())],
    )


def test_gain_invariance(planted_media):
    got = {
        r.media_id: (r.fp_hi, r.fp_lo, r.valid)
        for r in audio_fingerprint64(planted_media).collect()
    }
    # uniform gain scales every frame energy by 4 and leaves crossings
    # untouched: the GRADIENT fingerprint is identical
    assert got[1][:2] == got[2][:2]
    assert got[1][:2] != got[3][:2]
    assert all(v for _, _, v in got.values())


def test_planted_pair_recovered(planted_media):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in audio_fp_pairs(audio_fingerprint64(planted_media)).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_short_and_malformed_degrade(spark, planted_media):
    bad = spark.createDataFrame(
        [(98, bytearray(b"not a wav"))], "media_id long, content binary"
    )
    short = _blob_df(spark, [(99, np.zeros(16, dtype=np.int16))])
    fps = audio_fingerprint64(
        planted_media.unionByName(bad).unionByName(short)
    )
    rows = {r.media_id: r.valid for r in fps.collect()}
    assert rows[98] is False and rows[99] is False and rows[1] is True
    assert (
        audio_fp_pairs(fps).where("id_a >= 98 or id_b >= 98").count() == 0
    )


def test_fingerprint_pass_is_pure_map(planted_media):
    plan = (
        audio_fingerprint64(planted_media)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan

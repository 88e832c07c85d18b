"""operators/wavcodec.py + the WAV multimodal operators (r10-staged,
audio twin of the PNG codec family): codec round trip, chunk-walk
robustness, PERMISSIVE degradation, and the feature pipeline's DuckDB
replay (the intended future registry oracle)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pipeline_calculator_v3_spark.operators.multimodal import (
    decode_wav_features,
    synth_wav_media,
)
from pipeline_calculator_v3_spark.operators.wavcodec import (
    decode_wav,
    encode_wav,
)


def test_round_trip_exact():
    rng = np.random.default_rng(7)
    for n in (1, 2, 128, 1000):
        s = rng.integers(-32768, 32768, n).astype(np.int16)
        out, rate = decode_wav(encode_wav(s, 16000))
        assert rate == 16000
        assert np.array_equal(out, s)


def test_extra_chunks_skip_word_aligned():
    """A LIST metadata chunk (odd size, so the pad byte matters) between
    fmt and data must not derail the walk."""
    s = np.array([1, -2, 3], dtype=np.int16)
    blob = encode_wav(s, 8000)
    # splice an odd-sized junk chunk right after 'fmt ' (12 + 8 + 16 bytes)
    cut = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    spliced = blob[:cut] + junk + blob[cut:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    out, rate = decode_wav(spliced)
    assert rate == 8000 and np.array_equal(out, s)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:10],                      # truncated header
        lambda b: b"JUNK" + b[4:],             # bad magic
        lambda b: b[:12],                      # no chunks at all
        lambda b: b.replace(b"data", b"datx"),  # missing data chunk
        lambda b: b[: len(b) - 1],             # truncated data chunk
    ],
)
def test_malformed_raises(mutate):
    blob = encode_wav(np.array([5, -5], dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        decode_wav(bytes(mutate(blob)))


def test_stereo_and_non_pcm_rejected():
    s = np.array([1, 2], dtype=np.int16)
    blob = bytearray(encode_wav(s, 8000))
    blob[22] = 2  # channels = 2 in the fmt chunk
    with pytest.raises(ValueError):
        decode_wav(bytes(blob))


def test_encode_guards():
    with pytest.raises(ValueError):
        encode_wav(np.zeros((2, 2), dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        encode_wav(np.zeros(4, dtype=np.int16), 0)


# ---------------------------------------------------------------------------
# Spark pipeline: synth -> REAL encode -> REAL decode -> features, value-
# gated against the formula replayed in DuckDB.  The oracle text became the
# q_multimodal_decode_wav registry oracle in r11 — imported from the query
# module so test and driver check the SAME SQL.
# ---------------------------------------------------------------------------

# the registry must finish loading BEFORE any queries_* module is imported
# directly — entering queries_multimodal first leaves it partially
# initialized when queries.py's reorder asserts the full registry
# (standalone `pytest tests/test_wavcodec.py` failed at collection)
import pipeline_calculator_v3_spark.queries  # noqa: E402,F401
from pipeline_calculator_v3_spark.queries_multimodal import (  # noqa: E402
    WAV_FEATURES_ORACLE as WAV_ORACLE,
)


def test_features_match_duckdb_oracle(spark, sf_dir, duck):
    from tests.compare import assert_frames_match

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = decode_wav_features(synth_wav_media(docs)).toPandas()
    want = duck.execute(WAV_ORACLE).df()
    assert got["valid"].all()
    assert_frames_match(got, want)


def test_malformed_blob_degrades_not_fails(spark):
    import pandas as pd

    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2],
                      "content": [b"not audio at all",
                                  bytes(encode_wav(
                                      np.array([9, -9], dtype=np.int16),
                                      8000))]}),
        "media_id bigint, content binary",
    )
    rows = {r.media_id: r.valid for r in decode_wav_features(media).collect()}
    assert rows == {1: False, 2: True}

"""Perceptual image hashing (average hash) — near-duplicate detection
for the IMAGE modality, the dedup axis every text operator here misses:
re-encoded, renamed, or metadata-stripped copies of the same picture
have different bytes (exact dedup blind) and no text (MinHash/SimHash
blind), but the same 64-bit aHash.

aHash (the classic pHash-family baseline): downsample the grayscale
image to an 8x8 grid, threshold every cell against the grid mean, read
the 64 bits as the fingerprint; near-duplicates are pairs within a small
Hamming distance.  Deterministic spellings so BOTH engines replay it
exactly (tests/test_phash.py carries the DuckDB oracle over the
synth_png_media corpus, whose pixels are SQL-derivable from the
document text — the q_multimodal_decode_png move):

- downsample = NEAREST-NEIGHBOR on integer indices: grid cell (r, j) of
  an h x w image samples pixel (r*h//8, j*w//8) — pure integer
  arithmetic, no interpolation, no float resize;
- threshold = ``64 * sample > sum_of_64_samples`` — the mean compare
  multiplied through, so it stays INTEGER (no division, no float ties);
- the 64 bits pack into TWO non-negative BIGINTs (rows 0-3 -> lo,
  rows 4-7 -> hi, bit index r*8+j within each half) — a single 64-bit
  word would go negative at bit 63 and two's-complement spellings
  differ across engines.

Matching at scale is banded, the SimHash move: each hash splits into
four 16-bit band keys; candidate pairs share at least one band (an
equi-join on (band, key), never an all-pairs scan), then the exact
Hamming distance — bit_count(xor) on both halves — verifies.  By
pigeonhole, 4 bands catch EVERY pair with Hamming distance <= 3
(4 flipped bits can straddle all four bands); larger thresholds are
best-effort recall, the documented LSH trade.

Decode runs the REAL stdlib PNG codec (operators/pngcodec.py) through
one Arrow ``mapInPandas`` pass — hash extraction is a pure map, zero
shuffles; only (id, two BIGINTs) rows ever reach an exchange.  Staged
r11 for an r12/r13 registry face.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..shipping import ensure_pkg_shipped

AHASH_SCHEMA = (
    "media_id bigint, width int, height int, "
    "ahash_hi bigint, ahash_lo bigint, valid boolean"
)


def ahash64(media: DataFrame) -> DataFrame:
    """64-bit average hash per PNG blob.

    Returns (``media_id``, ``width``, ``height``, ``ahash_hi``,
    ``ahash_lo``, ``valid``) — the hash split into two non-negative
    BIGINT halves (see module docstring).  Malformed blobs degrade to
    valid=false rows (PERMISSIVE, the decode_media rule)."""
    from .pngcodec import decode_png

    ensure_pkg_shipped(media.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    a = decode_png(bytes(content))
                    if a.ndim == 3:  # luminance = mean over channels,
                        a = a.mean(axis=2).astype(np.int64)  # floor — int
                    a = a.astype(np.int64)
                    h, w = a.shape
                    rr = (np.arange(8) * h) // 8
                    jj = (np.arange(8) * w) // 8
                    grid = a[np.ix_(rr, jj)]
                    bits = (64 * grid > grid.sum()).astype(np.int64)
                    weights = 1 << (
                        (np.arange(4)[:, None] * 8) + np.arange(8)[None, :]
                    )
                    lo = int((bits[:4] * weights).sum())
                    hi = int((bits[4:] * weights).sum())
                    rows.append((int(mid), w, h, hi, lo, True))
                except Exception:  # zlib.error / struct.error / ValueError
                    rows.append((int(mid), 0, 0, 0, 0, False))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height",
                         "ahash_hi", "ahash_lo", "valid"],
            )

    return media.mapInPandas(gen, AHASH_SCHEMA)


def dhash64(media: DataFrame) -> DataFrame:
    """64-bit difference hash (dHash) per PNG blob — the gradient-based
    sibling of :func:`ahash64`: bit (r, j) = sample(r, j) > sample(r, j+1)
    over an 8x9 nearest-neighbor grid, so the fingerprint encodes local
    brightness GRADIENTS and survives global brightness/contrast shifts
    that move every cell relative to the aHash mean.  The classic pairing
    (Krawetz's aHash/dHash) — candidates matched under either hash.

    Same integer-only contract as ahash64 (9-column sampling at
    ``(j*w)//9``, strict ``>`` on integer samples, two non-negative
    BIGINT halves, same banding/pair machinery via :func:`ahash_pairs` on
    the renamed columns), same PERMISSIVE degradation, same one-pass
    Arrow map.  Output schema matches ahash64."""
    from .pngcodec import decode_png

    ensure_pkg_shipped(media.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    a = decode_png(bytes(content))
                    if a.ndim == 3:
                        a = a.mean(axis=2).astype(np.int64)
                    a = a.astype(np.int64)
                    h, w = a.shape
                    rr = (np.arange(8) * h) // 8
                    jj = (np.arange(9) * w) // 9
                    grid = a[np.ix_(rr, jj)]
                    bits = (grid[:, :8] > grid[:, 1:]).astype(np.int64)
                    weights = 1 << (
                        (np.arange(4)[:, None] * 8) + np.arange(8)[None, :]
                    )
                    lo = int((bits[:4] * weights).sum())
                    hi = int((bits[4:] * weights).sum())
                    rows.append((int(mid), w, h, hi, lo, True))
                except Exception:  # zlib.error / struct.error / ValueError
                    rows.append((int(mid), 0, 0, 0, 0, False))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height",
                         "ahash_hi", "ahash_lo", "valid"],
            )

    return media.mapInPandas(gen, AHASH_SCHEMA)


def ahash_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate image pairs by banded aHash matching.

    Returns (``id_a``, ``id_b``, ``hamming`` INT) with id_a < id_b and
    hamming <= ``max_hamming``.  Complete (no missed pairs) for
    max_hamming <= 3 by pigeonhole over the four 16-bit bands; above
    that it is LSH-style best-effort.  Invalid rows never match."""
    if max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    from ..caching import persist_tracked

    h = persist_tracked(
        hashes.where(F.col("valid")).select(
            F.col(id_col).alias("id"), "ahash_hi", "ahash_lo"
        )
    )
    mask = F.lit(0xFFFF)
    banded = h.select(
        "id", "ahash_hi", "ahash_lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        (
                            F.shiftright(
                                F.col("ahash_lo" if k < 2 else "ahash_hi"),
                                16 * (k % 2),
                            ).bitwiseAND(mask)
                        ).alias("key"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("_b"),
    ).select(
        "id", "ahash_hi", "ahash_lo",
        F.col("_b.band").alias("band"), F.col("_b.key").alias("key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    # Threshold BEFORE the pair dedup: a candidate pair can arrive from up
    # to 4 shared bands, but the Hamming verify is a cheap map-side
    # expression while distinct() is an exchange — filtering first shrinks
    # the dedup shuffle to surviving pairs only (measured 2.1M candidate
    # rows -> 60k at sf0.1; the degenerate all-dark/all-light band keys
    # that flat image regions produce make hot buckets the dominant cost,
    # so nothing row-heavy may follow the join unverified).
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            (
                F.bit_count(
                    F.col("a.ahash_hi").bitwiseXOR(F.col("b.ahash_hi"))
                )
                + F.bit_count(
                    F.col("a.ahash_lo").bitwiseXOR(F.col("b.ahash_lo"))
                )
            ).alias("hamming"),
        )
    )
    return cand.where(F.col("hamming") <= max_hamming).distinct()

"""Pure-stdlib PNG codec (operators/pngcodec.py): roundtrip across shapes
and all five scanline filters, spec-structure validation, and failure modes.
No third-party PNG implementation exists in this container to cross-check
against, so the tests pin the format at the byte level instead: signature,
chunk layout, CRCs, IHDR fields, and IDAT scanline structure per RFC 2083."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pipeline_calculator_v3_spark.operators.pngcodec import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape", [(1, 1), (8, 65), (13, 7), (5, 5, 3), (1, 64, 3), (64, 1)]
)
def test_roundtrip_all_filters(shape, filter_type):
    rng = np.random.RandomState(hash((shape, filter_type)) % 2**31)
    a = rng.randint(0, 256, size=shape).astype(np.uint8)
    b = decode_png(encode_png(a, filter_type=filter_type))
    assert b.shape == a.shape and b.dtype == np.uint8
    assert (b == a).all()


def test_emits_spec_structure():
    """The encoder output is a real PNG at the byte level: signature, IHDR
    first with correct big-endian fields, zlib-valid IDAT whose inflated
    length is exactly h*(stride+1), IEND last, every chunk CRC32-valid."""
    a = np.arange(24, dtype=np.uint8).reshape(3, 8)
    blob = encode_png(a)
    assert blob[:8] == PNG_SIGNATURE
    pos, chunks = 8, []
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos:pos + 4])
        ctype = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", blob[pos + 8 + length:pos + 12 + length])
        assert zlib.crc32(ctype + data) & 0xFFFFFFFF == crc, ctype
        chunks.append((ctype, data))
        pos += 12 + length
    assert [c for c, _ in chunks] == [b"IHDR", b"IDAT", b"IEND"]
    w, h, depth, ctype_, comp, filt, inter = struct.unpack(
        ">IIBBBBB", chunks[0][1]
    )
    assert (w, h, depth, ctype_, comp, filt, inter) == (8, 3, 8, 0, 0, 0, 0)
    raw = zlib.decompress(chunks[1][1])
    assert len(raw) == 3 * (8 + 1)
    # filter byte 0 per scanline; payload rows match the array
    for r in range(3):
        off = r * 9
        assert raw[off] == 0
        assert raw[off + 1:off + 9] == a[r].tobytes()


def test_rgb_ihdr_color_type():
    blob = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    ihdr = blob[16:16 + 13]
    w, h, depth, color_type = struct.unpack(">IIBB", ihdr[:10])
    assert (w, h, depth, color_type) == (2, 2, 8, 2)


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"XXXX" + b[4:], "signature"),
        (lambda b: b[:30] + bytes([b[30] ^ 0xFF]) + b[31:], "CRC"),
        (lambda b: b[:8], "IHDR"),
    ],
)
def test_rejects_corruption(mutate, msg):
    blob = encode_png(np.ones((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match=msg):
        decode_png(mutate(blob))


def test_rejects_out_of_scope_features():
    # 16-bit depth: patch IHDR depth byte (and fix the CRC) -> loud error
    blob = bytearray(encode_png(np.ones((2, 2), dtype=np.uint8)))
    ihdr = bytearray(blob[16:29])
    ihdr[8] = 16
    crc = zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF
    blob[16:29] = ihdr
    blob[29:33] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(blob))


def test_encoder_rejects_bad_shapes():
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 2, 4), dtype=np.uint8))  # RGBA unsupported
    with pytest.raises(ValueError):
        encode_png(np.zeros((0, 5), dtype=np.uint8))


def test_truncated_chunk_raises_value_error():
    import numpy as np
    import pytest

    from pipeline_calculator_v3_spark.operators.pngcodec import (
        decode_png,
        encode_png,
    )

    blob = encode_png(np.arange(64, dtype=np.uint8).reshape(8, 8))
    # IDAT chunk header sits at offset 33 (8 sig + 25 IHDR chunk); cuts:
    # inside IDAT data (declared length overruns -> truncated-chunk guard),
    # inside the IDAT header (chunk dropped -> missing IDAT), and mid-IDAT
    # at the end (partial deflate stream -> corrupt IDAT)
    for cut in (45, 36, len(blob) - 14):
        with pytest.raises(ValueError):
            decode_png(blob[:cut])


def test_nonzero_filter_method_rejected():
    import struct
    import zlib

    import numpy as np
    import pytest

    from pipeline_calculator_v3_spark.operators.pngcodec import (
        decode_png,
        encode_png,
    )

    blob = bytearray(encode_png(np.zeros((4, 4), dtype=np.uint8)))
    # IHDR data starts at offset 16; filter-method byte is IHDR[11] = w,h,
    # depth, color, compression, THEN filter at data offset 11
    ihdr_data = bytearray(blob[16:16 + 13])
    ihdr_data[11] = 1  # bogus filter method
    blob[16:16 + 13] = ihdr_data
    blob[16 + 13:16 + 17] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + bytes(ihdr_data)) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError):
        decode_png(bytes(blob))


def test_round_trip_fuzz_all_filters():
    """Property: decode(encode(a, ft)) == a for random shapes, gray+RGB,
    every filter type — the codec's end-to-end contract beyond goldens."""
    import numpy as np

    from pipeline_calculator_v3_spark.operators.pngcodec import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(1234)
    for trial in range(40):
        h = int(rng.integers(1, 20))
        w = int(rng.integers(1, 40))
        ft = int(rng.integers(0, 5))
        if trial % 2:
            a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        else:
            a = rng.integers(0, 256, (h, w), dtype=np.uint8)
        out = decode_png(encode_png(a, ft))
        assert out.shape == a.shape and (out == a).all(), (h, w, ft)

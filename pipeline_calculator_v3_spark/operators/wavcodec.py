"""Pure-stdlib WAV (RIFF/PCM16) codec — the AUDIO twin of
operators/pngcodec.py: the container ships no audio libraries (brief:
stub or make the plumbing real), so like the PNG path this implements the
real on-disk format with struct + numpy only.  Mono 16-bit little-endian
PCM — the subset every recorder emits — encoded and decoded by chunk
walk, not by offset arithmetic, so blobs carrying extra chunks (LIST
metadata, fact) decode correctly and malformed blobs raise for the
caller's PERMISSIVE degradation.

Spec: RIFF container (Microsoft/IBM WAVE, public): 'RIFF' <size> 'WAVE'
then chunks; 'fmt ' carries (audio_format=1 PCM, channels, sample_rate,
byte_rate, block_align, bits=16); 'data' carries the samples.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono PCM16 WAV bytes from an int16 sample vector."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim != 1:
        raise ValueError(f"mono PCM needs a 1-D vector, got shape {s.shape}")
    if sample_rate <= 0:
        raise ValueError(f"sample_rate must be positive, got {sample_rate}")
    data = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", _FMT_PCM, 1, sample_rate, sample_rate * 2, 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """(int16 samples, sample_rate) from mono PCM16 WAV bytes.

    Chunk-walking parser: unknown chunks skip (word-aligned per spec);
    missing/garbled structure raises ValueError — callers degrade to
    valid=false rows, the PERMISSIVE contract shared with decode_png and
    the KML source."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    (riff_size,) = struct.unpack_from("<I", blob, 4)
    if riff_size + 8 > len(blob):
        raise ValueError("RIFF size exceeds blob")
    pos, end = 12, 8 + riff_size
    rate, data = None, None
    while pos + 8 <= end:
        cid = blob[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + csize]
        if len(body) < csize:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != _FMT_PCM or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported format (fmt={audio_fmt}, ch={channels}, "
                    f"bits={bits}); this codec is mono PCM16"
                )
        elif cid == b"data":
            if csize % 2:
                raise ValueError("odd data size for 16-bit samples")
            data = body
        pos += 8 + csize + (csize % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return np.frombuffer(data, dtype="<i2"), int(rate)

"""Pure-stdlib PNG codec (zlib + per-scanline unfiltering).

Makes ``multimodal.image_features`` real without PIL: supports the
baseline variants a training pipeline actually stores — 8-bit depth,
grayscale / gray+alpha / RGB / RGBA color types, non-interlaced — and
rejects everything else loudly (palette, 16-bit, Adam7), which then
surfaces as ``decode_ok=false`` through image_features' fault isolation.

Reference: the public PNG specification (RFC 2083 / W3C PNG): IHDR/IDAT/
IEND chunk layout, filter types 0-4 (None/Sub/Up/Average/Paeth).
Implementation from scratch; no third-party code.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> channel count (3 = palette, unsupported)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (height, width, channels)."""
    if buf[:8] != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated chunk")
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={color} interlace={interlace})"
        )
    ch = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    img = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    o = 0
    for y in range(h):
        f = raw[o]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=o + 1).copy()
        o += 1 + stride
        if f == 0:  # None
            pass
        elif f == 1:  # Sub (cumulative left-neighbor, mod 256 per spec)
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif f == 2:  # Up (elementwise mod 256; uint8 wraparound IS the
            # spec's arithmetic — computed via int16 to keep numpy's
            # overflow warning out of executor logs)
            line = ((line.astype(np.int16) + prev) & 0xFF).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + (a + int(prev[x])) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pr) & 0xFF
        else:
            raise ValueError(f"bad filter byte {f}")
        img[y] = line
        prev = line
    return img.reshape(h, w, ch)


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w[, ch]) array -> PNG bytes (filter 0, one IDAT)."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    h, w, ch = img.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )

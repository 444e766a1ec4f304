"""Pure-stdlib PNG codec: round-trips, all five filter types, fault modes."""

import struct
import zlib

import numpy as np
import pytest

from mds_provider_spark.functions import multimodal as MM
from mds_provider_spark.functions.png import SIGNATURE, decode_png, encode_png


def _arr(seed: int, h: int, w: int, ch: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("shape", [(8, 8, 1), (16, 12, 3), (9, 7, 4), (5, 3, 2)])
def test_roundtrip(shape):
    img = _arr(1, *shape)
    out = decode_png(encode_png(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def _png_with_filter(img: np.ndarray, f: int) -> bytes:
    """Hand-build a PNG whose every scanline uses filter type f, applying
    the spec's filter function directly (the inverse of the decoder)."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    raw = b""
    for y in range(h):
        line = flat[y]
        left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]]) if stride > ch else np.zeros_like(line)
        upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]]) if stride > ch else np.zeros_like(line)
        if f == 0:
            filt = line
        elif f == 1:
            filt = line - left
        elif f == 2:
            filt = line - prev
        elif f == 3:
            filt = line - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            filt = line - pred
        raw += bytes([f]) + (filt % 256).astype(np.uint8).tobytes()
        prev = line

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_all_filter_types_unfilter_correctly(f):
    img = _arr(7 + f, 11, 6, 3)
    assert np.array_equal(decode_png(_png_with_filter(img, f)), img)


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = encode_png(_arr(2, 8, 8, 1))
    with pytest.raises(Exception):
        decode_png(good[:20])


def test_image_features_real_png(spark):
    imgs = {str(i): _arr(i, 8, 6, 3) for i in range(6)}
    rows = [(k, encode_png(v), "png") for k, v in imgs.items()]
    rows.append(("bad", b"\x89PNG garbage", "png"))
    df = spark.createDataFrame(rows, "item_id string, bytes binary, format string")
    got = {r.item_id: r for r in MM.image_features(df).collect()}
    for k, v in imgs.items():
        r = got[k]
        assert r.decode_ok and (r.height, r.width, r.channels) == (8, 6, 3)
        assert r.mean_intensity == pytest.approx(float(v.mean()))
    assert got["bad"].decode_ok is False and got["bad"].height is None

"""Y4M container codec + real frame-sampling chain (video -> PNG frames
-> image pipeline)."""

import numpy as np
import pytest

from mds_provider_spark.functions import video
from mds_provider_spark.functions.png import decode_png


def _frames(n=6, h=12, w=16, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)


def test_y4m_roundtrip():
    f = _frames()
    dec, fps = video.decode_y4m(video.encode_y4m(f, fps=24))
    assert fps == (24, 1)
    assert np.array_equal(dec, f)


def test_y4m_rejects_garbage_truncation_and_color():
    f = _frames()
    buf = video.encode_y4m(f)
    with pytest.raises(ValueError):
        video.decode_y4m(b"RIFFnot-a-video-stream\n")
    with pytest.raises(ValueError, match="truncated"):
        video.decode_y4m(buf[:-5])
    # spec default (C420) and any non-mono colorspace are refused, not
    # misparsed as mono
    with pytest.raises(ValueError, match="colorspace"):
        video.decode_y4m(b"YUV4MPEG2 W4 H4 F30:1\nFRAME\n" + bytes(24))


def test_sample_frames_real_chain(spark):
    """Video -> sampled frames -> REAL PNG -> decoded back bit-exact;
    corrupt/non-y4m rows fault-isolate."""
    f = _frames(7)
    rows = [("v0", video.encode_y4m(f), "y4m"),
            ("bad", b"YUV4MPEG2 W16 H12", "y4m"),
            ("img", b"\x89PNG", "png")]
    df = spark.createDataFrame(rows, "item_id string, bytes binary, format string")
    got = video.sample_frames(df, every_nth=3).collect()
    assert sorted(r.frame_idx for r in got) == [0, 3, 6]
    assert {r.item_id for r in got} == {"v0"}
    for r in got:
        img = decode_png(bytes(r.frame_png))
        assert img.shape == (12, 16, 1)
        assert np.array_equal(img[:, :, 0], f[r.frame_idx])

"""Multimodal binary-column plumbing: image / video / audio as opaque
``binary`` with typed metadata, processed batch-wise over Arrow.

The Spark-side contract is REAL and tested — column-pruned selects, a
codec/modality registry, ``mapInPandas`` with fixed output schemas, batch
shapes that hold at 10^12 rows. PNG decoding is real (pure-stdlib,
functions/png.py), audio decoding is real (functions/audio.py), and RAW
video is real (YUV4MPEG2 container parse + frame sampling,
functions/video.py); jpeg and COMPRESSED video decoders need libraries
absent from this container (PIL/opencv/ffmpeg), so those registry
entries raise ``NotImplementedError`` at decode time — a production
deployment swaps one dict entry.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# decoder: bytes -> np.ndarray (HxWxC for images, frames x H x W x C for video)
ImageDecoder = Callable[[bytes], np.ndarray]


def _decode_image_stub(buf: bytes) -> np.ndarray:
    raise NotImplementedError(
        "no image codec library in this container; register a real decoder "
        "(e.g. PIL.Image.open) in IMAGE_DECODERS['jpeg']"
    )


def _decode_image_fake(buf: bytes) -> np.ndarray:
    """Deterministic fake for plumbing tests: bytes -> pseudo 8x8 gray."""
    arr = np.frombuffer(buf[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8, 1)


from mds_provider_spark.functions.png import decode_png  # noqa: E402

IMAGE_DECODERS: dict[str, ImageDecoder] = {
    "png": decode_png,  # real pure-stdlib decoder (functions/png.py)
    "jpeg": _decode_image_stub,
    "fake8x8": _decode_image_fake,  # test-only deterministic modality
}


def image_features(
    df: DataFrame,
    key_col: str = "item_id",
    bytes_col: str = "bytes",
    format_col: str = "format",
) -> DataFrame:
    """binary -> (item_id, height, width, channels, mean_intensity).

    Decode errors and unregistered formats yield NULL features rather than
    failing the job (per-row fault isolation — one corrupt image must not
    kill a 10^12-row pass); the decode_ok flag feeds a validation rule.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("item_id", "height", "width", "channels", "mean_intensity", "decode_ok")}
            for iid, buf, fmt in zip(pdf[key_col], pdf[bytes_col], pdf[format_col]):
                out["item_id"].append(iid)
                dec = IMAGE_DECODERS.get(fmt)
                try:
                    if dec is None or buf is None:
                        raise NotImplementedError(fmt)
                    img = dec(bytes(buf))
                    out["height"].append(img.shape[0])
                    out["width"].append(img.shape[1])
                    out["channels"].append(img.shape[2] if img.ndim > 2 else 1)
                    out["mean_intensity"].append(float(img.mean()))
                    out["decode_ok"].append(True)
                except Exception:
                    out["height"].append(None)
                    out["width"].append(None)
                    out["channels"].append(None)
                    out["mean_intensity"].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(
                {
                    "item_id": pd.array(out["item_id"], dtype="string"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "width": pd.array(out["width"], dtype="Int32"),
                    "channels": pd.array(out["channels"], dtype="Int32"),
                    "mean_intensity": pd.array(out["mean_intensity"], dtype="Float64"),
                    "decode_ok": pd.array(out["decode_ok"], dtype="boolean"),
                }
            )

    pruned = df.select(key_col, bytes_col, format_col)
    return pruned.mapInPandas(
        feats,
        "item_id string, height int, width int, channels int, "
        "mean_intensity double, decode_ok boolean",
    )


def frame_sample_plumbing(
    df: DataFrame,
    every_nth: int = 30,
    key_col: str = "item_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Legacy video frame-sampling STUB (fan-out shape only). The REAL
    operator is ``functions/video.sample_frames`` — full YUV4MPEG2 parse
    + per-frame PNG re-encode; this stub remains for COMPRESSED formats,
    whose extraction needs ffmpeg (absent here): it emits frame_idx rows
    with NULL bytes so downstream partitioning/joins can be exercised."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs = [], []
            for iid, buf in zip(pdf[key_col], pdf[bytes_col]):
                if buf is None:
                    continue
                # stub: pretend a fixed 3-frame sample; ffmpeg would yield
                # len(video)/every_nth real frames here
                for k in range(3):
                    ids.append(iid)
                    idxs.append(k * every_nth)
            yield pd.DataFrame(
                {
                    "item_id": pd.array(ids, dtype="string"),
                    "frame_idx": pd.array(idxs, dtype="Int64"),
                    "frame_bytes": pd.array([None] * len(ids), dtype=object),
                }
            )

    return df.select(key_col, bytes_col).mapInPandas(
        sample, "item_id string, frame_idx long, frame_bytes binary"
    )

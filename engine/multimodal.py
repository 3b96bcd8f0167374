"""Multimodal binary columns: typed metadata + batch decode plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — exactly how
the reference stores complex features as Avro-encoded ``bytes`` decoded lazily
at serving time (``FeatureGroupUtils.java:191-200``, ``VectorServer.java:403-420``).
Audio decode is fully implemented (:mod:`engine.audio`); image/video decoding
needs external libraries absent from this environment, so those decoders are
STUBS behind a clearly-marked ``NotImplementedError`` — but the Spark-side
plumbing (schema, partitioning, Arrow batch shape, UDF signatures) is real and
tested with a deterministic fake decoder.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_FIELDS = "media_kind string, mime string, payload_bytes bigint"

IMAGE_FEATURE_SCHEMA = "width int, height int, n_channels int, mean_lum double"
VIDEO_FEATURE_SCHEMA = "n_frames int, fps double, frame_ms double"


def with_media_metadata(df: DataFrame, payload_col: str, kind: str, mime: str) -> DataFrame:
    """Cheap JVM-side metadata columns; no payload decode."""
    return df.withColumns(
        {
            "media_kind": F.lit(kind),
            "mime": F.lit(mime),
            "payload_bytes": F.length(F.col(payload_col)),
        }
    )


def decode_image_stub(buf: bytes) -> np.ndarray:
    """STUB: real JPEG/PNG decode requires Pillow/opencv (not in container)."""
    raise NotImplementedError(
        "image decode requires an external codec library; "
        "use fake_image_decoder for plumbing tests"
    )


def fake_image_decoder(buf: bytes) -> np.ndarray:
    """Deterministic fake: interpret bytes as an 8×8 grayscale tile (repeating),
    so plumbing tests exercise real numpy arrays end to end."""
    arr = np.frombuffer(buf[:64].ljust(64, b"\0"), dtype=np.uint8).reshape(8, 8)
    return arr


def extract_image_features(
    df: DataFrame,
    payload_col: str = "bytes",
    decoder: Callable[[bytes], np.ndarray] = decode_image_stub,
) -> DataFrame:
    """mapInPandas plumbing for image feature extraction: the batch shape,
    schema, and passthrough behavior are production-real; only the decoder
    body is swappable (stub vs real lib vs test fake)."""
    passthrough = [c for c in df.columns if c != payload_col]
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields if f.name != payload_col)
        + ", "
        + IMAGE_FEATURE_SCHEMA
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for buf in pdf[payload_col]:
                img = decoder(buf)
                h, w = img.shape[:2]
                ch = 1 if img.ndim == 2 else img.shape[2]
                rows.append((w, h, ch, float(img.mean())))
            feats = pd.DataFrame(
                rows, columns=["width", "height", "n_channels", "mean_lum"], index=pdf.index
            )
            yield pd.concat([pdf[passthrough], feats], axis=1)

    return df.mapInPandas(op, schema=out_schema)


def sample_video_frames_stub(buf: bytes, every_ms: int = 1000) -> list[bytes]:
    """STUB: frame sampling requires ffmpeg/pyav (not in container)."""
    raise NotImplementedError("video frame sampling requires ffmpeg/pyav")

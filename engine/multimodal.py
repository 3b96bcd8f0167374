"""Multimodal binary columns: typed metadata + batch decode plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — exactly how
the reference stores complex features as Avro-encoded ``bytes`` decoded lazily
at serving time (``FeatureGroupUtils.java:191-200``, ``VectorServer.java:403-420``).
Audio decode is fully implemented (:mod:`engine.audio`). For images and video
the *uncompressed* container formats are fully implemented too — BMP (8-bit
palette grayscale + 24-bit BGR, bottom-up, padded rows) and YUV4MPEG2 (Y4M)
are public byte layouts decodable with plain numpy, so
:func:`decode_image` / :func:`sample_video_frames` are REAL for those and the
codec-compressed formats (JPEG/PNG/H.264) remain clearly-marked
``NotImplementedError`` stubs — the external codec libraries are absent from
this environment. The Spark-side plumbing (schema, partitioning, Arrow batch
shape, UDF signatures) is shared by both paths.
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


# -- BMP: real, lib-free image codec (public byte layout) --------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal BMP writer: 2-D uint8 → 8-bit palette grayscale; (h, w, 3)
    uint8 RGB → 24-bit. Bottom-up rows, 4-byte padding — the standard layout
    every BMP reader accepts."""
    import struct

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    gray = img.ndim == 2
    bpp = 8 if gray else 24
    row_bytes = (w * (bpp // 8) + 3) & ~3
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256)) if gray else b""
    off = 14 + 40 + len(palette)
    data = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y] if gray else img[y, :, ::-1]  # RGB → BGR
        data += row.tobytes()
        data += b"\0" * (row_bytes - (w * (bpp // 8)))
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(data), 2835, 2835,
                       256 if gray else 0, 0)
    return header + info + palette + bytes(data)


def decode_bmp(buf: bytes) -> np.ndarray:
    """Minimal BMP reader: 8-bit palette (returned as grayscale via the
    palette's green channel) and 24-bit BGR (returned RGB), uncompressed,
    bottom-up or top-down, padded rows."""
    import struct

    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", buf, 10)[0]
    size, w, h = struct.unpack_from("<Iii", buf, 14)
    if size < 40:
        raise ValueError(f"unsupported BMP header size {size}")
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression != 0:
        raise NotImplementedError("compressed BMP (RLE) not supported")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * (bpp // 8) + 3) & ~3
    raw = np.frombuffer(buf, dtype=np.uint8, offset=off,
                        count=row_bytes * h).reshape(h, row_bytes)
    if not top_down:
        raw = raw[::-1]
    if bpp == 8:
        n_colors = struct.unpack_from("<I", buf, 46)[0] or 256
        # palette sits immediately after the info header, whose size varies
        # (40 = BITMAPINFO, 108 = V4, 124 = V5) — never at a fixed offset
        pal = np.frombuffer(buf, dtype=np.uint8, offset=14 + size,
                            count=n_colors * 4).reshape(n_colors, 4)
        return pal[raw[:, :w], 1]  # green channel of the palette
    if bpp == 24:
        return raw[:, : w * 3].reshape(h, w, 3)[:, :, ::-1].copy()  # BGR→RGB
    raise NotImplementedError(f"{bpp}-bit BMP not supported")


def decode_image(buf: bytes) -> np.ndarray:
    """Real decode for lib-free formats (BMP); compressed codecs stay
    stubbed until a codec library is present."""
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    return decode_image_stub(buf)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index striding — pure numpy."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


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
    """STUB: compressed-video frame sampling requires ffmpeg/pyav."""
    raise NotImplementedError("video frame sampling requires ffmpeg/pyav")


# -- YUV4MPEG2 (Y4M): real, lib-free video container -------------------------


def encode_y4m(frames: np.ndarray, fps_num: int = 30, fps_den: int = 1) -> bytes:
    """Minimal Y4M writer: (n, h, w) uint8 luma frames → YUV4MPEG2 with
    4:2:0 chroma planes filled neutral (128)."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 C420\n".encode()
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    out = bytearray(head)
    for i in range(n):
        out += b"FRAME\n" + frames[i].tobytes() + chroma + chroma
    return bytes(out)


def decode_y4m(buf: bytes) -> tuple[np.ndarray, float]:
    """Minimal Y4M reader (C420): returns (luma frames (n, h, w) uint8, fps)."""
    if not buf.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = buf.index(b"\n")
    w = h = None
    num, den = 30, 1
    for tok in buf[9:nl].split():
        t = tok.decode()
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            num, den = (int(x) for x in t[1:].split(":"))
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    y_sz, c_sz = w * h, (w // 2) * (h // 2)
    frames, pos = [], nl + 1
    while pos < len(buf):
        fnl = buf.index(b"\n", pos)
        if not buf[pos:fnl].startswith(b"FRAME"):
            raise ValueError("bad Y4M frame marker")
        pos = fnl + 1
        frames.append(
            np.frombuffer(buf, np.uint8, count=y_sz, offset=pos).reshape(h, w)
        )
        pos += y_sz + 2 * c_sz
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), num / den


def sample_video_frames(buf: bytes, every_ms: int = 1000) -> list[np.ndarray]:
    """Real frame sampling for Y4M payloads (every_ms → stride by fps);
    compressed containers fall through to the stub."""
    if buf.startswith(b"YUV4MPEG2"):
        frames, fps = decode_y4m(buf)
        step = max(1, round(fps * every_ms / 1000.0))
        return [frames[i] for i in range(0, frames.shape[0], step)]
    return sample_video_frames_stub(buf, every_ms)


def extract_video_features(
    df: DataFrame, payload_col: str = "bytes", every_ms: int = 1000
) -> DataFrame:
    """Per-clip video descriptors over sampled frames (real for Y4M):
    frame count, fps, sampled-frame luma mean/std, inter-frame motion proxy
    (mean absolute frame difference). Same mapInPandas shape as audio/image."""
    passthrough = [c for c in df.columns if c != payload_col]
    out_schema = (
        ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name != payload_col
        )
        + ", n_frames int, fps double, luma_mean double, luma_std double,"
        " motion double"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for buf in pdf[payload_col]:
                frames, fps = decode_y4m(bytes(buf))
                sampled = sample_video_frames(bytes(buf), every_ms)
                stack = np.stack(sampled) if sampled else frames
                motion = (
                    float(np.mean(np.abs(np.diff(stack.astype(np.int16), axis=0))))
                    if stack.shape[0] > 1
                    else 0.0
                )
                rows.append(
                    (int(frames.shape[0]), float(fps), float(stack.mean()),
                     float(stack.std()), motion)
                )
            feats = pd.DataFrame(
                rows, columns=["n_frames", "fps", "luma_mean", "luma_std", "motion"],
                index=pdf.index,
            )
            yield pd.concat([pdf[passthrough], feats], axis=1)

    return df.mapInPandas(op, schema=out_schema)

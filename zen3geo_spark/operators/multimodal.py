"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``. The image decode is a REAL codec for the netpbm PPM
format (P6 binary / P3 ascii — public spec, parsed with NumPy alone since
no image libraries ship in this container); other formats raise
ValueError at decode time. ``fake=True`` keeps the deterministic
stand-in decoder for plumbing tests that don't care about bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

DECODED_SCHEMA = (
    "media_id long, height int, width int, channels int, pixels array<double>"
)


def ppm_bytes(media_id: int, w: int, h: int) -> bytes:
    """Deterministic P6 PPM: pixel byte i = (media_id·7 + i·13) mod 256
    (the formula the image_stats DuckDB oracle recomputes)."""
    header = f"P6\n{w} {h}\n255\n".encode()
    idx = np.arange(w * h * 3, dtype=np.int64)
    return header + ((media_id * 7 + idx * 13) % 256).astype(np.uint8).tobytes()


def parse_ppm(buf: bytes) -> np.ndarray:
    """Minimal netpbm PPM parser (P6 raw / P3 ascii, maxval <= 255) →
    (h, w, 3) float64 array. Public format; NumPy-only."""
    toks: list[bytes] = []
    pos = 0
    while len(toks) < 4:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if pos >= len(buf):
            raise ValueError("truncated PPM header")
        if buf[pos:pos + 1] == b"#":
            while pos < len(buf) and buf[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        toks.append(buf[start:pos])
        if len(toks) == 1 and toks[0] not in (b"P6", b"P3"):
            raise ValueError(
                f"unsupported image format (magic {toks[0][:8]!r}); "
                "this engine decodes netpbm PPM (P6/P3)")
    magic, w, h, maxv = toks[0], int(toks[1]), int(toks[2]), int(toks[3])
    if maxv > 255:
        raise ValueError("PPM maxval > 255 unsupported")
    if magic == b"P6":
        pos += 1  # exactly one whitespace byte after maxval (spec)
        arr = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos)
    elif magic == b"P3":
        arr = np.array(buf[pos:].split()[: w * h * 3], dtype=np.int64)
    else:
        raise ValueError(f"unsupported image format (magic {magic!r}); "
                         "this engine decodes netpbm PPM (P6/P3)")
    return arr.reshape(h, w, 3).astype(np.float64)


def _fake_decode(payload: bytes, height: int, width: int) -> np.ndarray:
    """Deterministic stand-in decoder (plumbing tests)."""
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0] % (2**31)
    rng = np.random.RandomState(int(seed))
    return rng.randint(0, 256, size=(height, width, 3)).astype(np.float64)


def synth_media(spark, n: int) -> DataFrame:
    """Deterministic media table: image payloads are REAL binary P6 PPMs
    (``ppm_bytes``); audio/video payloads are opaque seeded bytes."""
    base = spark.range(n).selectExpr(
        "id as media_id",
        "case cast(id % 3 as int) when 0 then 'image' when 1 then 'audio' else 'video' end as kind",
        "case cast(id % 3 as int) when 0 then 'image/x-portable-pixmap' when 1 then 'audio/wav' else 'video/mp4' end as mime",
        "cast(16 + id % 16 as int) as width",
        "cast(16 + id % 8 as int) as height",
        "cast(1000 + id % 5000 as int) as duration_ms",
    )

    @F.pandas_udf("binary")
    def payload(mid: pd.Series, kind: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
        out = []
        for m, k, wi, hi in zip(mid, kind, w, h):
            if k == "image":
                out.append(ppm_bytes(int(m), int(wi), int(hi)))
            else:
                out.append(f"payload-{int(m)}".encode())
        return pd.Series(out)

    return base.select(
        "media_id", "kind",
        payload("media_id", "kind", "width", "height").alias("payload"),
        "mime", "width", "height", "duration_ms",
    )


def decode_image(media: DataFrame, fake: bool = False,
                 out_h: int = 4, out_w: int = 4) -> DataFrame:
    """Decode + nearest-neighbor-resize images to (out_h, out_w, 3) via
    mapInPandas (Arrow-batched; binary in, flat pixel array out). The
    real path parses netpbm PPM; non-PPM payloads raise ValueError.
    ``fake=True`` uses the deterministic stand-in decoder instead."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if fake:
                    img = _fake_decode(bytes(r.payload), int(r.height), int(r.width))
                else:
                    img = parse_ppm(bytes(r.payload))
                yi = (np.arange(out_h) * img.shape[0] // out_h)
                xi = (np.arange(out_w) * img.shape[1] // out_w)
                small = img[yi][:, xi]
                out.append((r.media_id, out_h, out_w, 3, small.ravel().tolist()))
            yield pd.DataFrame(out, columns=["media_id", "height", "width",
                                             "channels", "pixels"])

    return media.filter(F.col("kind") == "image").mapInPandas(run, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame timestamp
    (pure SQL explode; the frame decode itself would chain decode_image)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id", "duration_ms",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )


def image_stats(decoded: DataFrame) -> DataFrame:
    """Feature extraction: per-image mean/min/max over the pixel array —
    JVM array aggregates, no Python."""
    px = F.col("pixels")
    return decoded.select(
        "media_id",
        (F.aggregate(px, F.lit(0.0), lambda a, v: a + v) / F.size(px)).alias("mean_px"),
        F.array_min(px).alias("min_px"),
        F.array_max(px).alias("max_px"),
    )

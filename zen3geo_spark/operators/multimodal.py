"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``. The decode step itself is STUBBED (image/audio codecs
are not in this container): ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder (bytes →
seeded tiny RGB grid) exercises the full Spark plumbing — schema,
partitioning, UDF signature, Arrow batch shape — which is the part that
matters for the engine.
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


def synth_media(spark, n: int) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    return spark.range(n).selectExpr(
        "id as media_id",
        "case cast(id % 3 as int) when 0 then 'image' when 1 then 'audio' else 'video' end as kind",
        "cast(concat('payload-', cast(id as string)) as binary) as payload",
        "case cast(id % 3 as int) when 0 then 'image/png' when 1 then 'audio/wav' else 'video/mp4' end as mime",
        "cast(16 + id % 16 as int) as width",
        "cast(16 + id % 8 as int) as height",
        "cast(1000 + id % 5000 as int) as duration_ms",
    )


def _fake_decode(payload: bytes, height: int, width: int) -> np.ndarray:
    """Deterministic stand-in for a real image codec."""
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0] % (2**31)
    rng = np.random.RandomState(int(seed))
    return rng.randint(0, 256, size=(height, width, 3)).astype(np.float64)


def decode_image(media: DataFrame, fake: bool = False,
                 out_h: int = 4, out_w: int = 4) -> DataFrame:
    """Decode + resize images to (out_h, out_w, 3) via mapInPandas.

    Real codecs are unavailable in this container: pass fake=True for the
    deterministic stand-in, else this raises NotImplementedError at
    execution time (the plan itself builds fine — schema and batching are
    real either way).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "pass fake=True to exercise the pipeline"
                )
            out = []
            for r in pdf.itertuples(index=False):
                img = _fake_decode(bytes(r.payload), int(r.height), int(r.width))
                # nearest-neighbor resize to (out_h, out_w)
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

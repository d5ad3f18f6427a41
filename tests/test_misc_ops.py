"""STAC search, checkpoint/resume, streaming availableNow, multimodal."""

import glob
import os

from pyspark.sql import functions as F

from zen3geo_spark.operators.multimodal import (
    decode_image, frame_sample, image_stats, synth_media,
)
from zen3geo_spark.operators.stac import list_items, matched, search
from zen3geo_spark.plans.checkpoint import CheckpointRunner
from zen3geo_spark.sources.fixtures import stac_items
from zen3geo_spark.sources.pages import synth_pages
from zen3geo_spark.streaming.incremental import extract_and_encode, run_incremental


def test_stac_search_deferred_and_matched(spark):
    items = stac_items(spark, 50)
    s = search(items, bbox=(-60, -40, 40, 40),
               datetime_range=("2022-01-01", "2022-02-01"),
               collections=["sentinel-2-l2a", "landsat-c2-l2"])
    n = matched(s)
    assert n == list_items(s).count()
    assert 0 < n < 50
    # deferred-ness: adding a filter later still prunes (lazy plan)
    assert matched(s.filter(F.col("collection") == "sentinel-2-l2a")) <= n


def test_checkpoint_resume(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    runner = CheckpointRunner(spark, root)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return synth_pages(spark, 100).select("url", "lang")

    df1 = runner.stage("extract", "fp-v1", build)
    assert df1.count() == 100
    assert calls["n"] == 1
    # resume: same fingerprint → no recompute
    df2 = runner.stage("extract", "fp-v1", build)
    assert df2.count() == 100
    assert calls["n"] == 1
    m = runner.metrics("extract")
    assert m["complete"] and m["partitions"][0]["rows"] == 100
    # changed input fingerprint → recompute
    runner.stage("extract", "fp-v2", build)
    assert calls["n"] == 2


def test_checkpoint_partitioned_resume(spark, tmp_path):
    root = str(tmp_path / "ckpt2")
    runner = CheckpointRunner(spark, root)

    def build():
        return synth_pages(spark, 200).select("url", "lang")

    out = runner.stage("bylang", "fp1", build, partition_col="lang")
    assert out.count() == 200
    m = runner.metrics("bylang")
    assert len(m["partitions"]) == 5
    assert sum(p["rows"] for p in m["partitions"]) == 200


def test_streaming_available_now_incremental(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    synth_pages(spark, 100).write.mode("overwrite").parquet(pages_dir)
    run_incremental(spark, pages_dir, out_dir, ck)
    n1 = spark.read.parquet(out_dir).count()
    batch = extract_and_encode(synth_pages(spark, 100)).count()
    assert n1 == batch  # streaming path == batch path
    # append a new file; second run processes ONLY the increment
    synth_pages(spark, 50).write.mode("append").parquet(pages_dir)
    run_incremental(spark, pages_dir, out_dir, ck)
    n2 = spark.read.parquet(out_dir).count()
    assert n2 == n1 + extract_and_encode(synth_pages(spark, 50)).count()


def test_multimodal_plumbing(spark):
    media = synth_media(spark, 30)
    decoded = decode_image(media, fake=True, out_h=4, out_w=4)
    rows = decoded.collect()
    assert len(rows) == 10  # ids % 3 == 0
    assert all(len(r["pixels"]) == 4 * 4 * 3 for r in rows)
    stats = image_stats(decoded).collect()
    assert all(0 <= r["mean_px"] <= 255 for r in stats)
    frames = frame_sample(media, every_ms=500)
    f0 = frames.groupBy("media_id").count()
    assert f0.count() == 10  # ids % 3 == 2
    # deterministic: same plan twice → same bytes
    again = {(r["media_id"], tuple(r["pixels"])) for r in decode_image(media, fake=True).collect()}
    first = {(r["media_id"], tuple(r["pixels"])) for r in rows}
    assert again == first


def test_ppm_codec_roundtrip():
    """parse_ppm must invert ppm_bytes exactly, and handle P3/comments."""
    import numpy as np
    from zen3geo_spark.operators.multimodal import parse_ppm, ppm_bytes

    img = parse_ppm(ppm_bytes(7, 5, 3))
    assert img.shape == (3, 5, 3)
    idx = np.arange(5 * 3 * 3)
    assert (img.ravel() == (7 * 7 + idx * 13) % 256).all()
    # P3 ascii variant with a comment line
    p3 = b"P3\n# a comment\n2 1\n255\n0 128 255  1 2 3\n"
    assert parse_ppm(p3).ravel().tolist() == [0.0, 128.0, 255.0, 1.0, 2.0, 3.0]


def test_multimodal_real_decode_and_bad_format(spark):
    media = synth_media(spark, 6)
    real = decode_image(media, out_h=2, out_w=2).collect()
    assert len(real) == 2 and all(len(r["pixels"]) == 12 for r in real)
    import pytest
    from pyspark.sql import functions as F
    junk = media.withColumn("payload", F.lit(b"GIF89a..."))
    with pytest.raises(Exception, match="unsupported image format"):
        decode_image(junk).collect()

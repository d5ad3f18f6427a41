"""Combinator surface + raster-math transforms (SURVEY.md §2.2 goldens
from the reference docs)."""

import math

import pytest
from pyspark.sql import functions as F

from zen3geo_spark.functions.raster_math import (
    linear_to_decibel, month_key, shift_longitude,
)
from zen3geo_spark.operators.combinators import (
    batcher, collator, flat_mapper, forker, mapper, zipper,
)


def test_decibel_with_zero_mask(spark):
    df = spark.createDataFrame([(0.0,), (1.0,), (100.0,)], "x double")
    got = [r["db"] for r in df.select(linear_to_decibel(F.col("x")).alias("db"))
           .orderBy("x").collect()]
    assert got[0] is None          # zero masked, not -inf
    assert got[1] == pytest.approx(0.0)
    assert got[2] == pytest.approx(20.0)


def test_shift_longitude(spark):
    df = spark.createDataFrame([(0.0,), (179.0,), (180.0,), (359.0,), (360.0,)], "lon double")
    got = {r["lon"]: r["s"] for r in df.select("lon", shift_longitude(F.col("lon")).alias("s")).collect()}
    assert got[0.0] == 0.0 and got[179.0] == 179.0
    assert got[180.0] == -180.0 and got[359.0] == -1.0 and got[360.0] == 0.0


def test_month_split_key(spark):
    df = spark.createDataFrame(
        [("2022-01-15",), ("2022-01-31",), ("2022-02-01",)], "d string"
    ).select(F.col("d").cast("timestamp").alias("ts"))
    n = df.select(month_key(F.col("ts")).alias("m")).distinct().count()
    assert n == 2  # split on month boundaries → two groups


def test_zip_fork_batch_collate(spark):
    a = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("img"))
    b = spark.range(10).select(F.col("id"), (F.col("id") * 3).alias("msk"))
    z = zipper(a, b, ["id"], ["id"])
    assert z.count() == 10
    r = z.filter(F.col("id") == 4).first()
    assert r["img"] == 8 and r["msk"] == 12

    f1, f2 = forker(a)
    assert f1.count() == f2.count() == 10

    bt = batcher(a, batch_size=4, order=["id"])
    sizes = sorted(r["count"] for r in bt.groupBy("batch_id").count().collect())
    assert sizes == [2, 4, 4]

    c = collator(z, {"image": "img", "mask": "msk"})
    assert set(c.columns) >= {"image", "mask"}

    fm = flat_mapper(a, "rep", F.sequence(F.lit(0), F.lit(2)))
    assert fm.count() == 30

    m = mapper(a, img_db=linear_to_decibel(F.col("img").cast("double")))
    row = m.filter(F.col("id") == 5).first()
    assert row["img_db"] == pytest.approx(10 * math.log10(10))

"""The torchdata combinator surface re-expressed for DataFrames.

zen3geo's documented pipelines lean on torchdata built-ins
(SURVEY.md §2.2): IterableWrapper, Mapper, FlatMapper, Zipper, Forker,
Batcher, Collator. Each maps to a (usually trivial) DataFrame construct —
this module exists so a reference user can find every pipeline stage by
name. Non-trivial semantics preserved:

* zip is POSITIONAL in the reference — here it's an equi-join on an
  explicit pair key, or on ``row_number`` over a deterministic order
  (positional order does not exist in a distributed table).
* fork re-iterates (recomputes!) in the reference
  (docs/vector-segmentation-masks.md:153-157); ``fork`` here returns the
  same plan twice with an optional .cache() — strictly better.
* batch = floor((row_number-1)/size) bucketing over a deterministic order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def iterable_wrapper(spark, rows, schema) -> DataFrame:
    """IterableWrapper ≙ literal source."""
    return spark.createDataFrame(rows, schema)


def mapper(df: DataFrame, **exprs: Column) -> DataFrame:
    """Mapper ≙ withColumns (per-element scalar/array transform)."""
    return df.withColumns(dict(exprs))


def flat_mapper(df: DataFrame, out_name: str, arr: Column) -> DataFrame:
    """FlatMapper ≙ explode of an array-returning expression (1→N)."""
    return df.select("*", F.explode(arr).alias(out_name))


def zipper(left: DataFrame, right: DataFrame, order_left: list[str],
           order_right: list[str], suffix: str = "_r") -> DataFrame:
    """Zipper ≙ positional pairing via row_number over deterministic
    orders on both sides."""
    wl = Window.orderBy(*[F.col(c) for c in order_left])
    wr = Window.orderBy(*[F.col(c) for c in order_right])
    l = left.withColumn("_pos", F.row_number().over(wl))
    r = right.withColumn("_pos", F.row_number().over(wr))
    for c in set(l.columns) & set(r.columns) - {"_pos"}:
        r = r.withColumnRenamed(c, c + suffix)
    return l.join(r, "_pos").drop("_pos")


def forker(df: DataFrame, n: int = 2, cache: bool = True) -> list[DataFrame]:
    """Forker ≙ plan reuse; cache() avoids the reference's recompute."""
    if cache:
        df = df.cache()
    return [df] * n


def batcher(df: DataFrame, batch_size: int, order: list[str]) -> DataFrame:
    """Batcher ≙ deterministic row_number bucketing into batch_id."""
    w = Window.orderBy(*[F.col(c) for c in order])
    return df.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - 1) / batch_size).cast("long"),
    )


def collator(pairs: DataFrame, value_cols: dict[str, str]) -> DataFrame:
    """Collator ≙ renaming/stacking joined columns into a wide record
    (xr.merge(join='override') ≙ keep-left-coords wide select)."""
    cols = [F.col(src).alias(dst) for dst, src in value_cols.items()]
    keep = [c for c in pairs.columns if c not in value_cols.values()]
    return pairs.select(*keep, *cols)

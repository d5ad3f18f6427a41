"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the cluster before per-row expansion.

    Shingle explodes, minhash/simhash signatures, and pairwise similarity
    kernels multiply each input row 10-100x; when the input arrives as one
    small file (one scan partition), that expansion would run on a single
    task. One cheap shuffle of the *small* pre-explosion table buys full
    parallelism for the heavy stage. A wide input (already >=
    defaultParallelism partitions — the 100 TB case) is returned untouched,
    so no gratuitous shuffle at scale.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

"""Custom stateful streaming operator: running per-key totals via
applyInPandasWithState.

The reference is batch-only; this is the engine's answer for stream
semantics that windows can't express — arbitrary per-key state carried
across micro-batches AND across separate incremental (availableNow) runs
through the state store in the checkpoint directory. The update function
is Arrow-batched pandas (no per-row Python), the state is a single
counters row per key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")

_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])
_STATE = StructType([
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value); on a stream each
    micro-batch emits the updated totals for the users it touched."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update, outputStructType=_OUT, stateStructType=_STATE,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful(spark: SparkSession, events_dir: str, out_dir: str,
                 checkpoint_dir: str) -> None:
    """availableNow incremental driver: processes only new files; state
    persists in the checkpoint state store, so a later run CONTINUES the
    running totals. Each micro-batch's updates append to ``out_dir`` with
    a batch id; the current totals are the row with the highest batch id
    per user."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    updates = running_user_totals(stream)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_dir))

    q = (updates.writeStream.foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def latest_totals(spark: SparkSession, out_dir: str) -> DataFrame:
    """Current running totals: last emitted row per user."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.read.parquet(out_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("user_id", "n_events", "total_value"))

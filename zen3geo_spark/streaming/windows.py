"""Event-time windowed aggregation: tumbling windows + session windows.

The reference is batch-only (no watermark/state anywhere under
/root/reference/zen3geo/), but the engine's stream surface treats its
pipelines as one transform with two drivers (SURVEY.md §2.3): each function
here takes a DataFrame that may be a batch scan OR a ``readStream`` source.
On a stream, add ``with_watermark_ts`` so state for late windows is
dropped; in batch the same plan is a plain hash aggregate.

Tumbling windows use ``F.window`` (epoch-aligned, half-open [start, end));
session windows use ``F.session_window`` (gap-merged per key, window end =
last event + gap). Both are oracle-checkable: epoch-floor arithmetic and
the classic lag/cumsum gaps-and-islands rewrite produce identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark_ts(events: DataFrame, watermark: str = "2 hours",
                      ts_col: str = "ts") -> DataFrame:
    """Streaming late-data bound; a no-op marker for batch DataFrames."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark)
    return events


def tumbling_event_stats(events: DataFrame, window: str = "6 hours",
                         ts_col: str = "ts") -> DataFrame:
    """Per-(window, event_type) count / value sum / mean of props.k.

    Same plan for batch and streaming input (pass through
    ``with_watermark_ts`` first on a stream).
    """
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg(k), 6).alias("avg_k"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "sum_value", "avg_k",
        )
    )


def session_stats(events: DataFrame, gap: str = "30 minutes",
                  ts_col: str = "ts", key_col: str = "user_id") -> DataFrame:
    """Per-user session windows (gap-merged): events closer than ``gap``
    to the previous event share a session. Output keyed by the session's
    first event time; ``session_last`` is the last event (Spark's
    session_window end minus the gap)."""
    w = F.session_window(F.col(ts_col), gap).alias("w")
    return (
        events.groupBy(w, F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.max(ts_col).alias("session_last"),
        )
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            "session_last", "n_events", "sum_value",
        )
    )


def run_windowed_stream(spark, events_dir: str, out_dir: str,
                        checkpoint_dir: str, window: str = "6 hours",
                        watermark: str = "2 hours") -> None:
    """availableNow incremental driver for ``tumbling_event_stats``; each
    invocation processes only new files and stops (offset log = resume
    token). Append mode emits a window once its watermark passes — the
    trailing open windows surface on the next run with more data."""
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    stream = spark.readStream.schema(schema).parquet(events_dir)
    result = tumbling_event_stats(with_watermark_ts(stream, watermark), window)
    q = (
        result.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_tumbling_to_memory(spark, events_path: str,
                              window: str = "6 hours",
                              name: str = "stream_tumbling_out"):
    """Run :func:`tumbling_event_stats` through the REAL streaming engine
    (``readStream`` → complete-mode memory sink, ``availableNow``) over a
    bounded input and return the emitted result table — so the streaming
    micro-batch path itself (not just the shared transform) can be
    value-hash-checked against the batch SQL oracle: on a bounded input,
    complete mode must emit exactly the batch aggregate.

    Complete mode keeps all window state (no watermark eviction), which
    is what makes the comparison exact; the append-mode + watermark
    production path is exercised by :func:`run_windowed_stream` and its
    resume tests. Memory sink is driver-sized: the OUTPUT here is
    windows × event_types (tiny), never the event stream.

    ``FileStreamSource`` lists a DIRECTORY; when ``events_path`` is a
    single parquet file (the driver's testdata layout), a per-path
    symlink directory under /tmp stands in — the file itself is never
    copied.
    """
    import hashlib
    import os
    import tempfile

    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    schema = spark.read.parquet(events_path).schema
    src_dir = events_path
    if os.path.isfile(events_path):
        tag = hashlib.md5(events_path.encode()).hexdigest()[:12]
        src_dir = f"/tmp/zen3geo_stream_src_{tag}"
        os.makedirs(src_dir, exist_ok=True)
        link = os.path.join(src_dir, "part-0.parquet")
        if not os.path.lexists(link):
            os.symlink(events_path, link)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (tumbling_event_stats(stream, window)
         .writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="zst_ckpt_"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(name)

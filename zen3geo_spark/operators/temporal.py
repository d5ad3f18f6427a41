"""Temporal joins Spark lacks as built-ins, re-expressed shuffle-once.

``asof_join`` is the classic time-series operator (pandas ``merge_asof``,
DuckDB/QuestDB ``ASOF JOIN``): for every left row, the single right row
with the greatest right timestamp ≤ the left timestamp, per key. Spark
has no native as-of join; the naive encoding — an inequality theta-join
— is a nested-loop/range join that dies at scale. The scalable plan used
here is the **union-tag + running last_value** decomposition:

1. tag right rows side=0 and left rows side=1, project both onto a
   common schema (keys, ts, side, left-payload struct, right-payload
   struct — the absent side NULL);
2. union (no shuffle yet — union is plan-level);
3. one window over (partition by keys, order by ts, side) taking
   ``last(right_payload, ignorenulls=True)`` over rows UNBOUNDED
   PRECEDING..CURRENT — each left row picks up the latest right row at
   or before its timestamp (side 0 < 1 makes the equal-ts right row
   visible, i.e. the ``>=`` match DuckDB ASOF uses);
4. keep side=1 rows and unnest the payload structs.

Cost: ONE hash shuffle of (|L|+|R|) rows on the join keys plus an
in-partition sort — the same price as any windowed aggregate, no
replication, no range explosion, and AQE-splittable like every other
exchange. Per-key data need not fit in memory (Spark windows spill),
but a single pathological key serializes within its partition — the
same caveat as any per-key window, documented here rather than hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, keys: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_suffix: str = "_r") -> DataFrame:
    """Backward as-of left join: every ``left`` row gains the columns of
    the latest ``right`` row (same ``keys``) with ``right_ts`` ≤
    ``left_ts``; NULLs when no prior right row exists. Right's key/ts
    columns and any name collisions come back suffixed.

    Matches DuckDB ``ASOF LEFT JOIN`` semantics (``>=`` match) — the
    ``asof_join`` driver query is value-hash-checked against exactly
    that. Forward as-of is the mirror image (order descending, FOLLOWING
    frame); sessionization and windowed aggregates live in
    ``streaming/windows.py``.
    """
    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys]
    rstruct = right.select(F.struct(*rcols).alias("_r")).schema["_r"].dataType

    tagged_l = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(rstruct).alias("_r"),
    )
    tagged_r = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("_l")).schema["_l"].dataType
        ).alias("_l"),
        F.struct(*rcols).alias("_r"),
    )

    w = (Window.partitionBy(*keys).orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (tagged_l.unionByName(tagged_r)
               .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
               .filter(F.col("_side") == 1))

    out = matched.select(
        *keys,
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_m.{c}").alias(c + right_suffix) for c in rcols],
    )
    return out


def interval_join(events: DataFrame, intervals: DataFrame,
                  bucket_secs: int, ts_col: str = "ts",
                  start_col: str = "start_ts",
                  end_col: str = "end_ts") -> DataFrame:
    """Range-containment join (the brief's "range join"): every event
    row paired with every interval containing its timestamp
    (``start <= ts < end``; intervals may overlap, so an event can
    match several — the semantics an as-of join cannot express).

    Spark's native encoding of ``ts BETWEEN start AND end`` is a
    broadcast-nested-loop theta join — quadratic and memory-bound at
    scale. The scalable plan here is the classic **bucketized range
    join** (what Databricks' range-join optimization and postgres GiST
    effectively do): intervals explode to the epoch buckets of width
    ``bucket_secs`` they overlap (bounded fan-out
    ``1 + len/bucket_secs`` — pick the bucket near the typical interval
    length), events map to their single bucket, equi-join on the
    bucket, then the exact containment refine runs in codegen. Each
    (event, interval) pair meets exactly once — in the event's bucket —
    so no post-join dedup is needed.

    Returns the joined frame (all event columns + all interval
    columns); aggregate downstream.
    """
    b = int(bucket_secs)
    ev = events.withColumn(
        "_b", F.expr(f"unix_timestamp({ts_col}) div {b}"))
    iv = intervals.withColumn(
        "_b", F.expr(
            f"explode(sequence(unix_timestamp({start_col}) div {b}, "
            f"unix_timestamp({end_col}) div {b}))"))
    return (ev.join(iv, "_b")
            .filter((F.col(ts_col) >= F.col(start_col))
                    & (F.col(ts_col) < F.col(end_col)))
            .drop("_b"))


def scd2_compact(obs: DataFrame, key: str, ord_col: str,
                 val_col: str) -> DataFrame:
    """SCD-2 history compaction: collapse per-key observation history
    into validity intervals → (key, val_col, valid_from, valid_to),
    one row per maximal run of consecutive equal values. The
    Iceberg-/warehouse-style "what did this url look like over time"
    consolidation a recurring crawl accumulates; also the change-data
    capture shape Structured Streaming sinks emit.

    Scale shape: TWO windows over the SAME (key, ord) partitioning —
    Catalyst reuses one Exchange + sort for both (change detection via
    lag, interval close via lead) — so the whole compaction costs one
    shuffle of the observation table. Per-key work is bounded by the
    snapshot count (observations per url), never corpus-wide; no key is
    hot because urls repeat at most once per epoch. All comparisons are
    equality/integer, so the DuckDB twin matches bit-for-bit.
    ``valid_to`` is inclusive; the open current interval carries the
    key's max ordinal."""
    w = Window.partitionBy(key).orderBy(ord_col)
    chg = (obs
           .withColumn("_prev", F.lag(val_col).over(w))
           .withColumn("_last", F.max(ord_col).over(
               Window.partitionBy(key)))
           .filter(F.col("_prev").isNull()
                   | (F.col(val_col) != F.col("_prev"))))
    wc = Window.partitionBy(key).orderBy(ord_col)
    return (chg
            .withColumn("valid_to",
                        F.coalesce(F.lead(ord_col).over(wc) - 1,
                                   F.col("_last")))
            .select(key, val_col,
                    F.col(ord_col).alias("valid_from"), "valid_to"))

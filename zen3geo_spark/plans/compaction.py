"""Small-file compaction planning (Iceberg/Delta OPTIMIZE bin-pack shape).

A 10^12-row table accrues small files from streaming appends and
per-partition incremental writes; OPTIMIZE rewrites them into
target-sized files. The PLANNING step — which files coalesce into which
rewrite group — is itself a query over the file manifest, and is what
this module provides (the rewrite is then an ordinary per-group
read→write). Algorithm: the standard sorted greedy fill — within each
table partition, order files largest-first and cut the running byte sum
at every ``target_bytes`` boundary — the same approximation Iceberg's
BinPackStrategy ships. Deterministic (size desc, file id asc tie-break)
and all-integer ⇒ hash-exact cross-engine.

Scale shape: the input is the file MANIFEST (metadata-sized, millions of
rows at worst, never the data); the only window is per-partition and
bounded by files-per-partition. Groups that come out with a single file
are already compact and are excluded from the plan (nothing to rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def compaction_plan(files: DataFrame, part_col: str, id_col: str,
                    size_col: str, target_bytes: int) -> DataFrame:
    """→ (partition, grp, n_files, total_bytes, min_file, max_file):
    rewrite groups of ≥ 2 files per partition under the sorted greedy
    fill ``grp = (running_bytes − 1) div target_bytes``."""
    w = (Window.partitionBy(part_col)
         .orderBy(F.col(size_col).desc(), F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    g = (files
         .withColumn("_run", F.sum(size_col).over(w))
         .withColumn("grp",
                     F.expr(f"(_run - 1) div {target_bytes}").cast("long")))
    return (g.groupBy(F.col(part_col).alias("partition"), "grp")
            .agg(F.count("*").alias("n_files"),
                 F.sum(size_col).alias("total_bytes"),
                 F.min(id_col).alias("min_file"),
                 F.max(id_col).alias("max_file"))
            .filter(F.col("n_files") >= 2))


def compaction_plan_sql(files_sql: str, part_col: str, id_col: str,
                        size_col: str, target_bytes: int) -> str:
    """Engine-neutral SQL twin of :func:`compaction_plan`."""
    return f"""
with _f as ({files_sql}),
_r as (select {part_col}, {id_col}, {size_col},
              sum({size_col}) over (partition by {part_col}
                order by {size_col} desc, {id_col}
                rows between unbounded preceding and current row) as _run
       from _f),
_g as (select {part_col}, {id_col}, {size_col},
              (_run - 1) // {target_bytes} as grp
       from _r)
select {part_col} as partition, grp, count(*) as n_files,
       sum({size_col}) as total_bytes,
       min({id_col}) as min_file, max({id_col}) as max_file
from _g group by 1, 2
having count(*) >= 2
"""

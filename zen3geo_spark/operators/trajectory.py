"""Trajectory kernels over per-host geotag tracks.

A recurring crawl of geotagged pages yields, per host, an ordered track
of (time, lon, lat) observations — the same shape as GPS traces. Two
standard track operators re-expressed as bounded DataFrame plans:

* ``track_resample``: fixed-step linear resampling (the `ST_LineInterpolate
  / trajectory "resample to regular cadence"` shape) — one per-key lead
  window to form segments, then a bounded ``sequence`` explode per
  segment (fan-out ≤ max_gap/step, and segments longer than ``max_gap``
  are dropped entirely — the teleport/outage guard that also bounds the
  explode). Interpolation is exact integer micro-degrees via an explicit
  FLOOR division that both engines implement identically (Spark ``div``
  truncates toward zero, DuckDB ``//`` floors — they agree only on
  non-negative operands, so the negative-delta case is rewritten to
  keep every operand non-negative).

* ``bearing_mix``: per-host movement-bearing octant histogram (N, NE, …)
  from consecutive observations — the heading-distribution audit signal
  (a host whose geotags always move east is a scraper artifact, not an
  organization). Pure sign / doubled-magnitude comparisons, the same
  no-atan2 octant discipline as ``raster_algebra.slope_aspect`` with
  geographic y (north-positive) instead of image rows.

Both are one shuffle on the track key; per-key work is bounded by the
track length (windows spill). All integer ⇒ bit-exact vs the twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_DIV = {"spark": " div ", "duckdb": " // "}


def floor_div_sql(num: str, den: str, engine: str) -> str:
    """FLOOR(num/den) for den > 0 with truncating integer division —
    identical in Spark (`div`, truncates toward zero) and DuckDB
    (`//`, floors) because every operand is kept non-negative."""
    d = _DIV[engine]
    return (f"(case when ({num}) >= 0 then ({num}){d}({den}) "
            f"else -(((-({num})) + ({den}) - 1){d}({den})) end)")


def track_resample(points: DataFrame, key_col: str, t_col: str,
                   x_col: str, y_col: str, step: int,
                   max_gap: int) -> DataFrame:
    """Resample per-key tracks at fixed time step (t ≥ 0) →
    (key, tau, x, y): for every consecutive observation pair closer
    than ``max_gap``, emit the linearly interpolated position at every
    multiple of ``step`` in [t0, t1). The segment owning an exact grid
    hit is the one STARTING there (half-open intervals ⇒ no duplicate
    tau per key). The track's last observation closes no segment and
    emits nothing."""
    w = Window.partitionBy(key_col).orderBy(t_col, x_col, y_col)
    seg = (points
           .withColumn("_t1", F.lead(t_col).over(w))
           .withColumn("_x1", F.lead(x_col).over(w))
           .withColumn("_y1", F.lead(y_col).over(w))
           .filter(F.col("_t1").isNotNull()
                   & (F.col("_t1") > F.col(t_col))
                   & (F.col("_t1") - F.col(t_col) <= max_gap)))
    tau0 = f"(({t_col} + {step} - 1) div {step}) * {step}"
    taus = (seg.selectExpr(
        key_col, t_col, "_t1", x_col, "_x1", y_col, "_y1",
        f"case when {tau0} <= _t1 - 1 "
        f"then sequence({tau0}, _t1 - 1, {step}) "
        f"else array() end as _taus")
        .select(key_col, t_col, "_t1", x_col, "_x1", y_col, "_y1",
                F.explode("_taus").alias("tau")))
    xi = floor_div_sql(f"(_x1 - {x_col}) * (tau - {t_col})",
                       f"_t1 - {t_col}", "spark")
    yi = floor_div_sql(f"(_y1 - {y_col}) * (tau - {t_col})",
                       f"_t1 - {t_col}", "spark")
    return taus.selectExpr(key_col, "tau",
                           f"{x_col} + {xi} as x", f"{y_col} + {yi} as y")


def track_resample_sql_duckdb(points_sql: str, key_col: str, t_col: str,
                              x_col: str, y_col: str, step: int,
                              max_gap: int) -> str:
    """DuckDB twin of :func:`track_resample` (generate_series is
    inclusive like Spark's sequence; same floor-div rewrite)."""
    xi = floor_div_sql(f"(_x1 - {x_col}) * (tau - {t_col})",
                       f"_t1 - {t_col}", "duckdb")
    yi = floor_div_sql(f"(_y1 - {y_col}) * (tau - {t_col})",
                       f"_t1 - {t_col}", "duckdb")
    tau0 = f"(({t_col} + {step} - 1) // {step}) * {step}"
    return f"""
with _p as ({points_sql}),
_seg as (
  select {key_col}, {t_col}, {x_col}, {y_col},
         lead({t_col}) over wk as _t1,
         lead({x_col}) over wk as _x1,
         lead({y_col}) over wk as _y1
  from _p
  window wk as (partition by {key_col}
                order by {t_col}, {x_col}, {y_col})
),
_ok as (select * from _seg
        where _t1 is not null and _t1 > {t_col}
          and _t1 - {t_col} <= {max_gap}),
_taus as (
  select {key_col}, {t_col}, _t1, {x_col}, _x1, {y_col}, _y1,
         unnest(generate_series({tau0}, _t1 - 1, {step})) as tau
  from _ok
  where {tau0} <= _t1 - 1
)
select {key_col}, tau,
       {x_col} + {xi} as x, {y_col} + {yi} as y
from _taus
"""


def bearing_mix(points: DataFrame, key_col: str, t_col: str,
                x_col: str, y_col: str) -> DataFrame:
    """Per-key movement-bearing octant histogram → (key, octant,
    n_moves); octants 0..7 = E, NE, N, NW, W, SW, S, SE classified by
    integer sign and doubled-magnitude comparisons (axis octants claim
    |major| ≥ 2·|minor| — no atan2, hash-exact); zero moves drop."""
    w = Window.partitionBy(key_col).orderBy(t_col, x_col, y_col)
    mv = (points
          .withColumn("_dx", F.lead(x_col).over(w) - F.col(x_col))
          .withColumn("_dy", F.lead(y_col).over(w) - F.col(y_col))
          .filter(F.col("_dx").isNotNull()
                  & ((F.col("_dx") != 0) | (F.col("_dy") != 0))))
    ax, ay = F.abs(F.col("_dx")), F.abs(F.col("_dy"))
    octant = (
        F.when((F.col("_dx") > 0) & (ax >= 2 * ay), F.lit(0))   # E
        .when((F.col("_dx") < 0) & (ax >= 2 * ay), F.lit(4))    # W
        .when((F.col("_dy") > 0) & (ay >= 2 * ax), F.lit(2))    # N
        .when((F.col("_dy") < 0) & (ay >= 2 * ax), F.lit(6))    # S
        .when((F.col("_dx") > 0) & (F.col("_dy") > 0), F.lit(1))  # NE
        .when((F.col("_dx") < 0) & (F.col("_dy") > 0), F.lit(3))  # NW
        .when((F.col("_dx") < 0) & (F.col("_dy") < 0), F.lit(5))  # SW
        .otherwise(F.lit(7)))                                     # SE
    return (mv.select(key_col, octant.cast("int").alias("octant"))
            .groupBy(key_col, "octant")
            .agg(F.count("*").alias("n_moves")))


def bearing_mix_sql_duckdb(points_sql: str, key_col: str, t_col: str,
                           x_col: str, y_col: str) -> str:
    """DuckDB twin of :func:`bearing_mix` (same octant rule)."""
    return f"""
with _p as ({points_sql}),
_mv as (
  select {key_col},
         lead({x_col}) over wk - {x_col} as dx,
         lead({y_col}) over wk - {y_col} as dy
  from _p
  window wk as (partition by {key_col}
                order by {t_col}, {x_col}, {y_col})
)
select {key_col},
       cast(case
         when dx > 0 and abs(dx) >= 2 * abs(dy) then 0
         when dx < 0 and abs(dx) >= 2 * abs(dy) then 4
         when dy > 0 and abs(dy) >= 2 * abs(dx) then 2
         when dy < 0 and abs(dy) >= 2 * abs(dx) then 6
         when dx > 0 and dy > 0 then 1
         when dx < 0 and dy > 0 then 3
         when dx < 0 and dy < 0 then 5
         else 7
       end as int) as octant,
       count(*) as n_moves
from _mv
where dx is not null and (dx <> 0 or dy <> 0)
group by 1, 2
"""


def track_segments_sql(points_sql: str, key_col: str, t_col: str,
                       x_col: str, y_col: str, max_gap: int,
                       span_max: int) -> str:
    """Engine-neutral SQL: per-key consecutive-observation segments →
    (a_id, asx0, asy0, asx1, asy1), with the time-gap guard and a
    SPATIAL span guard (|Δx|,|Δy| ≤ ``span_max``) — the teleport filter
    that also bounds the PBSM cell fan-out of every downstream segment
    join (a world-spanning segment would register under O(grid) cells).
    a_id = key·4e9 + t is collision-free for t < 4e9. Plain lead
    window + arithmetic — identical in Spark and DuckDB."""
    return f"""
    with _p as ({points_sql}),
    _s as (
      select {key_col}, {t_col}, {x_col}, {y_col},
             lead({t_col}) over wk as _t1,
             lead({x_col}) over wk as _x1,
             lead({y_col}) over wk as _y1
      from _p
      window wk as (partition by {key_col}
                    order by {t_col}, {x_col}, {y_col})
    )
    select {key_col} * 4000000000 + {t_col} as a_id,
           {x_col} as asx0, {y_col} as asy0, _x1 as asx1, _y1 as asy1
    from _s
    where _t1 is not null and _t1 - {t_col} <= {max_gap}
      and abs(_x1 - {x_col}) <= {span_max}
      and abs(_y1 - {y_col}) <= {span_max}
    """

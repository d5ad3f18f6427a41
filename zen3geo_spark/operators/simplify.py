"""Polyline (trajectory) simplification: one Visvalingam–Whyatt sweep.

Crawl-derived trajectories (per-host consecutive geotag tracks — the
same polylines trajectory_cover burns to cells) are noisy and dense;
map rendering and mobility analytics simplify them before storage.
Visvalingam–Whyatt ranks interior vertices by EFFECTIVE AREA (the area
of the triangle a vertex forms with its neighbors) and removes the
flattest. The classic algorithm iterates to a fixpoint with a priority
queue — inherently serial per line. At web scale the standard
re-expression is the ONE-SWEEP variant: compute every interior
vertex's effective area against its ORIGINAL neighbors (one lag/lead
window over the track order — the same (key, seq) shuffle every
per-host rollup pays) and drop all vertices under the threshold in one
pass. One sweep is not the fixpoint (removing a vertex changes its
neighbors' areas) but is deterministic, embarrassingly parallel, and
the standard streaming approximation; iterate k bounded sweeps for a
tighter result.

Integer-exact: areas are kept as TWICE the triangle area (the raw
cross product, micro-degree², bigint) so the kernel and its SQL twin
never touch floating point. |coord| <= 1.8e8 ⇒ |cross| <= ~2.6e17,
well inside bigint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _cross2(x0, y0, x1, y1, x2, y2) -> Column:
    """2x the signed triangle area (integer cross product)."""
    return (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)


def simplify_sweep(tracks: DataFrame, key: str, seq: str,
                   x: str, y: str, min_area2: int) -> DataFrame:
    """One Visvalingam sweep over per-``key`` polylines ordered by
    ``seq``. Keeps endpoints unconditionally and every interior vertex
    whose doubled effective area >= ``min_area2``; returns the kept
    vertices as (key, seq, x, y, area2) with area2 = 0 for endpoints.
    """
    w = Window.partitionBy(key).orderBy(seq)
    px, py = F.lag(x).over(w), F.lag(y).over(w)
    nx, ny = F.lead(x).over(w), F.lead(y).over(w)
    a2 = F.abs(_cross2(px, py, F.col(x), F.col(y), nx, ny))
    out = tracks.select(
        key, seq, x, y,
        F.when(px.isNull() | nx.isNull(), F.lit(0).cast("long"))
        .otherwise(a2.cast("long")).alias("area2"),
        (px.isNull() | nx.isNull()).alias("_endpoint"))
    return (out.filter(F.col("_endpoint") | (F.col("area2") >= min_area2))
            .drop("_endpoint"))


def simplify_sweep_sql(tracks_sql: str, key: str, seq: str,
                       x: str, y: str, min_area2: int) -> str:
    """Engine-neutral SQL twin of :func:`simplify_sweep`.
    ``tracks_sql`` must be a complete SELECT yielding the four columns."""
    return f"""
    with _t as ({tracks_sql}),
    _n as (
      select {key}, {seq}, {x}, {y},
             lag({x})  over (partition by {key} order by {seq}) as _px,
             lag({y})  over (partition by {key} order by {seq}) as _py,
             lead({x}) over (partition by {key} order by {seq}) as _nx,
             lead({y}) over (partition by {key} order by {seq}) as _ny
      from _t
    ),
    _a as (
      select {key}, {seq}, {x}, {y},
             case when _px is null or _nx is null then cast(0 as bigint)
                  else cast(abs(({x} - _px) * (_ny - _py)
                                - (_nx - _px) * ({y} - _py)) as bigint)
             end as area2,
             (_px is null or _nx is null) as _endpoint
      from _n
    )
    select {key}, {seq}, {x}, {y}, area2
    from _a where _endpoint or area2 >= {min_area2}
    """

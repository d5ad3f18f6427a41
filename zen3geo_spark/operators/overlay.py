"""Spatial overlay join: intersection area between two rectangle sets.

The polygon-overlay primitive (PostGIS ``ST_Intersection`` area /
``geopandas.overlay``) specialized to axis-aligned rectangles — the
shape of serving areas, viewport footprints, and chip bboxes (the
reference's rectangle-clipper semantics, zen3geo
datapipes/geopandas.py:121-141, already pair chips with rects; this
operator pairs RECT SETS with RECT SETS).

Scale design (PBSM / partition-based spatial merge):

* each rect registers under every grid cell its bbox overlaps (bounded
  fan-out: ceil(w/cell)+1 x ceil(h/cell)+1 — choose ``res`` so rects
  span O(1) cells);
* candidates meet via an EQUI-join on the cell id — never an all-pairs
  theta join;
* duplicate candidate pairs (rects sharing several cells) are killed by
  the REFERENCE-POINT rule: a pair is emitted only by the one cell that
  contains the intersection's min corner — a filter, not a distinct, so
  no second shuffle;
* the intersection test + area are exact bigint arithmetic.

The DuckDB twin is the DIRECT theta join (exact overlay semantics), so
a hash match proves the blocked decomposition exact — the same
adversarial-oracle pattern as operators/temporal.interval_join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# world bounds in micro-degrees
_LAT_SPAN = 180_000_001
_LON_SPAN = 360_000_001
_LAT_MIN = -90_000_000
_LON_MIN = -180_000_000


def _cell_ids(df: DataFrame, res: int, pfx: str) -> DataFrame:
    """Explode a rect relation (id, x1, y1, x2, y2) to one row per
    overlapped grid cell at ``res`` (the registration step)."""
    n = 1 << res

    # integer cell-index ranges via the same scaling as cell_encode
    def iy(c):
        return F.expr(f"(({c}) - ({_LAT_MIN})) * {n} div {_LAT_SPAN}")

    def ix(c):
        return F.expr(f"(({c}) - ({_LON_MIN})) * {n} div {_LON_SPAN}")

    return (df
            .withColumn("_iy0", iy(f"{pfx}y1")).withColumn("_iy1", iy(f"{pfx}y2"))
            .withColumn("_ix0", ix(f"{pfx}x1")).withColumn("_ix1", ix(f"{pfx}x2"))
            .withColumn("_giy", F.explode(F.expr("sequence(_iy0, _iy1)")))
            .withColumn("_gix", F.explode(F.expr("sequence(_ix0, _ix1)")))
            .withColumn("block", F.col("_giy") * n + F.col("_gix"))
            .drop("_iy0", "_iy1", "_ix0", "_ix1"))


def rect_overlay_join(a: DataFrame, b: DataFrame, res: int = 5) -> DataFrame:
    """Intersection-area join between rect sets ``a`` and ``b``.

    Inputs: (a_id, ax1, ay1, ax2, ay2) and (b_id, bx1, by1, bx2, by2),
    micro-degree bigints, x1<=x2, y1<=y2, in world bounds (no
    antimeridian wrap — split wrapped rects upstream with
    ``split_antimeridian_bbox``). Output: (a_id, b_id, inter_area)
    for every pair with POSITIVE intersection area (open-interval
    semantics: edge-touching rects do not match), exact µdeg² bigint.
    """
    n = 1 << res
    ra = _cell_ids(a, res, "a")
    rb = _cell_ids(b, res, "b")
    j = ra.join(rb, "block")
    ox1 = F.greatest("ax1", "bx1")
    oy1 = F.greatest("ay1", "by1")
    wdt = F.least("ax2", "bx2") - ox1
    hgt = F.least("ay2", "by2") - oy1
    # reference point: only the cell containing the intersection's min
    # corner emits the pair (kills duplicates without a distinct)
    ref_iy = F.expr(f"((greatest(ay1, by1)) - ({_LAT_MIN})) * {n} div {_LAT_SPAN}")
    ref_ix = F.expr(f"((greatest(ax1, bx1)) - ({_LON_MIN})) * {n} div {_LON_SPAN}")
    return (j.filter((wdt > 0) & (hgt > 0)
                     & (F.col("block") == ref_iy * n + ref_ix))
            .select("a_id", "b_id", (wdt * hgt).cast("long").alias("inter_area")))


def rect_overlay_sql(a_sql: str, b_sql: str) -> str:
    """DuckDB twin: the DIRECT theta join (exact overlay semantics)."""
    return f"""
    with _a as ({a_sql}), _b as ({b_sql})
    select a_id, b_id,
           cast((least(ax2, bx2) - greatest(ax1, bx1))
                * (least(ay2, by2) - greatest(ay1, by1)) as bigint)
             as inter_area
    from _a, _b
    where least(ax2, bx2) > greatest(ax1, bx1)
      and least(ay2, by2) > greatest(ay1, by1)
    """

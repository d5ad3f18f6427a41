"""Multi-item → datacube stacking: StackSTACStacker for Spark.

Reference semantics (/root/reference/zen3geo/datapipes/stackstac.py:106-187):
stack per-item rasters into a (time, band, y, x) cube on a common grid;
kwargs select assets/bands, clip to bounds, choose resolution/resampling.
Golden: 3 assets → (1,3,10980,10980) with bound/resolution goldens
(tests/test_datapipes_stackstac.py:28-50).

Spark shape: UNION of per-item long-form tile tables + snap-to-common-grid
(nearest-neighbor: integer floor of the affine transform — pure SQL), with
band selection as `isin` filter and bounds as range filters (both pushed
down to the parquet scan by Catalyst).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snap_to_grid(tiles: DataFrame, xmin: float, ymax: float, res: float) -> DataFrame:
    """Nearest-neighbor regrid: world (x,y) → common-grid (y_idx, x_idx).

    Grid convention: north-up, row 0 at ymax (affine e = -res).
    """
    return tiles.withColumn(
        "x_idx", F.floor((F.col("x") - F.lit(xmin)) / F.lit(res)).cast("int")
    ).withColumn(
        "y_idx", F.floor((F.lit(ymax) - F.col("y")) / F.lit(res)).cast("int")
    )


def build_overviews(tiles: DataFrame, levels: int = 2,
                    agg: str = "avg") -> DataFrame:
    """Build a multi-resolution pyramid (COG overviews / the reference's
    DataTree multi-resolution hierarchy, docs/multi-resolution.md:221-234):
    level L+1 is the 2x2-block aggregate of level L.

    Input: long-form pixels (band, y_idx, x_idx, value) at level 0.
    Output: union of all levels with a ``level`` column — the table
    ``sources.raster.scan_tiles`` prunes by. One hash aggregate per level,
    each reading the previous level (geometric shrink: the whole pyramid
    costs ~1/3 extra rows).
    """
    agg_fn = {"avg": F.avg, "max": F.max, "min": F.min, "sum": F.sum}[agg]
    out = tiles.select(
        F.lit(0).alias("level"), "band", "y_idx", "x_idx", "value")
    levels_dfs = [out]
    cur = out
    for lvl in range(1, levels + 1):
        cur = (
            cur.groupBy(
                "band",
                # floor-div (not truncate-toward-zero) so negative grid
                # indices bucket identically to the oracle's `//`
                F.floor(F.col("y_idx") / 2).cast("int").alias("y_idx"),
                F.floor(F.col("x_idx") / 2).cast("int").alias("x_idx"),
            )
            .agg(agg_fn("value").alias("value"))
            .select(F.lit(lvl).alias("level"), "band", "y_idx", "x_idx", "value")
        )
        levels_dfs.append(cur)
    return reduce(DataFrame.unionByName, levels_dfs)


def stack(item_tiles: list[DataFrame] | DataFrame, assets: list[str] | None = None,
          bounds: tuple[float, float, float, float] | None = None,
          xmin: float | None = None, ymax: float | None = None,
          res: float | None = None) -> DataFrame:
    """Union per-item tables into one cube; optional band/bounds selection
    and grid snap. Input rows need (time, band, x, y, value)."""
    df = (reduce(DataFrame.unionByName, item_tiles)
          if isinstance(item_tiles, list) else item_tiles)
    if assets is not None:
        df = df.filter(F.col("band").isin(assets))
    if bounds is not None:
        bxmin, bymin, bxmax, bymax = bounds
        df = df.filter(
            (F.col("x") >= bxmin) & (F.col("x") < bxmax)
            & (F.col("y") > bymin) & (F.col("y") <= bymax)
        )
    if res is not None:
        df = snap_to_grid(df, xmin if xmin is not None else (bounds[0] if bounds else 0.0),
                          ymax if ymax is not None else (bounds[3] if bounds else 0.0), res)
    return df

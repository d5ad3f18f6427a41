"""Fixed-point map matching + DEM slope/aspect map algebra."""

from pyspark.sql import functions as F

from zen3geo_spark.operators.map_match import T_SCALE, map_match
from zen3geo_spark.operators.raster_algebra import slope_aspect

PT_SCHEMA = "point_id long, lat_us long, lon_us long"
SEG_SCHEMA = "seg_id long, x1 long, y1 long, x2 long, y2 long"


def _match(spark, pts, segs, res=6):
    p = spark.createDataFrame(pts, PT_SCHEMA)
    s = spark.createDataFrame(segs, SEG_SCHEMA)
    return {r.point_id: (r.seg_id, r.t_scaled, r.d2)
            for r in map_match(p, s, res=res).collect()}


def test_point_on_segment_zero_distance(spark):
    # midpoint of a horizontal segment
    out = _match(spark,
                 [(1, 2_000_000, 3_000_000)],
                 [(9, 2_500_000, 2_000_000, 3_500_000, 2_000_000)])
    seg, t, d2 = out[1]
    assert seg == 9 and t == T_SCALE // 2 and d2 == 0


def test_projection_clamps_to_endpoints(spark):
    # point past the x2 end: t = T, distance to (x2, y2)
    out = _match(spark,
                 [(1, 2_000_000, 4_000_000)],
                 [(9, 1_000_000, 2_000_000, 3_000_000, 2_000_000)])
    seg, t, d2 = out[1]
    assert seg == 9 and t == T_SCALE
    assert d2 == 1_000_000 ** 2  # snapped to the (3e6, 2e6) endpoint


def test_nearest_of_two_segments_wins_with_tiebreak(spark):
    segs = [(1, 0, 1_000_000, 1_000_000, 1_000_000),      # 1.0 deg above
            (2, 0, -500_000, 1_000_000, -500_000),        # 0.5 deg below
            (3, 0, -500_000, 1_000_000, -500_000)]        # duplicate of 2
    out = _match(spark, [(7, 0, 500_000)], segs)
    seg, t, d2 = out[7]
    assert seg == 2  # nearer; ties with 3 break to the smaller seg_id
    assert d2 == 500_000 ** 2


def test_antimeridian_wrap_candidate(spark):
    """A point at lon ~179.9 matches a segment at lon ~-179.95 with the
    WRAPPED (~0.15 deg) distance, not the 359.85-deg raw delta."""
    out = _match(spark,
                 [(1, 0, 179_900_000)],
                 [(5, -179_950_000, -500_000, -179_950_000, 500_000)])
    seg, t, d2 = out[1]
    assert seg == 5
    # wrapped dx = 179.9e6 - (-179.95e6) mod 360e6 -> -150_000
    assert d2 == 150_000 ** 2


def test_no_candidate_in_ring_unmatched(spark):
    out = _match(spark,
                 [(1, 0, 0)],
                 [(5, 90_000_000, 50_000_000, 91_000_000, 50_000_000)])
    assert out == {}


def test_degenerate_point_segment(spark):
    out = _match(spark,
                 [(1, 1_000_000, 1_000_000)],
                 [(5, 2_000_000, 2_000_000, 2_000_000, 2_000_000)])
    seg, t, d2 = out[1]
    assert seg == 5 and t == 0 and d2 == 2 * 1_000_000 ** 2


def test_slope_aspect_single_pixel(spark):
    px = spark.createDataFrame([(5, 5, 3)], "row int, col int, value long")
    out = {(r.row, r.col): (r.gx, r.gy, r.aspect_octant)
           for r in slope_aspect(px, width=360, height=180).collect()}
    # gx(r,c) = z(r,c+1) - z(r,c-1); gy(r,c) = z(r+1,c) - z(r-1,c)
    assert out[(5, 4)] == (3, 0, 0)    # east-pointing gradient
    assert out[(5, 6)] == (-3, 0, 4)   # west
    assert out[(4, 5)] == (0, 3, 6)    # south (gy > 0)
    assert out[(6, 5)] == (0, -3, 2)   # north
    assert len(out) == 4  # the pixel itself has no non-empty neighbors


def test_slope_aspect_ramp_and_flat(spark):
    rows = [(5, c, c) for c in range(4, 9)]
    px = spark.createDataFrame(rows, "row int, col int, value long")
    out = {(r.row, r.col): (r.gx, r.gy, r.aspect_octant)
           for r in slope_aspect(px, width=360, height=180).collect()}
    assert out[(5, 6)] == (2, 0, 0)  # central difference 7 - 5
    # diagonal NE case: gx > 0, gy < 0, neither dominant
    px2 = spark.createDataFrame(
        [(5, 4, 0), (5, 6, 4), (4, 5, 0), (6, 5, -4)],
        "row int, col int, value long")
    got = {(r.row, r.col): r.aspect_octant
           for r in slope_aspect(px2, width=360, height=180).collect()}
    assert got[(5, 5)] == 1  # gx=4, gy=-4 -> NE

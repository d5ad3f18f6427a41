"""Rect-overlay PBSM join + Visvalingam one-sweep simplification."""

from pyspark.sql import functions as F

from zen3geo_spark.operators.overlay import rect_overlay_join
from zen3geo_spark.operators.simplify import simplify_sweep

RECT_SCHEMA_A = "a_id long, ax1 long, ay1 long, ax2 long, ay2 long"
RECT_SCHEMA_B = "b_id long, bx1 long, by1 long, bx2 long, by2 long"


def _overlay(spark, a_rows, b_rows, res=5):
    a = spark.createDataFrame(a_rows, RECT_SCHEMA_A)
    b = spark.createDataFrame(b_rows, RECT_SCHEMA_B)
    return {(r.a_id, r.b_id): r.inter_area
            for r in rect_overlay_join(a, b, res=res).collect()}


def test_overlay_area_exact(spark):
    # 2x3 deg overlap => 2e6 * 3e6 = 6e12 udeg^2
    out = _overlay(
        spark,
        [(1, 0, 0, 5_000_000, 5_000_000)],
        [(7, 3_000_000, 2_000_000, 9_000_000, 9_000_000)])
    assert out == {(1, 7): 6_000_000_000_000}


def test_overlay_edge_touch_excluded(spark):
    # sharing only the x=5e6 edge: zero width => no pair
    out = _overlay(
        spark,
        [(1, 0, 0, 5_000_000, 5_000_000)],
        [(7, 5_000_000, 0, 9_000_000, 5_000_000)])
    assert out == {}


def test_overlay_dedup_multi_cell_pair(spark):
    """Two big rects overlapping across MANY grid cells still emit the
    pair exactly once (reference-point rule), with the exact area."""
    out = _overlay(
        spark,
        [(1, -40_000_000, -40_000_000, 40_000_000, 40_000_000)],
        [(7, -10_000_000, -20_000_000, 50_000_000, 30_000_000)],
        res=5)
    assert out == {(1, 7): 50_000_000 * 50_000_000}


def test_overlay_matches_theta_join(spark):
    """Blocked equi-join == brute-force theta join on a deterministic
    rect cloud (the exactness contract the oracle also pins)."""
    a_rows = [(i,
               (i * 7_919_123) % 300_000_000 - 150_000_000,
               (i * 104_729) % 140_000_000 - 70_000_000,
               (i * 7_919_123) % 300_000_000 - 150_000_000 + 4_000_000,
               (i * 104_729) % 140_000_000 - 70_000_000 + 3_000_000)
              for i in range(80)]
    b_rows = [(i,
               (i * 6_700_417) % 300_000_000 - 148_000_000,
               (i * 65_537) % 140_000_000 - 68_000_000,
               (i * 6_700_417) % 300_000_000 - 148_000_000 + 2_500_000,
               (i * 65_537) % 140_000_000 - 68_000_000 + 5_000_000)
              for i in range(80)]
    got = _overlay(spark, a_rows, b_rows, res=5)
    brute = {}
    for aid, ax1, ay1, ax2, ay2 in a_rows:
        for bid, bx1, by1, bx2, by2 in b_rows:
            w = min(ax2, bx2) - max(ax1, bx1)
            h = min(ay2, by2) - max(ay1, by1)
            if w > 0 and h > 0:
                brute[(aid, bid)] = w * h
    assert got == brute


TRACK_SCHEMA = "k string, s long, x long, y long"


def test_simplify_collinear_dropped_endpoints_kept(spark):
    rows = [("t", 0, 0, 0), ("t", 1, 1_000_000, 0), ("t", 2, 2_000_000, 0),
            ("t", 3, 2_000_000, 9_000_000)]
    out = simplify_sweep(
        spark.createDataFrame(rows, TRACK_SCHEMA),
        key="k", seq="s", x="x", y="y", min_area2=1)
    kept = sorted(r.s for r in out.collect())
    # s=1 collinear (area2=0) dropped; s=2 is a real corner; ends kept
    assert kept == [0, 2, 3]


def test_simplify_area2_exact_and_threshold(spark):
    # triangle (0,0),(2e6,2e6),(4e6,0): doubled area of middle vertex
    # = |2e6*(-0) - 4e6*2e6 ... | = 8e12
    rows = [("t", 0, 0, 0), ("t", 1, 2_000_000, 2_000_000),
            ("t", 2, 4_000_000, 0)]
    df = spark.createDataFrame(rows, TRACK_SCHEMA)
    keep = simplify_sweep(df, "k", "s", "x", "y",
                          min_area2=8_000_000_000_000).collect()
    drop = simplify_sweep(df, "k", "s", "x", "y",
                          min_area2=8_000_000_000_001).collect()
    mid = [r for r in keep if r.s == 1]
    assert len(mid) == 1 and mid[0].area2 == 8_000_000_000_000
    assert sorted(r.s for r in drop) == [0, 2]


def test_simplify_per_key_isolation(spark):
    """Windows never leak across keys: each 2-point track keeps both
    endpoints even when interleaved with another key's vertices."""
    rows = [("a", 0, 0, 0), ("b", 0, 9, 9), ("a", 1, 5, 5), ("b", 1, 1, 1)]
    out = simplify_sweep(
        spark.createDataFrame(rows, TRACK_SCHEMA),
        key="k", seq="s", x="x", y="y", min_area2=10 ** 18)
    assert sorted((r.k, r.s) for r in out.collect()) == [
        ("a", 0), ("a", 1), ("b", 0), ("b", 1)]


def test_segment_intersect_planted(spark):
    from zen3geo_spark.operators.overlay import (
        segment_intersect_join, segment_intersect_sql_duckdb,
    )
    import duckdb
    M = 1_000_000
    a_rows = [
        (1, -10 * M, -10 * M, 10 * M, 10 * M),   # crosses b1 at origin
        (2, 0, 5 * M, 5 * M, 0),                  # crosses b1
        (3, 0, 0, 10 * M, 0),                     # endpoint ON b1 -> no
        (4, 20 * M, -5 * M, 20 * M, 5 * M),       # disjoint
        (5, -60 * M, -60 * M, 60 * M, 60 * M),    # long: crosses b1, many cells
    ]
    b_rows = [
        (1, 10 * M, -20 * M, -10 * M, 20 * M),    # steep line through origin
        (2, -60 * M, 59 * M, 60 * M, 59 * M),     # horizontal, crosses seg 5
        (3, -10 * M, -10 * M, 10 * M, 10 * M),    # collinear with seg 1 -> no
    ]
    a = spark.createDataFrame(
        a_rows, "a_id long, asx0 long, asy0 long, asx1 long, asy1 long")
    b = spark.createDataFrame(
        b_rows, "b_id long, bsx0 long, bsy0 long, bsx1 long, bsy1 long")
    got = sorted((r.a_id, r.b_id)
                 for r in segment_intersect_join(a, b, res=4).collect())
    # (1,1)/(5,1): proper crossings at the origin; (2,3): seg 2 crosses
    # the y=x diagonal at (2.5M, 2.5M); (5,2): crossing at (59M, 59M).
    # Excluded: (2,1) — supporting lines meet at x=−5M, off-segment;
    # (3,1) — endpoint touch; (5,3) — collinear (same supporting line).
    assert got == [(1, 1), (2, 3), (5, 1), (5, 2)]
    # duplicate-free even though seg 5 shares many cells with b2
    assert len(got) == len(set(got))
    # DuckDB twin agrees on the same literals
    av = ", ".join(str(t) for t in a_rows)
    bv = ", ".join(str(t) for t in b_rows)
    acast = ("select a_id, cast(asx0 as bigint) as asx0, "
             "cast(asy0 as bigint) as asy0, cast(asx1 as bigint) as asx1, "
             "cast(asy1 as bigint) as asy1 "
             f"from (values {av}) t(a_id, asx0, asy0, asx1, asy1)")
    bcast = ("select b_id, cast(bsx0 as bigint) as bsx0, "
             "cast(bsy0 as bigint) as bsy0, cast(bsx1 as bigint) as bsx1, "
             "cast(bsy1 as bigint) as bsy1 "
             f"from (values {bv}) t(b_id, bsx0, bsy0, bsx1, bsy1)")
    duck = sorted(duckdb.sql(
        segment_intersect_sql_duckdb(acast, bcast)).fetchall())
    assert duck == got


def test_polygon_intersect_planted(spark):
    from zen3geo_spark.operators.overlay import polygon_intersect_join

    M = 1_000_000

    def diamond(pid, cx, cy, r, pfx):
        vs = [(cx + r, cy), (cx, cy + r), (cx - r, cy), (cx, cy - r)]
        rows = []
        for k in range(4):
            x0, y0 = vs[k]
            x1, y1 = vs[(k + 1) % 4]
            rows.append((pid, x0, y0, x1, y1, vs[0][0], vs[0][1]))
        return rows

    # a1: big diamond at origin; a2: far away; a3: tiny inside b2
    a_rows = (diamond(1, 0, 0, 10 * M, "a")
              + diamond(2, 100 * M, 0, 2 * M, "a")
              + diamond(3, 50 * M, 50 * M, 1 * M, "a"))
    # b1 crosses a1's boundary; b2 CONTAINS a3; b3 is INSIDE a1; b4 disjoint
    b_rows = (diamond(1, 9 * M, 0, 3 * M, "b")
              + diamond(2, 50 * M, 50 * M, 20 * M, "b")
              + diamond(3, 0, 0, 2 * M, "b")
              + diamond(4, -100 * M, -50 * M, 2 * M, "b"))
    ea = spark.createDataFrame(
        a_rows, "a_id long, aex0 long, aey0 long, aex1 long, aey1 long, "
                "avx long, avy long")
    eb = spark.createDataFrame(
        b_rows, "b_id long, bex0 long, bey0 long, bex1 long, bey1 long, "
                "bvx long, bvy long")
    got = sorted((r.a_id, r.b_id)
                 for r in polygon_intersect_join(ea, eb, res=4).collect())
    # (1,1) boundary crossing; (3,2) a inside b; (1,3) b inside a
    assert got == [(1, 1), (1, 3), (3, 2)]


def test_iou_match_reciprocal_semantics(spark):
    from zen3geo_spark.operators.overlay import iou_match

    # image 1: pred 10 overlaps BOTH gts but best-matches gt 1; pred 11
    # only gt 2. gt 1 <-> pred 10 and gt 2 <-> pred 11 are mutual bests.
    preds = spark.createDataFrame(
        [(1, 10, 0, 0, 10, 10), (1, 11, 20, 0, 32, 10),
         (1, 12, 500, 500, 510, 510)],              # spurious, no overlap
        "image_id long, pred_id long, px1 long, py1 long, px2 long, py2 long")
    gts = spark.createDataFrame(
        [(1, 1, 1, 1, 11, 11), (1, 2, 21, 0, 30, 9)],
        "image_id long, gt_id long, gx1 long, gy1 long, gx2 long, gy2 long")
    got = {(r.gt_id, r.pred_id): r.iou_milli
           for r in iou_match(preds, gts).collect()}
    assert set(got) == {(1, 10), (2, 11)}
    # gt1 x pred10: inter 9x9=81, union 100+100-81=119 -> 680
    assert got[(1, 10)] == 1000 * 81 // 119


def test_rect_union_area_brute_force(spark):
    from zen3geo_spark.operators.overlay import rect_union_area

    rects = [(i,
              (i * 37) % 60, (i * 23) % 40,
              (i * 37) % 60 + 5 + i % 9, (i * 23) % 40 + 4 + i % 7)
             for i in range(40)]
    df = spark.createDataFrame(
        rects, "rect_id long, x1 long, y1 long, x2 long, y2 long")
    got = rect_union_area(df).collect()[0]
    # brute force on the small integer grid
    cov = set()
    for _, x1, y1, x2, y2 in rects:
        for x in range(x1, x2):
            for y in range(y1, y2):
                cov.add((x, y))
    assert got.union_area == len(cov)
    assert got.n_rects == 40

"""Focal map algebra + integer-exact IDW + gazetteer geocoding."""

import pytest
from pyspark.sql import functions as F

from zen3geo_spark.functions.geo import cell_encode
from zen3geo_spark.operators.raster_algebra import (
    focal_stats,
    idw_accumulate,
)
from zen3geo_spark.sources.gazetteer import (
    GAZETTEER_N,
    GAZETTEER_NAMES,
    synth_gazetteer,
)


def test_focal_single_pixel_corner(spark):
    """One pixel at the (0,0) corner dilates to its 4 in-bounds
    neighbors; window sizes are 4/6/9 by corner/edge/interior."""
    px = spark.createDataFrame([(0, 0, 5)], "row int, col int, value long")
    out = {(r.row, r.col): r for r in
           focal_stats(px, width=10, height=10).collect()}
    assert set(out) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    for k, r in out.items():
        assert r.focal_sum == 5 and r.focal_max == 5 and r.n_present == 1
    assert out[(0, 0)].n_window == 4
    assert out[(0, 1)].n_window == 6
    assert out[(1, 0)].n_window == 6
    assert out[(1, 1)].n_window == 9


def test_focal_sum_max_interior(spark):
    """3x3 block of distinct values: center focal_sum is the full block
    sum, focal_max the block max, n_present 9."""
    rows = [(r + 5, c + 5, r * 3 + c + 1) for r in range(3) for c in range(3)]
    px = spark.createDataFrame(rows, "row int, col int, value long")
    out = {(r.row, r.col): r for r in
           focal_stats(px, width=20, height=20).collect()}
    center = out[(6, 6)]
    assert center.focal_sum == sum(v for _, _, v in rows) == 45
    assert center.focal_max == 9
    assert center.n_present == 9 and center.n_window == 9
    # dilated support: 5x5 minus nothing (all within bounds)
    assert len(out) == 25


def test_focal_mass_conservation(spark):
    """Every pixel contributes to exactly n_window outputs, so
    sum(focal_sum) == sum(value) * 9 for an interior-only raster."""
    rows = [(5 + r, 5 + c, (r * 7 + c * 13) % 11 + 1)
            for r in range(4) for c in range(4)]
    px = spark.createDataFrame(rows, "row int, col int, value long")
    out = focal_stats(px, width=100, height=100)
    total = out.agg(F.sum("focal_sum")).collect()[0][0]
    assert total == sum(v for _, _, v in rows) * 9


def test_focal_radius_validation(spark):
    px = spark.createDataFrame([(0, 0, 1)], "row int, col int, value long")
    with pytest.raises(ValueError, match="radius"):
        focal_stats(px, width=10, height=10, radius=0)


def test_idw_single_point_exact_weights(spark):
    """One point: every ring target's (wsum, wvsum) is exactly
    scale div (d2+1) recomputed in Python from the same closed forms."""
    res, scale, v = 5, 10 ** 15, 7
    lat_us, lon_us = 1_234_567, -55_000_111
    pts = spark.createDataFrame(
        [(lat_us, lon_us, v)], "lat_us long, lon_us long, v long")
    out = idw_accumulate(pts, res=res, value_col="v", scale=scale).collect()
    n, base = 1 << res, 1 << (2 * res)
    # python twin of cell_encode + ring + center + weight
    iy = (lat_us + 90_000_000) * n // 180000001
    ix = (lon_us + 180_000_000) * n // 360000001
    expected = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ny = min(n - 1, max(0, iy + dy))
            nx = (ix + dx + n) % n
            cell = base + ny * n + nx
            lat_c = (2 * ny + 1) * 180000001 // (2 * n) - 90_000_000
            lon_c = (2 * nx + 1) * 360000001 // (2 * n) - 180_000_000
            d2 = (lat_us - lat_c) ** 2 + (lon_us - lon_c) ** 2
            expected[cell] = (lat_c, lon_c, scale // (d2 + 1))
    assert {r.cell for r in out} == set(expected)
    for r in out:
        lat_c, lon_c, w = expected[r.cell]
        assert (r.lat_c_us, r.lon_c_us) == (lat_c, lon_c)
        assert r.n_pts == 1 and r.wsum == w and r.wvsum == w * v


def test_idw_nearest_cell_dominates(spark):
    """The point's own cell center gets the largest weight of its ring."""
    pts = spark.createDataFrame(
        [(10_000_000, 20_000_000, 3)], "lat_us long, lon_us long, v long")
    out = idw_accumulate(pts, res=5, value_col="v").collect()
    own = cell_encode(F.lit(10_000_000), F.lit(20_000_000), 5)
    own_cell = spark.range(1).select(own.alias("c")).collect()[0].c
    best = max(out, key=lambda r: r.wsum)
    assert best.cell == own_cell


def test_idw_accumulators_additive(spark):
    """Two points accumulate exactly the sum of their single-point
    runs (bigint accumulation has no order hazard)."""
    p1 = (5_000_000, 6_000_000, 2)
    p2 = (5_100_000, 6_100_000, 9)
    df1 = spark.createDataFrame([p1], "lat_us long, lon_us long, v long")
    df2 = spark.createDataFrame([p2], "lat_us long, lon_us long, v long")
    both = spark.createDataFrame([p1, p2], "lat_us long, lon_us long, v long")
    single = {}
    for df in (df1, df2):
        for r in idw_accumulate(df, res=5, value_col="v").collect():
            k = r.cell
            acc = single.setdefault(k, [0, 0, 0])
            acc[0] += r.n_pts
            acc[1] += r.wsum
            acc[2] += r.wvsum
    merged = {r.cell: (r.n_pts, r.wsum, r.wvsum)
              for r in idw_accumulate(both, res=5, value_col="v").collect()}
    assert merged == {k: tuple(v) for k, v in single.items()}


def test_contour_lone_pixel_four_crossings(spark):
    from zen3geo_spark.operators.raster_algebra import contour_crossings

    px = spark.createDataFrame([(5, 5, 7)], "row int, col int, value long")
    out = {(r.row, r.col, r.dir): (r.lo_value, r.hi_value)
           for r in contour_crossings(px, 360, 180, threshold=2).collect()}
    # the implicit-zero neighbors straddle the threshold on all 4 edges
    assert out == {
        (5, 4, "E"): (0, 7), (5, 5, "E"): (0, 7),
        (4, 5, "S"): (0, 7), (5, 5, "S"): (0, 7),
    }


def test_contour_interior_no_crossing(spark):
    from zen3geo_spark.operators.raster_algebra import contour_crossings

    # a 2x2 plateau of 5s: crossings only on the outline, none between
    # the equal-valued interior pairs
    rows = [(r, c, 5) for r in (5, 6) for c in (5, 6)]
    px = spark.createDataFrame(rows, "row int, col int, value long")
    out = contour_crossings(px, 360, 180, threshold=3).collect()
    inner = [r for r in out
             if (r.row, r.col, r.dir) in
             {(5, 5, "E"), (6, 5, "E"), (5, 5, "S"), (5, 6, "S")}]
    assert inner == []
    assert len(out) == 8  # the plateau's outline: 2 per side


def test_contour_boundary_pixels_clip(spark):
    from zen3geo_spark.operators.raster_algebra import contour_crossings

    # pixel in the (0,0) corner: no W/N anchors exist, E/S pairs remain
    px = spark.createDataFrame([(0, 0, 9)], "row int, col int, value long")
    got = sorted((r.row, r.col, r.dir)
                 for r in contour_crossings(px, 360, 180, 2).collect())
    assert got == [(0, 0, "E"), (0, 0, "S")]


def test_gazetteer_deterministic_and_ambiguous(spark):
    rows = synth_gazetteer(spark).collect()
    assert len(rows) == GAZETTEER_N
    by_name = {}
    for r in rows:
        by_name.setdefault(r.name, []).append(r)
        assert -90_000_000 <= r.lat_us <= 90_000_000
        assert -180_000_000 <= r.lon_us <= 180_000_000
        assert 0 <= r.population < 1_000_000
    assert len(by_name) == GAZETTEER_NAMES
    # names collide mod 700 over 1500 rows: 100 names x3, 600 x2
    sizes = sorted(len(v) for v in by_name.values())
    assert sizes[0] == 2 and sizes[-1] == 3
    # python twin of the LCG — determinism across engines/runs
    r0 = next(r for r in rows if r.gaz_id == 0)
    st = (0 * 48271 + 13) % 2147483647
    st2 = (st * 48271 + 29) % 2147483647
    assert r0.lat_us == st % 180000001 - 90_000_000
    assert r0.lon_us == st2 % 360000001 - 180_000_000


def test_flow_dir_d8_matches_brute_force(spark):
    """Brute-force D8 on a small sparse grid: steepest drop wins, ties
    break to the lowest direction index, pits/flats get -1, off-pixels
    are implicit zeros, out-of-grid neighbors are excluded."""
    from zen3geo_spark.operators.raster_algebra import _D8, flow_dir_d8

    w = h = 8
    px = {(r, c): ((r * 5 + c * 3) % 11) + 1
          for r in range(h) for c in range(w)
          if (r * 7 + c) % 3 != 0}
    want = {}
    for (r, c), z in px.items():
        best = None
        for d, dr, dc in _D8:
            nr, nc = r + dr, c + dc
            if not (0 <= nr < h and 0 <= nc < w):
                continue
            zn = px.get((nr, nc), 0)
            if z > zn:
                key = (z - zn, -d)  # steepest drop, then lowest dir
                if best is None or key > best[0]:
                    best = (key, d)
        want[(r, c)] = -1 if best is None else best[1]
    df = spark.createDataFrame(
        [(r, c, z) for (r, c), z in px.items()],
        "row int, col int, value long")
    got = {(x["row"], x["col"]): x["flow_dir"]
           for x in flow_dir_d8(df, width=w, height=h).collect()}
    assert got == want


def test_flow_accumulate_matches_brute_force(spark):
    """Brute-force bounded routing: unit mass per present pixel, K
    rounds along D8 steepest descent; pits and reached zero cells
    absorb."""
    from zen3geo_spark.operators.raster_algebra import (
        _D8, flow_accumulate,
    )

    w = h = 8
    rounds = 3
    px = {(r, c): ((r * 5 + c * 3) % 11) + 1
          for r in range(h) for c in range(w)
          if (r * 7 + c) % 3 != 0}

    def d8(r, c, z):
        best = None
        for d, dr, dc in _D8:
            nr, nc = r + dr, c + dc
            if not (0 <= nr < h and 0 <= nc < w):
                continue
            zn = px.get((nr, nc), 0)
            if z > zn:
                key = (z - zn, -d)
                if best is None or key > best[0]:
                    best = (key, (nr, nc))
        return None if best is None else best[1]

    tgt = {p: d8(*p, z) for p, z in px.items()}
    mass = {p: 1 for p in px}
    acc = dict(mass)
    for _ in range(rounds):
        nxt = {}
        for p, m in mass.items():
            t = tgt.get(p)  # absent cells (arrived mass) have no target
            if t is not None:
                nxt[t] = nxt.get(t, 0) + m
        for p, m in nxt.items():
            acc[p] = acc.get(p, 0) + m
        mass = nxt
    df = spark.createDataFrame(
        [(r, c, z) for (r, c), z in px.items()],
        "row int, col int, value long")
    got = {(x["row"], x["col"]): x["acc_mass"]
           for x in flow_accumulate(df, width=w, height=h,
                                    rounds=rounds).collect()}
    assert got == acc
    # own mass is a floor; the ceiling (every unit moving every round)
    # is only reached if nothing gets absorbed by a pit or zero cell
    assert len(px) <= sum(got.values()) <= len(px) * (rounds + 1)
    assert any(m > 1 for m in got.values())  # something actually flowed


def test_flow_basin_pointer_jumping_equals_step_routing(spark):
    """2 pointer jumps == 4 single routing steps, brute-forced; pits
    and implicit-zero termini are fixpoints."""
    from zen3geo_spark.operators.raster_algebra import _D8, flow_basin

    w = h = 8
    px = {(r, c): ((r * 5 + c * 3) % 11) + 1
          for r in range(h) for c in range(w)
          if (r * 7 + c) % 3 != 0}

    def step(p):
        if p not in px:          # absorbed on a zero cell
            return p
        r, c = p
        z = px[p]
        best = None
        for d, dr, dc in _D8:
            nr, nc = r + dr, c + dc
            if not (0 <= nr < h and 0 <= nc < w):
                continue
            zn = px.get((nr, nc), 0)
            if z > zn:
                key = (z - zn, -d)
                if best is None or key > best[0]:
                    best = (key, (nr, nc))
        return p if best is None else best[1]

    want = {}
    for p in px:
        q = p
        for _ in range(4):
            q = step(q)
        want[p] = q
    df = spark.createDataFrame(
        [(r, c, z) for (r, c), z in px.items()],
        "row int, col int, value long")
    got = {(x["row"], x["col"]): (x["basin_row"], x["basin_col"])
           for x in flow_basin(df, width=w, height=h, jumps=2).collect()}
    assert got == want
    assert len(set(got.values())) < len(got)  # paths actually converge


def test_distance_transform_single_feature(spark):
    """One feature pixel: chamfer-(3,4) distances radiate exactly —
    orthogonal neighbors 3, diagonals 4, two orthogonal steps 6, a
    knight's-move cell min(3+4)=7."""
    from zen3geo_spark.operators.raster_algebra import distance_transform

    px = spark.createDataFrame([(5, 5, 1)], "row int, col int, value long")
    out = {(r.row, r.col): r.dist
           for r in distance_transform(px, width=20, height=20,
                                       rounds=2).collect()}
    assert out[(5, 5)] == 0
    assert out[(4, 5)] == out[(5, 4)] == out[(6, 5)] == out[(5, 6)] == 3
    assert out[(4, 4)] == out[(6, 6)] == 4
    assert out[(3, 5)] == 6          # two orthogonal steps
    assert out[(3, 4)] == 7          # one diagonal + one orthogonal
    assert out[(3, 3)] == 8          # two diagonals
    assert (1, 5) not in out         # outside the 2-round band


def test_distance_transform_two_features_min_and_bounds(spark):
    """Distance takes the min over features; propagation clips at the
    raster edge (no negative rows/cols)."""
    from zen3geo_spark.operators.raster_algebra import distance_transform

    px = spark.createDataFrame([(0, 0, 1), (0, 4, 1)],
                               "row int, col int, value long")
    out = {(r.row, r.col): r.dist
           for r in distance_transform(px, width=6, height=3,
                                       rounds=2).collect()}
    assert out[(0, 2)] == 6          # 2 steps from either feature
    assert out[(0, 1)] == 3          # nearer feature wins
    assert min(r for r, _ in out) == 0 and min(c for _, c in out) == 0
    assert all(0 <= r < 3 and 0 <= c < 6 for r, c in out)


def test_distance_transform_extra_rounds_monotone(spark):
    """Rounds only ADD cells — distances already found never change
    (min-combine monotonicity, the exactness-within-band argument)."""
    from zen3geo_spark.operators.raster_algebra import distance_transform

    px = spark.createDataFrame([(2, 2, 1)], "row int, col int, value long")
    d2 = {(r.row, r.col): r.dist
          for r in distance_transform(px, 9, 9, rounds=2).collect()}
    d3 = {(r.row, r.col): r.dist
          for r in distance_transform(px, 9, 9, rounds=3).collect()}
    assert set(d2) <= set(d3)
    assert all(d3[k] == v for k, v in d2.items())


def test_polygonize_two_regions_same_class(spark):
    """Two diagonal pixels of one class are 4-DISCONNECTED → two
    regions; adding the bridging pixel merges them into one."""
    from zen3geo_spark.operators.raster_algebra import polygonize_regions

    sep = spark.createDataFrame([(0, 0, 1), (1, 1, 1)],
                                "row int, col int, cls long")
    out = polygonize_regions(sep, width=10).collect()
    assert len(out) == 2 and all(r.n_pixels == 1 for r in out)

    bridged = spark.createDataFrame([(0, 0, 1), (0, 1, 1), (1, 1, 1)],
                                    "row int, col int, cls long")
    out = polygonize_regions(bridged, width=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.region_id, r.cls, r.n_pixels) == (0, 1, 3)
    assert (r.min_row, r.min_col, r.max_row, r.max_col) == (0, 0, 1, 1)


def test_polygonize_class_boundary_splits(spark):
    """Adjacent pixels of DIFFERENT classes never merge: a 2x2 block
    with a class-checkerboard yields 4 singleton regions."""
    from zen3geo_spark.operators.raster_algebra import polygonize_regions

    px = spark.createDataFrame(
        [(0, 0, 1), (0, 1, 2), (1, 0, 2), (1, 1, 1)],
        "row int, col int, cls long")
    out = polygonize_regions(px, width=10).collect()
    assert len(out) == 4 and all(r.n_pixels == 1 for r in out)
    # region_id is the min pixel id: row*width+col
    assert sorted(r.region_id for r in out) == [0, 1, 10, 11]


def test_equalize_histogram_textbook_golden(spark):
    """Classic equalization: counts {1:4, 2:2, 3:2} over 8 pixels at 8
    levels — eq = (cdf - cdf_min) * 7 div (n - cdf_min)."""
    from zen3geo_spark.operators.raster_algebra import equalize_histogram

    vals = [1, 1, 1, 1, 2, 2, 3, 3]
    px = spark.createDataFrame(
        [(0, c, v) for c, v in enumerate(vals)],
        "row int, col int, value long")
    out = {r.value: r.eq_value
           for r in equalize_histogram(px, levels=8).collect()}
    # cdf: 1->4, 2->6, 3->8; cdf_min=4, n=8
    assert out == {1: 0, 2: (6 - 4) * 7 // 4, 3: 7}


def test_equalize_constant_raster_maps_to_zero(spark):
    """Single-valued raster: n == cdf_min — guard avoids div-by-zero
    and maps everything to level 0."""
    from zen3geo_spark.operators.raster_algebra import equalize_histogram

    px = spark.createDataFrame([(0, 0, 9), (0, 1, 9)],
                               "row int, col int, value long")
    out = equalize_histogram(px, levels=256).collect()
    assert {r.eq_value for r in out} == {0}


def test_equalize_monotone_and_full_range(spark):
    """eq_value is monotone in value and hits both endpoints."""
    from zen3geo_spark.operators.raster_algebra import equalize_histogram

    px = spark.createDataFrame(
        [(0, i, (i % 10) + 1) for i in range(100)],
        "row int, col int, value long")
    out = sorted({(r.value, r.eq_value)
                  for r in equalize_histogram(px, levels=16).collect()})
    eqs = [e for _, e in out]
    assert eqs == sorted(eqs) and eqs[0] == 0 and eqs[-1] == 15


def test_change_matrix_golden(spark):
    import duckdb
    from zen3geo_spark.operators.raster_algebra import (
        change_matrix, change_matrix_sql,
    )
    a_rows = [(0, 0, 1), (0, 1, 2), (1, 0, 3)]
    b_rows = [(0, 0, 1), (1, 0, 1), (2, 2, 2)]
    a = spark.createDataFrame(a_rows, "row long, col long, cls long")
    b = spark.createDataFrame(b_rows, "row long, col long, cls long")
    got = sorted((r.cls_a, r.cls_b, r.n_pixels)
                 for r in change_matrix(a, b).collect())
    # (0,0): 1->1 stable; (0,1): 2->nodata; (1,0): 3->1; (2,2): nodata->2
    assert got == [(0, 2, 1), (1, 1, 1), (2, 0, 1), (3, 1, 1)]
    av = ", ".join(str(t) for t in a_rows)
    bv = ", ".join(str(t) for t in b_rows)
    duck = sorted(duckdb.sql(change_matrix_sql(
        f"select * from (values {av}) t(row, col, cls)",
        f"select * from (values {bv}) t(row, col, cls)")).fetchall())
    assert duck == got

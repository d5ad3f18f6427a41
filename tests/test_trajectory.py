"""Track resampling + bearing octants (operators/trajectory.py)."""

from zen3geo_spark.operators.trajectory import bearing_mix, track_resample


def test_track_resample_golden_including_negative_delta(spark):
    """Exact interpolation on a two-segment track, one moving in the
    negative direction (the floor-division case where truncation and
    floor disagree)."""
    pts = spark.createDataFrame(
        [(1, 0, 0, 100), (1, 10, 10, 100), (1, 20, 3, 100)],
        "k long, t long, x long, y long")
    out = {r.tau: (r.x, r.y) for r in
           track_resample(pts, "k", "t", "x", "y",
                          step=4, max_gap=100).collect()}
    # seg 1: t0=0..10, dx=+10 -> x(tau)=tau; seg 2: t=10..20, dx=-7
    import math
    want = {0: (0, 100), 4: (4, 100), 8: (8, 100)}
    for tau in (12, 16):
        want[tau] = (10 + math.floor(-7 * (tau - 10) / 10), 100)
    assert out == want


def test_track_resample_grid_hit_owned_by_starting_segment(spark):
    """tau exactly at an observation time comes from the segment that
    STARTS there — no duplicate tau per key."""
    pts = spark.createDataFrame(
        [(1, 0, 0, 0), (1, 8, 80, 0), (1, 16, 0, 0)],
        "k long, t long, x long, y long")
    rows = track_resample(pts, "k", "t", "x", "y",
                          step=8, max_gap=100).collect()
    taus = [r.tau for r in rows]
    assert sorted(taus) == [0, 8]             # 16 has no following segment
    assert {r.tau: r.x for r in rows}[8] == 80  # from the second segment


def test_track_resample_max_gap_drops_outage(spark):
    pts = spark.createDataFrame(
        [(1, 0, 0, 0), (1, 5000, 100, 0), (1, 5010, 200, 0)],
        "k long, t long, x long, y long")
    out = track_resample(pts, "k", "t", "x", "y",
                         step=5, max_gap=100).collect()
    assert all(5000 <= r.tau < 5010 for r in out)  # only the short segment


def test_bearing_mix_eight_octants_and_tie_rule(spark):
    """One move in each octant; the axis class claims |major|>=2*|minor|
    so (2,1) is still E while (2,2) is NE; zero moves drop."""
    moves = [(10, 0), (10, 10), (0, 10), (-10, 10),
             (-10, 0), (-10, -10), (0, -10), (10, -10),
             (10, 4), (10, 5), (0, 0)]
    rows, x, y = [], 0, 0
    for i, (dx, dy) in enumerate(moves + [(0, 0)]):
        rows.append((1, i, x, y))
        x, y = x + dx, y + dy
    # rebuild: positions BEFORE each move, then apply; drop the padding
    rows = []
    x = y = 0
    for i, (dx, dy) in enumerate(moves):
        rows.append((1, i, x, y))
        x, y = x + dx, y + dy
    rows.append((1, len(moves), x, y))
    pts = spark.createDataFrame(rows, "k long, t long, x long, y long")
    out = {}
    for r in bearing_mix(pts, "k", "t", "x", "y").collect():
        out[r.octant] = r.n_moves
    # octants 0..7 hit once each, plus (10,4)->E (10 >= 8) and
    # (10,5)->E too (the axis claim 10 >= 2*5 holds at equality);
    # (0,0) dropped
    assert out == {0: 3, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 7: 1}


def test_bearing_mix_partitioned_per_key(spark):
    pts = spark.createDataFrame(
        [(1, 0, 0, 0), (1, 1, 10, 0), (2, 0, 0, 0), (2, 1, 0, 10)],
        "k long, t long, x long, y long")
    out = {(r.k, r.octant): r.n_moves
           for r in bearing_mix(pts, "k", "t", "x", "y").collect()}
    assert out == {(1, 0): 1, (2, 2): 1}

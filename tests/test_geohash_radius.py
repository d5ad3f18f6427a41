"""Geohash (canonical base32) and metric radius self-join.

Geohash parity is pinned against a from-first-principles per-bit binary
subdivision encoder (the algorithm every classic geohash library
implements), including the wiki's canonical example 57.64911,10.40744 →
``u4pruyd``. The radius join is pinned against an O(n²) numpy haversine
brute force — exactness comes from radius_join_guarantee, and the tests
also pin the guarantee's failure mode (radius too big for the res).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from zen3geo_spark.functions.geo import (
    GEOHASH_BASE32, with_geohash,
)
from zen3geo_spark.operators.spatial_join import (
    EARTH_R_M, radius_join_guarantee, radius_join_points,
)


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Classic per-bit subdivision encoder (public-domain algorithm)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, even, out, ch = 0, True, [], 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lon_lo = mid
            else:
                ch = ch * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lat_lo = mid
            else:
                ch = ch * 2
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(GEOHASH_BASE32[ch])
            bits, ch = 0, 0
    return "".join(out)


def _hav_m(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    a = (math.sin((p2 - p1) / 2) ** 2
         + math.cos(p1) * math.cos(p2)
         * math.sin(math.radians(lon2 - lon1) / 2) ** 2)
    return 2 * EARTH_R_M * math.asin(math.sqrt(a))


def test_geohash_wiki_example(spark):
    df = spark.createDataFrame([(57_649_110, 10_407_440)],
                               "lat_us long, lon_us long")
    got = with_geohash(df, "lat_us", "lon_us", 7).collect()[0]["ghash"]
    assert got == "u4pruyd"
    assert got == _ref_geohash(57.64911, 10.40744, 7)


@pytest.mark.parametrize("precision", [1, 2, 5, 8, 12])
def test_geohash_matches_reference_encoder(spark, precision):
    rng = np.random.default_rng(42 + precision)
    lats = rng.integers(-90_000_000, 90_000_001, 64)
    lons = rng.integers(-180_000_000, 180_000_001, 64)
    # corner / seam cases: poles, antimeridian (lon=180 clamps into the
    # last column, matching encoders that accept the seam), origin
    extra = [(-90_000_000, -180_000_000), (90_000_000, 180_000_000),
             (0, 0), (89_999_999, 179_999_999), (-1, -1)]
    rows = [(int(a), int(b)) for a, b in zip(lats, lons)] + extra
    df = spark.createDataFrame(rows, "lat_us long, lon_us long")
    got = {(r["lat_us"], r["lon_us"]): r["ghash"]
           for r in with_geohash(df, "lat_us", "lon_us", precision).collect()}
    # the exact seam (+90, +180) clamps into the all-max cell — below
    # micro-degree cell sizes (precision ≥ 11) the float reference can't
    # express that clamp, so pin it directly: all bits 1 ⇒ all 'z'
    assert got[(90_000_000, 180_000_000)] == "z" * precision
    for lat_us, lon_us in rows:
        if (lat_us, lon_us) == (90_000_000, 180_000_000):
            continue
        want = _ref_geohash(lat_us / 1e6, lon_us / 1e6, precision)
        assert got[(lat_us, lon_us)] == want, (lat_us, lon_us)


def test_geohash_prefix_property(spark):
    rng = np.random.default_rng(7)
    rows = [(int(a), int(b)) for a, b in zip(
        rng.integers(-90_000_000, 90_000_001, 32),
        rng.integers(-180_000_000, 180_000_001, 32))]
    df = spark.createDataFrame(rows, "lat_us long, lon_us long")
    df = with_geohash(df, "lat_us", "lon_us", 3, out="g3")
    df = with_geohash(df, "lat_us", "lon_us", 9, out="g9")
    for r in df.collect():
        assert r["g9"].startswith(r["g3"])


def test_radius_join_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    # cluster points so plenty of pairs land inside the radius
    lats = rng.integers(40_000_000, 46_000_000, 120)
    lons = rng.integers(-4_000_000, 4_000_000, 120)
    rows = [(i, int(a), int(b)) for i, (a, b) in enumerate(zip(lats, lons))]
    df = spark.createDataFrame(rows, "point_id long, lat_us long, lon_us long")
    got = sorted((r["id_a"], r["id_b"], r["dist_hm"])
                 for r in radius_join_points(df, 140_000.0, res=5).collect())
    want = []
    for i, alat, alon in rows:
        for j, blat, blon in rows:
            if i >= j:
                continue
            d = _hav_m(alat / 1e6, alon / 1e6, blat / 1e6, blon / 1e6)
            if d <= 140_000.0:
                want.append((i, j, int(d // 100)))
    assert got == sorted(want)
    assert len(want) > 50  # the fixture actually exercises dense pairs


def test_radius_join_pairs_across_cell_boundary(spark):
    # two points 100 km apart straddling a res-5 row boundary (lat 5.625°)
    df = spark.createDataFrame(
        [(1, 5_200_000, 0), (2, 6_050_000, 300_000), (3, 80_000_000, 0)],
        "point_id long, lat_us long, lon_us long")
    got = {(r["id_a"], r["id_b"]) for r in
           radius_join_points(df, 140_000.0, res=5).collect()}
    assert (1, 2) in got
    assert all(3 not in pair for pair in got)


def test_radius_join_guarantee_rejects_uncovered_radius(spark):
    # 700 km blows the res-5 latitude span (0.98 * 5.625° ≈ 613 km)
    with pytest.raises(ValueError, match="not ring-covered"):
        radius_join_guarantee(700_000.0, 5, 83_000_000)
    # high-latitude cap: the same radius that passes at |lat|≤83 fails
    # when the cap widens toward the pole (lon shrinkage)
    radius_join_guarantee(140_000.0, 5, 83_000_000)
    with pytest.raises(ValueError, match="not ring-covered"):
        radius_join_guarantee(140_000.0, 5, 89_990_000)
    with pytest.raises(ValueError, match="res >= 2"):
        radius_join_guarantee(1000.0, 1, 0)


def test_radius_join_filters_polar_points(spark):
    df = spark.createDataFrame(
        [(1, 84_000_000, 0), (2, 84_000_000, 10_000)],
        "point_id long, lat_us long, lon_us long")
    # both points above the cap → filtered, no pairs (not an error)
    assert radius_join_points(df, 140_000.0, res=5).count() == 0

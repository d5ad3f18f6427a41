"""Hilbert cell index: bijectivity, continuity, CTE parity, Spark parity."""
import numpy as np
import pytest

from zen3geo_spark.functions.hilbert import (
    hilbert_cte_sql,
    hilbert_d_np,
    hilbert_encode,
    hilbert_parent,
)


def test_bijective_and_continuous_res4():
    """Any correct Hilbert numbering is a bijection whose consecutive ids
    are 4-neighbors — this pins the curve completely at res 4."""
    res = 4
    n = 1 << res
    iy, ix = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = hilbert_d_np(iy.ravel(), ix.ravel(), res)
    assert sorted(d) == list(range(n * n))
    order = np.argsort(d)
    steps = (np.abs(np.diff(iy.ravel()[order]))
             + np.abs(np.diff(ix.ravel()[order])))
    assert (steps == 1).all()


def test_prefix_property():
    """S2 hierarchy: the res-r id integer-divided by 4^(r-L) equals the
    level-L id of the ancestor cell."""
    rng = np.random.RandomState(3)
    res, pres = 12, 5
    iy = rng.randint(0, 1 << res, 400)
    ix = rng.randint(0, 1 << res, 400)
    child = hilbert_d_np(iy, ix, res)
    parent = hilbert_d_np(iy >> (res - pres), ix >> (res - pres), pres)
    assert (child // (1 << (2 * (res - pres))) == parent).all()


def test_duckdb_cte_matches_kernel():
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    rng = np.random.RandomState(42)
    lat = rng.randint(-90_000_000, 90_000_001, 200).astype(np.int64)
    lon = rng.randint(-180_000_000, 180_000_001, 200).astype(np.int64)
    con = duckdb.connect()
    con.register("pts0", pd.DataFrame(
        {"point_id": np.arange(200), "lat_us": lat, "lon_us": lon}))
    cte = hilbert_cte_sql("pts0", "point_id", "lat_us", "lon_us", 10)
    got = np.array([r[1] for r in con.sql(
        f"with recursive {cte} select point_id, hd from hcells "
        "order by point_id").fetchall()])
    iy = ((lat + 90_000_000) << 10) // 180_000_001
    ix = ((lon + 180_000_000) << 10) // 360_000_001
    assert (got == hilbert_d_np(iy, ix, 10)).all()


def test_spark_encode_and_parent(spark):
    df = spark.range(300).selectExpr(
        "id", "cast(id * 1234567 % 180000001 - 90000000 as long) as lat_us",
        "cast(id * 7654321 % 360000001 - 180000000 as long) as lon_us")
    rows = (df.withColumn("hd", hilbert_encode("lat_us", "lon_us", 12))
            .withColumn("h5", hilbert_parent("hd", 12, 5))
            .collect())
    lat = np.array([r["lat_us"] for r in rows], dtype=np.int64)
    lon = np.array([r["lon_us"] for r in rows], dtype=np.int64)
    iy = ((lat + 90_000_000) << 12) // 180_000_001
    ix = ((lon + 180_000_000) << 12) // 360_000_001
    want = hilbert_d_np(iy, ix, 12)
    got = np.array([r["hd"] for r in rows])
    assert (got == want).all()
    assert all(r["h5"] == r["hd"] // (1 << 14) for r in rows)


def test_encode_null_propagates(spark):
    """Null lat/lon must yield null hd (same semantics as the JVM
    cell/zorder paths), not an Arrow-batch crash or garbage."""
    df = spark.createDataFrame(
        [(0, 1_000_000, 2_000_000), (1, None, 2_000_000),
         (2, 1_000_000, None), (3, None, None)],
        "id long, lat_us long, lon_us long")
    got = {r["id"]: r["hd"]
           for r in df.withColumn(
               "hd", hilbert_encode("lat_us", "lon_us", 10)).collect()}
    assert got[0] is not None
    assert got[1] is None and got[2] is None and got[3] is None

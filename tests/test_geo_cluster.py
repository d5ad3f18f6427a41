"""Integer Lloyd k-means (operators/geo_cluster.py)."""

import duckdb


def test_geo_kmeans_converges_to_obvious_clusters(spark):
    from zen3geo_spark.operators.geo_cluster import geo_kmeans

    M = 1_000_000
    # two tight blobs far apart; k=12 seeds, only clusters holding
    # points survive in the output
    pts = ([(100 * M + d, 50 * M + d) for d in range(0, 50, 10)]
           + [(-120 * M + d, -30 * M - d) for d in range(0, 50, 10)])
    df = spark.createDataFrame(pts, "lon_us long, lat_us long")
    out = geo_kmeans(df, k=12, rounds=4).collect()
    assert sum(r.n_points for r in out) == len(pts)
    # every reported centroid sits inside one of the blobs' bboxes
    for r in out:
        in_a = 100 * M <= r.cx <= 100 * M + 49 and 50 * M <= r.cy
        in_b = -120 * M <= r.cx <= -120 * M + 49 and r.cy <= -30 * M
        assert in_a or in_b, (r.cx, r.cy)


def test_geo_kmeans_twin_bit_exact(spark):
    from zen3geo_spark.operators.geo_cluster import (
        geo_kmeans, geo_kmeans_sql_duckdb,
    )
    pts = [((i * 7_919_123) % 300_000_000 - 150_000_000,
            (i * 104_729) % 140_000_000 - 70_000_000) for i in range(200)]
    df = spark.createDataFrame(pts, "lon_us long, lat_us long")
    got = sorted((r.cluster_id, r.n_points, r.cx, r.cy)
                 for r in geo_kmeans(df, k=8, rounds=3).collect())
    vals = ", ".join(f"({x}, {y})" for x, y in pts)
    duck = sorted(duckdb.sql(geo_kmeans_sql_duckdb(
        f"select cast(lon_us as bigint) as lon_us, "
        f"cast(lat_us as bigint) as lat_us "
        f"from (values {vals}) t(lon_us, lat_us)",
        k=8, rounds=3)).fetchall())
    assert duck == got

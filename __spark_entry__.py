"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs a real engine operator (zen3geo_spark.*) and
has a DuckDB ``oracle_sql()`` twin sharing the exact same arithmetic via
the engine-parameterized SQL templates in zen3geo_spark.functions /
sources.pages. Column names and dtypes are aligned on both sides; float
aggregates are rounded identically. Every entry — including the
iterative ones — has an oracle: the Hilbert curve runs as a recursive
CTE and the trained-IVF spherical-kmeans recurrence as driver-built
per-round SQL blocks (cosine scale-invariance lets the oracle skip the
centroid re-normalization the Spark kernel performs).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zen3geo_spark.functions.geo import (
    cell_encode, cell_id_sql, cell_parent, cell_parent_sql,
    extract_all_geotags,
    extract_first_geotag, mercator_x, mercator_x_sql, mercator_y,
    mercator_y_sql, micro_from_str, micro_from_str_sql,
)
from zen3geo_spark.functions.hilbert import (
    hilbert_cte_sql, hilbert_encode, hilbert_parent,
)
from zen3geo_spark.functions.zorder import (
    with_zorder, z_range_predicate, z_ranges_for_bbox, zorder_parent,
    zorder_parent_sql, zorder_sql,
)
from zen3geo_spark.functions.text import (
    fingerprint, fingerprint_sql, lang_id, lang_id_sql, quality_score,
    quality_score_sql, token_count, token_count_sql,
    dsir_sql_duckdb, unigram_logppl_sql_duckdb,
)
from zen3geo_spark.operators.canvas import canvas_from_grid
from zen3geo_spark.operators.chipper import chip_grid, assign_chips, chip_stats
from zen3geo_spark.operators.clipper import clip_vector_with_rectangle
from zen3geo_spark.operators.combinators import batcher, zipper
from zen3geo_spark.operators.dedup import (
    dedup_exact, gram_hash60_sql_duckdb, gram_hashes40_sql_duckdb,
    minhash_lsh_candidates, minhash_signature_sql_duckdb, ngram_jaccard,
    shingles_sql_duckdb, simhash64_sql_duckdb, simhash_near_dups,
    verify_jaccard_pairs, winnow_fingerprints_pd,
    winnow_fingerprints_sql_duckdb,
)
from zen3geo_spark.operators.mosaic import mosaic_first_valid
from zen3geo_spark.operators.multimodal import (
    decode_audio, decode_image, frame_sample, image_stats, synth_media,
)
from zen3geo_spark.operators.rasterize import rasterize
from zen3geo_spark.operators.similarity import (
    cosine_near_dup_pairs_blocked, cosine_topk_bruteforce, cosine_topk_ivf,
    cosine_topk_lsh,
)
from zen3geo_spark.operators.stacker import build_overviews, stack
from zen3geo_spark.operators.spatial_join import (
    knn_join_bruteforce, knn_join_cells, points_in_polygons,
    radius_join_points, radius_join_sql_duckdb,
)
from zen3geo_spark.operators.stac import search
from zen3geo_spark.sources.fixtures import (
    GEOM_SCHEMA, canvas_rasterize, datacube_for_mosaic, geometries_datashader,
    raster_grid, scenes_meta, stac_items, with_bbox,
)
from zen3geo_spark.functions.web import (
    canonical_url, canonical_url_sql, html_to_text, html_to_text_sql,
    messy_url_sql,
)
from zen3geo_spark.sources.pages import (
    URL_HOST_SQL, URL_PID_SQL, pages_cte_sql, synth_pages,
)
from zen3geo_spark.streaming.windows import session_stats, tumbling_event_stats

N_PAGES = 5000  # fixed-size synthetic pages table for geo queries

# micro-degree fixture polygons (a triangle and a non-convex notched quad)
TRIANGLE = [(0, 0), (20_000_000, 0), (10_000_000, 15_000_000)]
NOTCHED = [(-30_000_000, -10_000_000), (-10_000_000, -10_000_000),
           (-10_000_000, 10_000_000), (-20_000_000, 0),
           (-30_000_000, 10_000_000)]
POLYS = [(0, TRIANGLE), (1, NOTCHED)]

# multi-ring fixtures (x=lon, y=lat micro-degrees): a donut whose inner
# ring is a HOLE under even-odd parity, and a two-part multipolygon
# (two disjoint outer rings carried as one geometry)
DONUT = [
    [(-60_000_000, -45_000_000), (60_000_000, -45_000_000),
     (60_000_000, 45_000_000), (-60_000_000, 45_000_000)],
    [(-30_000_000, -20_000_000), (30_000_000, -20_000_000),
     (30_000_000, 20_000_000), (-30_000_000, 20_000_000)],
]
TWO_PART = [
    [(80_000_000, -40_000_000), (120_000_000, -40_000_000),
     (120_000_000, 0), (80_000_000, 0)],
    [(-170_000_000, 30_000_000), (-120_000_000, 30_000_000),
     (-120_000_000, 70_000_000), (-170_000_000, 70_000_000)],
]
MULTI_POLYS = [(0, DONUT), (1, TWO_PART)]


# ---------------------------------------------------------------------------
# shared builders
# ---------------------------------------------------------------------------

def _points_df(spark: SparkSession) -> DataFrame:
    """Pages → extracted+parsed points (point_id = page id)."""
    pages = synth_pages(spark, N_PAGES).withColumn(
        "point_id", F.regexp_extract("url", r"/page/(\d+)", 1).cast("long")
    )
    lat_s, lon_s = extract_first_geotag(F.col("text"))
    pts = pages.select("point_id", lat_s.alias("lat_str"), lon_s.alias("lon_str"))
    pts = pts.filter(F.col("lat_str") != "")
    return pts.select(
        "point_id",
        micro_from_str(F.col("lat_str")).alias("lat_us"),
        micro_from_str(F.col("lon_str")).alias("lon_us"),
    )


def _points_cte() -> str:
    """DuckDB twin of _points_df."""
    lat = micro_from_str_sql("lat_str", "duckdb")
    lon = micro_from_str_sql("lon_str", "duckdb")
    return f"""
    with pages as ({pages_cte_sql(N_PAGES, with_id=True)}),
    tagged as (
      select id as point_id,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 1) as lat_str,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 2) as lon_str
      from pages
    ),
    pts as (
      select point_id, {lat} as lat_us, {lon} as lon_us
      from tagged where lat_str <> ''
    )
    """


def _polys_df(spark: SparkSession) -> DataFrame:
    """Polygon dimension table as a pure-JVM single-partition VALUES
    relation. createDataFrame(python_rows) would parallelize PICKLED rows
    across defaultParallelism partitions — every broadcast build of the
    PIP join then runs 32 python-deserialization tasks just to read 2
    polygons; as a LocalRelation the broadcast side is one JVM-only task
    (and Catalyst can fold it)."""
    rows = []
    for gid, ring in POLYS:
        pts = ", ".join(
            f"named_struct('x', cast({x} as double), 'y', cast({y} as double))"
            for x, y in ring)
        xs = [x for x, _ in ring]
        ys = [y for _, y in ring]
        rows.append(
            f"({gid}L, 'polygon', array(array({pts})), 'OGC:CRS84', "
            f"{min(xs)}L, {min(ys)}L, {max(xs)}L, {max(ys)}L)")
    return spark.sql(
        "select * from values " + ", ".join(rows) +
        " as t(geom_id, geom_type, parts, crs, "
        "minx_us, miny_us, maxx_us, maxy_us)")


def _edges_values() -> str:
    rows = []
    for gid, ring in POLYS:
        for i in range(len(ring)):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % len(ring)]
            rows.append(f"({gid}, {x1}, {y1}, {x2}, {y2})")
    return "(values " + ", ".join(rows) + ") e(geom_id, x1, y1, x2, y2)"


def _multi_polys_df(spark: SparkSession) -> DataFrame:
    """Multi-ring geometry dimension (same LocalRelation discipline as
    _polys_df; parts = ALL rings, bbox spans every ring)."""
    rows = []
    for gid, rings in MULTI_POLYS:
        ring_sqls = []
        for ring in rings:
            pts = ", ".join(
                f"named_struct('x', cast({x} as double), 'y', cast({y} as double))"
                for x, y in ring)
            ring_sqls.append(f"array({pts})")
        xs = [x for ring in rings for x, _ in ring]
        ys = [y for ring in rings for _, y in ring]
        rows.append(
            f"({gid}L, 'polygon', array({', '.join(ring_sqls)}), 'OGC:CRS84', "
            f"{min(xs)}L, {min(ys)}L, {max(xs)}L, {max(ys)}L)")
    return spark.sql(
        "select * from values " + ", ".join(rows) +
        " as t(geom_id, geom_type, parts, crs, "
        "minx_us, miny_us, maxx_us, maxy_us)")


def _multi_edges_values() -> str:
    rows = []
    for gid, rings in MULTI_POLYS:
        for ring in rings:
            for i in range(len(ring)):
                x1, y1 = ring[i]
                x2, y2 = ring[(i + 1) % len(ring)]
                rows.append(f"({gid}, {x1}, {y1}, {x2}, {y2})")
    return "(values " + ", ".join(rows) + ") e(geom_id, x1, y1, x2, y2)"


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_pages_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = synth_pages(spark, N_PAGES)
    lat_s, lon_s = extract_first_geotag(F.col("text"))
    return pages.select(
        "url", lat_s.alias("lat_str"), lon_s.alias("lon_str"), "lang"
    ).filter(F.col("lat_str") != "")


def q_url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + host-level rollup over the pages table —
    the per-domain aggregation every crawl pipeline runs (robots/quotas/
    spam scoring). Host parsed with the same regex both engines; one
    map-side-combinable aggregate keyed by host (1000 hosts at any
    corpus scale — no skew, the heavy key is the GROUP key itself)."""
    pages = synth_pages(spark, N_PAGES)
    host = F.regexp_extract(F.col("url"), r"^https?://([^/]+)/", 1)
    return (pages
            .select(host.alias("host"), "lang", "warc_ts")
            .groupBy("host")
            .agg(F.count("*").alias("n_pages"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.min("warc_ts").alias("first_ts"),
                 F.max("warc_ts").alias("last_ts")))


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt longest-prefix-match evaluation (RFC 9309: longest
    match wins, Allow wins ties, no match = allowed) over the pages
    table, rolled up per host. Per-host rule arrays broadcast; the match
    is a higher-order aggregate in codegen — the corpus never shuffles
    and never fans out by matching-rule count."""
    from zen3geo_spark.functions.web import (robots_decisions,
                                             robots_rules_synth)

    pages = synth_pages(spark, N_PAGES)
    rules = robots_rules_synth(spark, n_hosts=1000)
    return (robots_decisions(pages, rules)
            .groupBy("host")
            .agg(F.count("*").alias("n_pages"),
                 F.sum("allowed").alias("n_allowed"),
                 (F.count("*") - F.sum("allowed")).alias("n_blocked")))


def q_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch mixture planner: per-language token totals + the sampling
    weight reshaping the corpus toward a target token mixture (the
    DoReMi/Llama-recipe data-mixing table). Lang-keyed partial agg +
    constant-key broadcast of the one-row total."""
    from zen3geo_spark.operators.curation import epoch_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return epoch_mix(docs, targets={"en": 30, "zh": 25}, default_pct=15)


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode the ``html`` binary column, strip markup JVM-side, and pin
    the input contract's per-row invariant (BASELINE.json ``input_hint``:
    byte-identical extracted text per url): per lang, how many pages'
    extracted text equals the ``text`` column byte-for-byte, plus the
    summed extracted length. On the synthetic corpus every page must
    match — the oracle hash locks that at 100%.

    Scale shape: one scan, all whole-stage codegen (decode +
    regexp_replace + comparison), one docs-sized map-side-combinable
    aggregate on a 5-value key."""
    pages = synth_pages(spark, N_PAGES)
    extracted = html_to_text(F.col("html"))
    return (pages
            .select("lang",
                    (extracted == F.col("text")).alias("_ok"),
                    F.length(extracted).alias("_len"))
            .groupBy("lang")
            .agg(F.count("*").alias("n_pages"),
                 F.sum(F.when(F.col("_ok"), 1).otherwise(0))
                  .alias("n_byte_identical"),
                 F.sum("_len").alias("sum_extracted_len")))


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization as crawl dedup uses it: two deterministic
    re-spellings of every page URL (case/port/tracking-param/fragment/
    param-order noise, built from the shared ``messy_url_sql`` template)
    must collapse to ONE canonical URL each. Per host: canonical count,
    total variants seen, and how many canonicals collapsed a full pair —
    the invariant n_collapsed_pairs == n_canonical is visible in the
    hash.

    Scale shape: union of two projections of one scan → pure-JVM
    canonicalize (string ops + a bounded array_sort of the per-URL param
    list) → group-by canonical (unique-ish key, no skew) → host rollup
    (map-side combinable, 1000 hosts)."""
    base = synth_pages(spark, N_PAGES).selectExpr(
        "url",
        f"{URL_PID_SQL} as _pid")
    messy = (
        base.selectExpr(f"{messy_url_sql('url', '_pid', 0, 'spark')} as messy")
        .unionAll(
            base.selectExpr(f"{messy_url_sql('url', '_pid', 1, 'spark')} as messy"))
    )
    per_canon = (messy
                 .select(canonical_url(F.col("messy")).alias("curl"))
                 .groupBy("curl")
                 .agg(F.count("*").alias("_nv")))
    host = F.regexp_extract("curl", r"^https://([^/?#]+)", 1)
    return (per_canon
            .select(host.alias("host"), "_nv")
            .groupBy("host")
            .agg(F.count("*").alias("n_canonical"),
                 F.sum("_nv").alias("n_variants"),
                 F.sum(F.when(F.col("_nv") == 2, 1).otherwise(0))
                  .alias("n_collapsed_pairs")))


def q_crawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-snapshot diff: two overlapping snapshots of the pages table
    (snapshot A = ids [0, N), snapshot B = ids [N/5, 6N/5)) full-outer
    joined on url → per host, how many URLs are new in B, gone from A,
    and kept. The recrawl bookkeeping every snapshot-oriented crawl
    pipeline runs.

    Scale shape: url-keyed equi-join between two snapshot scans — urls
    are unique per snapshot so the join key is skew-free and the join is
    a plain shuffle-hash/sort-merge that AQE sizes; at 10^12 rows both
    snapshot tables would be bucketed by url to make it co-located. The
    host rollup is map-side combinable (1000 hosts)."""
    n2 = N_PAGES * 6 // 5
    lo = N_PAGES // 5
    allp = synth_pages(spark, n2).selectExpr(
        "url",
        f"{URL_HOST_SQL} as host",
        f"{URL_PID_SQL} as _pid")
    snap_a = (allp.filter(F.col("_pid") < N_PAGES)
              .select("url", F.col("host").alias("host_a")))
    snap_b = (allp.filter(F.col("_pid") >= lo)
              .select("url", F.col("host").alias("host_b")))
    j = snap_a.join(snap_b, "url", "full_outer")
    return (j.select(F.coalesce("host_a", "host_b").alias("host"),
                     F.col("host_a").isNull().cast("int").alias("_new"),
                     F.col("host_b").isNull().cast("int").alias("_gone"))
            .groupBy("host")
            .agg(F.sum("_new").alias("n_new"),
                 F.sum("_gone").alias("n_gone"),
                 F.sum(F.when((F.col("_new") == 0) & (F.col("_gone") == 0), 1)
                       .otherwise(0)).alias("n_kept")))


def q_bloom_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier membership via a cross-engine-exact Bloom filter:
    was this incoming URL already crawled in the previous snapshot? The
    filter (2^15 bits, k=4, Kirsch–Mitzenmacher over the shared 40-bit
    polynomial hashes) broadcasts at any corpus scale; only its passes
    need the exact seen-table re-check, so the common case (a genuinely
    new URL) never touches the 10^12-row seen set. Per host: incoming
    count, filter passes, exact seen count, false positives, and missed
    seen — the no-false-negatives guarantee pins n_missed_seen = 0 in
    the value hash.

    Scale shape: build = Arrow hash pass + bit_or groupBy bounded by the
    FILTER size; probe = Arrow hash pass + broadcast join on word + one
    per-key map-side-combinable reduction; the exact re-check join runs
    on the full incoming side here so the oracle can pin the
    false-positive count — production filters first and re-checks only
    the passes."""
    from zen3geo_spark.functions.sketch import bloom_build, bloom_probe

    n2 = N_PAGES * 6 // 5
    lo = N_PAGES // 5
    allp = synth_pages(spark, n2).selectExpr(
        "url",
        f"{URL_HOST_SQL} as host",
        f"{URL_PID_SQL} as _pid")
    seen = allp.filter(F.col("_pid") < N_PAGES).select("url")
    incoming = allp.filter(F.col("_pid") >= lo).select("url", "host")
    bloom = bloom_build(seen, "url")
    passed = bloom_probe(incoming, bloom, "url", carry=("host",))
    flagged = passed.join(seen.withColumn("_s", F.lit(1)), "url", "left")
    bp = F.col("bloom_pass")
    ts = F.col("_s").isNotNull()
    return (flagged.groupBy("host")
            .agg(F.count("*").alias("n_incoming"),
                 F.sum(bp.cast("int")).alias("n_bloom_pass"),
                 F.sum(ts.cast("int")).alias("n_true_seen"),
                 F.sum((bp & ~ts).cast("int")).alias("n_false_pos"),
                 F.sum((ts & ~bp).cast("int")).alias("n_missed_seen")))


def q_pages_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points_df(spark).withColumn(
        "cell", cell_encode(F.col("lat_us"), F.col("lon_us"), 12)
    )
    return pts.groupBy("cell").agg(F.count("*").alias("n_pages"))


# res-12 Morton grid + res-6 rollup for the z-order queries; bbox picked to
# straddle several top-level quadrant boundaries (the hard case for a
# space-filling-curve cover)
ZRES = 12
ZBBOX = (-20_000_000, -40_000_000, 5_000_000, -5_000_000)  # minlat,minlon,maxlat,maxlon


def q_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) cell encode + hierarchical rollup, pure bigint
    JVM codegen — the id layout that makes bbox scans range-prunable at
    10^12 rows (Delta OPTIMIZE ZORDER / S2 cell-range idea)."""
    pts = with_zorder(_points_df(spark), "lat_us", "lon_us", ZRES)
    return (pts.withColumn("z6", zorder_parent(F.col("z"), ZRES, 6))
            .groupBy("z6").agg(F.count("*").alias("n_pages"),
                               F.min("z").alias("z_min"),
                               F.max("z").alias("z_max")))


def q_zorder_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bbox query over a STORED z-ordered table: points written once,
    range-partitioned + sorted by Morton id (the Delta ``OPTIMIZE ZORDER``
    layout), then the bbox is compiled driver-side to <=64 contiguous
    z-ranges whose BETWEENs push to the parquet scan as row-group pruning
    — plus an exact lat/lon refine.  The oracle is the DIRECT bbox filter:
    hash equality proves the z-cover is a correct superset and the refine
    is exact.  (Filtering computed-on-the-fly z instead would make
    Catalyst inline the 5-step bit-spread into all 64 predicates — the
    stored-column layout is both the correct scale pattern and the fast
    plan.)"""
    import pathlib

    from zen3geo_spark.functions.zorder import optimize_zorder

    minlat, minlon, maxlat, maxlon = ZBBOX
    ranges = z_ranges_for_bbox(minlat, minlon, maxlat, maxlon, ZRES)
    d = pathlib.Path(__file__).resolve().parent / ".gen_assets" / f"ztable_{N_PAGES}"
    if not (d / "_SUCCESS").exists():
        pts = optimize_zorder(_points_df(spark), str(d), res=ZRES, n_files=8)
    else:
        pts = spark.read.parquet(str(d))
    return (pts.filter(z_range_predicate(F.col("z"), ranges))
            .filter((F.col("lat_us") >= minlat) & (F.col("lat_us") <= maxlat)
                    & (F.col("lon_us") >= minlon) & (F.col("lon_us") <= maxlon))
            .select("point_id", "lat_us", "lon_us"))


def q_hilbert_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True S2-style Hilbert-curve cell encode + prefix-property rollup.
    Spark side: Arrow-batched numpy kernel; oracle side: the SAME
    per-level recurrence as a DuckDB recursive CTE — cross-engine
    verification of an iterative algorithm."""
    pts = _points_df(spark).withColumn(
        "hd", hilbert_encode("lat_us", "lon_us", ZRES)
    )
    return (pts.withColumn("h6", hilbert_parent(F.col("hd"), ZRES, 6))
            .groupBy("h6").agg(F.count("*").alias("n_pages"),
                               F.min("hd").alias("hd_min"),
                               F.max("hd").alias("hd_max")))


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = points_in_polygons(_points_df(spark), _polys_df(spark), res=4,
                             broadcast_polys=True)
    return out.select("point_id", "geom_id")


def q_pip_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = points_in_polygons(_points_df(spark), _polys_df(spark), res=4,
                             salt_factor=4, broadcast_polys=True)
    return out.select("point_id", "geom_id")


def q_pip_multi_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even-odd multi-ring PIP: geometry 0 is a donut (points inside the
    inner ring are OUTSIDE the geometry), geometry 1 a two-part
    multipolygon — the OGC interior test the refine kernel implements
    for arbitrary ring sets (ray-cast crossing parity over the union of
    ring edges). Exercises the multi-ring path of _pip_refine_group that
    the single-ring fixtures never touch."""
    out = points_in_polygons(_points_df(spark), _multi_polys_df(spark),
                             res=4, broadcast_polys=True)
    return out.select("point_id", "geom_id")


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics: per-polygon aggregates over a deterministic
    micro-degree pixel grid (raster×vector reduction composed from the
    cell-keyed PIP join)."""
    from zen3geo_spark.operators.spatial_join import zonal_stats

    px = spark.range(36 * 61).selectExpr(
        "id as pixel_id",
        "cast(-15000000 + (id div 61) * 1000000 as long) as lat_us",
        "cast(-35000000 + (id % 61) * 1000000 as long) as lon_us",
        "cast((id * 7) % 97 as double) as value",
    )
    out = zonal_stats(px, _polys_df(spark), res=4, broadcast_polys=True)
    return out.select("geom_id", "n_px", "sum_val",
                      F.round("mean_val", 6).alias("mean_val"),
                      "min_val", "max_val")


def q_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points_df(spark)
    queries = pts.filter(F.col("point_id") < 30).select(
        F.col("point_id").alias("query_id"), "lat_us", "lon_us"
    )
    targets = pts.select(F.col("point_id").alias("target_id"), "lat_us", "lon_us")
    return knn_join_bruteforce(queries, targets, k=3).select(
        "query_id", "target_id", "rk", "dist2"
    )


def q_knn_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points_df(spark)
    queries = pts.filter(F.col("point_id") < 30).select(
        F.col("point_id").alias("query_id"), "lat_us", "lon_us"
    )
    targets = pts.select(F.col("point_id").alias("target_id"), "lat_us", "lon_us")
    return knn_join_cells(queries, targets, k=3, res=2).select(
        "query_id", "target_id", "rk", "dist2"
    )


def q_rasterize_world_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin every extracted page point onto a 360x180 world canvas (the
    rasterize-points kernel at web scale shape)."""
    pts = _points_df(spark)
    geoms = pts.select(
        F.col("point_id").alias("geom_id"),
        F.lit("multipoint").alias("geom_type"),
        F.array(F.array(F.struct(
            (F.col("lon_us") / 1e6).alias("x"), (F.col("lat_us") / 1e6).alias("y")
        ))).alias("parts"),
        F.lit("OGC:CRS84").alias("crs"),
    )
    canvas = spark.createDataFrame(
        [(0, 360, 180, -180.0, -90.0, 180.0, 90.0, "OGC:CRS84")],
        "canvas_id long, width int, height int, xmin double, ymin double, xmax double, ymax double, crs string",
    )
    return rasterize(canvas, geoms, validate=False).select("row", "col", "value")


def q_rasterize_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-reduction rasterize (the reference's pluggable datashader
    ``agg`` kwarg, datashader.py:49-55): mean of a per-point value per
    world-canvas pixel."""
    pts = _points_df(spark)
    geoms = pts.select(
        F.col("point_id").alias("geom_id"),
        F.lit("multipoint").alias("geom_type"),
        F.array(F.array(F.struct(
            (F.col("lon_us") / 1e6).alias("x"), (F.col("lat_us") / 1e6).alias("y")
        ))).alias("parts"),
        F.lit("OGC:CRS84").alias("crs"),
        (F.col("point_id") % 97).cast("double").alias("pval"),
    )
    canvas = spark.createDataFrame(
        [(0, 360, 180, -180.0, -90.0, 180.0, 90.0, "OGC:CRS84")],
        "canvas_id long, width int, height int, xmin double, ymin double, xmax double, ymax double, crs string",
    )
    out = rasterize(canvas, geoms, agg="mean", validate=False, value_col="pval")
    return out.select("row", "col", F.round("value", 6).alias("value"))


def q_rasterize_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Polygon=15 golden as an oracle-checked query: burn
    the fixture polygon on the 14x10 canvas (winding-number fill)."""
    canvas = canvas_rasterize(spark, n=1)
    geoms = geometries_datashader(spark).filter(F.col("geom_type") == "polygon")
    return rasterize(canvas, geoms).select("row", "col", "value")


def q_rasterize_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line=13 golden (Bresenham — rows-only check, no SQL analogue)."""
    canvas = canvas_rasterize(spark, n=1)
    geoms = geometries_datashader(spark).filter(F.col("geom_type") == "linestring")
    return rasterize(canvas, geoms).select("row", "col", "value")


def q_chip_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = scenes_meta(spark, [(0, 1, 1024, 1536), (1, 1, 1024, 1536)])
    return chip_grid(meta, 512, 512, 256, 256).select(
        "scene_id", "chip_id", "chip_y", "chip_x", "y0", "x0"
    )


def q_chip_grid_nd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-dim chipping with a BAND window (xbatcher arbitrary input_dims):
    (4 bands, 1024, 1536) scene, windows band=2/y=512/x=512, y/x overlap
    256 → 2·3·5 chips."""
    from zen3geo_spark.operators.chipper import chip_grid_nd

    meta = scenes_meta(spark, [(0, 4, 1024, 1536), (1, 4, 1024, 1536)])
    g = chip_grid_nd(meta, {"band": 2, "y": 512, "x": 512},
                     overlaps={"y": 256, "x": 256})
    return g.select("scene_id", "chip_id", "chip_band", "band0",
                    "chip_y", "y0", "chip_x", "x0")


def q_chip_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = scenes_meta(spark, [(0, 1, 128, 128)])
    px = spark.range(128 * 128).selectExpr(
        # id % 1 == 0 but is not a foldable literal: a literal scene_id
        # would constant-propagate into the meta join and cross-join it
        "cast(id % 1 as long) as scene_id",
        "cast(id % 128 as int) as x_idx",
        "cast(id div 128 as int) as y_idx",
        "1.0 as value",
    )
    chipped = assign_chips(px, meta, 64, 64)
    return chip_stats(chipped).select("scene_id", "chip_id", "n_px", "sum_val")


def q_rect_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clipper goldens as a query: two chips x two boxes → clipped bounds."""
    from zen3geo_spark.sources.fixtures import clip_boxes, raster_grid
    from zen3geo_spark.operators.clipper import chip_bounds_from_grid
    grid = raster_grid(spark)
    chips = chip_bounds_from_grid(grid, -1, 0, 1, 1, chip_id=0).unionByName(
        chip_bounds_from_grid(grid, 3, 3, 5, 4, chip_id=1)
    )
    return clip_vector_with_rectangle(clip_boxes(spark), chips).select(
        "chip_id", "geom_id", "clip_minx", "clip_miny", "clip_maxx", "clip_maxy"
    )


def q_rect_clip_reproject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-chip-CRS clip: one CRS84 chip + the same chip warped to
    EPSG:3857 (GDAL suggested-warp-output grid); vector vertices
    reprojected per chip, Sutherland–Hodgman clipped. Reprojected
    coordinates rounded to 0.1 mm (numpy vs DuckDB libm ulp)."""
    from zen3geo_spark.operators.clipper import (
        clip_vector_with_rectangle_crs, suggested_warp_grid,
    )
    from zen3geo_spark.sources.fixtures import clip_boxes

    g = suggested_warp_grid(-1.5, -0.5, 1.5, 1.5, 3, 2, "EPSG:3857")
    chips = spark.createDataFrame(
        [(0, -1.5, -0.5, 1.5, 1.5, "OGC:CRS84"),
         (1, g[0], g[1], g[2], g[3], "EPSG:3857")],
        "chip_id long, xmin double, ymin double, xmax double, ymax double, crs string",
    )
    out = clip_vector_with_rectangle_crs(clip_boxes(spark), chips)
    # + 0.0 normalizes IEEE negative zero (round(-5e-10, 4) → -0.0)
    return out.select(
        "chip_id", "geom_id", "crs",
        (F.round("clip_minx", 4) + 0.0).alias("clip_minx"),
        (F.round("clip_miny", 4) + 0.0).alias("clip_miny"),
        (F.round("clip_maxx", 4) + 0.0).alias("clip_maxx"),
        (F.round("clip_maxy", 4) + 0.0).alias("clip_maxy"),
    )


def q_mosaic(spark: SparkSession, sf_dir: str) -> DataFrame:
    cube = datacube_for_mosaic(spark, nodata_variant=True)
    return mosaic_first_valid(cube, order_col="tile", nodata=0.0).select(
        "band", "y_idx", "x_idx", "value", "src"
    )


def q_mosaic_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental mosaic maintenance: when a NEW scene lands, the
    first-valid mosaic updates by merging the EXISTING mosaic (its src
    tile carried as the order key) with only the new scene's pixels —
    cost |mosaic| + |new scene| rows, never the whole stack. Exactly
    equals the full recompute by min_by associativity (the oracle IS
    the full 3-tile recompute)."""
    cube = datacube_for_mosaic(spark, nodata_variant=True)
    old = mosaic_first_valid(cube.filter(F.col("tile") < 2),
                             order_col="tile", nodata=0.0)
    new_scene = cube.filter(F.col("tile") == 2)
    merged = (old.select("band", "y_idx", "x_idx",
                         F.col("src").alias("tile"), "value")
              .unionByName(new_scene.select(
                  "band", "y_idx", "x_idx", "tile", "value")))
    return mosaic_first_valid(merged, order_col="tile", nodata=0.0).select(
        "band", "y_idx", "x_idx", "value", "src")


def q_stac_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = stac_items(spark, 50)
    s = search(items, bbox=(-60, -40, 40, 40),
               datetime_range=("2022-01-01", "2022-02-01"),
               collections=["sentinel-2-l2a", "landsat-c2-l2"])
    return s.groupBy("collection").agg(F.count("*").alias("n_items"))


def q_stac_item_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PySTACItemReader surface: item metadata scan + field projection
    incl. map-typed properties/assets access."""
    from zen3geo_spark.operators.stac import list_items

    items = list_items(stac_items(spark, 50))
    return items.select(
        "item_id", "collection", "dt", "minx", "miny", "maxx", "maxy",
        F.col("properties")["platform"].alias("platform"),
        F.size("assets").alias("n_assets"),
    )


def q_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collator: positional zip of docs+embeddings collated into a wide
    training record with renamed value columns."""
    from zen3geo_spark.operators.combinators import collator

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 100).select("doc_id", "n_chars"))
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .filter(F.col("vec_id") < 100).select("vec_id", "label"))
    z = zipper(docs, emb, ["doc_id"], ["vec_id"])
    return collator(z, {"sample_id": "doc_id", "target": "label",
                        "feature_len": "n_chars"}).select(
        "sample_id", "vec_id", "target", "feature_len")


def q_forked_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forker: one cached source feeding two branch aggregations, joined
    back (the reference's fork-consume-twice pipelines)."""
    from zen3geo_spark.operators.combinators import forker

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a, b = forker(docs, 2)
    counts = a.groupBy("source").agg(F.count("*").alias("n_docs"))
    sizes = b.groupBy("source").agg(
        F.round(F.avg("n_chars"), 6).alias("avg_chars"))
    return counts.join(sizes, "source").select(
        "source", "n_docs", "avg_chars")


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distinct-count sketch (K-minimum-values over the
    shared polynomial hash): estimated distinct 2-gram shingles per
    source — unlike HLL, the sketch itself hash-matches across engines.
    Runs the fused kernel (shingle+hash+batch-dedup in one Arrow pass;
    no string ever shuffles)."""
    from zen3geo_spark.operators.dedup import kmv_distinct_shingles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = kmv_distinct_shingles(docs, "source", "text", shingle_n=2, k=64)
    return out.select(F.col("key").alias("source"), "n_kept",
                      F.round("est_distinct", 6).alias("est_distinct"))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup_exact(docs).select("fp", "keep_id", "n_dups")


def q_token_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(quality_score(F.col("text")), 6).alias("quality"),
        fingerprint(F.col("text")).alias("fp"),
    )


WORD_JACCARD_MAX_DF = 0.06  # blocking tokens must appear in <= 6% of docs


def q_word_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-level (1-gram) Jaccard near-dup pairs above 0.5 over ALL docs:
    candidates blocked on shared sub-6%-document-frequency tokens (the
    stop-token prefilter — this corpus' ~30-word vocabulary makes the
    common tokens quadratic blocking keys), then exact full-set Jaccard
    verification. The df filter is mirrored in the oracle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ngram_jaccard(docs, shingle_n=1, threshold=0.5,
                        max_df_frac=WORD_JACCARD_MAX_DF)
    return out.select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_candidates(docs, num_hashes=8, bands=4, shingle_n=2)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_near_dups(docs, max_hamming=8, shingle_n=2)


def q_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_bruteforce(q, emb, k=3).select("query_id", "target_id", "rk")


def q_ann_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized coarse ANN pass: scalar-quantize (floor(v·2^8),
    clamped) then rank by exact integer dot product — 4× less scan/
    shuffle than float32 at 100 TB, and bit-reproducible on any cluster
    size because scores are int64, not floats."""
    from zen3geo_spark.operators.similarity import int8_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return int8_topk(q, emb, k=3)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_lsh(q, emb, k=3, dim=64, n_tables=6).select(
        "query_id", "target_id", "rk"
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("event_type"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_segment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


def q_unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained unigram-LM perplexity quality score per document
    (the CCNet-style perplexity-filter shape)."""
    from zen3geo_spark.functions.text import unigram_logppl

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = unigram_logppl(docs)
    return out.select("doc", F.round("logppl", 6).alias("logppl"))


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): per doc, the mean
    log ratio of a Laplace-smoothed target unigram LM (target slice =
    sources src0-src3) over the corpus source LM — resampling
    proportional to the weight concentrates the corpus on the target's
    token mix. One explode feeds both LMs; scalars ride constant-key
    broadcasts; all JVM."""
    from zen3geo_spark.functions.text import dsir_importance

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dsir_importance(
        docs, F.col("source").isin("src0", "src1", "src2", "src3"))
    return out.select("doc", "n_toks",
                      F.round("log_importance", 6).alias("log_importance"))


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-token estimate per source (Flajolet et al.
    2007) audited against the exact count. The register table (1024
    max-rank cells per group, merged with max — map-side combinable at
    any corpus size) is cross-engine exact, and the harmonic sum is a
    sum of dyadic rationals that IEEE doubles represent exactly, so only
    the linear-counting ln() touches libm (round-6 both sides)."""
    from zen3geo_spark.functions.sketch import hll_estimate, hll_registers

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = (docs.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"))
        .filter(F.col("tok") != ""))
    est = hll_estimate(hll_registers(toks, "tok", ("source",)), ("source",))
    exact = toks.groupBy("source").agg(
        F.countDistinct("tok").alias("true_distinct"))
    return (est.join(exact, "source")
            .select("source",
                    F.round("est_distinct", 6).alias("est_distinct"),
                    "true_distinct", "registers_hit"))


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-length p50/p90/p99 per language from the HDR-style log-linear
    quantile sketch — the percentile-threshold derivation a quality
    filter runs at corpus scale where sorting is impossible. Bucketing
    and rank walk are all-integer (length(bin), shifts, ceil-div), so
    the returned [est_lo, est_hi] bucket is cross-engine exact; the
    windows run over the bounded sketch, never the data."""
    from zen3geo_spark.functions.sketch import (
        qsketch_build, qsketch_quantiles,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sk = qsketch_build(docs, "n_chars", ("lang",))
    return (qsketch_quantiles(sk, (50, 90, 99), ("lang",))
            .select("lang", "q_pct", "n", "est_lo", "est_hi"))


def q_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a spherical-kmeans-trained codebook (2 Lloyd rounds)
    — hash-checked against a driver-built per-round SQL twin of the
    Lloyd recurrence (plus recall vs brute force in pytest)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return cosine_topk_ivf(q, emb, k=3, n_lists=16, n_probe=6,
                           train_iters=2).select(
        "query_id", "target_id", "rk")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs above 0.4: exact block-matrix
    decomposition (NumPy matmul per block pair, no join — replaces the
    all-pairs nested-loop baseline with identical output)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = cosine_near_dup_pairs_blocked(emb, threshold=0.4)
    return out.select("a_id", "b_id", F.round("cos", 6).alias("cos"))


def q_canvas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XarrayCanvas semantics: grid → canvas spec (pixel-edge bounds)."""
    return canvas_from_grid(raster_grid(spark)).select(
        "canvas_id", "width", "height", "xmin", "ymin", "xmax", "ymax", "crs"
    )


def _item_tiles(spark: SparkSession) -> list[DataFrame]:
    """Three synthetic items, two bands each, offset 16x16 grids at 2.0
    resolution; item 0 has a nodata (0.0) strip so mosaic falls through."""
    tiles = []
    for item in range(3):
        t = (
            spark.range(256)
            .selectExpr(
                f"cast({item} as int) as time",
                "cast(id % 16 as int) as xi",
                "cast(id div 16 as int) as yi",
            )
            .selectExpr("time", "explode(array('vv', 'vh')) as band", "xi", "yi")
            .selectExpr(
                "time", "band",
                f"cast(xi * 2.0 + {item} * 4.0 as double) as x",
                "cast(30.0 - yi * 2.0 as double) as y",
                "case when time = 0 and yi < 4 then 0.0 "
                "else cast(time * 1000 + yi * 16 + xi as double) end as value",
            )
        )
        tiles.append(t)
    return tiles


def q_stack_mosaic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StackSTACStacker + Mosaicker: union per-item tiles, select the 'vv'
    asset, clip to bounds, snap to a common 2.0-res grid, then first-valid
    mosaic along time with nodata=0."""
    cube = stack(_item_tiles(spark), assets=["vv"],
                 bounds=(0.0, 0.0, 40.0, 30.0), xmin=0.0, ymax=30.0, res=2.0)
    return mosaic_first_valid(cube, order_col="time", nodata=0.0).select(
        "band", "y_idx", "x_idx", "value", "src"
    )


def q_stack_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StackSTAC resampling kwarg: bilinear 2x upsample of a 16x16 tile
    (res 2 → res 1) — dyadic-exact weights make the cross-engine float
    compare safe."""
    src = spark.range(256).selectExpr(
        "cast(0 as int) as time", "'vv' as band",
        "cast((id % 16) * 2.0 + 1.0 as double) as x",
        "cast(31.0 - (id div 16) * 2.0 as double) as y",
        "cast((id div 16) * 16 + id % 16 as double) as value",
    )
    cube = stack([src], res=1.0, xmin=0.0, ymax=32.0, resampling="bilinear",
                 src_grid=(0.0, 32.0, 2.0), dst_size=(32, 32))
    return cube.select("time", "band", "y_idx", "x_idx",
                       F.round("value", 6).alias("value"))


def q_stack_cast_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StackSTAC kwargs dtype= / fill_value= / xy_coords= (reference
    stackstac.py:106-126, docs/stacking.md:244-251): a 4x4 source block in
    an 8x8 bounds lattice — uncovered positions densify to fill_value,
    values cast through float32, centroid coordinate labels attached."""
    src = spark.range(16).selectExpr(
        "cast(0 as int) as time", "'vv' as band",
        "cast((id % 4) * 2.0 + 1.0 as double) as x",
        "cast(15.0 - (id div 4) * 2.0 as double) as y",
        "cast(id * 3 as double) as value",
    )
    cube = stack([src], assets=["vv"], bounds=(0.0, 0.0, 16.0, 16.0),
                 xmin=0.0, ymax=16.0, res=2.0, fill_value=-1.0,
                 dtype="float32", xy_coords="center")
    return cube.select(
        "time", "band", "y_idx", "x_idx",
        F.col("value").cast("double").alias("value"),
        "x_coord", "y_coord")


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, 300)
    return frame_sample(media, every_ms=700).select(
        "media_id", F.col("frame_ms").cast("int").alias("frame_ms")
    )


def q_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode (netpbm P6 PPM parsed with NumPy) → nearest-
    neighbor resize → per-image stats; the deterministic pixel formula is
    recomputed by the DuckDB oracle."""
    media = synth_media(spark, 300)
    dec = decode_image(media, out_h=4, out_w=4)
    return image_stats(dec).select(
        "media_id", F.round("mean_px", 6).alias("mean_px"), "min_px", "max_px"
    )


def q_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode (RIFF/WAVE PCM16 chunk walker, NumPy-only) →
    per-clip features: sample count, mean amplitude, RMS, peak, zero
    crossings. All features are exact (int16 samples ⇒ integer sums
    representable in float64), so the DuckDB oracle recomputes them
    bit-identically from the deterministic sample formula."""
    media = synth_media(spark, 300)
    return decode_audio(media)


def q_batcher(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    b = batcher(docs, batch_size=64, order=["doc_id"])
    return b.groupBy("batch_id").agg(
        F.count("*").alias("n"),
        F.min("doc_id").alias("first_id"),
        F.max("doc_id").alias("last_id"),
    )


def q_zipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 100).select("doc_id", "n_chars"))
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .filter(F.col("vec_id") < 100).select("vec_id", "label"))
    return zipper(docs, emb, ["doc_id"], ["vec_id"]).select(
        "doc_id", "n_chars", "vec_id", "label"
    )


def _tiles_table(spark: SparkSession) -> DataFrame:
    """Synthetic raster tile table with a COG-style pyramid ``level``
    column (RioXarrayReader's overview_level ≙ partition-column filter,
    reference rioxarray.py:70-74, docs/walkthrough.md:142)."""
    return spark.range(3 * 2 * 16 * 16).selectExpr(
        "cast(id % 16 as int) as x_idx",
        "cast((id div 16) % 16 as int) as y_idx",
        "cast((id div 256) % 2 as int) as band",
        "cast(id div 512 as int) as level",
        "cast(id % 97 as double) as value",
    )


def q_tile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster scan with pyramid-level + band pruning → per-band stats
    (the RioXarrayReader overview_level semantics)."""
    tiles = _tiles_table(spark)
    # same predicate shape sources.raster.scan_tiles pushes onto a
    # parquet tile table (level/band are partition columns there)
    pruned = tiles.filter((F.col("level") == 1) & F.col("band").isin([0]))
    return pruned.groupBy("band").agg(
        F.count("*").alias("n_px"),
        F.round(F.sum("value"), 4).alias("sum_val"),
        F.max("x_idx").alias("max_x"),
    )


def q_vector_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector scan with bbox predicate pruning (PyogrioReader + the
    denormalized-bbox GeoParquet layout, SURVEY.md §1 row 5)."""
    geoms = spark.range(500).selectExpr(
        "id as geom_id",
        "cast(-170 + (id * 7 % 340) as double) as minx",
        "cast(-80 + (id * 11 % 160) as double) as miny",
        "cast(-170 + (id * 7 % 340) + 5 as double) as maxx",
        "cast(-80 + (id * 11 % 160) + 4 as double) as maxy",
    )
    qxmin, qymin, qxmax, qymax = -30.0, -20.0, 40.0, 35.0
    hit = geoms.filter(
        (F.col("minx") < qxmax) & (F.col("maxx") > qxmin)
        & (F.col("miny") < qymax) & (F.col("maxy") > qymin)
    )
    return hit.select("geom_id", "minx", "miny", "maxx", "maxy")


def q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash (winnowing) document fingerprints: one row per
    (doc_id, fingerprint)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp_udf = winnow_fingerprints_pd(k=8, w=4)
    return docs.select("doc_id", F.explode(fp_udf(F.col("text"))).alias("fp"))


def q_overviews(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution pyramid build (COG overviews / DataTree
    hierarchy): level L+1 = 2x2-block average of level L. Integer-valued
    base pixels make avg-of-avgs dyadic-exact on both engines."""
    base = spark.range(1024).selectExpr(
        "cast(0 as int) as band",
        "cast(id div 32 as int) as y_idx",
        "cast(id % 32 as int) as x_idx",
        "cast((id * 7) % 97 as double) as value",
    )
    return build_overviews(base, levels=2).select(
        "level", "band", "y_idx", "x_idx", "value")


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (inverted lists by nearest centroid, n_probe
    probes); hash-checked against a full SQL twin (deterministic seed
    centroids + cosine-argmax assignment + probe ranking)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return cosine_topk_ivf(q, emb, k=3, n_lists=16, n_probe=6).select(
        "query_id", "target_id", "rk")


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data cleaning shape: exact-dup keep-list ∘
    language filter ∘ quality threshold → surviving docs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keep = dedup_exact(docs).select("keep_id", "n_dups")
    return (
        docs.join(keep, docs["doc_id"] == keep["keep_id"])
        .filter(lang_id(F.col("text")) == "en")
        .filter(quality_score(F.col("text")) >= 0.5)
        .select("doc_id", F.round(quality_score(F.col("text")), 6).alias("quality"),
                "n_dups")
    )


def q_raster_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Mapper per-pixel transforms from the reference's documented
    pipelines: linear→decibel with zero masking and longitude shift."""
    from zen3geo_spark.functions.raster_math import (
        linear_to_decibel, shift_longitude,
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        "event_id",
        F.round(linear_to_decibel(F.col("value")), 6).alias("db"),
        F.round(shift_longitude(F.col("value") * 3.7), 6).alias("lon_shifted"),
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: simhash pairs → connected components →
    (doc, component) with component = min doc id in the group (the keep
    list for group-level dedup). Iterative min-label propagation with
    pointer jumping; oracle is the recursive-CTE reachability closure."""
    from zen3geo_spark.operators.dedup import connected_components

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = simhash_near_dups(docs, max_hamming=8, shingle_n=2).select("a_id", "b_id")
    comp = connected_components(
        pairs, nodes=docs.select(F.col("doc_id").alias("node")))
    return comp.select("node", "component")


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup retention: simhash near-dup clusters → keep
    the HIGHEST-quality member per component (ties → lowest doc id) —
    the retention policy production dedup applies, vs the min-id keep
    list of dedup_clusters."""
    from zen3geo_spark.operators.dedup import (
        cluster_keep_best, connected_components,
    )
    from zen3geo_spark.functions.text import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = simhash_near_dups(docs, max_hamming=8, shingle_n=2).select(
        "a_id", "b_id")
    comp = connected_components(
        pairs, nodes=docs.select(F.col("doc_id").alias("node")))
    scores = docs.select(F.col("doc_id").alias("node"),
                         quality_score(F.col("text")).alias("score"))
    out = cluster_keep_best(comp.select("node", "component"), scores)
    return out.select("component", F.col("node").alias("doc_id"),
                      F.round("score", 6).alias("score"))


def q_adaptive_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language adaptive quality filter: each language's own p25
    quality score becomes its cut (CCNet-style per-bucket thresholds —
    a single global cut over- or under-prunes low-resource languages).
    The threshold is a POSITIONAL pick (the value at floor((n-1)/4) in
    (score, doc_id) order), so both engines choose an existing score —
    deterministic, no interpolation. Rollup output: per language the
    corpus count, kept count and the threshold.

    Scale shape: two window passes over the same (lang) partitioning —
    one shuffle, reused — then a map-side-combinable rollup; language
    cardinality is tiny so the thresholds could equally broadcast."""
    from zen3geo_spark.functions.text import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = docs.select("doc_id", "lang",
                         quality_score(F.col("text")).alias("score"))
    w = Window.partitionBy("lang").orderBy(
        F.col("score").asc(), F.col("doc_id").asc())
    wn = Window.partitionBy("lang")
    ranked = scored.select(
        "lang", "score",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"))
    thr = (ranked
           .filter(F.expr("rn = ((n - 1) div 4) + 1"))
           .select("lang", F.col("score").alias("thr")))
    return (scored.join(thr, "lang")
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum((F.col("score") >= F.col("thr")).cast("int"))
                 .alias("n_kept"),
                 F.round(F.min("thr"), 6).alias("p25_thr")))


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split: the split key is the CONTENT
    fingerprint (md5 of normalized text), not the doc id, so exact
    duplicates can never straddle the held-out boundary — the
    decontamination-aware split discipline. Bucket = shared 40-bit
    polynomial hash of the fingerprint mod 100; < 90 → train. Rollup:
    per (source, split) doc and distinct-content counts."""
    from zen3geo_spark.operators.dedup import gram_hash40
    from zen3geo_spark.functions.text import fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = docs.select("doc_id", "source",
                     fingerprint(F.col("text")).alias("fp"))
    split = fp.withColumn(
        "split",
        F.when(F.pmod(gram_hash40(F.col("fp")), F.lit(100)) < 90,
               F.lit("train")).otherwise(F.lit("val")))
    return split.groupBy("source", "split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fp").alias("n_contents"))


def q_geo_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-based geolocation backfill: pages WITHOUT a well-formed
    geotag inherit their host's modal res-4 cell, learned from the
    host's tagged pages (tie-break: count desc, cell asc) — the
    coverage-raising enrichment every geo pipeline runs over web text.
    The host→modal-cell map is host-cardinality and broadcast; the
    untagged corpus joins it without shuffling. Output: backfilled
    pages per inherited cell."""
    pages = synth_pages(spark, N_PAGES)
    lat_s, lon_s = extract_first_geotag(F.col("text"))
    base = pages.select(
        F.expr(URL_HOST_SQL).alias("host"),
        lat_s.alias("lat_str"), lon_s.alias("lon_str"))
    tagged = (base.filter(F.col("lat_str") != "")
              .select("host",
                      cell_encode(micro_from_str(F.col("lat_str")),
                                  micro_from_str(F.col("lon_str")), 4)
                      .alias("cell")))
    per = tagged.groupBy("host", "cell").agg(F.count("*").alias("n"))
    w = Window.partitionBy("host").orderBy(
        F.col("n").desc(), F.col("cell").asc())
    modal = (per.withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") == 1).select("host", "cell"))
    untagged = base.filter(F.col("lat_str") == "").select("host")
    return (untagged.join(F.broadcast(modal), "host")
            .groupBy("cell").agg(F.count("*").alias("n_backfilled")))


def q_recrawl_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host recrawl cadence: the gap (seconds) between consecutive
    geotagged snapshots of each host — min/max/lower-median per host,
    all integer so the cross-engine compare is exact (lower median =
    the (n+1) div 2-th ordered gap, ties broken by snapshot id; no FP
    percentile interpolation). The crawl-scheduling input: hosts whose
    cadence stretched are due for refetch. Windows are per-host
    (bounded by a host's snapshot count), the per-host stats table is
    host-cardinality and broadcasts."""
    pts = _points_df(spark).select(
        F.pmod(F.col("point_id"), F.lit(1000)).alias("host_id"),
        F.col("point_id").alias("pid"))
    w = Window.partitionBy("host_id").orderBy("pid")
    gaps = (pts.withColumn("gap", F.col("pid") - F.lag("pid").over(w))
            .filter(F.col("gap").isNotNull()))
    stats = gaps.groupBy("host_id").agg(
        F.count("*").alias("n_gaps"),
        F.min("gap").alias("min_gap"),
        F.max("gap").alias("max_gap"))
    wg = Window.partitionBy("host_id").orderBy("gap", "pid")
    med = (gaps.withColumn("rn", F.row_number().over(wg))
           .join(F.broadcast(stats.select("host_id", "n_gaps")), "host_id")
           .filter(F.col("rn") == F.expr("(n_gaps + 1) div 2"))
           .select("host_id", F.col("gap").alias("med_gap")))
    return stats.join(med, "host_id").select(
        "host_id", "n_gaps", "min_gap", "max_gap", "med_gap")


def q_compact_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3-style ``compact_cells`` over the crawl's res-5 coverage mask:
    complete sibling quads promote to their parent recursively (the
    cell-SET maintenance that keeps 10^12-row coverage masks storable).
    Closed-form plan — one bounded level explode + one (level,
    ancestor) count + a min-level pick — no bottom-up iteration; the
    completeness-monotonicity argument is in operators/cells.py."""
    from zen3geo_spark.operators.cells import compact_cells

    cells = _points_df(spark).select(
        cell_encode(F.col("lat_us"), F.col("lon_us"), 5).alias("cell"))
    return compact_cells(cells, res=5, min_res=2)


def q_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``uncompact(compact(S)) == S`` — the inverse pair run end-to-end
    on the same coverage mask; the oracle is the ORIGINAL distinct cell
    set, so a hash match proves the round-trip is the identity (the
    invariant h3.uncompact_cells pins)."""
    from zen3geo_spark.operators.cells import compact_cells, uncompact_cells

    cells = _points_df(spark).select(
        cell_encode(F.col("lat_us"), F.col("lon_us"), 5).alias("cell"))
    comp = compact_cells(cells, res=5, min_res=2)
    return uncompact_cells(comp, res=5).distinct()


def q_grid_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid DBSCAN over the page points: res-6 cells holding >= 2 pages
    are core; clusters = 8-neighbor connected components (lon wraps,
    lat clamps — cell_neighbors ring semantics); label = min cell id.
    Candidate edges via bounded ring explode + equi-join (never a
    distance cross-join); components via the contraction +
    pointer-jumping CC. Oracle: recursive-CTE reachability over the
    same integer adjacency."""
    from zen3geo_spark.operators.cells import grid_dbscan

    return grid_dbscan(_points_df(spark), res=6, min_pts=2)


def q_polygon_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2-RegionCoverer analogue: per-polygon compacted cell cover at
    res 8 (min_res 3) — candidate cells from two bounded sequence
    explodes over the bbox, center-in-polygon by ray-cast parity
    against the broadcast edge list (all JVM), then the grouped
    closed-form compact. The multi-resolution cover is what a 10^12-row
    PIP prefilter stores instead of a flat fine-res cell list."""
    from zen3geo_spark.operators.cells import cover_polygon_cells

    edges = spark.sql("select * from " + _edges_values())
    return cover_polygon_cells(_polys_df(spark), edges, res=8, min_res=3)


def q_crawl_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host geo mobility matrix: consecutive geotagged snapshots of
    a host ordered by crawl time → (from_cell, to_cell) transition
    counts at res 4 (+ distinct hosts per transition) — the Markov
    transition rollup impossible-travel and recrawl planners consume.
    The lag window is per-host (bounded by a host's snapshot count);
    the output is cell-pair-cardinality."""
    pages = synth_pages(spark, N_PAGES)
    lat_s, lon_s = extract_first_geotag(F.col("text"))
    base = (pages.select(F.expr(URL_HOST_SQL).alias("host"),
                         F.expr(URL_PID_SQL).alias("pid"),
                         lat_s.alias("lat_str"), lon_s.alias("lon_str"))
            .filter(F.col("lat_str") != ""))
    pts = base.select(
        "host", "pid",
        cell_encode(micro_from_str(F.col("lat_str")),
                    micro_from_str(F.col("lon_str")), 4).alias("cell"))
    w = Window.partitionBy("host").orderBy("pid")
    tr = pts.withColumn("from_cell", F.lag("cell").over(w)).filter(
        F.col("from_cell").isNotNull())
    return (tr.groupBy("from_cell", F.col("cell").alias("to_cell"))
            .agg(F.count("*").alias("n_hops"),
                 F.countDistinct("host").alias("n_hosts")))


def q_trajectory_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory supercover: per-host consecutive-snapshot segments →
    every res-5 cell each segment touches (closed-form integer
    rect-line test, no DDA walk) → per-cell segment counts — the
    line-geometry sibling of cell_encode (points) and polygon_cover
    (areas), i.e. road/trajectory coverage at web scale."""
    from zen3geo_spark.operators.cells import cover_segment_cells

    pages = synth_pages(spark, N_PAGES)
    lat_s, lon_s = extract_first_geotag(F.col("text"))
    base = (pages.select(F.expr(URL_HOST_SQL).alias("host"),
                         F.expr(URL_PID_SQL).alias("pid"),
                         lat_s.alias("lat_str"), lon_s.alias("lon_str"))
            .filter(F.col("lat_str") != "")
            .select("host", "pid",
                    micro_from_str(F.col("lat_str")).alias("lat_us"),
                    micro_from_str(F.col("lon_str")).alias("lon_us")))
    w = Window.partitionBy("host").orderBy("pid")
    segs = (base
            .withColumn("x1", F.lag("lon_us").over(w))
            .withColumn("y1", F.lag("lat_us").over(w))
            .filter(F.col("x1").isNotNull())
            .select(F.col("pid").alias("seg_id"), "x1", "y1",
                    F.col("lon_us").alias("x2"), F.col("lat_us").alias("y2")))
    cover = cover_segment_cells(segs, res=5)
    return cover.groupBy("cell").agg(F.count("*").alias("n_segments"))


def q_disk_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence/serving-area cover: every res-6 cell whose rectangle
    intersects the 5°-radius planar disk around each of the first 30
    page points — exact bigint point-to-rect distance, bbox-bounded
    candidates (the disk sibling of polygon_cover / trajectory_cover;
    pair with the haversine refine for metric radii)."""
    from zen3geo_spark.operators.cells import cover_disk_cells

    pts = _points_df(spark).filter(F.col("point_id") < 30)
    return cover_disk_cells(pts, radius_us=5_000_000, res=6)


def q_coverage_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage set-algebra between crawl epochs: res-5 cells reached
    by the ODD-id half of the crawl but not the EVEN half (left
    anti-join of the raw cell sets), COMPACTED — the added-coverage
    report a recrawl planner reads. Mixed-res output keeps the report
    polylog-sized however large the grid."""
    from zen3geo_spark.operators.cells import compact_cells

    # one extraction pass feeds both epoch branches (the regexp parse
    # dominates; without the plan cut each branch re-runs it)
    cells = (_points_df(spark)
             .select((F.col("point_id") % 2).alias("epoch"),
                     cell_encode(F.col("lat_us"), F.col("lon_us"), 5)
                     .alias("cell"))
             .localCheckpoint(eager=False))
    even = cells.filter(F.col("epoch") == 0).select("cell").distinct()
    odd = cells.filter(F.col("epoch") == 1).select("cell").distinct()
    added = odd.join(even, "cell", "left_anti")
    return compact_cells(added, res=5, min_res=2)


def q_cover_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup onto a compacted cover: page counts per
    MEMBER of the even-epoch compacted cover (members are an antichain,
    so each page matches at most one member via its bounded ancestor
    chain — an equi-join on (level, ancestor), never a range probe).
    The hypertable-rollup shape: aggregate onto a mixed-res index."""
    from zen3geo_spark.operators.cells import compact_cells

    res, min_res = 5, 2
    pts = (_points_df(spark)
           .withColumn("cell",
                       cell_encode(F.col("lat_us"), F.col("lon_us"), res))
           .localCheckpoint(eager=False))  # extract once, feed both uses
    cover = compact_cells(
        pts.filter(F.col("point_id") % 2 == 0).select("cell"),
        res=res, min_res=min_res)
    anc = [F.struct(F.lit(lvl).alias("cell_res"),
                    cell_parent(F.col("cell"), res, lvl).alias("member"))
           for lvl in range(min_res, res + 1)]
    chain = pts.select(
        "point_id", F.explode(F.array(*anc)).alias("a")).select(
        "point_id", F.col("a.cell_res").alias("cell_res"),
        F.col("a.member").alias("member"))
    j = chain.join(cover.withColumnRenamed("cell", "member"),
                   ["member", "cell_res"])
    return (j.groupBy(F.col("member").alias("cell"), "cell_res")
            .agg(F.count("*").alias("n_pages")))


def q_str_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STR (Sort-Tile-Recursive) leaf packing of the page points — the
    bulk-load packing shapely.STRtree uses (the reference PIP path per
    the north_star), built as the spatial PARTITIONER: x-rank via the
    scale-safe zipWithIndex pattern (never a global Window), bounded
    per-strip y-rank, leaf bbox directory out. Total order ties break
    on point id in both engines."""
    from zen3geo_spark.operators.spatial_join import str_pack_points

    return str_pack_points(_points_df(spark), leaf_cap=64)


INTERVALS_N = 300


def _intervals_df(spark: SparkSession) -> DataFrame:
    """Deterministic maintenance-window intervals over the events month:
    start = 2024-01-01 + k*8640 s, length = 2400 + (k%5)*1200 s —
    consecutive intervals overlap when the length exceeds the stride,
    so containment (not as-of) semantics are actually exercised."""
    return spark.range(INTERVALS_N).selectExpr(
        "id as interval_id",
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*8640)"
        " as start_ts",
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,"
        "id*8640 + 2400 + (id % 5)*1200) as end_ts")


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-containment join (the brief's 'range join'): events ⋈
    intervals on start <= ts < end via the bucketized equi-join plan
    (intervals explode to their epoch buckets — bounded fan-out — and
    the exact refine runs in codegen; never a nested-loop theta join).
    Oracle = the direct theta join, so the hash proves the bucket
    decomposition is exact. Output: per-interval event count + value
    sum."""
    from zen3geo_spark.operators.temporal import interval_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    j = interval_join(ev, _intervals_df(spark), bucket_secs=3600)
    return (j.groupBy("interval_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value")))


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING (Sennrich/Gage), distributed: one
    corpus-sized word-count aggregate, then every merge round runs on
    the Heaps-bounded VOCABULARY table — pair counts weighted by word
    frequency, 1-row argmax collect, literal double-delimiter replace
    (greedy non-overlapping merge, exact reference semantics). Output =
    the 12-merge list a tokenizer ships; oracle = the same recurrence
    unrolled as chained DuckDB CTEs."""
    from zen3geo_spark.functions.bpe import bpe_train, word_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_train(word_counts(docs), n_merges=12)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE: learn the 12-merge list, apply it in rank order to
    the vocabulary (the tokenize step), emit corpus token frequencies.
    The oracle re-derives the merges through the same chained CTEs, so
    a hash match re-verifies training AND application."""
    from zen3geo_spark.functions.bpe import (
        bpe_encode_token_counts, bpe_train, word_counts,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = word_counts(docs).localCheckpoint(eager=False)
    merges = [(r.pair_a, r.pair_b)
              for r in bpe_train(words, n_merges=12).collect()]
    return bpe_encode_token_counts(words, merges)


def q_moran_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I of crawl density over the full res-4 lattice
    (8-neighbor weights, lon wrap / lat clamp) — exact scaled-integer
    arithmetic, so the autocorrelation statistic itself is value-hash
    checkable (no FP summation order)."""
    from zen3geo_spark.operators.cells import moran_i

    return moran_i(_points_df(spark), res=4)


def q_local_moran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISA hot/cold-spot map: per-cell local Moran numerator + quadrant
    (HH/LL core, HL/LH outlier) over res-4 crawl density — same scaled
    integer residuals as moran_i, so the cluster map is hash-exact."""
    from zen3geo_spark.operators.cells import local_moran

    return local_moran(_points_df(spark), res=4)


def q_snapshot_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style PARTITION PRUNING on a stored table: pages written
    once partitioned by snapshot stripe (pid % 10 — the crawl-epoch
    layout a 10^12-row table ships with), then a two-stripe read whose
    filter prunes 8/10 partition directories at PLANNING time
    (PartitionFilters in the scan, plan-gated in test_plans) — the
    directory-level sibling of zorder_range_scan's row-group pruning.
    Output: per-cell counts inside the two snapshots."""
    import pathlib

    d = pathlib.Path(__file__).resolve().parent / ".gen_assets" / \
        f"pages_by_snap_{N_PAGES}"
    if not (d / "_SUCCESS").exists():
        pages = synth_pages(spark, N_PAGES)
        lat_s, lon_s = extract_first_geotag(F.col("text"))
        (pages.select(F.expr(URL_PID_SQL).alias("pid"),
                      lat_s.alias("lat_str"), lon_s.alias("lon_str"))
         .withColumn("snap", F.col("pid") % 10)
         .write.mode("overwrite").partitionBy("snap").parquet(str(d)))
    pts = (spark.read.parquet(str(d))
           .filter(F.col("snap").isin(3, 7))
           .filter(F.col("lat_str") != "")
           .select(F.col("snap").cast("long").alias("snap"),
                   cell_encode(micro_from_str(F.col("lat_str")),
                               micro_from_str(F.col("lon_str")), 4)
                   .alias("cell")))
    return (pts.groupBy("snap", "cell")
            .agg(F.count("*").alias("n_pages")))


def q_cell_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell language diversity: Simpson index (1 − Σp_i²) as the
    exact integer ``(n² − Σn_i²)·10⁴ div n²`` — no logs, no FP — plus
    the dominant language (count desc, lang asc). The geo×text mix
    audit a multilingual corpus builder reads per region."""
    pages = synth_pages(spark, N_PAGES)
    lat_s, lon_s = extract_first_geotag(F.col("text"))
    pts = (pages.select("lang", lat_s.alias("lat_str"),
                        lon_s.alias("lon_str"))
           .filter(F.col("lat_str") != "")
           .select("lang",
                   cell_encode(micro_from_str(F.col("lat_str")),
                               micro_from_str(F.col("lon_str")), 4)
                   .alias("cell")))
    per = pts.groupBy("cell", "lang").agg(F.count("*").alias("ni"))
    w = Window.partitionBy("cell").orderBy(F.col("ni").desc(),
                                           F.col("lang").asc())
    agg = (per.withColumn("rk", F.row_number().over(w))
           .groupBy("cell")
           .agg(F.sum("ni").alias("n"),
                F.sum(F.col("ni") * F.col("ni")).alias("sq"),
                F.max(F.when(F.col("rk") == 1, F.col("lang")))
                .alias("top_lang")))
    return agg.select(
        "cell", "n", "top_lang",
        F.expr("(n * n - sq) * 10000 div (n * n)").alias("simpson_x1e4"))


def q_cell_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatiotemporal volume anomaly: per (res-2 cell, 10-minute crawl
    epoch) page counts scored against the cell's own history by
    INTEGER lower-median and MAD (no FP percentile interpolation — the
    same exact-median discipline as recrawl_cadence), flagging epochs
    with |n − med| > max(3·MAD, 2). The per-region crawl-surge /
    outage screen; windows are per-cell (epoch-count bounded)."""
    pages = synth_pages(spark, N_PAGES)
    lat_s, lon_s = extract_first_geotag(F.col("text"))
    pts = (pages.select(F.col("warc_ts"),
                        lat_s.alias("lat_str"), lon_s.alias("lon_str"))
           .filter(F.col("lat_str") != "")
           .select(F.expr("unix_timestamp(warc_ts) div 600").alias("ep"),
                   cell_encode(micro_from_str(F.col("lat_str")),
                               micro_from_str(F.col("lon_str")), 2)
                   .alias("cell")))
    cnts = pts.groupBy("cell", "ep").agg(F.count("*").alias("n"))
    w = Window.partitionBy("cell").orderBy(F.col("n").asc(),
                                           F.col("ep").asc())
    tot = Window.partitionBy("cell")
    med = (cnts.withColumn("rk", F.row_number().over(w))
           .withColumn("med", F.max(F.when(
               F.col("rk") == F.expr(
                   "(count(*) over (partition by cell) + 1) div 2"),
               F.col("n"))).over(tot)))
    wd = Window.partitionBy("cell").orderBy(
        F.abs(F.col("n") - F.col("med")).asc(), F.col("ep").asc())
    mad = (med.withColumn("rk2", F.row_number().over(wd))
           .withColumn("mad", F.max(F.when(
               F.col("rk2") == F.expr(
                   "(count(*) over (partition by cell) + 1) div 2"),
               F.abs(F.col("n") - F.col("med")))).over(tot)))
    return mad.select(
        "cell", "ep", "n", "med", "mad",
        (F.abs(F.col("n") - F.col("med"))
         > F.greatest(F.lit(3) * F.col("mad"), F.lit(2)))
        .alias("is_anomaly"))


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC (ISO 28500) round-trip over the pages table: serialize each
    page to a framed WARC/1.0 response record (pure JVM binary concat),
    assemble bounded 200-record WARC objects (one Arrow concat per
    bucket), parse the blobs back by Content-Length framing, and emit
    (url, warc_date, content_length, payload_md5). The oracle computes
    the same four values DIRECTLY from the source table, so any framing
    or parsing defect breaks the value hash."""
    from zen3geo_spark.sources.warc import warc_roundtrip

    return warc_roundtrip(synth_pages(spark, N_PAGES), records_per_file=200)


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup through the streaming engine's STATE STORE: two
    parquet files (documents + a re-keyed duplicate copy), one
    micro-batch per file (maxFilesPerTrigger=1), streaming
    dropDuplicates on the content fingerprint — later-batch duplicates
    are suppressed by cross-batch state, and the append-mode output is
    exactly the distinct fingerprint set (deterministic whichever
    arrival won). Oracle: SELECT DISTINCT fingerprint FROM documents."""
    import pathlib

    from zen3geo_spark.streaming.windows import stream_dedup_to_memory

    d = pathlib.Path(__file__).resolve().parent / ".gen_assets" / \
        f"stream_docs_{pathlib.Path(sf_dir).name}"
    if not (d / "_SUCCESS").exists():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text")
        docs.coalesce(1).write.mode("overwrite").parquet(str(d))
        dup = docs.filter(F.col("doc_id") % 2 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        dup.coalesce(1).write.mode("append").parquet(str(d))
    return stream_dedup_to_memory(spark, str(d))


def q_quadkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bing-maps-style quadkey tile addressing: per-zoom-6 tile, the
    base-4 string key whose digit at level z is (2*bit_y + bit_x) of the
    tile coords' z-th bit — the string form real tile servers key caches
    and CDN paths by. Pure compile-time concat of 6 digit expressions
    (all codegen, no UDF); rollup: pages per quadkey. The quadkey's
    prefix property (parent = prefix) is what makes it the string twin
    of the integer cell hierarchy."""
    res = 6
    pts = _points_df(spark)
    iy = F.expr(
        "((lat_us + 90000000) * 64) div 180000001").cast("long")
    ix = F.expr(
        "((lon_us + 180000000) * 64) div 360000001").cast("long")
    digits = []
    for z in range(res - 1, -1, -1):
        bit_y = F.shiftright(iy, z).bitwiseAND(F.lit(1))
        bit_x = F.shiftright(ix, z).bitwiseAND(F.lit(1))
        digits.append((bit_y * 2 + bit_x).cast("string"))
    qk = F.concat(*digits)
    return (pts.select(qk.alias("quadkey"))
            .groupBy("quadkey").agg(F.count("*").alias("n_pages")))


def q_geo_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-resolution skew profile of the point distribution: for each
    cell resolution 2/4/6, the occupied-cell count, max and total
    occupancy, and the integer skew ratio (max * n_cells / total, 100×
    fixed-point) — the planning diagnostic that decides WHERE salting
    and adaptive subdivision are worth it (find_hot_cells' input, as a
    first-class audit). One corpus scan per res, each a map-side-
    combinable aggregate; the profile rows are resolution-cardinality."""
    parts = []
    for res in (2, 4, 6):
        per = (_points_df(spark)
               .groupBy(cell_encode(F.col("lat_us"), F.col("lon_us"), res)
                        .alias("cell"))
               .agg(F.count("*").alias("n")))
        parts.append(per.agg(
            F.lit(res).alias("res"),
            F.count("*").alias("n_cells"),
            F.max("n").alias("max_cell"),
            F.sum("n").alias("n_points")).select(
            "res", "n_cells", "max_cell", "n_points",
            F.expr("(max_cell * n_cells * 100) div n_points")
            .alias("skew_x100")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label transfer: classify each query page's region language
    by majority vote of its k=5 nearest geotagged neighbors
    (deterministic tie-breaks throughout: neighbor rank by (dist2,
    target_id), vote by (count desc, lang asc)) — the label-propagation
    pattern for enriching unlabeled pages from labeled neighbors.
    Exactness rides knn_join_cells' ring escalation; the vote windows
    run over k-sized groups, never the corpus."""
    pages = synth_pages(spark, N_PAGES).select(
        F.regexp_extract("url", r"/page/(\d+)", 1).cast("long")
        .alias("target_id"),
        "lang")
    pts = _points_df(spark)
    queries_df = pts.filter(F.col("point_id") < 30).select(
        F.col("point_id").alias("query_id"), "lat_us", "lon_us")
    targets = pts.filter(F.col("point_id") >= 30).select(
        F.col("point_id").alias("target_id"), "lat_us", "lon_us")
    knn = knn_join_cells(queries_df, targets, k=5, res=2)
    votes = (knn.join(pages, "target_id")
             .groupBy("query_id", "lang").agg(F.count("*").alias("n")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("n").desc(), F.col("lang").asc())
    return (votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("query_id", F.col("lang").alias("pred_lang"), "n"))


def q_stream_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spatial kernel through the REAL streaming engine: readStream
    over a bounded on-disk pages table → geotag extract → cell encode →
    per-cell counts, complete-mode memory sink under availableNow — on
    a bounded input this must emit exactly the batch aggregate, so the
    micro-batch execution of the extraction+index path is value-hash-
    checked against the same SQL twin as the batch cell counts."""
    import pathlib

    from zen3geo_spark.streaming.windows import stream_cell_counts_to_memory

    d = pathlib.Path(__file__).resolve().parent / ".gen_assets" / \
        f"stream_pages_{N_PAGES}"
    if not (d / "_SUCCESS").exists():
        synth_pages(spark, N_PAGES).write.mode("overwrite").parquet(str(d))
    return stream_cell_counts_to_memory(spark, str(d), res=6)


def q_chip_label_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's vector-segmentation-masks walkthrough composed
    end-to-end (docs/vector-segmentation-masks.md: rasterized masks +
    xbatcher chips feeding the DataLoader): burn the fixture polygon
    onto the 14x10 canvas (winding-number fill — the Polygon=15
    golden), slice the canvas into 5x7 chips, and count label pixels
    per chip — the chip/label pair generation step of a segmentation
    training pipeline. Chip assignment is pure floor division on the
    burned pixels (no join, no shuffle beyond the final tiny agg)."""
    canvas = canvas_rasterize(spark, n=1)
    geoms = geometries_datashader(spark).filter(
        F.col("geom_type") == "polygon")
    burned = rasterize(canvas, geoms)
    # non-foldable zero: a literal scene_id would constant-propagate
    # into the broadcast meta join and fold it to a cross join
    px = burned.select(
        F.pmod(F.xxhash64("row"), F.lit(1)).cast("long").alias("scene_id"),
        F.col("col").cast("int").alias("x_idx"),
        F.col("row").cast("int").alias("y_idx"),
        "value")
    meta = scenes_meta(spark, [(0, 1, 10, 14)])
    chipped = assign_chips(px, meta, 5, 7)
    return chip_stats(chipped).select(
        "scene_id", "chip_id", F.col("n_px").alias("n_label_px"))


def q_wrap_bbox_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Antimeridian-crossing bbox query: the 20°-wide strip across the
    dateline (lon 170° → -170°, lat ±60°), split at planning time into
    two non-wrapping intervals by split_antimeridian_bbox — each a
    plain pushdown-able range predicate (a naive BETWEEN would match
    the 340° complement). Output: per-res-4-cell page counts inside
    the strip."""
    from zen3geo_spark.functions.geo import split_antimeridian_bbox

    parts = split_antimeridian_bbox(170_000_000, -170_000_000)
    lon = F.col("lon_us")
    pred = None
    for lo, hi in parts:
        p = (lon >= lo) & (lon <= hi)
        pred = p if pred is None else (pred | p)
    pts = (_points_df(spark)
           .filter(pred & F.col("lat_us").between(-60_000_000, 60_000_000)))
    return (pts.groupBy(
        cell_encode(F.col("lat_us"), F.col("lon_us"), 4).alias("cell"))
        .agg(F.count("*").alias("n_pages")))


def q_cell_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo-diversity retention: keep at most K=3 pages per res-4 cell,
    preferring the longest text with point_id as the total-order
    tie-break — the spatial counterpart of the per-source cap (one
    mega-city must not dominate the corpus the way one mega-host must
    not). Exact salted two-phase top-k: no single hot cell ever becomes
    one window partition's sort."""
    from zen3geo_spark.operators.curation import source_cap

    pages = synth_pages(spark, N_PAGES).select(
        F.regexp_extract("url", r"/page/(\d+)", 1).cast("long")
        .alias("point_id"),
        F.length("text").alias("score"))
    pts = _points_df(spark).withColumn(
        "cell", cell_encode(F.col("lat_us"), F.col("lon_us"), 4))
    scored = pts.join(pages, "point_id").select("point_id", "cell", "score")
    return source_cap(scored, k=3, n_salts=4, id_col="point_id",
                      source_col="cell", order_col="score")


def q_spatial_block_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatially-blocked train/val split: the split unit is the res-6
    CELL, not the page — all pages of a cell land in the same split, so
    spatial autocorrelation cannot leak across the held-out boundary
    (the geographic counterpart of `leakage_safe_split`'s content
    blocking). Bucket = shared 40-bit polynomial hash of the decimal
    cell id, mod 100; < 80 → train. Map-side-combinable rollup."""
    from zen3geo_spark.operators.dedup import gram_hash40

    pts = _points_df(spark).withColumn(
        "cell", cell_encode(F.col("lat_us"), F.col("lon_us"), 6))
    split = pts.withColumn(
        "split",
        F.when(F.pmod(gram_hash40(F.col("cell").cast("string")),
                      F.lit(100)) < 80,
               F.lit("train")).otherwise(F.lit("val")))
    return split.groupBy("split").agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("cell").alias("n_cells"))


def q_geo_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo×language mix: PIP-join extracted page points into polygons,
    then the per-polygon language distribution with within-polygon share
    — the "what languages does this region's crawl speak" rollup that
    drives per-region sampling weights in a multilingual pipeline.
    Composition: broadcast cell-keyed PIP join (bounded refine groups) →
    join back to the page dim on point_id → tiny (polygon×lang) aggregate;
    the share window runs on the aggregated table, never on the corpus."""
    pages = synth_pages(spark, N_PAGES).select(
        F.regexp_extract("url", r"/page/(\d+)", 1).cast("long")
        .alias("point_id"),
        "lang")
    hits = points_in_polygons(_points_df(spark), _polys_df(spark), res=4,
                              broadcast_polys=True).select(
        "point_id", "geom_id")
    per = (hits.join(pages, "point_id")
           .groupBy("geom_id", "lang").agg(F.count("*").alias("n_pages")))
    w = Window.partitionBy("geom_id")
    return per.select(
        "geom_id", "lang", "n_pages",
        F.round(F.col("n_pages") / F.sum("n_pages").over(w), 6)
        .alias("share"))


def q_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-zoom tile pyramid: extracted page points binned once at the
    base zoom (one full-corpus map-side-combinable aggregate), then every
    coarser zoom rolled up FROM THE BASE AGGREGATE — the tile-serving
    pyramid build. At 100 TB the corpus is touched exactly once; the six
    parent rollups run over <= 4^base_zoom rows. The base aggregate is
    localCheckpoint-ed so the seven union branches share one scan."""
    base_z = 6
    pts = _points_df(spark).withColumn(
        "cell", cell_encode(F.col("lat_us"), F.col("lon_us"), base_z))
    base = (pts.groupBy("cell").agg(F.count("*").alias("n_pages"))
            .localCheckpoint(eager=False))
    levels = [base.select(F.lit(base_z).alias("zoom"), "cell", "n_pages")]
    for z in range(base_z):
        levels.append(
            base.groupBy(cell_parent(F.col("cell"), base_z, z).alias("cell"))
            .agg(F.sum("n_pages").alias("n_pages"))
            .select(F.lit(z).alias("zoom"), "cell", "n_pages"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def q_tile_pyramid_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental pyramid maintenance: when crawl snapshot B replaces A
    (A = ids [0,N), B = ids [N/5, 6N/5)), the tile counts are updated
    from the DELTA page sets only — departed pages contribute -1, new
    pages +1, pages in both snapshots never touched. Signed per-cell
    sums roll up the pyramid (zooms 6/4/2), changed tiles only. At
    10^12 rows this is the difference between re-aggregating the corpus
    and aggregating the snapshot fringe."""
    n2 = N_PAGES * 6 // 5
    lo = N_PAGES // 5
    pages = synth_pages(spark, n2).withColumn(
        "point_id", F.regexp_extract("url", r"/page/(\d+)", 1).cast("long"))
    lat_s, lon_s = extract_first_geotag(F.col("text"))
    pts = (pages
           .filter((F.col("point_id") < lo) | (F.col("point_id") >= N_PAGES))
           .select("point_id", lat_s.alias("lat_str"),
                   lon_s.alias("lon_str"))
           .filter(F.col("lat_str") != "")
           .select("point_id",
                   micro_from_str(F.col("lat_str")).alias("lat_us"),
                   micro_from_str(F.col("lon_str")).alias("lon_us")))
    signed = pts.withColumn(
        "sgn", F.when(F.col("point_id") < lo, F.lit(-1)).otherwise(F.lit(1)))
    base = (signed
            .withColumn("cell", cell_encode(F.col("lat_us"), F.col("lon_us"), 6))
            .groupBy("cell").agg(F.sum("sgn").alias("delta"))
            .filter(F.col("delta") != 0)
            .localCheckpoint(eager=False))
    levels = [base.select(F.lit(6).alias("zoom"), "cell", "delta")]
    for z in (4, 2):
        levels.append(
            base.groupBy(cell_parent(F.col("cell"), 6, z).alias("cell"))
            .agg(F.sum("delta").alias("delta"))
            .filter(F.col("delta") != 0)
            .select(F.lit(z).alias("zoom"), "cell", "delta"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def q_adaptive_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-adaptive spatial index: coarse res-4 cells whose page
    count exceeds the occupied-cell average are subdivided to res-8 —
    the quadtree discipline that balances partition sizes under
    web-crawl point skew. The hot-cell set is an aggregate-sized
    broadcast (never a corpus shuffle); the threshold is integer-exact
    (n4 * n_occupied > total) so both engines pick identical cells."""
    pts = _points_df(spark).withColumn(
        "c8", cell_encode(F.col("lat_us"), F.col("lon_us"), 8)).withColumn(
        "c4", cell_encode(F.col("lat_us"), F.col("lon_us"), 4))
    from zen3geo_spark.operators._util import pair_all

    coarse = pts.groupBy("c4").agg(F.count("*").alias("n4"))
    stats = coarse.agg(F.sum("n4").alias("tot"),
                       F.count("*").alias("nocc"))
    hot = (pair_all(coarse, stats)
           .filter(F.col("n4") * F.col("nocc") > F.col("tot"))
           .select("c4", F.lit(True).alias("is_hot")))
    assigned = pts.join(F.broadcast(hot), "c4", "left")
    return (assigned.select(
        F.when(F.col("is_hot"), F.col("c8")).otherwise(F.col("c4"))
        .alias("cell"),
        F.when(F.col("is_hot"), F.lit(8)).otherwise(F.lit(4))
        .alias("res"))
        .groupBy("cell", "res").agg(F.count("*").alias("n_pages")))


def q_near_dup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production dedup shape: MinHash-LSH candidate pairs → exact
    n-gram Jaccard verification (candidates only, never all-pairs)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cand = minhash_lsh_candidates(docs, num_hashes=8, bands=4, shingle_n=2)
    verified = verify_jaccard_pairs(cand, docs, shingle_n=2)
    return verified.select(
        "a_id", "b_id", F.round("jaccard", 6).alias("jaccard")
    ).filter(F.col("jaccard") >= 0.5)


def q_month_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FlatMapper month-boundary split (reference
    docs/multi-resolution.md:354-370): events re-keyed by month via
    date_trunc, per-month stats."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.date_trunc("month", F.col("ts")).alias("month"),
        "event_type",
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))


def q_mercator_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reprojection kernel: extracted points → EPSG:3857 metres → 100 km
    bin counts (integer bins make the cross-engine float compare safe)."""
    pts = _points_df(spark).filter(F.abs(F.col("lat_us")) <= 85051129)
    m = pts.select(
        mercator_x(F.col("lon_us") / 1e6).alias("x"),
        mercator_y(F.col("lat_us") / 1e6).alias("y"),
    )
    return m.groupBy(
        F.floor(F.col("x") / 100000.0).alias("bx"),
        F.floor(F.col("y") / 100000.0).alias("by"),
    ).agg(F.count("*").alias("n"))


def q_cell_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup: res-12 cells aggregated to their res-6 parents
    (oracle encodes res 6 directly — equal by the floor-nesting identity
    floor(floor(x/m)/n) == floor(x/(m*n)))."""
    pts = _points_df(spark).withColumn(
        "cell12", cell_encode(F.col("lat_us"), F.col("lon_us"), 12))
    return pts.groupBy(
        cell_parent(F.col("cell12"), 12, 6).alias("cell6")
    ).agg(F.count("*").alias("n_pages"))


def q_extract_all_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-geotag extraction: every well-formed tag per page (pages
    embed 0-3 plus malformed ones the extractor must skip)."""
    pages = synth_pages(spark, N_PAGES)
    return pages.select(
        "url", F.size(extract_all_geotags(F.col("text"))).alias("n_tags"))


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling windows (the streaming transform run as batch;
    epoch-aligned F.window semantics, UTC session)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return tumbling_event_stats(ev, window="6 hours")


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling windows through the REAL streaming engine: readStream →
    complete-mode memory sink, availableNow trigger. On a bounded input
    complete mode must emit exactly the batch aggregate, so this query
    value-hash-checks the micro-batch execution path itself against the
    same SQL oracle as `tumbling_window`."""
    from zen3geo_spark.streaming.windows import stream_tumbling_to_memory

    return stream_tumbling_to_memory(
        spark, f"{sf_dir}/events.parquet", window="6 hours")


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user gap-merged session windows (F.session_window; oracle is
    the lag/cumsum gaps-and-islands rewrite)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_stats(ev, gap="30 minutes")


def q_rasterize_line_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-carrying LINE burn (the reference forwards any datashader
    reduction for every geometry kind, datashader.py:49-55,228-242):
    three road segments with speed values, mean speed per covered pixel."""
    canvas = canvas_rasterize(spark, n=1)
    rows = [
        (0, "linestring", [[{"x": 3.0, "y": 5.0}, {"x": 5.0, "y": 3.0}]], "OGC:CRS84", 10.0),
        (1, "linestring", [[{"x": 3.0, "y": 2.0}, {"x": 5.0, "y": 0.0}]], "OGC:CRS84", 30.0),
        (2, "linestring", [[{"x": 1.5, "y": 4.5}, {"x": 6.5, "y": 0.5}]], "OGC:CRS84", 20.0),
    ]
    geoms = spark.createDataFrame(
        rows, "geom_id long, geom_type string, "
        "parts array<array<struct<x:double,y:double>>>, crs string, speed double")
    out = rasterize(canvas, geoms, agg="mean", value_col="speed")
    return out.select("row", "col", F.round("value", 6).alias("value"))


def q_rasterize_poly_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-carrying POLYGON burn: two overlapping polygons with
    attribute values, max value per covered pixel (winding-number fill)."""
    canvas = canvas_rasterize(spark, n=1)
    fixture = [(6.0, 5.0), (3.5, 2.5), (6.0, 0.0), (6.0, 2.5), (5.0, 2.5)]
    tri = [(2.0, 1.0), (7.0, 1.0), (4.5, 4.0)]
    rows = [
        (0, "polygon", [[{"x": x, "y": y} for x, y in fixture]], "OGC:CRS84", 7.0),
        (1, "polygon", [[{"x": x, "y": y} for x, y in tri]], "OGC:CRS84", 9.0),
    ]
    geoms = spark.createDataFrame(
        rows, "geom_id long, geom_type string, "
        "parts array<array<struct<x:double,y:double>>>, crs string, pval double")
    out = rasterize(canvas, geoms, agg="max", value_col="pval")
    return out.select("row", "col", F.round("value", 6).alias("value"))


def q_bbox_image_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-detection-boxes helpers (reference
    docs/object-detection-boxes.md:319,364): geometry → bounds →
    image-pixel box under the 14x10 canvas' north-up affine."""
    from zen3geo_spark.functions.geo import geo_to_image_coords, polygon_bounds

    geoms = geometries_datashader(spark).select("geom_id", "parts")
    b = geoms.select("geom_id", polygon_bounds(F.col("parts")).alias("b"))
    b = b.select("geom_id", "b.minx", "b.miny", "b.maxx", "b.maxy")
    resx, resy = F.lit(0.5), F.lit(0.5)
    xmin, ymax = F.lit(1.0), F.lit(5.0)
    c0, r0 = geo_to_image_coords(F.col("minx"), F.col("maxy"), xmin, ymax, resx, resy)
    c1, r1 = geo_to_image_coords(F.col("maxx"), F.col("miny"), xmin, ymax, resx, resy)
    return b.select(
        "geom_id", "minx", "miny", "maxx", "maxy",
        F.round(c0, 6).alias("col0"), F.round(r0, 6).alias("row0"),
        F.round(c1, 6).alias("col1"), F.round(r1, 6).alias("row1"),
    )


N_PGM_ASSETS = 64


def q_binary_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile ingestion end-to-end: real netpbm PGM files on disk →
    binary rows → Arrow-batched decode (second real codec) → per-file
    grayscale stats."""
    import pathlib

    from zen3geo_spark.operators.multimodal import (
        scan_pgm_assets, write_pgm_assets,
    )

    d = pathlib.Path(__file__).resolve().parent / ".gen_assets" / "pgm"
    write_pgm_assets(d, N_PGM_ASSETS)
    out = scan_pgm_assets(spark, d)
    return out.select("asset_id", "height", "width",
                      F.round("mean_px", 6).alias("mean_px"),
                      "min_px", "max_px")


def q_hashed_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick TF-IDF features in long form (doc, bucket, w):
    portable polynomial hash over the DISTINCT vocab only; df/N joins are
    aggregate-sized."""
    from zen3geo_spark.functions.text import hashed_tfidf

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return hashed_tfidf(docs, dim=64)


def q_stac_asset_engines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XpySTACAssetReader engine DISPATCH end-to-end (xpystac.py:41-46):
    the same ``open_asset`` entry point reads a STAC-item sidecar through
    TWO different engines — json (item metadata) and csv (per-item pixel
    table) — joined into one per-item readout. The unsupported-engine
    error contract is pytest-asserted (test_datapipes_xpystac.py:96-102
    parity)."""
    import pathlib

    from zen3geo_spark.sources.raster import (
        open_asset, write_stac_sidecar_assets,
    )

    d = pathlib.Path(__file__).resolve().parent / ".gen_assets" / "sidecar"
    write_stac_sidecar_assets(d)
    items = open_asset(spark, str(d / "items.jsonl"), engine="json").select(
        F.col("item_id").cast("long").alias("item_id"),
        "collection",
        F.col("lat_us").cast("long").alias("lat_us"),
        F.col("lon_us").cast("long").alias("lon_us"))
    px = open_asset(spark, str(d / "pixels.csv"), engine="csv",
                    header="true", inferSchema="true")
    stats = (px.groupBy(F.col("item_id").cast("long").alias("item_id"))
             .agg(F.count("*").alias("n_px"),
                  F.sum(F.col("v").cast("double")).alias("sum_v")))
    return items.join(stats, "item_id").select(
        "item_id", "collection", "lat_us", "lon_us", "n_px", "sum_v")


def q_zarr_like_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zarr-analogue chunked-store readout (the reference's zarr engine,
    xpystac.py:41-46 / test_datapipes_xpystac.py:40-70): consolidated-
    metadata sidecar + per-chunk binary files; a WINDOWED read plans only
    the intersecting chunk files from metadata (lazy chunk access — the
    prune metric is pytest-asserted via plan_chunks) and decodes exact
    float32 values with pixel-center world coords. Values follow a
    deterministic formula so DuckDB regenerates them without the files."""
    import pathlib

    import numpy as np

    from zen3geo_spark.sources.raster import open_asset
    from zen3geo_spark.sources.zarr_like import write_zarr_like_store

    d = pathlib.Path(__file__).resolve().parent / ".gen_assets" / "zarr_like"
    if not (d / ".zmeta.json").exists():
        h, w = 40, 64
        arr = ((np.arange(h)[:, None] * 31 + np.arange(w)[None, :] * 17)
               % 251).astype("float32")
        write_zarr_like_store(str(d), arr, chunks=(16, 16),
                              grid=(100.0, 500.0, 10.0), fill_value=-9.0)
    px = open_asset(spark, str(d), engine="zarr_like",
                    bbox_idx=(10, 25, 20, 50))
    return px.select("y_idx", "x_idx", "value", "x", "y")


def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: top-bigram coverage + duplicate
    trigram fraction per doc, keep flag under both thresholds."""
    from zen3geo_spark.functions.text import ngram_repetition_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_repetition_stats(docs)


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set contamination check: per corpus doc, word-5-gram positions
    shared with the benchmark split (doc_id % 97 == 0 stands in for the
    eval-suite table). Benchmark n-gram vocab broadcasts; corpus side is
    scan → expand → broadcast join → per-doc agg, all JVM."""
    from zen3geo_spark.operators.curation import contamination_check

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return contamination_check(docs, n=5, bench_mod=97)


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-span inventory: top-20 most-repeated word 8-grams with
    doc/source spread — the map-reduce approximation of the suffix-array
    duplicate-substring report; group-by gram with map-side combine +
    TakeOrdered top-k."""
    from zen3geo_spark.operators.curation import duplicate_span_inventory

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return duplicate_span_inventory(docs, n=8, top_k=20)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling audit table: per (lang,
    source) totals and kept counts under per-language keep-rates decided
    by an arithmetic hash of doc_id (reproducible across engines/retries/
    cluster sizes — no rand())."""
    from zen3geo_spark.operators.curation import stratified_sample_summary

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return stratified_sample_summary(
        docs, rates={"en": 100, "es": 50}, default_rate=10)


def q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot incremental near-dup screen: docs split into an
    OLD corpus (even ids) and a NEW snapshot (odd ids); every new doc is
    flagged iff it shares an LSH band-bucket with any old doc. Left-semi
    probe of the new banded table against distinct old buckets — the old
    corpus is never self-paired."""
    from zen3geo_spark.operators.dedup import incremental_neardup_flags

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    new = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    return incremental_neardup_flags(old, new, num_hashes=8, bands=4,
                                     shingle_n=2)


def q_geom_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon area / centroid / perimeter / orientation over the fixture
    rings (GeoSeries.area/.centroid/.length parity): shoelace twice-area
    is INT64-EXACT in micro-units²; centroid/perimeter are ring-ordered
    double folds rounded to 4."""
    from zen3geo_spark.functions.geo import polygon_measures

    return polygon_measures(_polys_df(spark))


def q_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric radius self-join: all point pairs within 140 km great-circle
    (mid-latitude band |lat| <= 83°), cell-ring candidates at res 5 —
    exactness validated by radius_join_guarantee, never assumed."""
    return radius_join_points(_points_df(spark), radius_m=140_000.0, res=5)


def q_geohash_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-geohash rollup: points → base32 geohash (exact integer
    bit math, parity with classic encoders pinned in tests), grouped at
    precision 2 with the lexicographic-min precision-5 member hash —
    exercises the prefix property (gh5 startswith gh2)."""
    from zen3geo_spark.functions.geo import with_geohash

    pts = with_geohash(_points_df(spark), "lat_us", "lon_us", 2, out="gh2")
    pts = with_geohash(pts, "lat_us", "lon_us", 5, out="gh5")
    return pts.groupBy("gh2").agg(
        F.count("*").alias("n_points"),
        F.sum("lat_us").alias("sum_lat_us"),
        F.sum("lon_us").alias("sum_lon_us"),
        F.min("gh5").alias("min_gh5"),
    )


def q_host_geo_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host geographic footprint: how many distinct res-6 cells each
    crawl host's pages geotag into, plus the integer bbox — the
    webtext×geo rollup a 100 TB crawl curation pass runs per domain
    (host-level geo diversity signal). Exact ints throughout."""
    pages = synth_pages(spark, N_PAGES).select(
        F.expr(URL_HOST_SQL).alias("host"), "text")
    lat_s, lon_s = extract_first_geotag(F.col("text"))
    pts = pages.select("host", lat_s.alias("lat_str"), lon_s.alias("lon_str"))
    pts = pts.filter(F.col("lat_str") != "").select(
        "host",
        micro_from_str(F.col("lat_str")).alias("lat_us"),
        micro_from_str(F.col("lon_str")).alias("lon_us"))
    pts = pts.withColumn("cell6", cell_encode(F.col("lat_us"),
                                              F.col("lon_us"), 6))
    return pts.groupBy("host").agg(
        F.count("*").alias("n_points"),
        F.countDistinct("cell6").alias("n_cells6"),
        F.min("lat_us").alias("min_lat_us"),
        F.max("lat_us").alias("max_lat_us"),
        F.min("lon_us").alias("min_lon_us"),
        F.max("lon_us").alias("max_lon_us"),
    )


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style cluster-then-prune embedding dedup: nearest of 16
    deterministic centroids, drop any vector with a lower-id neighbor in
    the same cluster at cosine >= 0.43; keeps the within-cluster
    equi-join as the only pairwise work (the 100 TB path — vs the exact
    corpus-wide block matmul of embed_neardup)."""
    from zen3geo_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semantic_dedup(emb, n_lists=16, threshold=0.43)


def q_geo_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impossible-travel screen: per crawl host, order its geotagged
    pages by crawl time (page id ≙ warc_ts seconds) and measure the
    great-circle hop between consecutive geotags; roll up hop count,
    max implied speed (km/h, floored to bigint — coarse bucket keeps
    the hash immune to libm ulps) and the count of hops over
    1000 km/h. The geo-consistency signal a crawl curation pass uses
    to flag location-spoofing/aggregator hosts.

    Scale shape: one window over (host, pid) — the same shuffle the
    host rollups already pay — then a map-side-combinable aggregate;
    1000 hosts ⇒ no skew (a hot host would ride the same salting the
    PIP join uses)."""
    from zen3geo_spark.operators.spatial_join import haversine_m_sql

    pages = synth_pages(spark, N_PAGES).select(
        F.expr(URL_HOST_SQL).alias("host"),
        F.expr(URL_PID_SQL).alias("pid"), "text")
    lat_s, lon_s = extract_first_geotag(F.col("text"))
    pts = pages.select("host", "pid", lat_s.alias("lat_str"),
                       lon_s.alias("lon_str"))
    pts = pts.filter(F.col("lat_str") != "").select(
        "host", "pid",
        micro_from_str(F.col("lat_str")).alias("lat_us"),
        micro_from_str(F.col("lon_str")).alias("lon_us"))
    w = Window.partitionBy("host").orderBy("pid")
    hop = pts.select(
        "host", "pid", "lat_us", "lon_us",
        F.lag("lat_us").over(w).alias("p_lat"),
        F.lag("lon_us").over(w).alias("p_lon"),
        F.lag("pid").over(w).alias("p_pid"),
    ).filter(F.col("p_pid").isNotNull())
    hav = haversine_m_sql("p_lat", "p_lon", "lat_us", "lon_us", "spark")
    speed = f"((({hav}) / 1000.0) / (cast(pid - p_pid as double) / 3600.0))"
    hops = hop.selectExpr("host", f"cast(floor({speed}) as bigint) as kmh")
    return hops.groupBy("host").agg(
        F.count("*").alias("n_hops"),
        F.max("kmh").alias("max_kmh"),
        F.sum((F.col("kmh") >= F.lit(1000)).cast("int")).alias("n_impossible"),
    )


def q_spread_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datashader tf.spread over the world-points raster (px=1, add):
    the standard make-sparse-points-visible post-pass after a points
    rasterize — offset explode + one partial-aggregating groupBy."""
    from zen3geo_spark.operators.rasterize import spread

    img = q_rasterize_world_points(spark, sf_dir)
    return spread(img, width=360, height=180, px=1, how="add")


def q_tf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-cosine near-dup pairs via posting-list self-join on a
    bounded slice (doc_id < 400 — the synthetic corpus's ~31-token vocab
    makes every token a stopword, so the df cost knob is opened and the
    slice bounds the Σdf² pair volume instead; production keeps max_df
    tight). Integer dot/norms ⇒ bit-identical cosine cross-engine."""
    from zen3geo_spark.functions.text import tf_cosine_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tf_cosine_pairs(docs.filter(F.col("doc_id") < 400),
                           threshold=0.8)


def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (LASER/CCMatrix-style, simplified):
    mutual-best cosine pairs between two embedding groups (labels 0/1)
    where the forward best beats the second-best by a 1.01 ratio margin.
    Ids only in the output — hash-stable like the ANN queries."""
    from zen3geo_spark.operators.similarity import bitext_mine

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    src = emb.filter(F.col("label") == 0).select("vec_id", "embedding")
    tgt = emb.filter(F.col("label") == 1).select("vec_id", "embedding")
    return bitext_mine(src, tgt, margin=1.01)


def q_event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-spike detection per event type: tumbling 6h counts vs the
    mean of the previous 4 observed windows, flagged at >=2x with an
    integer compare (cross-engine exact). The ordered frame runs over
    the window-count aggregate, never the event stream."""
    from zen3geo_spark.streaming.windows import windowed_anomaly

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return windowed_anomaly(ev, window="6 hours", trail=4, factor=2)


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate chunk dedup (CCNet/RefinedWeb paragraph-dedup
    analogue): tile each doc into non-overlapping 8-word chunks, drop
    chunks shared by >2 distinct docs, reassemble in order. Hot set is
    boilerplate-sized -> broadcast join back; all codegen."""
    from zen3geo_spark.operators.curation import chunk_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_dedup(docs, chunk_words=8, max_docs=2)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: shard by id hash, hash-order within
    shard, contiguous fill at a 256-token budget — per-doc (shard,
    seq_id, n_tokens) assignment, one partitioned-window shuffle."""
    from zen3geo_spark.operators.curation import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(docs, budget=256, n_shards=8)


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap: keep the top-10 docs per source by
    (n_chars desc, doc_id) via the salted two-phase top-k (exact; no
    single-host window-partition meltdown at 10^12 rows)."""
    from zen3geo_spark.operators.curation import source_cap

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return source_cap(docs, k=10, n_salts=4)


# PII injected deterministically into the synthetic corpus so the scrub
# has ground truth; the SAME concat formula runs in Spark SQL and DuckDB
# (documents.text contains no '@'/'-'/dotted-quad tokens of its own, but
# both engines count with the same regex either way).
_PII_INJECT_EXPR = (
    "concat(text,"
    " case when doc_id % 7 = 0 then concat(' contact user',"
    "   cast(doc_id as string), '@mail.example.com now') else '' end,"
    " case when doc_id % 11 = 0 then concat(' call 555-',"
    "   lpad(cast(doc_id % 1000 as string), 3, '0'), '-',"
    "   lpad(cast(doc_id % 10000 as string), 4, '0'), ' today') else '' end,"
    " case when doc_id % 13 = 0 then concat(' from 10.',"
    "   cast(doc_id % 256 as string), '.0.',"
    "   cast((doc_id * 7) % 256 as string), ' logged') else '' end)"
)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (email/phone/IPv4 → placeholder tokens) + per-source
    redaction audit — the privacy pass every released webtext corpus
    runs. Three regexp_count + three regexp_replace JVM expressions per
    row, then one map-side-combinable aggregate; the DuckDB oracle runs
    the same RE2-compatible patterns."""
    from zen3geo_spark.operators.curation import pii_scrub

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .selectExpr("doc_id", "source",
                        f"{_PII_INJECT_EXPR} as text"))
    scrubbed = pii_scrub(docs, "text")
    has_pii = (F.col("n_email") + F.col("n_phone") + F.col("n_ipv4")) > 0
    return (scrubbed.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.count(F.when(has_pii, 1)).alias("docs_with_pii"),
                 F.sum("n_email").alias("n_emails"),
                 F.sum("n_phone").alias("n_phones"),
                 F.sum("n_ipv4").alias("n_ips"),
                 F.sum(F.length("clean_text")).alias("clean_len")))


CM_PROBES = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
             "part", "hash", "merge", "batch", "zzz_never_seen"]


def q_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (4×512, Kirsch–Mitzenmacher double hashing over
    the shared 40-bit polynomial hashes) built over corpus tokens, then
    point-queried for a watchlist with the exact count alongside — the
    sketch cells AND the estimates hash-match the DuckDB twin."""
    from zen3geo_spark.functions.sketch import (
        corpus_tokens, count_min_build, count_min_estimate,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sketch = count_min_build(docs, depth=4, width=512)
    probes = spark.createDataFrame([(t,) for t in CM_PROBES],
                                   "token string")
    est = count_min_estimate(sketch, probes, depth=4, width=512)
    exact = (corpus_tokens(docs).filter(F.col("token").isin(CM_PROBES))
             .groupBy("token").agg(F.count("*").alias("true_cnt")))
    return (est.join(exact, on="token", how="left")
            .select("token", "est",
                    F.coalesce("true_cnt", F.lit(0)).alias("true_cnt")))


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (pandas merge_asof / DuckDB ASOF JOIN
    semantics): every click event picks up the latest prior error event
    of the same user. Spark has no native as-of; the union-tag +
    running-last_value decomposition costs ONE shuffle on the key — no
    range join, no per-key replication (operators/temporal.py). The
    oracle runs DuckDB's native ASOF LEFT JOIN."""
    from zen3geo_spark.operators.temporal import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", "value")
    j = asof_join(clicks, errors, keys=["user_id"])
    return j.select(
        "user_id", "event_id", "ts",
        F.col("event_id_r").alias("err_event_id"),
        F.col("ts_r").alias("err_ts"),
        F.col("value_r").alias("err_value"))


def q_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-budget rollup with BOTH token estimators: the
    whitespace count and the GPT-2-ish subword pre-tokenizer count
    (contraction splits / letter runs / digit runs / single punctuation)
    — pure JVM regexp_extract_all, one map-side-combinable aggregate."""
    from zen3geo_spark.functions.text import subword_count, token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (docs.select("lang",
                        token_count(F.col("text")).alias("_ws"),
                        subword_count(F.col("text")).alias("_sw"))
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("_ws").alias("ws_tokens"),
                 F.sum("_sw").alias("subword_tokens")))


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear classifier inference over hashing-trick
    bag-of-words features (integer weights ⇒ exact margins in both
    engines); the corpus-wide quality/spam gate."""
    from zen3geo_spark.functions.text import linear_classifier_margin

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return linear_classifier_margin(docs, dim=256)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank over the synthetic host link graph
    (5 damped supersteps, 10^9 rank mass, floor division throughout) —
    every sum is an exact int64, so the distributed partial aggregates
    and the DuckDB unrolled-CTE twin agree bit-for-bit; per-round
    localCheckpoint keeps the final plan O(1) like connected_components."""
    from zen3geo_spark.operators.linkgraph import (
        pagerank_fixed_point, synth_host_edges,
    )

    edges = synth_host_edges(spark, n_hosts=1000)
    return pagerank_fixed_point(edges, n_nodes=1000, iters=5)


def q_lang_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-operator composition: fixed-point PageRank over the host
    graph joined back onto the pages corpus — per language, page count
    and total host-authority mass. The "how authoritative is our
    German crawl" rollup; shows the graph operators compose with the
    corpus scan. The 1000-row rank table broadcasts; the corpus never
    shuffles for the join. Integer fixed-point => bit-exact."""
    from zen3geo_spark.operators.linkgraph import (
        pagerank_fixed_point, synth_host_edges,
    )

    ranks = pagerank_fixed_point(
        synth_host_edges(spark, n_hosts=1000), n_nodes=1000, iters=5)
    pages = synth_pages(spark, N_PAGES).selectExpr(
        "lang", f"({URL_PID_SQL}) % 1000 as host_num")
    return (pages.join(F.broadcast(
                ranks.withColumnRenamed("node", "host_num")), "host_num")
            .groupBy("lang")
            .agg(F.count("*").alias("n_pages"),
                 F.sum("rank_fp").alias("authority_mass")))


def q_degree_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint degree distribution (degree-mixing matrix) of the host
    graph: for every undirected edge, the (deg_lo, deg_hi) endpoint
    pair, counted — the assortativity profile that separates
    hub-to-leaf link-farm topologies from organic hub-to-hub webs,
    computed without any FP correlation coefficient (the integer JDD
    IS the sufficient statistic). One degree aggregate + two joins +
    one group-by; all integer => bit-exact."""
    from zen3geo_spark.operators.linkgraph import synth_host_edges_dense

    edges = synth_host_edges_dense(spark, n_hosts=1000)
    und = (edges.filter(F.col("src") != F.col("dst"))
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .distinct())
    deg = (und.select(F.col("a").alias("node"))
           .unionAll(und.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count("*").alias("deg")))
    j = (und.join(deg.select(F.col("node").alias("a"),
                             F.col("deg").alias("da")), on="a")
         .join(deg.select(F.col("node").alias("b"),
                          F.col("deg").alias("db")), on="b"))
    return (j.select(F.least("da", "db").alias("deg_lo"),
                     F.greatest("da", "db").alias("deg_hi"))
            .groupBy("deg_lo", "deg_hi")
            .agg(F.count("*").alias("n_edges")))


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peeling of the dense host graph (3 rounds of
    "drop degree<8 nodes", cascading): dense-core vs spam-tendril separation.
    Each round = one map-side-combinable degree agg + two semi-joins,
    O(|E|) — no fanout. Integer-exact vs the unrolled DuckDB twin."""
    from zen3geo_spark.operators.linkgraph import (
        kcore_peel, synth_host_edges_dense,
    )

    edges = synth_host_edges_dense(spark, n_hosts=1000)
    return kcore_peel(edges, k=8, rounds=3)


def q_cheapest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop Bellman-Ford over the host link graph: min path cost
    (integer fetch-latency weights) from the seed set within 4 relax
    rounds — the weighted sibling of bfs_hops. Map-side-combinable min
    relaxation; all integer => bit-exact vs the unrolled DuckDB twin."""
    from zen3geo_spark.operators.linkgraph import (
        cheapest_paths, synth_host_edges,
    )

    edges = synth_host_edges(spark, n_hosts=1000)
    return cheapest_paths(edges, n_nodes=1000, seed_mod=100, max_hops=4)


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 snapshot-history compaction: 4 crawl epochs of a per-url
    quality band collapsed into validity intervals (url, quality_band,
    valid_from, valid_to) — the warehouse change-history consolidation a
    recurring crawl accumulates. One shuffle (url-keyed windows share
    the Exchange); per-url work bounded by epoch count. All integer ⇒
    bit-exact vs the DuckDB twin."""
    from zen3geo_spark.operators.temporal import scd2_compact

    obs = (synth_pages(spark, N_PAGES)
           .selectExpr("url", f"{URL_PID_SQL} as pid")
           .selectExpr(
               "url", "pid",
               "explode(sequence(cast(0 as bigint), cast(3 as bigint)))"
               " as epoch")
           .selectExpr(
               "url", "epoch",
               "(pid % 7) + ((epoch * (pid % 4)) div 3) as quality_band"))
    return scd2_compact(obs, "url", "epoch", "quality_band")


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the host link graph via the
    degree-ordered orientation (each triangle enumerated once at its
    lowest-(deg,id) corner; wedge fan-out bounded O(sqrt|E|) so hub
    hosts can't melt a partition) — the link-farm / near-clique audit
    signal. All integer ⇒ bit-exact vs the DuckDB twin."""
    from zen3geo_spark.operators.linkgraph import (
        synth_host_edges_dense, triangle_counts,
    )

    edges = synth_host_edges_dense(spark, n_hosts=1000)
    return triangle_counts(edges)


def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop BFS over the synthetic host link graph: min hop
    distance from the seed set (node % 100 == 0) within 4 supersteps —
    the crawl-frontier expansion shape. Frontier-only joins + anti-join
    vs settled set per round; all integer ⇒ bit-exact vs the unrolled
    DuckDB twin."""
    from zen3geo_spark.operators.linkgraph import bfs_hops, synth_host_edges

    edges = synth_host_edges(spark, n_hosts=1000)
    return bfs_hops(edges, n_nodes=1000, seed_mod=100, max_hops=4)


def q_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-citation pairs over the host link graph (hosts linked from ≥2
    common sources) with the out-degree hot-block guard — the
    related-domain / spam-ring signal."""
    from zen3geo_spark.operators.linkgraph import (
        cocitation_pairs, synth_host_edges,
    )

    edges = synth_host_edges(spark, n_hosts=1000)
    return cocitation_pairs(edges, max_out_deg=64, min_cocite=2)


def q_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UT1-style domain-blocklist pass: broadcast hash join of the pages
    scan against a (host, category) dimension — no shuffle of the corpus
    side — then a per-(lang, category) audit rollup (category NULL =
    page kept)."""
    from zen3geo_spark.operators.curation import (
        synth_blocklist, url_blocklist_filter,
    )

    pages = synth_pages(spark, N_PAGES)
    tagged = url_blocklist_filter(pages, synth_blocklist(spark))
    return (tagged.groupBy("lang", "block_category")
            .agg(F.count("*").alias("n_pages"),
                 F.countDistinct("host").alias("n_hosts")))


def q_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 of a fixed term set over the corpus (training-data
    retrieval/filter scorer); df/corpus stats broadcast into the tf
    join."""
    from zen3geo_spark.functions.text import bm25_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bm25_scores(docs, ["spark", "table", "window"])


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted-index build (delta-encoded postings) with a
    doc-frequency band filter standing in for stopword pruning — the
    search-index construction stage over the corpus."""
    from zen3geo_spark.functions.text import inverted_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the synthetic corpus has a ~31-token vocabulary that nearly all
    # appears in >60% of docs, so the stopword band is opened up here;
    # production would keep the default tight band
    return inverted_index(docs, min_df=2, max_df=1_000_000)


def q_embed_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup CLUSTERING end-to-end: exact block-matmul
    cosine pairs (>= 0.4) → connected components → (vec, component) keep
    groups — the semantic-dedup shape (cluster, keep min id per group)."""
    from zen3geo_spark.operators.dedup import connected_components

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = cosine_near_dup_pairs_blocked(emb, threshold=0.4).select("a_id", "b_id")
    comp = connected_components(
        pairs, nodes=emb.select(F.col("vec_id").alias("node")))
    return comp.select("node", "component")


def q_word_jaccard_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT word-Jaccard baseline on a bounded slice (doc_id < 200), no
    document-frequency blocking — the recall yardstick for word_jaccard's
    df-prefiltered path (which can miss pairs whose shared tokens are all
    high-df; see the df-blocking recall note in ngram_jaccard)."""
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 200))
    out = ngram_jaccard(docs, shingle_n=1, threshold=0.5)
    return out.select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))


def q_focal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster map algebra: 3x3 focal sum/max over the world-points count
    raster (the smoothing/hot-spot-dilation pass GDAL focal stats and
    xarray ``rolling`` run after a burn). Sparse-pixel plan: one bounded
    explode (fan-out 9) + one (row, col) group-by — never a dense
    canvas materialization, so the same plan holds on a 10^12-page
    world raster partitioned by pixel key."""
    from zen3geo_spark.operators.raster_algebra import focal_stats

    img = q_rasterize_world_points(spark, sf_dir).select(
        "row", "col", F.col("value").cast("long").alias("value"))
    return focal_stats(img, width=360, height=180, radius=1)


def q_idw_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scattered-point -> grid IDW interpolation (coverage-surface
    estimation from the extracted page points), INTEGER-exact: weights
    are ``scale div (d2+1)`` bigints accumulated per res-5 cell center
    over the bounded 3x3 candidate ring (equi-join on the exploded ring
    key — the kNN/grid-DBSCAN candidate discipline, never a distance
    cross-join). Output is the exact (wsum, wvsum) accumulator pair;
    the estimate is wvsum/wsum caller-side."""
    from zen3geo_spark.operators.raster_algebra import idw_accumulate

    pts = _points_df(spark).select(
        "lat_us", "lon_us", (F.col("point_id") % 10).alias("v"))
    return idw_accumulate(pts, res=5, value_col="v", scale=10 ** 15)


def q_geocode_gazetteer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gazetteer geocoding of coordinate-less pages: per-host page
    counts joined against a GeoNames-style toponym dimension (broadcast
    — it is dimension-sized at any corpus scale), AMBIGUOUS names
    (several gazetteer rows per name) resolved by max population with a
    deterministic gaz_id tie-break; located hosts are cell-encoded at
    res 4. The text/metadata-geolocation path of the north rule for the
    ~2/7 of pages the tag extractor cannot locate."""
    from zen3geo_spark.sources.gazetteer import synth_gazetteer

    pages = synth_pages(spark, N_PAGES)
    hosts = (pages.select(F.expr(URL_HOST_SQL).alias("host"))
             .groupBy("host").agg(F.count("*").alias("n_pages")))
    gaz = synth_gazetteer(spark)
    wname = Window.partitionBy("name")
    wbest = wname.orderBy(F.col("population").desc(), F.col("gaz_id").asc())
    best = (gaz.withColumn("rk", F.row_number().over(wbest))
            .withColumn("n_candidates", F.count("*").over(wname))
            .filter(F.col("rk") == 1))
    j = hosts.join(F.broadcast(best), hosts.host == best.name)
    return j.select(
        "host", "n_pages", "n_candidates", "lat_us", "lon_us",
        cell_encode(F.col("lat_us"), F.col("lon_us"), 4).alias("cell"))


def q_cell_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell crawl-volume TREND: OLS slope of 5-minute-epoch page
    counts per res-2 cell, kept as the exact bigint (numerator,
    denominator) pair (n*Sxy - Sx*Sy, n*Sxx - Sx*Sx) — the
    growing/shrinking-coverage screen that complements cell_anomaly's
    point outliers. Epochs are rebased to the crawl start so the
    moment sums stay far from bigint range at any corpus size."""
    pages = synth_pages(spark, N_PAGES)
    lat_s, lon_s = extract_first_geotag(F.col("text"))
    pts = (pages.select("warc_ts", lat_s.alias("lat_str"),
                        lon_s.alias("lon_str"))
           .filter(F.col("lat_str") != "")
           .select(F.expr("unix_timestamp(warc_ts) div 300 - 5680224")
                   .alias("t"),
                   cell_encode(micro_from_str(F.col("lat_str")),
                               micro_from_str(F.col("lon_str")), 2)
                   .alias("cell")))
    cnts = pts.groupBy("cell", "t").agg(F.count("*").alias("y"))
    n, st, sy = F.count("*"), F.sum("t"), F.sum("y")
    sxy = F.sum(F.col("t") * F.col("y"))
    sxx = F.sum(F.col("t") * F.col("t"))
    return cnts.groupBy("cell").agg(
        n.alias("n_epochs"), sy.alias("sum_y"),
        (n * sxy - st * sy).alias("slope_num"),
        (n * sxx - st * st).alias("slope_den"))


def q_simplify_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host trajectory simplification: one Visvalingam–Whyatt sweep
    over each host's geotag track (ordered by page id), integer-exact
    doubled-triangle-area test — endpoints kept, interior vertices kept
    iff area2 >= 5e15 µdeg². The polyline thinning pass that runs before
    trajectory_cover / map rendering; one (host, pid) window, the same
    shuffle every per-host rollup pays."""
    from zen3geo_spark.operators.simplify import simplify_sweep

    pages = synth_pages(spark, N_PAGES).select(
        F.expr(URL_HOST_SQL).alias("host"),
        F.expr(URL_PID_SQL).alias("pid"), "text")
    lat_s, lon_s = extract_first_geotag(F.col("text"))
    pts = (pages.select("host", "pid", lat_s.alias("lat_str"),
                        lon_s.alias("lon_str"))
           .filter(F.col("lat_str") != "")
           .select("host", "pid",
                   micro_from_str(F.col("lon_str")).alias("x_us"),
                   micro_from_str(F.col("lat_str")).alias("y_us")))
    return simplify_sweep(pts, key="host", seq="pid", x="x_us", y="y_us",
                          min_area2=5 * 10 ** 15)


def q_rect_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangle overlay join (PBSM): intersection areas between the
    even-id pages' ±1.5° viewport rects and the odd-id pages' ±1.0°
    rects — grid-blocked equi-join with reference-point dedup (a
    filter, not a distinct), exact µdeg² bigint areas. The oracle is
    the DIRECT theta join, so a hash match proves the blocked
    decomposition exact."""
    from zen3geo_spark.operators.overlay import rect_overlay_join

    pts = _points_df(spark)

    def rects(df, parity, half, pfx):
        return df.filter(F.col("point_id") % 2 == parity).select(
            F.col("point_id").alias(f"{pfx}_id"),
            F.greatest(F.col("lon_us") - half, F.lit(-180_000_000))
            .alias(f"{pfx}x1"),
            F.greatest(F.col("lat_us") - half, F.lit(-90_000_000))
            .alias(f"{pfx}y1"),
            F.least(F.col("lon_us") + half, F.lit(180_000_000))
            .alias(f"{pfx}x2"),
            F.least(F.col("lat_us") + half, F.lit(90_000_000))
            .alias(f"{pfx}y2"))

    a = rects(pts, 0, 1_500_000, "a")
    b = rects(pts, 1, 1_000_000, "b")
    return rect_overlay_join(a, b, res=5)


def q_flow_basin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watershed basin labeling by pointer jumping: each pixel labeled
    with the cell its D8 flow path reaches after 2^2 = 4 routing steps
    — 2 self-joins instead of 4 (the O(log k) doubling trick, on the
    flow DAG). The pointee join side is unique per cell, so popular
    termini never fan out. Integer => bit-exact vs the unrolled twin."""
    from zen3geo_spark.operators.raster_algebra import flow_basin

    img = q_rasterize_world_points(spark, sf_dir).select(
        "row", "col", F.col("value").cast("long").alias("value"))
    return flow_basin(img, width=360, height=180, jumps=2)


def q_flow_accum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded D8 flow accumulation (3 routing rounds) over the
    world-points raster: per pixel, own mass + everything arriving
    within 3 steepest-descent steps — the upstream-contributing-area
    approximation. One equi-join + map-side-combinable sum per round;
    integer => bit-exact vs the unrolled twin."""
    from zen3geo_spark.operators.raster_algebra import flow_accumulate

    img = q_rasterize_world_points(spark, sf_dir).select(
        "row", "col", F.col("value").cast("long").alias("value"))
    return flow_accumulate(img, width=360, height=180, rounds=3)


def q_flow_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 steepest-descent flow direction over the world-points count
    raster (hydrology routing on the DEM analogue): bounded fan-out 8 +
    one left join back onto the pixel table + integer-encoded argmax —
    tie-break toward the lowest direction index is inside the encoding,
    so the map is hash-exact."""
    from zen3geo_spark.operators.raster_algebra import flow_dir_d8

    img = q_rasterize_world_points(spark, sf_dir).select(
        "row", "col", F.col("value").cast("long").alias("value"))
    return flow_dir_d8(img, width=360, height=180)


_IOU_GT_SQL = """
    select i.i as image_id, i.i * 4 + k.k as gt_id,
           (i.i * 17 + k.k * 29) % 800 as gx1,
           (i.i * 23 + k.k * 31) % 800 as gy1,
           (i.i * 17 + k.k * 29) % 800 + 40 + (i.i * 3 + k.k * 7) % 60 as gx2,
           (i.i * 23 + k.k * 31) % 800 + 40 + (i.i * 5 + k.k * 11) % 60 as gy2
    from range(50) as i(i), range(4) as k(k)
"""

_IOU_PRED_SQL = """
    select i.i as image_id, i.i * 4 + k.k as pred_id,
           case when k.k < 3
             then (i.i * 17 + k.k * 29) % 800 + (i.i + k.k) % 15 - 7
             else (i.i * 53 + 13) % 800 end as px1,
           case when k.k < 3
             then (i.i * 23 + k.k * 31) % 800 + (i.i * 2 + k.k) % 15 - 7
             else (i.i * 59 + 17) % 800 end as py1,
           case when k.k < 3
             then (i.i * 17 + k.k * 29) % 800 + 40 + (i.i * 3 + k.k * 7) % 60
                  + (i.i + k.k) % 15 - 7
             else (i.i * 53 + 13) % 800 + 50 end as px2,
           case when k.k < 3
             then (i.i * 23 + k.k * 31) % 800 + 40 + (i.i * 5 + k.k * 11) % 60
                  + (i.i * 2 + k.k) % 15 - 7
             else (i.i * 59 + 17) % 800 + 50 end as py2
    from range(50) as i(i), range(4) as k(k)
"""


def q_dedup_pr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation harness over the dedup family: precision/recall of
    the CHEAP near-dup signal (SimHash hamming ≤ 8 on unigrams)
    against the EXACT ground truth (1-gram Jaccard ≥ 0.5) on the
    bounded audit slice — the methodology query that justifies which
    candidate generator a production dedup pass trusts. Integer counts
    + milli ratios ⇒ hash-exact."""
    from zen3geo_spark.operators._util import pair_all

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pred = (simhash_near_dups(docs, max_hamming=8, shingle_n=1)
            .select("a_id", "b_id")
            .filter("a_id < 200 and b_id < 200"))
    truth = (ngram_jaccard(docs.filter("doc_id < 200"), shingle_n=1,
                           threshold=0.9)
             .select("a_id", "b_id"))
    np_ = pred.agg(F.count("*").alias("n_pred"))
    nt = truth.agg(F.count("*").alias("n_truth"))
    nb = (pred.join(truth, ["a_id", "b_id"])
          .agg(F.count("*").alias("n_both")))
    return (pair_all(pair_all(np_, nt), nb)
            .selectExpr(
                "n_pred", "n_truth", "n_both",
                "case when n_pred = 0 then null "
                "else 1000 * n_both div n_pred end as precision_milli",
                "case when n_truth = 0 then null "
                "else 1000 * n_both div n_truth end as recall_milli"))


def q_layout_rle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-layout audit closing the OPTIMIZE-ZORDER story: count
    RLE runs of the res-6 cell column under (a) crawl/url order vs (b)
    z-order layout — the run collapse IS the dictionary/RLE
    compression and rowgroup-pruning win clustering buys. Runs are
    counted scale-safe: a global position (two-phase numbering) + one
    pos+1 self-EQUI-join to count adjacent-equal pairs — no global
    window anywhere. runs = n − adjacent_equal."""
    from zen3geo_spark.functions.geo import cell_encode
    from zen3geo_spark.operators._util import pair_all
    from zen3geo_spark.operators.combinators import with_global_pos

    pts = (_points_df(spark)
           .withColumn("cell", cell_encode(F.col("lat_us"),
                                           F.col("lon_us"), 6))
           .select("point_id", "cell"))

    def runs(order_cols, name):
        pos = with_global_pos(pts, order_cols, "_p")
        nxt = pos.selectExpr("_p - 1 as _p", "cell as _c2")
        eq = (pos.join(nxt, "_p")
              .agg(F.sum(F.when(F.col("cell") == F.col("_c2"), 1)
                         .otherwise(0)).alias("adj_eq"),
                   (F.count("*") + 1).alias("n")))
        return eq.selectExpr(f"n - adj_eq as {name}")

    u = runs(["point_id"], "runs_url_order")
    z = runs(["cell", "point_id"], "runs_zorder")
    return (pair_all(u, z)
            .selectExpr("runs_url_order", "runs_zorder",
                        "1000 * runs_url_order div runs_zorder"
                        " as collapse_milli"))


def q_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data profile that justifies a watermark choice: replay the
    stream in arrival order (event_id), track the running max event
    time per type, and count rows arriving more than 2 h behind it +
    the worst lateness — one ordered frame over the per-type stream,
    integer epoch seconds ⇒ hash-exact."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_type", "event_id",
        # lateness uses DIFFERENCES only, so the session-tz offset of
        # the NTZ→LTZ cast cancels against the DuckDB epoch() twin
        "unix_timestamp(cast(ts as timestamp)) as es")
    w = (Window.partitionBy("event_type").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    run = ev.withColumn("_hwm", F.max("es").over(w))
    return (run.groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.when(F.col("es") < F.col("_hwm") - 7200, 1)
                       .otherwise(0)).alias("n_late_2h"),
                 F.max(F.when(F.col("_hwm") > F.col("es"),
                              F.col("_hwm") - F.col("es"))
                       .otherwise(0)).alias("max_lateness_s")))


def q_equi_depth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style equi-depth histogram (32 buckets) over lineitem
    prices in exact integer cents — the CBO statistics collector:
    bucket = (global rank − 1) div ceil(n/32) with the scale-safe
    numbering, per-bucket min/max/rows/ndv. Exact rank boundaries, not
    a sample."""
    from zen3geo_spark.operators.combinators import with_global_pos

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "cast(round(l_extendedprice * 100) as bigint) as cents",
        "l_orderkey * 10 + l_linenumber as rid")
    n = li.count()
    w = -(-n // 32)
    ranked = with_global_pos(li, ["cents", "rid"], "pos")
    return (ranked.selectExpr(f"(pos - 1) div {w} as bucket", "cents")
            .groupBy("bucket")
            .agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"),
                 F.count("*").alias("n_rows"),
                 F.countDistinct("cents").alias("ndv")))


def q_join_card_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based join-cardinality estimation audited against the
    true join size — the CBO selectivity model as a query: bucket both
    sides' key distributions (equi-width, key div 8), estimate
    |A⋈B| per bucket as na·nb div ndv_max (uniform-within-bucket,
    container-ndv denominator), and report estimate vs actual."""
    from zen3geo_spark.operators._util import pair_all
    from zen3geo_spark.operators.linkgraph import synth_host_edges

    a = (synth_pages(spark, N_PAGES)
         .selectExpr(f"({URL_PID_SQL}) % 1000 as k"))
    b = synth_host_edges(spark, 1000).selectExpr("dst as k")
    ha = a.selectExpr("k div 8 as b8", "k").groupBy("b8").agg(
        F.count("*").alias("na"), F.countDistinct("k").alias("nda"))
    hb = b.selectExpr("k div 8 as b8", "k").groupBy("b8").agg(
        F.count("*").alias("nb"), F.countDistinct("k").alias("ndb"))
    est = (ha.join(hb, "b8")
           .selectExpr("na * nb div greatest(nda, ndb) as e")
           .agg(F.sum("e").alias("est_rows")))
    actual = (a.groupBy("k").agg(F.count("*").alias("ca"))
              .join(b.groupBy("k").agg(F.count("*").alias("cb")), "k")
              .agg(F.sum(F.col("ca") * F.col("cb")).alias("true_rows")))
    return pair_all(est, actual).selectExpr(
        "est_rows", "true_rows",
        "1000 * est_rows div true_rows as ratio_milli")


_STR_QBOX_SQL = """
    select i.i as q_id,
           (i.i * 48271 + 7) % 2147483647 % 300000001 - 150000000 as x1,
           ((i.i * 48271 + 7) * 48271 + 11) % 2147483647 % 140000001
             - 80000000 as y1,
           (i.i * 48271 + 7) % 2147483647 % 300000001 - 150000000
             + 30000000 as x2,
           ((i.i * 48271 + 7) * 48271 + 11) % 2147483647 % 140000001
             - 80000000 + 20000000 as y2
    from range(20) as i(i)
"""


def q_str_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R-tree QUERY against the STR-packed leaf directory: per query
    bbox, candidate leaves touched (MBR overlap) + candidate point
    budget vs the exact in-box count — the index-selectivity audit
    that justifies the bulk load. The leaf directory is index-sized ⇒
    constant-key broadcast; the exact side here scans (the audit);
    production uses the cell-blocked path for the answer itself."""
    from zen3geo_spark.operators._util import pair_all
    from zen3geo_spark.operators.spatial_join import str_pack_points

    qb = spark.sql(_STR_QBOX_SQL)
    pts = _points_df(spark)
    leaves = str_pack_points(pts, leaf_cap=64)
    cand = (pair_all(qb, leaves)
            .filter("minx_us <= x2 and maxx_us >= x1 and "
                    "miny_us <= y2 and maxy_us >= y1")
            .groupBy("q_id")
            .agg(F.count("*").alias("n_cand_leaves"),
                 F.sum("n_pts").alias("n_cand_points")))
    exact = (pair_all(pts, qb)
             .filter("lon_us between x1 and x2 and "
                     "lat_us between y1 and y2")
             .groupBy("q_id").agg(F.count("*").alias("n_exact")))
    return (qb.select("q_id")
            .join(cand, "q_id", "left").join(exact, "q_id", "left")
            .selectExpr("q_id",
                        "coalesce(n_cand_leaves, 0) as n_cand_leaves",
                        "coalesce(n_cand_points, 0) as n_cand_points",
                        "coalesce(n_exact, 0) as n_exact"))


def q_windowed_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE-sketch demonstration: distinct active users per 6 h
    window estimated by HyperLogLog register merge (max per register —
    map-side combinable into any window/rollup), audited against the
    exact per-window count distinct. The property that matters at
    10^12 events is that the registers merge; the groupBy is bounded
    by windows × 1024 cells."""
    from zen3geo_spark.functions.sketch import hll_estimate, hll_registers

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "timestampadd(HOUR, -(hour(date_trunc('hour', ts)) % 6), "
        "date_trunc('hour', ts)) as wstart",
        "cast(user_id as string) as u")
    est = hll_estimate(hll_registers(ev, "u", ("wstart",),
                                     use_arrow=False), ("wstart",))
    exact = ev.groupBy("wstart").agg(
        F.countDistinct("u").alias("true_distinct"))
    return (est.join(exact, "wstart")
            .select("wstart", F.round("est_distinct", 6)
                    .alias("est_distinct"),
                    "true_distinct", "registers_hit"))


def q_snapshot_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style expire-snapshots PLANNING: over a 120-snapshot
    metadata list, keep the most recent 7 plus the first snapshot of
    every 7-day bucket; everything else is marked expire. Pure window
    arithmetic over a metadata-sized table (snapshot lists are tiny by
    construction — the data files are never touched)."""
    from pyspark.sql.window import Window

    snaps = spark.range(120).selectExpr(
        "id as snap_id",
        "cast(19723 + id * 2 + id % 3 as long) as day_no")
    wr = Window.orderBy(F.col("day_no").desc(), F.col("snap_id").desc())
    ww = Window.partitionBy(F.expr("day_no div 7")).orderBy(
        "day_no", "snap_id")
    return (snaps
            .withColumn("_recent", F.row_number().over(wr))
            .withColumn("_wk_first", F.row_number().over(ww))
            .selectExpr(
                "snap_id", "day_no",
                "case when _recent <= 7 then 'recent' "
                "when _wk_first = 1 then 'weekly' "
                "else 'expire' end as action"))


def q_embed_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding distribution audit — the quantization
    calibration pass that picks int8 scales: posexplode → per-dim
    min/max and micro-scaled mean (floor(1e6·Σv) div n keeps the mean
    integer-exact; Σ of float32-exact doubles is order-stable after the
    1e-6 round both engines apply identically via the integer floor of
    the rounded sum)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = (emb.select(F.posexplode("embedding").alias("dim", "v"))
         .groupBy("dim")
         .agg(F.count("*").alias("n"),
              F.round(F.min("v"), 6).alias("min_v"),
              F.round(F.max("v"), 6).alias("max_v"),
              F.round(F.avg(F.col("v").cast("double")), 6)
              .alias("mean_v")))
    return d.select("dim", "n", "min_v", "max_v", "mean_v")


PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic data-quality profile (dbt-style): per column — null
    count, empty-string count, distinct count — via one stacked
    unpivot; the schema-drift / ingestion-health audit every pipeline
    fronts its tables with."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stacked = docs.selectExpr(
        "stack({}, {}) as (col, val)".format(
            len(PROFILE_COLS),
            ", ".join(f"'{c}', cast({c} as string)"
                      for c in PROFILE_COLS)))
    return (stacked.groupBy("col")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.when(F.col("val").isNull(), 1).otherwise(0))
                 .alias("n_null"),
                 F.sum(F.when(F.col("val") == "", 1).otherwise(0))
                 .alias("n_empty"),
                 F.countDistinct("val").alias("n_distinct")))


def q_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (the OLAP subtotal surface): doc counts and
    byte totals by (lang, source) with per-lang subtotals and a grand
    total — grouping levels tagged via grouping_id, NULL dimensions
    coalesced to 'ALL' so the row set is hash-stable."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (docs.rollup("lang", "source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.length("text")).alias("n_bytes"),
                 F.grouping_id().alias("gid"))
            .selectExpr("coalesce(lang, 'ALL') as lang",
                        "coalesce(source, 'ALL') as source",
                        "gid", "n_docs", "n_bytes"))


PIVOT_SOURCES = ["src0", "src1", "src2", "src3", "src4"]


def q_pivot_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (wide reshaping): doc counts per lang × source as one row
    per lang with a column per source — explicit pivot value list so
    the schema is deterministic; the twin is the equivalent
    conditional aggregation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = (docs.groupBy("lang").pivot("source", PIVOT_SOURCES).count())
    return out.select("lang", *[F.coalesce(F.col(s), F.lit(0))
                                .alias(s) for s in PIVOT_SOURCES])


def q_host_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer percent-rank of hosts by total bytes (percent_rank /
    cume_dist surface without FP): pr_milli = 1000·(rank−1) div (n−1),
    cume_milli = 1000·rank_max div n — exact rational arithmetic over
    one host-keyed aggregate; the global rank uses the scale-safe
    two-phase numbering (with_global_pos), never a single-partition
    Window, so the plan survives 10^8 hosts."""
    from zen3geo_spark.operators._util import pair_all
    from zen3geo_spark.operators.combinators import with_global_pos

    hosts = (synth_pages(spark, N_PAGES)
             .selectExpr(f"{URL_HOST_SQL} as host",
                         "length(text) as tl")
             .groupBy("host").agg(F.sum("tl").alias("bytes")))
    n = hosts.agg(F.count("*").alias("n"))
    ranked = pair_all(with_global_pos(hosts, ["bytes", "host"], "rk"), n)
    return ranked.selectExpr(
        "host", "bytes",
        "1000 * (rk - 1) div (n - 1) as pr_milli",
        "1000 * rk div n as cume_milli")


# engine-neutral TPC-H Q3/Q5 shapes in integer cents·percent units
# (price·100 and discount·100 are exact integers, so revenue is bigint
# and the top-k cutoff is deterministic — no FP sum-order dependence)
_REV_C = ("cast(round(l_extendedprice * 100) as bigint) * "
          "(100 - cast(round(l_discount * 100) as bigint))")

_Q3_SQL = f"""
    select l_orderkey,
           sum({_REV_C}) as revenue_c,
           o_orderdate, o_orderpriority
    from customer
    join orders on c_custkey = o_custkey
    join lineitem on l_orderkey = o_orderkey
    where c_mktsegment = 'BUILDING'
      and o_orderdate < timestamp '1997-03-15 00:00:00'
      and l_shipdate > timestamp '1997-03-15 00:00:00'
    group by l_orderkey, o_orderdate, o_orderpriority
    order by revenue_c desc, l_orderkey
    limit 10
"""

_Q5_SQL = f"""
    select n_name, sum({_REV_C}) as revenue_c,
           count(*) as n_items
    from customer
    join orders on c_custkey = o_custkey
    join lineitem on l_orderkey = o_orderkey
    join supplier on l_suppkey = s_suppkey
                 and s_nationkey = c_nationkey
    join nation on c_nationkey = n_nationkey
    join region on n_regionkey = r_regionkey
    where r_name = 'ASIA'
      and o_orderdate >= timestamp '1996-01-01 00:00:00'
      and o_orderdate < timestamp '1998-01-01 00:00:00'
    group by n_name
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): customer⋈orders⋈lineitem
    with selective predicates on both fact sides, top-10 orders by
    exact integer revenue — the classic join-ordering/broadcast
    benchmark over the driver's relational tables; Catalyst picks
    broadcast for the filtered customer side."""
    _register_tpch(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(_Q3_SQL)


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the 6-table snowflake
    join with the co-nationality constraint — region/nation dims
    broadcast, customer⋈orders⋈lineitem⋈supplier shuffle on keys;
    integer-cents revenue ⇒ hash-exact."""
    _register_tpch(spark, sf_dir,
                   ["customer", "orders", "lineitem", "supplier",
                    "nation", "region"])
    return spark.sql(_Q5_SQL)


def _register_tpch(spark: SparkSession, sf_dir: str,
                   tables: list[str]) -> None:
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


HEX_A, HEX_B = 5_000_000, 8_660_254  # ~near-regular 20°-wide hexes


def q_hex_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT hexagonal binning of the extracted geotag points (the H3
    tessellation shape with rational edges — three floor divisions +
    one integer edge test, no trig): per-hex counts + integer center
    coordinates."""
    from zen3geo_spark.functions.geo import hex_bin_sql

    ex = hex_bin_sql("lon_us", "lat_us", HEX_A, HEX_B, "spark")
    return (_points_df(spark)
            .selectExpr(f"{ex['q']} as q", f"{ex['r']} as r")
            .groupBy("q", "r")
            .agg(F.count("*").alias("n_points"))
            .selectExpr("q", "r", "n_points",
                        f"3 * {HEX_A} * q as cx",
                        f"{HEX_B} * q + 2 * {HEX_B} * r as cy"))


def q_cell_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell distinctive vocabulary — the geospatial × webtext
    product query ('what does this region talk about'): token lift =
    1000·n_ct·T div (n_c·n_t) against the corpus unigram distribution,
    top-3 tokens per res-3 cell by (lift desc, token). One token
    explode feeds both the per-cell and corpus aggregates; everything
    integer ⇒ hash-exact."""
    from pyspark.sql.window import Window

    from zen3geo_spark.functions.geo import cell_encode
    from zen3geo_spark.operators._util import pair_all

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    placed = docs.selectExpr(
        "doc_id", "text",
        "(doc_id * 48271 + 11) % 2147483647 % 180000001 - 90000000"
        " as lat_us",
        "((doc_id * 48271 + 11) % 2147483647 * 48271 + 7) % 2147483647"
        " % 360000001 - 180000000 as lon_us").withColumn(
        "cell", cell_encode(F.col("lat_us"), F.col("lon_us"), 3))
    toks = placed.select(
        "cell", F.explode(F.split(F.lower(F.col("text")), " "))
        .alias("tok")).filter("tok != ''")
    ct = toks.groupBy("cell", "tok").agg(F.count("*").alias("n_ct"))
    c = toks.groupBy("cell").agg(F.count("*").alias("n_c"))
    t = toks.groupBy("tok").agg(F.count("*").alias("n_t"))
    tot = toks.agg(F.count("*").alias("tt"))
    j = (pair_all(ct.join(c, "cell").join(t.filter("n_t >= 5"), "tok"),
                  tot)
         .selectExpr("cell", "tok",
                     "1000 * n_ct * tt div (n_c * n_t) as lift_milli"))
    w = Window.partitionBy("cell").orderBy(
        F.col("lift_milli").desc(), F.col("tok"))
    return (j.withColumn("_rk", F.row_number().over(w))
            .filter("_rk <= 3")
            .select("cell", F.col("_rk").alias("rk"), "tok",
                    "lift_milli"))


def q_skyline_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of hosts over (total text bytes,
    geo-tagged page count) — the 'best tradeoff set' analytics query,
    solved with TWO WINDOW FRAMES instead of the naive dominance
    self-join (which would be a nested loop): a host is dominated iff
    some strictly-larger-x host has y ≥ its y (integer RANGE frame
    ending at −1 on x) or an equal-x host has strictly larger y
    (partition max). Exact integers, no join at all."""
    from pyspark.sql.window import Window

    hosts = (synth_pages(spark, N_PAGES)
             .selectExpr(f"{URL_HOST_SQL} as host",
                         "length(text) as tl",
                         "case when text like '% lat=%' then 1 else 0 end"
                         " as tagged")
             .groupBy("host")
             .agg(F.sum("tl").alias("x"), F.sum("tagged").alias("y")))
    wgt = (Window.orderBy(F.col("x").desc())
           .rangeBetween(Window.unboundedPreceding, -1))
    weq = Window.partitionBy("x")
    return (hosts
            .withColumn("_m1", F.max("y").over(wgt))
            .withColumn("_m2", F.max("y").over(weq))
            .filter("( _m1 is null or _m1 < y ) and _m2 <= y")
            .select("host", "x", "y"))


def q_url_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy URL near-dup pairs inside each host: Levenshtein distance
    ≤ 2 over host-blocked candidate pairs (the typo/variant URL
    collapse) — both engines ship the classic unit-cost DP, so the
    distance is cross-engine exact; blocking keeps the pair space
    per-host quadratic, never corpus-quadratic."""
    pages = synth_pages(spark, N_PAGES).selectExpr(
        f"{URL_HOST_SQL} as host", "url", f"{URL_PID_SQL} as pid")
    a = pages.selectExpr("host", "url as a_url", "pid as a_pid")
    b = pages.selectExpr("host", "url as b_url", "pid as b_pid")
    return (a.join(b, "host")
            .filter("a_pid < b_pid")
            .withColumn("dist", F.levenshtein("a_url", "b_url"))
            .filter("dist <= 2")
            .select("host", "a_pid", "b_pid", "dist"))


_UNION_RECTS_SQL = """
    select i.i as rect_id,
           (i.i * 7919123) % 280000000 - 140000000 as x1,
           (i.i * 104729) % 120000000 - 60000000 as y1,
           (i.i * 7919123) % 280000000 - 140000000
             + 2000000 + (i.i % 7) * 900000 as x2,
           (i.i * 104729) % 120000000 - 60000000
             + 1500000 + (i.i % 5) * 800000 as y2
    from range(300) as i(i)
"""


def q_rect_union_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT union area of 300 overlapping coverage rects via the
    relational sweepline (strips from boundary ranks, per-strip
    gaps-and-islands interval merge) — ST_Area(ST_Union) semantics
    with zero geometry library."""
    from zen3geo_spark.operators.overlay import rect_union_area

    return rect_union_area(spark.sql(_UNION_RECTS_SQL))


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling bars per (6 h window, event_type) — the TSDB
    rollup: open/close via deterministic first/last picks
    ((ts, event_id) total order), high/low plain min/max. Two windows
    over one window-keyed shuffle."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_id", "ts", "event_type", "value",
        "date_trunc('hour', ts) as _h").selectExpr(
        "event_id", "ts", "event_type", "value",
        "timestampadd(HOUR, -(hour(_h) % 6), _h) as wstart")
    w = Window.partitionBy("wstart", "event_type")
    asc = w.orderBy("ts", "event_id")
    desc = w.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (ev.withColumn("_ra", F.row_number().over(asc))
            .withColumn("_rd", F.row_number().over(desc))
            .groupBy("wstart", "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.max(F.when(F.col("_ra") == 1,
                                      F.col("value"))), 4).alias("open"),
                 F.round(F.max("value"), 4).alias("high"),
                 F.round(F.min("value"), 4).alias("low"),
                 F.round(F.max(F.when(F.col("_rd") == 1,
                                      F.col("value"))), 4).alias("close")))


def q_ip_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix-match IP geolocation of crawl hosts against a
    synthetic CIDR table — constant-fanout prefix registration +
    broadcast equi-join + per-host most-specific argmax (the GeoIP
    lookup without a range join)."""
    from zen3geo_spark.functions.web import ip_geo_join, synth_cidr_sql
    from zen3geo_spark.operators.dedup import gram_hash40

    hosts = (synth_pages(spark, N_PAGES)
             .selectExpr(f"{URL_HOST_SQL} as host").distinct()
             .withColumn("ip", F.pmod(gram_hash40(F.col("host"), 1),
                                      F.lit(4294967296))))
    cidr = spark.sql(synth_cidr_sql(600, "spark"))
    return ip_geo_join(hosts, cidr)


def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive corpus integrity checksum (bit_xor fold of
    per-row canonical digests) — one aggregate, overflow-free at any
    scale, identical under any partitioning or row order."""
    from zen3geo_spark.functions.web import table_checksum

    return table_checksum(synth_pages(spark, N_PAGES))


def q_dom_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML structure statistics over the html BINARY column: tag
    count, distinct tag names, and MAX NESTING DEPTH via a per-page
    running sum over the tag stream (+1 open / −1 close, ordered by
    byte position) — the DOM-shape boilerplate signal, computed
    without a DOM parser: one regexp extract + one per-page window."""
    from pyspark.sql.window import Window

    pages = synth_pages(spark, N_PAGES)
    tags = (pages.selectExpr(
        "url",
        "regexp_extract_all(cast(html as string), '</?[a-zA-Z]+', 0)"
        " as _tags")
        .select("url", F.posexplode("_tags").alias("pos", "tag")))
    w = (Window.partitionBy("url").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, 0))
    depth = F.sum(F.when(F.col("tag").startswith("</"), -1)
                  .otherwise(1)).over(w)
    return (tags.withColumn("_d", depth)
            .groupBy("url")
            .agg(F.count("*").alias("n_tags"),
                 F.countDistinct(
                     F.regexp_replace("tag", "[</]", "")).alias("n_names"),
                 F.max("_d").alias("max_depth")))


def q_budget_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-budget allocation by largest-remainder apportionment
    (Hamilton method): distribute a fixed fetch budget across hosts
    proportionally to integer value scores — floor shares exactly sum
    to ≤ B, and the B − Σfloor leftover units go to the largest
    remainders. The remainder rank uses the scale-safe global
    numbering (with_global_pos), never a single-partition window, so
    the plan survives 10^8 hosts; Σ alloc == B exactly."""
    from zen3geo_spark.operators._util import pair_all
    from zen3geo_spark.operators.combinators import with_global_pos

    B = 10_000
    hosts = (synth_pages(spark, N_PAGES)
             .selectExpr(f"{URL_HOST_SQL} as host",
                         "length(text) as score")
             .groupBy("host").agg(F.sum("score").alias("score")))
    tot = hosts.agg(F.sum("score").alias("tot"))
    base = (pair_all(hosts, tot)
            .selectExpr("host", "score",
                        f"(score * {B}) div tot as floor_share",
                        f"(score * {B}) % tot as rem",
                        f"tot - ((score * {B}) % tot) as negrem"))
    left = base.agg((F.lit(B) - F.sum("floor_share")).alias("leftover"))
    ranked = with_global_pos(pair_all(base, left), ["negrem", "host"],
                             "_rk")
    return ranked.selectExpr(
        "host", "score",
        "floor_share + case when _rk <= leftover then 1 else 0 end"
        " as alloc")


def q_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding of the URL space:
    shard = argmax over shards of hash(url, shard). The consistency
    property — adding one shard moves only ~1/(S+1) of keys — is
    AUDITED in the output: per-shard counts at S=8 plus how many of
    each shard's keys move under S=9. Pure hash arithmetic, the
    shard loop is a constant-fanout explode."""
    from zen3geo_spark.operators.dedup import gram_hash40

    pages = synth_pages(spark, N_PAGES).select("url")

    def with_shard(df, n, out):
        cands = F.array(*[
            F.struct(gram_hash40(
                F.concat_ws("#", F.col("url"), F.lit(str(s))), 1).alias("h"),
                F.lit(s).alias("s"))
            for s in range(n)])
        pick = F.expr("array_sort(_cand)[size(_cand) - 1].s")
        return (df.withColumn("_cand", cands).withColumn(out, pick)
                .drop("_cand"))

    both = with_shard(with_shard(pages, 8, "shard8"), 9, "shard9")
    return (both.groupBy("shard8")
            .agg(F.count("*").alias("n_urls"),
                 F.sum(F.when(F.col("shard8") != F.col("shard9"), 1)
                       .otherwise(0)).alias("n_moved")))


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization training + code assignment (Jégou et al.
    2011) over int8-quantized embeddings: fully distributed join-based
    Lloyd per subspace, zero driver collects, integer-exact vs the
    unrolled twin."""
    from zen3geo_spark.operators.similarity import pq_train_codes

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pq_train_codes(emb, m=4, dsub=16, k=16, rounds=2)


def q_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k search over the PQ codes: per-query m×k distance
    table ⋈ code words — the scan never touches raw vectors. Each
    query ranks itself first at its quantization-error floor (queries
    stay in the corpus)."""
    from zen3geo_spark.operators.similarity import pq_search_adc

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pq_search_adc(emb, n_queries=3, top_k=5)


def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution by pointer doubling over synthetic
    3xx chains (page pid redirects to pid−1 except every 16th — chains
    up to 15 hops, resolved in 5 doublings). The oracle is the CLOSED
    FORM final = pid − pid%16, hops = pid%16 — a fully independent
    derivation, so the hash proves the iterative kernel exact."""
    from zen3geo_spark.operators.linkgraph import resolve_redirects

    edges = (synth_pages(spark, N_PAGES)
             .selectExpr(f"{URL_PID_SQL} as src")
             .filter("src % 16 != 0")
             .selectExpr("src", "src - 1 as dst"))
    return resolve_redirects(edges, rounds=5)


def q_iou_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-best IoU matching of predicted vs ground-truth boxes
    per image — the detection-eval pairing downstream of the
    reference's object-detection box pipeline. Exact integer IoU,
    mutual-argmax matching, one image-keyed shuffle."""
    from zen3geo_spark.operators.overlay import iou_match

    return iou_match(spark.sql(_IOU_PRED_SQL), spark.sql(_IOU_GT_SQL))


def q_graph_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible random-walk sampling over the host graph (the
    DeepWalk corpus pass): hash-argmin neighbor choice per step — a
    pure function of (edge, step), so the walk corpus is identical
    across engines, retries, and cluster sizes."""
    from zen3geo_spark.operators.linkgraph import (
        deterministic_walks, synth_host_edges,
    )

    return deterministic_walks(synth_host_edges(spark, 1000),
                               n_nodes=1000, steps=4)


def q_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX capture index over the WARC shards: SURT url keys + byte
    offsets from the REAL serialized record lengths (per-shard cumsum
    in page-id order — exactly the blob concatenation order). The twin
    recomputes lengths symbolically from the WARC/1.0 grammar, so the
    hash re-proves the byte framing."""
    from zen3geo_spark.sources.warc import cdx_index

    return cdx_index(synth_pages(spark, N_PAGES), records_per_file=200)


def q_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host politeness scheduling of the crawl frontier: queue rank
    per host (window row_number) × host crawl-delay → deterministic
    fetch slots and worker assignment — the frontier→fetcher planning
    pass of a distributed crawler, all window/arithmetic codegen."""
    from pyspark.sql.window import Window

    from zen3geo_spark.operators.dedup import gram_hash40

    pages = synth_pages(spark, N_PAGES).selectExpr(
        "url", f"{URL_HOST_SQL} as host", f"{URL_PID_SQL} as pid")
    w = Window.partitionBy("host").orderBy("pid")
    return (pages
            .withColumn("slot", F.row_number().over(w) - 1)
            .withColumn("_h", gram_hash40(F.col("host"), 1))
            .selectExpr(
                "url", "host", "slot",
                "slot * (1 + _h % 5) as sched_s",
                "_h % 32 as worker"))


def q_image_chips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xbatcher chipping over REAL decoded netpbm rasters (floor
    semantics, trailing partials dropped) with per-chip stats — decode
    + XbatcherSlicer composed in one Arrow pass; the oracle recomputes
    every chip from the synthetic pixel formula."""
    from zen3geo_spark.operators.multimodal import (
        chip_image_stats, synth_media,
    )

    out = chip_image_stats(synth_media(spark, 300), chip=8)
    return out.select("media_id", "chip_row", "chip_col",
                      F.round("mean_px", 6).alias("mean_px"),
                      "min_px", "max_px")


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING event-time windows (6 h length, 2 h slide — the overlap
    variant tumbling_window doesn't cover): per (window, event_type)
    counts via F.window's multi-assignment."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(F.window("ts", "6 hours", "2 hours").alias("w"),
                       "event_type")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n"))


def q_geo_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact Lloyd k-means over the extracted geotag points
    (POI/hotspot clustering): broadcast-literal argmin assignment +
    k-row centroid updates per round — the IVF coarse-quantizer
    training pattern on geographic coordinates, bit-identical to the
    DuckDB unrolled twin."""
    from zen3geo_spark.operators.geo_cluster import geo_kmeans

    return geo_kmeans(_points_df(spark).select("lon_us", "lat_us"),
                      k=12, rounds=3)


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup→view→click→purchase funnel over the events table
    (earliest-completion semantics): k conditional aggregates sharing
    one user-key partitioning — no per-event window, no explode."""
    from zen3geo_spark.operators.temporal import funnel_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel_counts(ev, ["signup", "view", "click", "purchase"])


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix over crawl epochs: cohort = a host's
    first-seen epoch; cell (cohort, epoch) = hosts of that cohort still
    crawled in that epoch. Two host-keyed aggregates + one join — the
    classic product-analytics rollup re-expressed on crawl activity."""
    pages = synth_pages(spark, N_PAGES).selectExpr(
        f"{URL_HOST_SQL} as host", f"({URL_PID_SQL}) div 500 as epoch")
    act = pages.groupBy("host", "epoch").agg(F.count("*").alias("n"))
    first = act.groupBy("host").agg(F.min("epoch").alias("cohort"))
    return (act.join(first, "host")
            .groupBy("cohort", "epoch")
            .agg(F.countDistinct("host").alias("n_hosts")))


def q_suffix_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed suffix-array construction (Manber–Myers prefix
    doubling) over the corpus token stream — the ExactSubstr-dedup
    infrastructure (Lee et al. 2022). 8 doubling rounds (covers
    254-token docs; sentinels bound comparisons at doc ends), each one
    offset equi-join + distinct-pair dense rank via the scale-safe
    global numbering."""
    from zen3geo_spark.operators.suffix import suffix_ranks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return suffix_ranks(docs, rounds=8)


def q_poly_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Intersects polygon×polygon join (diamonds × squares): PBSM
    bbox blocking + reference-point dedup, then the classical
    decomposition — proper edge crossing ∪ first-vertex containment
    either way. Oracle is the direct theta join ⇒ hash match proves
    the blocked plan exact."""
    from zen3geo_spark.operators.overlay import (
        polygon_intersect_join, synth_poly_edges_sql,
    )

    ea = spark.sql(synth_poly_edges_sql(120, 11, "diamond", "a"))
    eb = spark.sql(synth_poly_edges_sql(120, 23, "square", "b"))
    return polygon_intersect_join(ea, eb, res=4)


def q_bigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram-LM perplexity per document (Laplace-smoothed
    — the CCNet perplexity filter one order up from unigram_logppl)."""
    from zen3geo_spark.functions.text import bigram_logppl

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bigram_logppl(docs).select(
        "doc", F.round("logppl", 6).alias("logppl"))


def q_change_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster change detection between two crawl-epoch density rasters
    (even/odd page ids): per-pixel class (density capped at 3) →
    full-outer pixel join → class-transition matrix. The join key is
    the unique pixel — skew-free at any scale; output is classes²."""
    from zen3geo_spark.operators.raster_algebra import change_matrix

    pts = _points_df(spark)

    def epoch(parity: int) -> DataFrame:
        return (pts.filter(F.expr(f"point_id % 2 = {parity}"))
                .selectExpr(
                    "least((lat_us + 90000000) div 10000000, 17) as row",
                    "least((lon_us + 180000000) div 10000000, 35) as col")
                .groupBy("row", "col")
                .agg(F.least(F.count("*"), F.lit(3))
                     .cast("long").alias("cls")))

    return change_matrix(epoch(0), epoch(1))


def q_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-intersection sketch: Jaccard + distinct-union estimates
    between the en and de corpus vocabularies from a k-minimum-values
    sample — two vocabulary aggregates + a TakeOrdered, nothing
    data-sized on the wire."""
    from zen3geo_spark.functions.sketch import kmv_intersect

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return kmv_intersect(docs.filter("lang = 'en'"),
                         docs.filter("lang = 'de'"), k=256)


def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg/Delta VERSION AS OF: reconstruct the page table at three
    pinned CDC versions in ONE scan (constant version fan-out +
    map-side-combinable last-writer-wins arg-max). Each key carries 2–3
    ops across the version pins, so the three snapshots genuinely
    differ."""
    from zen3geo_spark.operators.temporal import snapshot_as_of

    log = synth_pages(spark, N_PAGES).selectExpr(
        f"concat('k', cast(({URL_PID_SQL}) % 2000 as string)) as k",
        f"{URL_PID_SQL} as ord",
        f"case when ({URL_PID_SQL}) % 10 = 0 then 'D' else 'U' end as op",
        "lang", f"({URL_PID_SQL}) % 7 as band")
    return snapshot_as_of(log, "k", "ord", [1500, 3500, 4800],
                          ["lang", "band"])


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join through the REAL streaming engine
    (conversion-attribution shape: purchase × trailing-2-hour views per
    user), watermarks + event-time range condition, append-mode memory
    sink under availableNow — must emit exactly the batch join, so the
    stream-stream state-store path itself is value-hash-checked."""
    from zen3geo_spark.streaming.windows import stream_pair_join_to_memory

    return stream_pair_join_to_memory(spark, f"{sf_dir}/events.parquet")


def q_seg_crossings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proper segment-intersection join: host-track segments × synthetic
    border fences (the ST_Crosses trajectory/border primitive). PBSM
    cell blocking + reference-point dedup + four exact orientation
    signs; the span guard on segment extent bounds every segment's cell
    fan-out. DuckDB twin is the direct theta join ⇒ the hash match
    proves the blocked decomposition exact."""
    from pyspark.sql.window import Window

    from zen3geo_spark.operators.overlay import segment_intersect_join

    pts = _points_df(spark).select(
        F.pmod(F.col("point_id"), F.lit(200)).alias("host_id"),
        F.col("point_id").alias("t"), F.col("lon_us").alias("x"),
        F.col("lat_us").alias("y"))
    w = Window.partitionBy("host_id").orderBy("t", "x", "y")
    segs = (pts
            .withColumn("_t1", F.lead("t").over(w))
            .withColumn("_x1", F.lead("x").over(w))
            .withColumn("_y1", F.lead("y").over(w))
            .filter("_t1 is not null and _t1 - t <= 1000"
                    " and abs(_x1 - x) <= 120000000"
                    " and abs(_y1 - y) <= 120000000")
            .selectExpr("host_id * 4000000000 + t as a_id",
                        "x as asx0", "y as asy0",
                        "_x1 as asx1", "_y1 as asy1"))
    borders = spark.range(24).selectExpr(
        "id as b_id",
        "cast(-180000000 + id * 15000000 as bigint) as bsx0",
        "cast(-80000000 as bigint) as bsy0",
        "cast(-175000000 + id * 15000000 as bigint) as bsx1",
        "cast(80000000 as bigint) as bsy1")
    return segment_intersect_join(segs, borders, res=4)


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer Flesch–Kincaid readability statistics per page — the
    readability band filter of a curation pipeline. All scaled integer
    arithmetic (vowel-group syllables, terminal-punct sentences, floor
    divisions) in whole-stage codegen ⇒ hash-exact; the rollup the
    caller would add is a plain groupBy."""
    from zen3geo_spark.functions.text import readability_sql

    ex = readability_sql("text", "spark")
    return synth_pages(spark, N_PAGES).selectExpr(
        "url", *[f"{sql} as {name}" for name, sql in ex.items()])


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style segment-level cleanup over the pages table: keep only
    terminal-punctuation segments with ≥3 whitespace tokens, drop pages
    with no survivor, rebuild clean_text in source order. Higher-order
    array exprs, one scan, no shuffle — byte-stable output."""
    from zen3geo_spark.operators.curation import c4_segment_clean

    return c4_segment_clean(synth_pages(spark, N_PAGES), "url", "text",
                            min_tokens=3)


def q_lang_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-detected language confusion matrix over documents —
    the metadata-trust audit (CLD-mismatch filter shape): one scan +
    one small groupBy on the (declared, detected) pair."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (docs.select(F.col("lang").alias("declared"),
                        lang_id(F.col("text")).alias("detected"))
            .groupBy("declared", "detected")
            .agg(F.count("*").alias("n_docs")))


def q_equalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram equalization of the world count-raster: the contrast
    stretch every tile-server styling pass runs. The CDF comes from a
    value-cardinality histogram + one tiny window — never a global sort
    of the pixels — and the value→level map broadcasts back. Integer ⇒
    hash-exact."""
    from zen3geo_spark.operators.raster_algebra import equalize_histogram

    img = q_rasterize_world_points(spark, sf_dir).select(
        "row", "col", F.col("value").cast("long").alias("value"))
    return equalize_histogram(img, levels=16)


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE bin-pack planning over a synthetic file manifest:
    sorted greedy fill cuts each partition's largest-first running byte
    sum at the target size — Iceberg's BinPackStrategy as a query over
    metadata (the manifest, never the data). Integer + deterministic
    tie-break ⇒ hash-exact."""
    from zen3geo_spark.plans.compaction import compaction_plan

    files = spark.range(500).selectExpr(
        "id % 20 as part", "id as file_id",
        "((id * 48271 + 7) % 97 + 1) * 10 as mb")
    return compaction_plan(files, "part", "file_id", "mb",
                           target_bytes=1024)


def q_track_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-cadence trajectory resampling of per-host geotag tracks:
    integer linear interpolation at 64-unit grid times, outage segments
    (gap > 1000) dropped — the guard that also bounds the per-segment
    explode. Exact micro-degree floor-division arithmetic both engines
    ⇒ hash-exact."""
    from zen3geo_spark.operators.trajectory import track_resample

    pts = _points_df(spark).select(
        F.pmod(F.col("point_id"), F.lit(200)).alias("host_id"),
        F.col("point_id").alias("t"), F.col("lon_us").alias("x"),
        F.col("lat_us").alias("y"))
    return track_resample(pts, "host_id", "t", "x", "y",
                          step=64, max_gap=1000)


def q_bearing_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host movement-bearing octant histogram over geotag tracks
    (heading-distribution audit: a host that only ever moves east is a
    scraper artifact). Integer sign / doubled-magnitude octants — the
    slope_aspect discipline with geographic north-positive y."""
    from zen3geo_spark.operators.trajectory import bearing_mix

    pts = _points_df(spark).select(
        F.pmod(F.col("point_id"), F.lit(200)).alias("host_id"),
        F.col("point_id").alias("t"), F.col("lon_us").alias("x"),
        F.col("lat_us").alias("y"))
    return bearing_mix(pts, "host_id", "t", "x", "y")


def q_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: document-level token co-occurrence with
    exact integer PMI sufficient statistics (n_ab, n_a, n_b, N) — the
    log is left to the consumer so the table is hash-exact. df band +
    per-doc distinct-token cap guard the quadratic pair join (the
    synthetic corpus's ~31-token ubiquitous vocab needs the band wide
    open; production keeps it tight)."""
    from zen3geo_spark.functions.text import pmi_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pmi_pairs(docs, min_df=3, max_df=1_000_000, min_pair=3,
                     max_doc_toks=80)


def q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword salience: integer fixed-point PageRank over the
    word-adjacency graph (consecutive in-doc tokens, undirected) — the
    link-graph superstep kernel composed onto text. Adjacency = one
    per-doc lead window; each round one equi-join + combinable sum.
    Bit-exact vs the unrolled DuckDB twin."""
    from zen3geo_spark.functions.text import textrank_keywords

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textrank_keywords(docs, min_df=3, max_df=1_000_000, iters=4)


def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided integer CUSUM drift screen over per-host crawl-volume
    series (text bytes per epoch): flags sustained shifts a per-point
    spike test misses. The sequential CUSUM recurrence is rewritten
    closed-form as prefix-sum minus running-min — two sums + two mins
    over ONE (host, epoch) window shuffle. All bigint ⇒ hash-exact."""
    from zen3geo_spark.operators.temporal import cusum_screen

    series = (synth_pages(spark, N_PAGES)
              .selectExpr(f"({URL_PID_SQL}) % 50 as host_id",
                          f"({URL_PID_SQL}) div 500 as epoch",
                          "length(text) as tl")
              .groupBy("host_id", "epoch")
              .agg(F.sum("tl").alias("vol")))
    return cusum_screen(series, "host_id", "epoch", "vol",
                        drift_k=20, threshold=60)


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (Iceberg/Delta upsert) semantics over the canonical
    page table: fold a re-crawl change batch (update / delete / insert
    ops, last-op-wins CDC collapse via struct-max) into the base
    snapshot through ONE url-keyed full-outer equi-join — unique keys
    both sides, skew-free, bucket-co-locatable at 10^12 rows. Output =
    next snapshot + an action audit column; hash-exact."""
    from zen3geo_spark.operators.temporal import merge_upsert

    pages = synth_pages(spark, N_PAGES).selectExpr(
        "url", f"{URL_PID_SQL} as pid", "lang")
    base = pages.filter("pid < 4000").selectExpr(
        "url", "lang", "pid % 7 as band")
    upd = (pages.filter("pid >= 3000")
           .selectExpr("url", "pid as ord",
                       "case when pid % 10 = 0 then 'D' else 'U' end as op",
                       "concat(lang, '2') as lang", "pid % 7 + 1 as band"))
    return merge_upsert(base, upd, "url", "ord")


def q_distance_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded chamfer-(3,4) distance transform over the world
    count-raster (gdal_proximity shape): distance-to-nearest populated
    tile (value ≥ 2) for everything within 3 chamfer steps. Per round a
    fan-out-8 projection + map-side-combinable min — sparse, no dense
    canvas. Integer chamfer units ⇒ hash-exact."""
    from zen3geo_spark.operators.raster_algebra import distance_transform

    img = (q_rasterize_world_points(spark, sf_dir)
           .filter(F.col("value") >= 2)
           .select("row", "col", F.col("value").cast("long").alias("value")))
    return distance_transform(img, width=360, height=180, rounds=3)


def q_polygonize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster polygonize (gdal_polygonize shape): 4-connected
    equal-class regions of the density-classified world raster
    (cls = least(value, 3)), labeled by the dedup CC kernel
    (contraction + pointer jumping) and aggregated to (region, class,
    pixel count, bbox). Adjacency = two shifted self-equi-joins — fanout
    ≤ 2 per pixel; a continent-sized region costs O(log diameter)
    rounds. Integer ⇒ hash-exact vs the recursive-CTE twin."""
    from zen3geo_spark.operators.raster_algebra import polygonize_regions

    img = q_rasterize_world_points(spark, sf_dir).select(
        "row", "col", F.least(F.col("value"), F.lit(3))
        .cast("long").alias("cls"))
    return polygonize_regions(img, width=360)


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded HITS hubs-and-authorities over the host link graph in
    integer fixed-point (max-norm rescale instead of FP L2 — ranking
    preserved, every score integer): the directory-page vs
    destination-page separation a crawl seed-list builder needs and
    PageRank can't express. Per half-step: one edge⋈score equi-join +
    map-side-combinable sum + a one-row max broadcast. Bit-exact vs
    the unrolled DuckDB twin."""
    from zen3geo_spark.operators.linkgraph import (
        hits_fixed_point, synth_host_edges,
    )

    edges = synth_host_edges(spark, n_hosts=1000)
    return hits_fixed_point(edges, n_nodes=1000, iters=2)


def q_link_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard similarity between host pairs over the
    dense undirected graph (mirror-site / link-prediction signal):
    wedge equi-join through the common neighbor with the hot-center
    degree guard — never all-pairs; union size from the degree table.
    Integer (n_common, n_union) sufficient statistics ⇒ hash-exact."""
    from zen3geo_spark.operators.linkgraph import (
        neighbor_jaccard, synth_host_edges_dense,
    )

    edges = synth_host_edges_dense(spark, n_hosts=1000)
    return neighbor_jaccard(edges, max_deg=64, min_common=2)


def q_slope_aspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEM-style slope/aspect map algebra over the world-points count
    raster: central-difference gradient (gx, gy) via a fan-out-4
    scatter + group-by (sparse, never a dense canvas or 4-way
    self-join) and an integer aspect-octant classification — no atan2,
    so the output is hash-exact."""
    from zen3geo_spark.operators.raster_algebra import slope_aspect

    img = q_rasterize_world_points(spark, sf_dir).select(
        "row", "col", F.col("value").cast("long").alias("value"))
    return slope_aspect(img, width=360, height=180)


N_SEGMENTS = 400


def _segment_col_exprs() -> dict[str, str]:
    """Engine-neutral reference-segment columns over bigint ``id``
    (seg_id, x1, y1, x2, y2): LCG endpoints with extent <= ~1.4e6 udeg
    so every segment spans O(1) res-6 cells (map_match's registration
    contract)."""
    s1 = "((id * 48271 + 101) % 2147483647)"
    s2 = f"(({s1} * 48271 + 211) % 2147483647)"
    s3 = f"(({s2} * 48271 + 307) % 2147483647)"
    s4 = f"(({s3} * 48271 + 401) % 2147483647)"
    x1 = f"({s1} % 360000001 - 180000000)"
    y1 = f"({s2} % 180000001 - 90000000)"
    return {
        "seg_id": "id",
        "x1": x1,
        "y1": y1,
        "x2": f"least(greatest({x1} + ({s3} % 2000001 - 1000000), "
              f"-180000000), 180000000)",
        "y2": f"least(greatest({y1} + ({s4} % 2000001 - 1000000), "
              f"-90000000), 90000000)",
    }


def q_map_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map matching: snap every extracted page point to its nearest
    reference segment within the 3x3 ring at res 6 (two-sided cell
    gate: segments register under their bbox cells, points probe their
    ring — an equi-join, never an all-pairs distance join). The snap is
    fixed-point integer arithmetic (T=64 projection, distance at T^2
    scale with no division), so (t_scaled, d2) are hash-exact; the
    oracle expresses the same gate as a direct range-overlap predicate,
    proving the blocked decomposition exact."""
    from zen3geo_spark.operators.map_match import map_match

    pts = _points_df(spark)
    segs = spark.range(N_SEGMENTS).selectExpr(
        *[f"{e} as {k}" for k, e in _segment_col_exprs().items()])
    return map_match(pts, segs, res=6)


def q_link_geo_propagate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geotag label propagation over the link graph: coordinate-less
    pages (the ~1/7 the extractor cannot locate) inherit the MAJORITY
    res-3 cell of the tagged pages that link to them (one hop; count
    desc, cell asc tie-break). Join shapes: links equi-join tagged
    sources on page id, one (dst, cell) count, one bounded argmax
    window — the web-graph sibling of geo_backfill's host-modal rule
    and knn_classify's spatial vote."""
    links = spark.range(N_PAGES).select(
        F.col("id").alias("src"),
        ((F.col("id") * 2654435761) % N_PAGES).alias("dst"))
    tagged = _points_df(spark).select(
        F.col("point_id").alias("src"),
        cell_encode(F.col("lat_us"), F.col("lon_us"), 3).alias("cell"))
    votes = (links.join(tagged, "src")
             .filter(F.col("dst") % 7 == 3)
             .groupBy("dst", "cell").agg(F.count("*").alias("n_votes")))
    w = Window.partitionBy("dst").orderBy(
        F.col("n_votes").desc(), F.col("cell").asc())
    tot = Window.partitionBy("dst")
    return (votes
            .withColumn("n_tagged_in", F.sum("n_votes").over(tot))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(F.col("dst").alias("page_id"), "cell",
                    "n_votes", "n_tagged_in"))


def q_contour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isoline extraction over the world-points count raster: every
    4-adjacent pixel-pair crossing of the count threshold (marching-
    squares edge test, implicit-zero semantics) — the raster→vector
    step behind gdal_contour / heatmap outlines. Sparse fan-out-3
    scatter + one group-by; integer values, hash-exact."""
    from zen3geo_spark.operators.raster_algebra import contour_crossings

    img = q_rasterize_world_points(spark, sf_dir).select(
        "row", "col", F.col("value").cast("long").alias("value"))
    return contour_crossings(img, width=360, height=180, threshold=2)


STAY_R2 = 10 ** 16  # squared planar run-continuity radius (~1e8 udeg)


def q_stay_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stay-point / local-burst detection per crawl host: maximal runs
    of consecutive geotagged pages whose hop distance stays within the
    run radius (gaps-and-islands: break flag -> running-sum group id),
    keeping runs of >= 3 pages with their exact integer centroid
    (shift-before-divide keeps the floor division non-negative, so
    Spark ``div`` and DuckDB ``//`` agree). The mobility-mining
    primitive (stay points) applied to host geo-consistency runs."""
    pages = synth_pages(spark, N_PAGES).select(
        F.expr(URL_HOST_SQL).alias("host"),
        F.expr(URL_PID_SQL).alias("pid"), "text")
    lat_s, lon_s = extract_first_geotag(F.col("text"))
    pts = (pages.select("host", "pid", lat_s.alias("lat_str"),
                        lon_s.alias("lon_str"))
           .filter(F.col("lat_str") != "")
           .select("host", "pid",
                   micro_from_str(F.col("lat_str")).alias("lat_us"),
                   micro_from_str(F.col("lon_str")).alias("lon_us")))
    w = Window.partitionBy("host").orderBy("pid")
    dlat = F.col("lat_us") - F.lag("lat_us").over(w)
    dlon = F.col("lon_us") - F.lag("lon_us").over(w)
    brk = F.when(F.lag("lat_us").over(w).isNull()
                 | (dlat * dlat + dlon * dlon > STAY_R2), 1).otherwise(0)
    grp = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    runs = (pts.withColumn("grp", grp)
            .groupBy("host", "grp")
            .agg(F.count("*").alias("n_pages"),
                 F.min("pid").alias("first_pid"),
                 F.max("pid").alias("last_pid"),
                 F.sum("lat_us").alias("_slat"),
                 F.sum("lon_us").alias("_slon")))
    n = F.col("n_pages")
    return (runs.filter(n >= 3)
            .select("host", "first_pid", "last_pid", "n_pages",
                    F.expr("(_slat + n_pages * 90000000) div n_pages"
                           " - 90000000").alias("ctr_lat_us"),
                    F.expr("(_slon + n_pages * 180000000) div n_pages"
                           " - 180000000").alias("ctr_lon_us")))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages → extract → cell-encode → PIP join → per-polygon
    counts joined with world-tile counts (sf0.001-scale shapes)."""
    pts = _points_df(spark)
    pip = points_in_polygons(pts, _polys_df(spark), res=4, broadcast_polys=True)
    per_geom = pip.groupBy("geom_id").agg(F.count("*").alias("n_points"))
    cells = pts.withColumn("cell", cell_encode(F.col("lat_us"), F.col("lon_us"), 6))
    top_cells = (
        cells.groupBy("cell").agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("cell").asc()).limit(10)
    )
    from zen3geo_spark.operators._util import pair_all
    return pair_all(
        per_geom,
        top_cells.agg(F.count("*").alias("n_top_cells"),
                      F.sum("n").alias("pages_in_top_cells")),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Ordered RISKIEST-FIRST: the driver's correctness harness caps at 50
    entries (positional), so new-this-round and recently-changed queries
    lead, and the longest-stable trivial scans/aggregates trail — only
    queries that have hash-matched in every prior round may fall outside
    the window."""
    return {
        # --- newest: time travel, stream-stream join, crossings ---
        "dedup_pr_audit": q_dedup_pr_audit,
        "layout_rle_audit": q_layout_rle_audit,
        "late_data_audit": q_late_data_audit,
        "equi_depth_hist": q_equi_depth_hist,
        "join_card_est": q_join_card_est,
        "str_query": q_str_query,
        "windowed_hll": q_windowed_hll,
        "snapshot_expiry": q_snapshot_expiry,
        "embed_calibration": q_embed_calibration,
        "table_profile": q_table_profile,
        "rollup_report": q_rollup_report,
        "pivot_langs": q_pivot_langs,
        "host_percentiles": q_host_percentiles,
        "shipping_priority": q_shipping_priority,
        "local_supplier_volume": q_local_supplier_volume,
        "hex_bins": q_hex_bins,
        "cell_topics": q_cell_topics,
        "skyline_hosts": q_skyline_hosts,
        "url_editdist": q_url_editdist,
        "rect_union_area": q_rect_union_area,
        "ohlc_bars": q_ohlc_bars,
        "ip_geo": q_ip_geo,
        "table_checksum": q_table_checksum,
        "dom_stats": q_dom_stats,
        "budget_alloc": q_budget_alloc,
        "rendezvous_shards": q_rendezvous_shards,
        "pq_codes": q_pq_codes,
        "pq_search": q_pq_search,
        "redirect_resolve": q_redirect_resolve,
        "iou_match": q_iou_match,
        "graph_walks": q_graph_walks,
        "cdx_index": q_cdx_index,
        "fetch_schedule": q_fetch_schedule,
        "image_chips": q_image_chips,
        "sliding_window": q_sliding_window,
        "geo_kmeans": q_geo_kmeans,
        "funnel": q_funnel,
        "retention_cohorts": q_retention_cohorts,
        "suffix_ranks": q_suffix_ranks,
        "poly_intersect": q_poly_intersect,
        "bigram_logppl": q_bigram_logppl,
        "change_detect": q_change_detect,
        "kmv_intersect": q_kmv_intersect,
        "time_travel": q_time_travel,
        "stream_join": q_stream_join,
        "seg_crossings": q_seg_crossings,
        "readability": q_readability,
        "c4_clean": q_c4_clean,
        "lang_mismatch": q_lang_mismatch,
        # --- link-graph traversal + raster map algebra ---
        "equalize": q_equalize,
        "compaction_plan": q_compaction_plan,
        "track_resample": q_track_resample,
        "bearing_mix": q_bearing_mix,
        "pmi_pairs": q_pmi_pairs,
        "textrank": q_textrank,
        "cusum_drift": q_cusum_drift,
        "merge_upsert": q_merge_upsert,
        "distance_transform": q_distance_transform,
        "polygonize": q_polygonize,
        "hits": q_hits,
        "link_jaccard": q_link_jaccard,
        "flow_basin": q_flow_basin,
        "flow_accum": q_flow_accum,
        "flow_dir": q_flow_dir,
        "lang_authority": q_lang_authority,
        "degree_mixing": q_degree_mixing,
        "kcore": q_kcore,
        "cheapest_paths": q_cheapest_paths,
        "scd2_history": q_scd2_history,
        "triangles": q_triangles,
        "bfs_hops": q_bfs_hops,
        "cocitation": q_cocitation,
        "contour": q_contour,
        "stay_points": q_stay_points,
        "map_match": q_map_match,
        "slope_aspect": q_slope_aspect,
        "link_geo_propagate": q_link_geo_propagate,
        "simplify_track": q_simplify_track,
        "rect_overlay": q_rect_overlay,
        "focal_stats": q_focal_stats,
        "idw_grid": q_idw_grid,
        "geocode_gazetteer": q_geocode_gazetteer,
        "cell_trend": q_cell_trend,
        # --- new this session: cell-set algebra + grid clustering ---
        "compact_cells": q_compact_cells,
        "compact_roundtrip": q_compact_roundtrip,
        "grid_dbscan": q_grid_dbscan,
        "warc_roundtrip": q_warc_roundtrip,
        "stream_dedup": q_stream_dedup,
        "polygon_cover": q_polygon_cover,
        "crawl_transitions": q_crawl_transitions,
        "trajectory_cover": q_trajectory_cover,
        "disk_cover": q_disk_cover,
        "coverage_delta": q_coverage_delta,
        "cover_rollup": q_cover_rollup,
        "str_pack": q_str_pack,
        "interval_join": q_interval_join,
        "bpe_train": q_bpe_train,
        "bpe_encode": q_bpe_encode,
        "moran_i": q_moran_i,
        "local_moran": q_local_moran,
        "snapshot_prune": q_snapshot_prune,
        "cell_diversity": q_cell_diversity,
        "cell_anomaly": q_cell_anomaly,
        # --- new this round (r5) ---
        "zarr_like_scan": q_zarr_like_scan,
        "stack_cast_fill": q_stack_cast_fill,
        "contamination": q_contamination,
        "dup_spans": q_dup_spans,
        "stratified_sample": q_stratified_sample,
        # --- new this round (r5, late additions — kept inside the
        #     driver's correctness window so each gets a first check) ---
        "audio_stats": q_audio_stats,
        "pii_redact": q_pii_redact,
        "url_blocklist": q_url_blocklist,
        "count_min": q_count_min,
        "asof_join": q_asof_join,
        "pagerank": q_pagerank,
        "subword_tokens": q_subword_tokens,
        "quality_classifier": q_quality_classifier,
        "ann_int8": q_ann_int8,
        "html_extract": q_html_extract,
        "url_canonical": q_url_canonical,
        "crawl_delta": q_crawl_delta,
        # --- positions 50+: the 22 r3-window rotation queries (the r4
        # --- verdict's task 8). This round added 91 never-driver-checked
        # --- queries against a 50-slot window, so re-checks of queries
        # --- that are already hash-green in CORRECTNESS_r03 yield to
        # --- FIRST checks of new queries — every window slot goes to a
        # --- query with no driver record at all. The 22 below (and all
        # --- out-of-window queries) are re-verified locally this round:
        # --- full 169-query hash sweep, log at
        # --- BENCH/sweep_r5_final_169.log (tools/check_oracle.py, same
        # --- compare as the driver).
        "overviews": q_overviews,
        "unigram_logppl": q_unigram_logppl,
        "session_window": q_session_window,
        "tumbling_window": q_tumbling_window,
        "rasterize_mean": q_rasterize_mean,
        "rasterize_polygon": q_rasterize_polygon,
        "rasterize_line": q_rasterize_line,
        "rasterize_line_mean": q_rasterize_line_mean,
        "rasterize_poly_max": q_rasterize_poly_max,
        "rasterize_world_points": q_rasterize_world_points,
        "bbox_image_coords": q_bbox_image_coords,
        "chip_grid": q_chip_grid,
        "chip_assign": q_chip_assign,
        "chip_grid_nd": q_chip_grid_nd,
        "rect_clip": q_rect_clip,
        "rect_clip_reproject": q_rect_clip_reproject,
        "stack_bilinear": q_stack_bilinear,
        "stack_mosaic": q_stack_mosaic,
        "mosaic": q_mosaic,
        "stac_item_read": q_stac_item_read,
        "raster_math": q_raster_math,
        "month_split": q_month_split,
        "bloom_frontier": q_bloom_frontier,
        "dsir_weights": q_dsir_weights,
        "hll_distinct": q_hll_distinct,
        "quantile_sketch": q_quantile_sketch,
        "inverted_index": q_inverted_index,
        "chunk_dedup": q_chunk_dedup,
        "pack_sequences": q_pack_sequences,
        "source_cap": q_source_cap,
        "stream_tumbling": q_stream_tumbling,
        "robots_filter": q_robots_filter,
        "incremental_neardup": q_incremental_neardup,
        # positions 72+ — past the driver's 50-query window (all 50
        # slots hold never-driver-checked r5 queries; the 22 rotation
        # queries above keep their r3 hash-green records). These stay
        # locally oracle-checked (tools/check_oracle.py, full-sweep log
        # committed) with pytest goldens; least-novel first
        "epoch_mix": q_epoch_mix,
        "bitext_mine": q_bitext_mine,
        "event_anomaly": q_event_anomaly,
        "geom_measures": q_geom_measures,
        "radius_join": q_radius_join,
        "geohash_rollup": q_geohash_rollup,
        "host_geo_spread": q_host_geo_spread,
        "semdedup": q_semdedup,
        "geo_velocity": q_geo_velocity,
        "tf_cosine": q_tf_cosine,
        "spread_points": q_spread_points,
        "dedup_keep_best": q_dedup_keep_best,
        "adaptive_quality": q_adaptive_quality,
        "leakage_safe_split": q_leakage_safe_split,
        "geo_lang_mix": q_geo_lang_mix,
        "tile_pyramid": q_tile_pyramid,
        "adaptive_cells": q_adaptive_cells,
        "pip_multi_ring": q_pip_multi_ring,
        "tile_pyramid_delta": q_tile_pyramid_delta,
        "spatial_block_split": q_spatial_block_split,
        "cell_top_docs": q_cell_top_docs,
        "wrap_bbox_scan": q_wrap_bbox_scan,
        "chip_label_pairs": q_chip_label_pairs,
        "stream_cell_counts": q_stream_cell_counts,
        "knn_classify": q_knn_classify,
        "geo_skew_profile": q_geo_skew_profile,
        "mosaic_incremental": q_mosaic_incremental,
        "quadkeys": q_quadkeys,
        "recrawl_cadence": q_recrawl_cadence,
        "geo_backfill": q_geo_backfill,
        # --- code paths changed this round (r5 fixes touch these) ---
        "knn_cells": q_knn_cells,          # ring escalation
        "knn_brute": q_knn_brute,
        "ann_ivf_trained": q_ann_ivf_trained,  # stable probe tie-break
        "ann_ivf": q_ann_ivf,
        "ann_lsh": q_ann_lsh,
        "dedup_clusters": q_dedup_clusters,        # CC eager unpersist
        "embed_dedup_clusters": q_embed_dedup_clusters,
        "zorder_range_scan": q_zorder_range_scan,  # post-split clamp
        "zorder_cells": q_zorder_cells,
        "hilbert_cells": q_hilbert_cells,
        "pages_extract": q_pages_extract,          # geo.py regex guard
        "extract_all_tags": q_extract_all_tags,
        "pages_cell_counts": q_pages_cell_counts,
        "pip_join": q_pip_join,                    # spatial_join.py edits
        "pip_join_salted": q_pip_join_salted,
        "zonal_stats": q_zonal_stats,
        # --- in-window fillers (green r4, keep re-checking) ---
        "minhash_lsh": q_minhash_lsh,
        "near_dup_verified": q_near_dup_verified,
        "word_jaccard": q_word_jaccard,
        "word_jaccard_exact": q_word_jaccard_exact,
        "corpus_clean": q_corpus_clean,
        "embed_neardup": q_embed_neardup,
        # --- past the 50-cap this round: hash-green in the r4 window AND
        # --- behaviorally untouched by r5 changes (simhash/winnow/
        # --- kmv_distinct demoted to make room for the three new
        # --- curation queries; their dedup.py edits this round were
        # --- docstring-only) ---
        "ann_cosine": q_ann_cosine,
        "simhash": q_simhash,
        "winnow": q_winnow,
        "kmv_distinct": q_kmv_distinct,
        "gopher_repetition": q_gopher_repetition,
        "bm25_scores": q_bm25_scores,
        "hashed_tfidf": q_hashed_tfidf,
        "url_host_stats": q_url_host_stats,
        "stac_asset_engines": q_stac_asset_engines,
        "dedup_exact": q_dedup_exact,
        "token_quality": q_token_quality,
        "lang_id": q_lang_id,
        "mercator_bins": q_mercator_bins,
        "cell_rollup": q_cell_rollup,
        "canvas": q_canvas,
        "stac_search": q_stac_search,
        "frame_sample": q_frame_sample,
        "events_hourly": q_events_hourly,
        "pricing_summary": q_pricing_summary,
        "segment_orders": q_segment_orders,
        "tile_scan": q_tile_scan,
        "vector_scan": q_vector_scan,
        "zipper": q_zipper,
        "batcher": q_batcher,
        "collate": q_collate,
        "forked_stats": q_forked_stats,
        "image_stats": q_image_stats,
        "binary_assets": q_binary_assets,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB)
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    pts_cte = _points_cte()
    edges = _edges_values()
    cell12 = cell_id_sql("lat_us", "lon_us", 12, "duckdb")

    z12 = zorder_sql("lat_us", "lon_us", ZRES, "duckdb")
    zorder_cells_sql_q = f"""
    {pts_cte}
    , zz as (select point_id, {z12} as z from pts)
    select {zorder_parent_sql('z', ZRES, 6, 'duckdb')} as z6,
           count(*) as n_pages, min(z) as z_min, max(z) as z_max
    from zz group by z6
    """
    # recursive CTE: the RECURSIVE keyword must go on the shared WITH
    hilbert_cells_sql_q = f"""
    {pts_cte.replace("with ", "with recursive ", 1)}
    , {hilbert_cte_sql('pts', 'point_id', 'lat_us', 'lon_us', ZRES)}
    select {zorder_parent_sql('hd', ZRES, 6, 'duckdb')} as h6,
           count(*) as n_pages, min(hd) as hd_min, max(hd) as hd_max
    from hcells group by h6
    """
    zminlat, zminlon, zmaxlat, zmaxlon = ZBBOX
    zorder_range_scan_sql_q = f"""
    {pts_cte}
    select point_id, lat_us, lon_us from pts
    where lat_us between {zminlat} and {zmaxlat}
      and lon_us between {zminlon} and {zmaxlon}
    """

    pip_core = f"""
    {pts_cte}
    select p.point_id, e.geom_id
    from pts p join {edges}
      on ((e.y1 > p.lat_us) != (e.y2 > p.lat_us))
    group by p.point_id, e.geom_id, p.lat_us, p.lon_us
    having sum(case when p.lon_us < cast(e.x2 - e.x1 as double) * cast(p.lat_us - e.y1 as double)
                                     / cast(e.y2 - e.y1 as double) + e.x1
                    then 1 else 0 end) % 2 = 1
    """

    zonal_stats_sql = f"""
    with px as (
      select id as pixel_id,
             cast(-15000000 + (id // 61) * 1000000 as bigint) as lat_us,
             cast(-35000000 + (id % 61) * 1000000 as bigint) as lon_us,
             cast((id * 7) % 97 as double) as value
      from range({36 * 61}) t(id)
    ),
    inside as (
      select p.pixel_id, e.geom_id
      from px p join {edges}
        on ((e.y1 > p.lat_us) != (e.y2 > p.lat_us))
      group by p.pixel_id, e.geom_id, p.lat_us, p.lon_us
      having sum(case when p.lon_us < cast(e.x2 - e.x1 as double) * cast(p.lat_us - e.y1 as double)
                                       / cast(e.y2 - e.y1 as double) + e.x1
                      then 1 else 0 end) % 2 = 1
    )
    select geom_id, count(*) as n_px, sum(value) as sum_val,
           round(avg(value), 6) as mean_val,
           min(value) as min_val, max(value) as max_val
    from inside join px using (pixel_id)
    group by geom_id
    """

    knn_core = f"""
    {pts_cte}
    , pairs as (
      select q.point_id as query_id, t.point_id as target_id,
             (q.lat_us - t.lat_us) * (q.lat_us - t.lat_us)
             + (q.lon_us - t.lon_us) * (q.lon_us - t.lon_us) as dist2
      from pts q join pts t on true
      where q.point_id < 30
    ),
    ranked as (
      select query_id, target_id, dist2,
             row_number() over (partition by query_id order by dist2 asc, target_id asc) as rk
      from pairs
    )
    select query_id, target_id, rk, dist2 from ranked where rk <= 3
    """

    # winding-number polygon rasterization in pure SQL (mirrors the kernel:
    # canvas coords = (v - vmin)*scale - 0.5, test at integer lattice)
    poly_ring = [(6.0, 5.0), (3.5, 2.5), (6.0, 0.0), (6.0, 2.5), (5.0, 2.5)]
    pedges = []
    for i in range(len(poly_ring)):
        x1, y1 = poly_ring[i]
        x2, y2 = poly_ring[(i + 1) % len(poly_ring)]
        pedges.append(f"({x1}, {y1}, {x2}, {y2})")
    rasterize_polygon_sql = f"""
    with edges_raw as (
      select (x1 - 1.0) * 2.0 - 0.5 as x1c, (y1 - 0.0) * 2.0 - 0.5 as y1c,
             (x2 - 1.0) * 2.0 - 0.5 as x2c, (y2 - 0.0) * 2.0 - 0.5 as y2c
      from (values {", ".join(pedges)}) t(x1, y1, x2, y2)
      where y1 <> y2
    ),
    edges as (
      select case when y2c > y1c then x1c else x2c end as x0c,
             case when y2c > y1c then y1c else y2c end as y0c,
             case when y2c > y1c then x2c else x1c end as xuc,
             case when y2c > y1c then y2c else y1c end as yuc,
             case when y2c > y1c then 1 else -1 end as inc
      from edges_raw
    ),
    pixels as (
      select xi, yi
      from (select unnest(generate_series(0, 13)) as xi),
           (select unnest(generate_series(0, 9)) as yi)
    ),
    wn as (
      select p.xi, p.yi,
             sum(case when e.y0c < p.yi and p.yi <= e.yuc
                       and ((p.xi > e.x0c and p.xi > e.xuc)
                            or ((e.xuc - e.x0c) * (p.yi - e.y0c)
                                - (e.yuc - e.y0c) * (p.xi - e.x0c)) < 0)
                      then e.inc else 0 end) as w
      from pixels p, edges e
      group by p.xi, p.yi
    )
    select (9 - yi)::int as row, xi::int as col, 1.0 as value
    from wn where w <> 0
    """

    rasterize_mean_sql = f"""
    {_points_cte()}
    , binned as (
      select least(cast(floor((lon_us / 1000000.0 - (-180.0)) / (180.0 - (-180.0)) * 360) as int), 359) as col0,
             least(cast(floor((lat_us / 1000000.0 - (-90.0)) / (90.0 - (-90.0)) * 180) as int), 179) as yi,
             cast(point_id % 97 as double) as pval
      from pts
    )
    select (180 - 1 - yi)::int as row, col0::int as col,
           round(avg(pval), 6) as value
    from binned group by yi, col0
    """

    # Bresenham line rasterization in closed form (the kernel's per-step
    # y-advance m(k) = max(0, ceil((k·dy − dx//2)/dx)) is pure integer
    # arithmetic — rasterize.py:168): walk each snapped segment of the
    # linestring golden, union pixels
    line_pts = [(3.0, 5.0), (5.0, 3.0), (3.0, 2.0), (5.0, 0.0)]
    line_vals = ", ".join(f"({i}, {x}, {y})" for i, (x, y) in enumerate(line_pts))
    rasterize_line_sql = f"""
    with pts as (select * from (values {line_vals}) p(i, x, y)),
    sn as (
      select i,
             least(cast(floor((x - 1.0) / (8.0 - 1.0) * 14) as bigint), 13) as px,
             least(cast(floor((y - 0.0) / (5.0 - 0.0) * 10) as bigint), 9) as py
      from pts
    ),
    seg as (
      select s.px as x0, s.py as y0, e.px as x1, e.py as y1
      from sn s join sn e on e.i = s.i + 1
    ),
    par as (
      select x0, y0, x1, y1, abs(x1 - x0) as dx, abs(y1 - y0) as dy,
             case when x0 < x1 then 1 else -1 end as sx,
             case when y0 < y1 then 1 else -1 end as sy
      from seg
    ),
    walk as (
      -- m(k) = max(0, ceil((k·d_minor − d_major//2)/d_major)); DuckDB //
      -- truncates toward zero, so ceil(a/b) = a//b + (a % b > 0) (b > 0)
      select case when dx >= dy then x0 + sx * k
                  else x0 + sx * greatest(0, (k * dx - dy // 2) // dy
                       + (case when (k * dx - dy // 2) % dy > 0 then 1 else 0 end)) end as xi,
             case when dx >= dy then
                    (case when dx = 0 then y0
                          else y0 + sy * greatest(0, (k * dy - dx // 2) // dx
                               + (case when (k * dy - dx // 2) % dx > 0 then 1 else 0 end)) end)
                  else y0 + sy * k end as yi
      from par, unnest(generate_series(0, greatest(dx, dy))) t(k)
    )
    select distinct cast(9 - yi as int) as row, cast(xi as int) as col, 1.0 as value
    from walk where xi between 0 and 13 and yi between 0 and 9
    """

    world_bin = """
    , binned as (
      select least(cast(floor((lon_us / 1000000.0 - (-180.0)) / (180.0 - (-180.0)) * 360) as int), 359) as col0,
             least(cast(floor((lat_us / 1000000.0 - (-90.0)) / (90.0 - (-90.0)) * 180) as int), 179) as yi
      from pts
    )
    select (180 - 1 - yi)::int as row, col0::int as col, cast(count(*) as double) as value
    from binned group by yi, col0
    """

    stac_cte = """
    with items as (
      select concat('item-', cast(id as varchar)) as item_id,
             case cast(id % 3 as int) when 0 then 'sentinel-2-l2a' when 1 then 'sentinel-1-grd' else 'landsat-c2-l2' end as collection,
             TIMESTAMP '2022-01-01 00:00:00' + to_days(cast(id as int)) as dt,
             cast(-180 + (id * 37 % 340) as double) as minx,
             cast(-85 + (id * 53 % 160) as double) as miny,
             cast(-180 + (id * 37 % 340) + 10 as double) as maxx,
             cast(-85 + (id * 53 % 160) + 8 as double) as maxy
      from range(50) t(id)
    )
    select collection, count(*) as n_items
    from items
    where minx < 40 and maxx > -60 and miny < 40 and maxy > -40
      and dt between TIMESTAMP '2022-01-01 00:00:00' and TIMESTAMP '2022-02-01 00:00:00'
      and collection in ('sentinel-2-l2a', 'landsat-c2-l2')
    group by collection
    """

    chip_grid_sql = """
    with meta as (
      select * from (values (0, 1024, 1536), (1, 1024, 1536)) m(scene_id, n_y, n_x)
    ),
    g as (
      select scene_id,
             (n_y - 512) // 256 + 1 as n_chips_y,
             (n_x - 512) // 256 + 1 as n_chips_x
      from meta
    ),
    cells as (
      select scene_id, n_chips_x,
             unnest(generate_series(0, n_chips_y - 1)) as chip_y
      from g
    ),
    cells2 as (
      select scene_id, chip_y, n_chips_x,
             unnest(generate_series(0, n_chips_x - 1)) as chip_x
      from cells
    )
    select cast(scene_id as bigint) as scene_id,
           cast(chip_y * n_chips_x + chip_x as bigint) as chip_id,
           cast(chip_y as int) as chip_y, cast(chip_x as int) as chip_x,
           cast(chip_y * 256 as int) as y0, cast(chip_x * 256 as int) as x0
    from cells2
    """

    chip_grid_nd_sql = """
    with meta as (select * from (values (0), (1)) m(scene_id)),
    grid as (
      select scene_id, b.chip_band, y.chip_y, x.chip_x
      from meta,
           (select unnest(generate_series(0, 1)) as chip_band) b,
           (select unnest(generate_series(0, 2)) as chip_y) y,
           (select unnest(generate_series(0, 4)) as chip_x) x
    )
    select cast(scene_id as bigint) as scene_id,
           cast((chip_band * 3 + chip_y) * 5 + chip_x as bigint) as chip_id,
           cast(chip_band as int) as chip_band, cast(chip_band * 2 as int) as band0,
           cast(chip_y as int) as chip_y, cast(chip_y * 256 as int) as y0,
           cast(chip_x as int) as chip_x, cast(chip_x * 256 as int) as x0
    from grid
    """

    chip_assign_sql = """
    with px as (
      select cast(id % 128 as int) as x_idx, cast(id // 128 as int) as y_idx
      from range(16384) t(id)
    ),
    assigned as (
      select x_idx // 64 as chip_x, y_idx // 64 as chip_y
      from px where x_idx // 64 < 2 and y_idx // 64 < 2
    )
    select cast(0 as bigint) as scene_id,
           cast(chip_y * 2 + chip_x as bigint) as chip_id,
           count(*) as n_px, cast(count(*) as double) as sum_val
    from assigned group by chip_y, chip_x
    """

    rect_clip_sql = """
    with chips as (
      select * from (values
        (0, -1.5, -0.5, 1.5, 1.5),
        (1, 2.5, 2.5, 5.5, 4.5)
      ) c(chip_id, xmin, ymin, xmax, ymax)
    ),
    boxes as (
      select * from (values
        (0, 0.0, 0.0, 2.0, 2.0),
        (1, 2.0, 2.0, 4.0, 4.0)
      ) b(geom_id, minx, miny, maxx, maxy)
    )
    select cast(chip_id as bigint) as chip_id, cast(geom_id as bigint) as geom_id,
           greatest(minx, xmin) as clip_minx, greatest(miny, ymin) as clip_miny,
           least(maxx, xmax) as clip_maxx, least(maxy, ymax) as clip_maxy
    from chips join boxes
      on minx < xmax and maxx > xmin and miny < ymax and maxy > ymin
    """

    from zen3geo_spark.operators.clipper import suggested_warp_grid
    _g = suggested_warp_grid(-1.5, -0.5, 1.5, 1.5, 3, 2, "EPSG:3857")
    _mx = lambda c: mercator_x_sql(c, "duckdb")  # noqa: E731
    _my = lambda c: mercator_y_sql(c, "duckdb")  # noqa: E731
    rect_clip_reproject_sql = f"""
    with chips as (
      select * from (values
        (0, -1.5, -0.5, 1.5, 1.5, 'OGC:CRS84'),
        (1, {_g[0]!r}, {_g[1]!r}, {_g[2]!r}, {_g[3]!r}, 'EPSG:3857')
      ) c(chip_id, xmin, ymin, xmax, ymax, crs)
    ),
    boxes as (
      select * from (values
        (0, 0.0, 0.0, 2.0, 2.0),
        (1, 2.0, 2.0, 4.0, 4.0)
      ) b(geom_id, bxmin, bymin, bxmax, bymax)
    ),
    tb as (
      select chip_id, geom_id, crs, xmin, ymin, xmax, ymax,
             case when crs = 'EPSG:3857' then {_mx('bxmin')} else bxmin end as gminx,
             case when crs = 'EPSG:3857' then {_my('bymin')} else bymin end as gminy,
             case when crs = 'EPSG:3857' then {_mx('bxmax')} else bxmax end as gmaxx,
             case when crs = 'EPSG:3857' then {_my('bymax')} else bymax end as gmaxy
      from chips, boxes
    )
    select cast(chip_id as bigint) as chip_id, cast(geom_id as bigint) as geom_id, crs,
           round(greatest(gminx, xmin), 4) + 0.0 as clip_minx,
           round(greatest(gminy, ymin), 4) + 0.0 as clip_miny,
           round(least(gmaxx, xmax), 4) + 0.0 as clip_maxx,
           round(least(gmaxy, ymax), 4) + 0.0 as clip_maxy
    from tb
    where gminx < xmax and gmaxx > xmin and gminy < ymax and gmaxy > ymin
    """

    mosaic_sql = """
    with cube as (
      select t.tile, 0 as band,
             cast(y.y as int) as y_idx, cast(x.x as int) as x_idx,
             case when t.tile = 0 and y.y < 16 and x.x < 16 then 0.0 else 1.0 end as value
      from range(3) t(tile), range(32) y(y), range(32) x(x)
    )
    select cast(band as int) as band, y_idx, x_idx,
           arg_min(value, tile) as value, min(tile) as src
    from cube where value <> 0.0
    group by band, y_idx, x_idx
    """

    # deterministic KMV distinct sketch: per-source 2-gram shingle
    # estimate — the shingle explode feeds the shared estimator template
    from zen3geo_spark.operators.dedup import kmv_distinct_sql_duckdb
    kmv_sql = f"""
    with _pairs as (
      select source, unnest({shingles_sql_duckdb("text", 2)}) as sh from documents
    ),
    _est as ({kmv_distinct_sql_duckdb('_pairs', 'source', 'sh', 64)})
    select key as source, n_kept, round(est_distinct, 6) as est_distinct
    from _est
    """

    # word-level jaccard over ALL documents: sub-6%-df blocking tokens →
    # candidate pairs → exact full-set jaccard (mirrors ngram_jaccard's
    # max_df_frac path)
    word_jaccard_sql = f"""
    with toks as (
      select doc_id, unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) as tok,
             len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) as n_sh
      from documents
    ),
    total as (select count(*) as n_docs from documents),
    rare as (
      select tok from toks, total group by tok, n_docs
      having count(*) <= n_docs * {WORD_JACCARD_MAX_DF}
    ),
    cand as (
      select distinct l.doc_id as a_id, r.doc_id as b_id
      from toks l join rare using (tok) join toks r
        on r.tok = l.tok and l.doc_id < r.doc_id
    ),
    inter as (
      select c.a_id, c.b_id, l.n_sh as n_a, r.n_sh as n_b, count(*) as n_inter
      from cand c
      join toks l on l.doc_id = c.a_id
      join toks r on r.doc_id = c.b_id and r.tok = l.tok
      group by 1, 2, 3, 4
    )
    select a_id, b_id,
           round(cast(n_inter as double) / (n_a + n_b - n_inter), 6) as jaccard
    from inter
    where cast(n_inter as double) / (n_a + n_b - n_inter) >= 0.5
    """

    # ann_lsh oracle: the full hyperplane-bucket pipeline with the SAME
    # deterministic plane literals as cosine_topk_lsh (seed 42+tbl) —
    # bucket = sign-bit signature, candidates = (tbl, bucket) equi-join,
    # exact cosine rerank. Sign decisions agree across engines except for
    # |dot| at float-noise scale, which this fixture's data never hits.
    from zen3geo_spark.operators.similarity import _hyperplanes

    def _bucket_expr(planes, v):
        terms = []
        for p, plane in enumerate(planes):
            lit = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
            dot = (f"list_sum(list_transform(generate_series(1, 64), "
                   f"i -> ({lit})[i] * {v}[i]))")
            terms.append(f"(case when ({dot}) >= 0 then {1 << p} else 0 end)")
        return "(" + " + ".join(terms) + ")"

    _tables = [_hyperplanes(64, 8, seed=42 + t) for t in range(6)]
    _qb = " union all ".join(
        f"select query_id, qv, {t} as tbl, {_bucket_expr(pl, 'qv')} as bucket from q"
        for t, pl in enumerate(_tables))
    _tb = " union all ".join(
        f"select target_id, tv, {t} as tbl, {_bucket_expr(pl, 'tv')} as bucket from t"
        for t, pl in enumerate(_tables))
    ann_lsh_sql = f"""
    with q as (select vec_id as query_id, embedding::DOUBLE[] as qv from embeddings where vec_id < 5),
    t as (select vec_id as target_id, embedding::DOUBLE[] as tv from embeddings),
    qb as ({_qb}),
    tb as ({_tb}),
    cand as (select distinct query_id, target_id from qb join tb using (tbl, bucket)),
    pairs as (
      select c.query_id, c.target_id, list_cosine_similarity(q.qv, t.tv) as cos
      from cand c join q using (query_id) join t using (target_id)
    ),
    ranked as (
      select query_id, target_id,
             row_number() over (partition by query_id order by cos desc, target_id asc) as rk
      from pairs
    )
    select query_id, target_id, rk from ranked where rk <= 3
    """

    # ann_ivf_trained oracle: the Lloyd recurrence is deterministic
    # (seeded centroids, fixed iteration order), so the driver BUILDS one
    # SQL block per training round — same trick as the Hilbert recursive
    # CTE, applied to an iterative ML algorithm.
    #
    # FP fragility note (known, accepted): the Spark kernel scores on
    # NORMALIZED vectors via one float64 matmul, the oracle via DuckDB's
    # list_cosine_similarity on RAW vectors — different summation orders.
    # Exact ties resolve identically (both sides break on lowest list_id:
    # stable argsort on the Spark side, (cos DESC, list_id ASC) here), but
    # a near-tie at rounding noise could still flip an assignment or an
    # n_probe boundary and fail the hash intermittently; the pytest recall
    # assertion (tests/test_lang_similarity.py) is the primary gate.  Cosine similarity is
    # scale-invariant, so the oracle skips the Spark side's per-round
    # centroid re-normalization entirely: argmax cos(tv, c) and
    # avg-of-assigned-vectors are the whole recurrence; empty lists keep
    # the previous centroid via the left-join coalesce (the Spark kernel
    # keeps C_unit[i] — same assignment under scale invariance).
    def _ivf_trained_sql(train_iters: int = 2, n_lists: int = 16,
                         n_probe: int = 6, k: int = 3, dim: int = 64) -> str:
        parts = [
            "t as (select vec_id as target_id, embedding::DOUBLE[] as tv "
            "from embeddings)",
            "q as (select vec_id as query_id, embedding::DOUBLE[] as qv "
            "from embeddings where vec_id < 5)",
            "c0 as (select vec_id as list_id, embedding::DOUBLE[] as cv "
            f"from embeddings where vec_id < {n_lists})",
        ]

        def argmax_cte(name: str, rel: str, idc: str, vc: str, cents: str,
                       keep: str) -> str:
            return (
                f"{name} as (select {idc}, {vc}, list_id from ("
                f"select s.{idc}, s.{vc}, c.list_id, "
                f"row_number() over (partition by s.{idc} "
                f"order by list_cosine_similarity(s.{vc}, c.cv) desc, "
                f"c.list_id asc) as rk from {rel} s, {cents} c) "
                f"where {keep})")

        prev = "c0"
        for r in range(train_iters):
            parts.append(argmax_cte(f"a{r}", "t", "target_id", "tv", prev,
                                    "rk = 1"))
            parts.append(
                f"m{r} as (select list_id, i, avg(tv[i]) as v "
                f"from a{r}, range(1, {dim + 1}) r(i) group by list_id, i)")
            parts.append(
                f"c{r + 1} as (select c.list_id, coalesce(m.mcv, c.cv) as cv "
                f"from {prev} c left join (select list_id, "
                f"list(v order by i) as mcv from m{r} group by list_id) m "
                f"using (list_id))")
            prev = f"c{r + 1}"
        parts.append(argmax_cte("tl", "t", "target_id", "tv", prev, "rk = 1"))
        parts.append(argmax_cte("qprobe", "q", "query_id", "qv", prev,
                                f"rk <= {n_probe}"))
        parts.append(
            "pairs as (select p.query_id, l.target_id, "
            "list_cosine_similarity(p.qv, l.tv) as cos "
            "from qprobe p join tl l using (list_id)), "
            "ranked as (select query_id, target_id, "
            "row_number() over (partition by query_id "
            "order by cos desc, target_id asc) as rk from pairs)")
        return ("with " + ",\n".join(parts)
                + f"\nselect query_id, target_id, rk from ranked "
                  f"where rk <= {k}")

    ann_ivf_trained_sql = _ivf_trained_sql()

    # ann_ivf oracle: untrained centroids are deterministic (first 16
    # target vectors); assignment = cosine-argmax over centroids, probes =
    # top-6 lists, exact cosine rerank — all expressible in SQL
    ann_ivf_sql = """
    with cents as (select vec_id as cid, embedding::DOUBLE[] as cv
                   from embeddings where vec_id < 16),
    t as (select vec_id as target_id, embedding::DOUBLE[] as tv from embeddings),
    q as (select vec_id as query_id, embedding::DOUBLE[] as qv
          from embeddings where vec_id < 5),
    tassign as (
      select target_id, tv, cid,
             row_number() over (partition by target_id
                                order by list_cosine_similarity(tv, cv) desc, cid asc) as rk
      from t, cents
    ),
    tl as (select target_id, tv, cid as list_id from tassign where rk = 1),
    qprobe as (
      select query_id, qv, cid as list_id from (
        select query_id, qv, cid,
               row_number() over (partition by query_id
                                  order by list_cosine_similarity(qv, cv) desc, cid asc) as rk
        from q, cents
      ) where rk <= 6
    ),
    pairs as (
      select p.query_id, l.target_id, list_cosine_similarity(p.qv, l.tv) as cos
      from qprobe p join tl l using (list_id)
    ),
    ranked as (
      select query_id, target_id,
             row_number() over (partition by query_id order by cos desc, target_id asc) as rk
      from pairs
    )
    select query_id, target_id, rk from ranked where rk <= 3
    """

    ann_cosine_sql = """
    with q as (select vec_id as query_id, embedding as qv from embeddings where vec_id < 5),
    pairs as (
      select q.query_id, t.vec_id as target_id,
             list_cosine_similarity(q.qv, t.embedding) as cos
      from q, embeddings t
    ),
    ranked as (
      select query_id, target_id,
             row_number() over (partition by query_id order by cos desc, target_id asc) as rk
      from pairs
    )
    select query_id, target_id, rk from ranked where rk <= 3
    """

    # int8 quantization twin: q_i = clamp(floor(double(v_i)·256),−128,127);
    # ×2^8 is FP-exact and floor is deterministic, so the integer dots
    # match Spark bit-for-bit (similarity.py quantize_int8/int8_dot)
    ann_int8_sql = """
    with d as (
      select vec_id,
             list_transform(embedding,
               v -> cast(greatest(-128, least(127,
                    floor(cast(v as double) * 256))) as bigint)) as qv
      from embeddings
    ),
    q as (select vec_id as query_id, qv from d where vec_id < 5),
    pairs as (
      select q.query_id, t.vec_id as target_id,
             list_sum(list_transform(generate_series(1, len(q.qv)),
                      i -> q.qv[i] * t.qv[i])) as dot_q
      from q, d t
    ),
    ranked as (
      select query_id, target_id, dot_q,
             row_number() over (partition by query_id
                                order by dot_q desc, target_id asc) as rk
      from pairs
    )
    select query_id, target_id, dot_q, rk from ranked where rk <= 3
    """

    tq = (
        f"select doc_id, {token_count_sql('text', 'duckdb')} as n_tokens, "
        f"round({quality_score_sql('text', 'duckdb')}, 6) as quality, "
        f"{fingerprint_sql('text', 'duckdb')} as fp from documents"
    )

    embed_neardup_sql = """
    with d as (select vec_id, embedding::DOUBLE[] as v from embeddings),
    pairs as (
      select a.vec_id as a_id, b.vec_id as b_id, list_cosine_similarity(a.v, b.v) as cos
      from d a join d b on a.vec_id < b.vec_id
    )
    select a_id, b_id, round(cos, 6) as cos from pairs where cos >= 0.4
    """

    canvas_sql = """
    with grid as (
      select cast(4.0 - y as double) as y, cast(-1.0 + x as double) as x
      from range(5) t1(y), range(7) t2(x)
    ),
    agg as (
      select count(distinct x) as width, count(distinct y) as height,
             min(x) as cxmin, max(x) as cxmax, min(y) as cymin, max(y) as cymax
      from grid
    )
    select cast(0 as bigint) as canvas_id,
           cast(width as int) as width, cast(height as int) as height,
           cxmin - ((cxmax - cxmin) / (width - 1)) / 2 as xmin,
           cymin - ((cymax - cymin) / (height - 1)) / 2 as ymin,
           cxmax + ((cxmax - cxmin) / (width - 1)) / 2 as xmax,
           cymax + ((cymax - cymin) / (height - 1)) / 2 as ymax,
           'OGC:CRS84' as crs
    from agg
    """

    stack_mosaic_sql = """
    with raw as (
      select cast(t.item as int) as time, b.band,
             cast((id % 16) * 2.0 + t.item * 4.0 as double) as x,
             cast(30.0 - (id // 16) * 2.0 as double) as y,
             id % 16 as xi, id // 16 as yi
      from range(256) r(id), range(3) t(item), (select unnest(['vv', 'vh']) as band) b
    ),
    vals as (
      select time, band, x, y,
             case when time = 0 and yi < 4 then 0.0
                  else cast(time * 1000 + yi * 16 + xi as double) end as value
      from raw
    ),
    cube as (
      select time, band,
             cast(floor((x - 0.0) / 2.0) as int) as x_idx,
             cast(floor((30.0 - y) / 2.0) as int) as y_idx,
             value
      from vals
      where band = 'vv' and x >= 0.0 and x < 40.0 and y > 0.0 and y <= 30.0
    )
    select band, y_idx, x_idx, arg_min(value, time) as value, min(time) as src
    from cube where value <> 0.0
    group by band, y_idx, x_idx
    """

    # image decode oracle: synth_media's P6 payload pixel i is
    # (media_id·7 + i·13) mod 256; the 4x4 nearest-neighbor resize samples
    # source rows oy·h//4 and cols ox·w//4 (multimodal.py ppm_bytes /
    # decode_image) — recompute the 48 sampled values per image directly
    image_stats_sql = """
    with media as (
      select id as media_id, cast(16 + id % 16 as int) as w,
             cast(16 + id % 8 as int) as h
      from range(300) t(id) where id % 3 = 0
    ),
    px as (
      select media_id,
             (((oy * h) // 4) * w + ((ox * w) // 4)) * 3 + c as idx
      from media,
           (select unnest(generate_series(0, 3)) as oy),
           (select unnest(generate_series(0, 3)) as ox),
           (select unnest(generate_series(0, 2)) as c)
    ),
    vals as (
      select media_id, cast((media_id * 7 + idx * 13) % 256 as double) as v
      from px
    )
    select media_id, round(avg(v), 6) as mean_px, min(v) as min_px,
           max(v) as max_px
    from vals group by media_id
    """

    # audio decode oracle: synth_media's WAV payload sample i is
    # ((media_id·31 + i·57) mod 65536) − 32768 at 1 kHz, n = duration_ms
    # (multimodal.py wav_bytes / decode_audio). int16 samples ⇒ Σv and Σv²
    # are integers < 2^53, so avg/rms are bit-identical in both engines.
    audio_stats_sql = """
    with aud as (
      select id as media_id, cast(1000 + id % 5000 as int) as n
      from range(300) t(id) where id % 3 = 1
    ),
    s as (
      select media_id, unnest(generate_series(0, n - 1)) as i
      from aud
    ),
    v as (
      select media_id, i,
             cast((media_id * 31 + i * 57) % 65536 - 32768 as double) as val
      from s
    ),
    lagged as (
      select media_id, val,
             lag(val) over (partition by media_id order by i) as prev
      from v
    )
    select media_id,
           count(*) as n_samples,
           cast(1000 as int) as sample_rate,
           sum(val) / count(*) as mean_amp,
           sqrt(sum(val * val) / count(*)) as rms,
           cast(max(abs(val)) as bigint) as peak,
           sum(case when prev is not null and ((val < 0) <> (prev < 0))
               then 1 else 0 end) as zero_crossings
    from lagged group by media_id
    """

    stack_bilinear_sql = """
    with src as (
      select cast(id % 16 as int) as sx, cast(id // 16 as int) as sy,
             cast((id // 16) * 16 + id % 16 as double) as v
      from range(256) t(id)
    ),
    tgt as (
      select cast(id % 32 as int) as x_idx, cast(id // 32 as int) as y_idx,
             (id % 32) / 2.0 - 0.25 as u, (id // 32) / 2.0 - 0.25 as vv
      from range(1024) t(id)
    ),
    pos as (
      select x_idx, y_idx, cast(floor(u) as int) as sx0, cast(floor(vv) as int) as sy0,
             u - floor(u) as fx, vv - floor(vv) as fy
      from tgt
    ),
    corners as (
      select x_idx, y_idx, sx0 + dx as sx, sy0 + dy as sy,
             (case when dx = 1 then fx else 1 - fx end)
             * (case when dy = 1 then fy else 1 - fy end) as w
      from pos, (values (0, 0), (1, 0), (0, 1), (1, 1)) c(dx, dy)
    )
    select cast(0 as int) as time, 'vv' as band, y_idx, x_idx,
           round(sum(w * v) / sum(w), 6) as value
    from corners join src using (sx, sy)
    group by y_idx, x_idx
    """

    frame_sample_sql = """
    with media as (
      select id as media_id, 1000 + id % 5000 as duration_ms
      from range(300) t(id) where id % 3 = 2
    ),
    f as (
      select media_id, unnest(generate_series(0, duration_ms - 1, 700)) as frame_ms
      from media
    )
    select media_id, cast(frame_ms as int) as frame_ms from f
    """

    batcher_sql = """
    with r as (
      select doc_id, (row_number() over (order by doc_id) - 1) // 64 as batch_id
      from documents
    )
    select batch_id, count(*) as n, min(doc_id) as first_id, max(doc_id) as last_id
    from r group by batch_id
    """

    zipper_sql = """
    with a as (
      select doc_id, n_chars, row_number() over (order by doc_id) as rn
      from documents where doc_id < 100
    ),
    b as (
      select vec_id, label, row_number() over (order by vec_id) as rn
      from embeddings where vec_id < 100
    )
    select a.doc_id, a.n_chars, b.vec_id, b.label from a join b using (rn)
    """

    # minhash LSH candidates (num_hashes=8, bands=4 → 2 rows/band, 2-gram
    # shingles) — the polynomial gram hash + affine permutations are
    # mirrored exactly (operators/dedup.py constants)
    mh_grams = shingles_sql_duckdb("text", 2)
    mh_hashes = gram_hashes40_sql_duckdb("grams")
    mh_sig = minhash_signature_sql_duckdb("hs", 8)
    minhash_sql = f"""
    with sh as (select doc_id, {mh_grams} as grams from documents),
    hashed as (select doc_id, {mh_hashes} as hs from sh),
    sig as (select doc_id, {mh_sig} as sig from hashed),
    banded as (
      select doc_id, band,
             md5(array_to_string(sig[band * 2 + 1 : band * 2 + 2], '|')) as bucket
      from sig, (select unnest(generate_series(0, 3)) as band) b
    )
    select distinct l.doc_id as a_id, r.doc_id as b_id
    from banded l join banded r
      on l.band = r.band and l.bucket = r.bucket and l.doc_id < r.doc_id
    """

    # incremental cross-snapshot screen: same banded CTE, old = even ids,
    # new = odd ids; collided = shares any (band, bucket) with the old side
    incremental_neardup_sql = f"""
    with sh as (select doc_id, {mh_grams} as grams from documents),
    hashed as (select doc_id, {mh_hashes} as hs from sh),
    sig as (select doc_id, {mh_sig} as sig from hashed),
    banded as (
      select doc_id, band,
             md5(array_to_string(sig[band * 2 + 1 : band * 2 + 2], '|')) as bucket
      from sig, (select unnest(generate_series(0, 3)) as band) b
    ),
    oldb as (select distinct band, bucket from banded where doc_id % 2 = 0),
    hits as (
      select distinct n.doc_id
      from banded n join oldb o using (band, bucket)
      where n.doc_id % 2 = 1
    )
    select d.doc_id,
           case when h.doc_id is not null then 1 else 0 end as collided
    from documents d left join hits h on h.doc_id = d.doc_id
    where d.doc_id % 2 = 1
    """

    near_dup_verified_sql = f"""
    with sh0 as (select doc_id, {mh_grams} as grams from documents),
    hashed as (select doc_id, grams, {mh_hashes} as hs from sh0),
    sig as (select doc_id, {mh_sig} as sig from hashed),
    banded as (
      select doc_id, band,
             md5(array_to_string(sig[band * 2 + 1 : band * 2 + 2], '|')) as bucket
      from sig, (select unnest(generate_series(0, 3)) as band) b
    ),
    cand as (
      select distinct l.doc_id as a_id, r.doc_id as b_id
      from banded l join banded r
        on l.band = r.band and l.bucket = r.bucket and l.doc_id < r.doc_id
    ),
    toks as (select doc_id, unnest(grams) as sh, len(grams) as n_sh from sh0),
    inter as (
      select c.a_id, c.b_id, l.n_sh as n_a, r.n_sh as n_b, count(*) as n_inter
      from cand c
      join toks l on l.doc_id = c.a_id
      join toks r on r.doc_id = c.b_id and r.sh = l.sh
      group by 1, 2, 3, 4
    )
    select a_id, b_id,
           round(cast(n_inter as double) / (n_a + n_b - n_inter), 6) as jaccard
    from inter
    where round(cast(n_inter as double) / (n_a + n_b - n_inter), 6) >= 0.5
    """

    # simhash near-dups (2-gram shingles, hamming <= 8) — bit math mirrored
    sim_expr = simhash64_sql_duckdb("hs", "n")
    simhash_ctes = f"""
    with sh as (select doc_id, {mh_grams} as grams from documents),
    h as (
      select doc_id,
             list_transform(grams, g -> {gram_hash60_sql_duckdb('g')}) as hs,
             len(grams) as n
      from sh
    ),
    sim as (select doc_id, {sim_expr} as sh64 from h),
    chunks as (
      select doc_id, sh64, chunk, (sh64 >> (chunk * 15)) & 32767 as key
      from sim, (select unnest(generate_series(0, 3)) as chunk) c
    ),
    cand as (
      select distinct l.doc_id as a_id, r.doc_id as b_id, l.sh64 as sa, r.sh64 as sb
      from chunks l join chunks r
        on l.chunk = r.chunk and l.key = r.key and l.doc_id < r.doc_id
    )"""
    simhash_sql = f"""
    {simhash_ctes}
    select a_id, b_id, cast(bit_count(xor(sa, sb)) as int) as hamming
    from cand where bit_count(xor(sa, sb)) <= 8
    """

    # value-carrying line burn: per-segment values through the closed-form
    # Bresenham walk (same arithmetic as rasterize_line_sql), mean per pixel
    rasterize_line_mean_sql = """
    with seg as (
      select * from (values
        (0, 3.0, 5.0, 5.0, 3.0, 10.0),
        (1, 3.0, 2.0, 5.0, 0.0, 30.0),
        (2, 1.5, 4.5, 6.5, 0.5, 20.0)) s(gid, ax, ay, bx, by, v)
    ),
    sn as (
      select gid, v,
             least(cast(floor((ax - 1.0) / 7.0 * 14) as bigint), 13) as x0,
             least(cast(floor((ay - 0.0) / 5.0 * 10) as bigint), 9) as y0,
             least(cast(floor((bx - 1.0) / 7.0 * 14) as bigint), 13) as x1,
             least(cast(floor((by - 0.0) / 5.0 * 10) as bigint), 9) as y1
      from seg
    ),
    par as (
      select gid, v, x0, y0, x1, y1, abs(x1 - x0) as dx, abs(y1 - y0) as dy,
             case when x0 < x1 then 1 else -1 end as sx,
             case when y0 < y1 then 1 else -1 end as sy
      from sn
    ),
    walk as (
      select gid, v,
             case when dx >= dy then x0 + sx * k
                  else x0 + sx * greatest(0, (k * dx - dy // 2) // dy
                       + (case when (k * dx - dy // 2) % dy > 0 then 1 else 0 end)) end as xi,
             case when dx >= dy then
                    (case when dx = 0 then y0
                          else y0 + sy * greatest(0, (k * dy - dx // 2) // dx
                               + (case when (k * dy - dx // 2) % dx > 0 then 1 else 0 end)) end)
                  else y0 + sy * k end as yi
      from par, unnest(generate_series(0, greatest(dx, dy))) t(k)
    ),
    pix as (
      select distinct gid, v, xi, yi from walk
      where xi between 0 and 13 and yi between 0 and 9
    )
    select cast(9 - yi as int) as row, cast(xi as int) as col,
           round(avg(v), 6) as value
    from pix group by yi, xi
    """

    # value-carrying polygon burn: winding-number fill per (polygon, pixel)
    # with the polygon's value, max per pixel
    _poly_vals = {0: (7.0, [(6.0, 5.0), (3.5, 2.5), (6.0, 0.0), (6.0, 2.5), (5.0, 2.5)]),
                  1: (9.0, [(2.0, 1.0), (7.0, 1.0), (4.5, 4.0)])}
    _vedges = []
    for _gid, (_v, _ring) in _poly_vals.items():
        for _i in range(len(_ring)):
            _x1, _y1 = _ring[_i]
            _x2, _y2 = _ring[(_i + 1) % len(_ring)]
            _vedges.append(f"({_gid}, {_v}, {_x1}, {_y1}, {_x2}, {_y2})")
    rasterize_poly_max_sql = f"""
    with edges_raw as (
      select gid, v,
             (x1 - 1.0) * 2.0 - 0.5 as x1c, (y1 - 0.0) * 2.0 - 0.5 as y1c,
             (x2 - 1.0) * 2.0 - 0.5 as x2c, (y2 - 0.0) * 2.0 - 0.5 as y2c
      from (values {", ".join(_vedges)}) t(gid, v, x1, y1, x2, y2)
      where y1 <> y2
    ),
    edges as (
      select gid, v,
             case when y2c > y1c then x1c else x2c end as x0c,
             case when y2c > y1c then y1c else y2c end as y0c,
             case when y2c > y1c then x2c else x1c end as xuc,
             case when y2c > y1c then y2c else y1c end as yuc,
             case when y2c > y1c then 1 else -1 end as inc
      from edges_raw
    ),
    pixels as (
      select xi, yi
      from (select unnest(generate_series(0, 13)) as xi),
           (select unnest(generate_series(0, 9)) as yi)
    ),
    wn as (
      select e.gid, e.v, p.xi, p.yi,
             sum(case when e.y0c < p.yi and p.yi <= e.yuc
                       and ((p.xi > e.x0c and p.xi > e.xuc)
                            or ((e.xuc - e.x0c) * (p.yi - e.y0c)
                                - (e.yuc - e.y0c) * (p.xi - e.x0c)) < 0)
                      then e.inc else 0 end) as w
      from pixels p, edges e
      group by e.gid, e.v, p.xi, p.yi
    )
    select (9 - yi)::int as row, xi::int as col, round(max(v), 6) as value
    from wn where w <> 0 group by yi, xi
    """

    # object-detection boxes: geometry vertices → bounds → image coords
    # under the 14x10 canvas affine (xmin=1, ymax=5, res 0.5)
    _verts = []
    for _gid, _pts in ((0, [(4.5, 4.5), (3.5, 1.0), (6.0, 3.5)]),
                       (1, [(3.0, 5.0), (5.0, 3.0), (3.0, 2.0), (5.0, 0.0)]),
                       (2, [(6.0, 5.0), (3.5, 2.5), (6.0, 0.0), (6.0, 2.5), (5.0, 2.5)])):
        _verts += [f"({_gid}, {_x}, {_y})" for _x, _y in _pts]
    bbox_image_coords_sql = f"""
    with v as (select * from (values {", ".join(_verts)}) t(gid, x, y)),
    b as (select gid, min(x) as minx, min(y) as miny,
                 max(x) as maxx, max(y) as maxy from v group by gid)
    select cast(gid as bigint) as geom_id, minx, miny, maxx, maxy,
           round((minx - 1.0) / 0.5, 6) as col0, round((5.0 - maxy) / 0.5, 6) as row0,
           round((maxx - 1.0) / 0.5, 6) as col1, round((5.0 - miny) / 0.5, 6) as row1
    from b
    """

    # binary PGM assets: pixel i of asset f = (f·11 + i·17) mod 256 over
    # (20 + f%8) x (12 + f%4) pixels (multimodal.pgm_bytes)
    from zen3geo_spark.functions.text import (
        bm25_sql_duckdb, hashed_tfidf_sql_duckdb, ngram_repetition_sql_duckdb,
    )

    hashed_tfidf_sql = hashed_tfidf_sql_duckdb("documents", dim=64)

    url_host_stats_sql = f"""
    with pages as ({pages_cte_sql(N_PAGES)})
    select regexp_extract(url, '^https?://([^/]+)/', 1) as host,
           count(*) as n_pages, count(distinct lang) as n_langs,
           min(warc_ts) as first_ts, max(warc_ts) as last_ts
    from pages group by host
    """
    _extract = html_to_text_sql("html", "duckdb")
    html_extract_sql = f"""
    with pages as ({pages_cte_sql(N_PAGES)})
    select lang, count(*) as n_pages,
           sum(case when {_extract} = text then 1 else 0 end)
               as n_byte_identical,
           sum(length({_extract})) as sum_extracted_len
    from pages group by lang
    """

    _canon = canonical_url_sql("messy", "duckdb")
    url_canonical_sql = f"""
    with pages as ({pages_cte_sql(N_PAGES)}),
    base as (select url, {URL_PID_SQL} as _pid
             from pages),
    messy as (
      select {messy_url_sql('url', '_pid', 0, 'duckdb')} as messy from base
      union all
      select {messy_url_sql('url', '_pid', 1, 'duckdb')} as messy from base
    ),
    per_canon as (select {_canon} as curl, count(*) as _nv
                  from messy group by 1)
    select regexp_extract(curl, '^https://([^/?#]+)', 1) as host,
           count(*) as n_canonical,
           sum(_nv) as n_variants,
           sum(case when _nv = 2 then 1 else 0 end) as n_collapsed_pairs
    from per_canon group by host
    """

    crawl_delta_sql = f"""
    with pages as ({pages_cte_sql(N_PAGES * 6 // 5)}),
    allp as (select url, {URL_HOST_SQL} as host, {URL_PID_SQL} as _pid
             from pages),
    a as (select url, host as host_a from allp where _pid < {N_PAGES}),
    b as (select url, host as host_b from allp where _pid >= {N_PAGES // 5}),
    j as (select coalesce(a.host_a, b.host_b) as host,
                 case when a.host_a is null then 1 else 0 end as _new,
                 case when b.host_b is null then 1 else 0 end as _gone
          from a full outer join b on a.url = b.url)
    select host, sum(_new) as n_new, sum(_gone) as n_gone,
           sum(case when _new = 0 and _gone = 0 then 1 else 0 end) as n_kept
    from j group by host
    """

    from zen3geo_spark.functions.sketch import (
        bloom_cte_sql_duckdb, bloom_pass_sql_duckdb, hll_sql_duckdb,
        qsketch_sql_duckdb,
    )

    quantile_sketch_sql = qsketch_sql_duckdb(
        "documents", "n_chars", (50, 90, 99), ("lang",))

    hll_distinct_sql = f"""
    with toks_nz as (
      select source,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) as tok
      from documents
    ),
    toks as (select * from toks_nz where tok <> ''),
    hll as ({hll_sql_duckdb("toks", "tok", ("source",))}),
    exact as (select source, count(distinct tok) as true_distinct
              from toks group by source)
    select h.source, round(est_distinct, 6) as est_distinct,
           true_distinct, registers_hit
    from hll h join exact using (source)
    """

    bloom_frontier_sql = f"""
    with pages as ({pages_cte_sql(N_PAGES * 6 // 5)}),
    allp as (select url, {URL_HOST_SQL} as host, {URL_PID_SQL} as _pid
             from pages),
    seen as (select url from allp where _pid < {N_PAGES}),
    incoming as (select url, host from allp where _pid >= {N_PAGES // 5}),
    bloom as ({bloom_cte_sql_duckdb("seen", "url")}),
    passed as ({bloom_pass_sql_duckdb("incoming", "bloom", "url",
                                      carry=("host",))})
    select host, count(*) as n_incoming,
           sum(case when bloom_pass then 1 else 0 end) as n_bloom_pass,
           sum(case when s.url is not null then 1 else 0 end) as n_true_seen,
           sum(case when bloom_pass and s.url is null then 1 else 0 end)
               as n_false_pos,
           sum(case when s.url is not null and not bloom_pass then 1 else 0 end)
               as n_missed_seen
    from passed p left join seen s on p.url = s.url
    group by host
    """

    gopher_repetition_sql = ngram_repetition_sql_duckdb("documents")
    bm25_scores_sql = bm25_sql_duckdb(
        "documents", ["spark", "table", "window"])

    from zen3geo_spark.functions.text import inverted_index_sql_duckdb
    inverted_index_sql = inverted_index_sql_duckdb(
        "documents", max_df=1_000_000)

    from zen3geo_spark.operators.curation import (
        contamination_sql_duckdb, duplicate_span_sql_duckdb,
        stratified_sample_sql_duckdb,
    )

    contamination_sql = contamination_sql_duckdb("documents", n=5,
                                                 bench_mod=97)
    dup_spans_sql = duplicate_span_sql_duckdb("documents", n=8, top_k=20)
    stratified_sample_sql = stratified_sample_sql_duckdb(
        "documents", rates={"en": 100, "es": 50}, default_rate=10)

    from zen3geo_spark.operators.curation import (
        chunk_dedup_sql_duckdb, pack_sequences_sql_duckdb,
        source_cap_sql_duckdb,
    )

    chunk_dedup_sql = chunk_dedup_sql_duckdb("documents", chunk_words=8,
                                             max_docs=2)
    pack_sequences_sql = pack_sequences_sql_duckdb("documents", budget=256,
                                                   n_shards=8)
    source_cap_sql = source_cap_sql_duckdb("documents", k=10)

    from zen3geo_spark.functions.web import robots_audit_sql_duckdb
    from zen3geo_spark.operators.curation import epoch_mix_sql_duckdb
    robots_filter_sql = robots_audit_sql_duckdb(
        pages_cte_sql(N_PAGES), n_hosts=1000)
    epoch_mix_sql = epoch_mix_sql_duckdb(
        "documents", targets={"en": 30, "zh": 25}, default_pct=15)

    from zen3geo_spark.operators.similarity import bitext_mine_sql_duckdb
    from zen3geo_spark.streaming.windows import windowed_anomaly_sql_duckdb
    bitext_mine_sql = bitext_mine_sql_duckdb("embeddings", 0, 1, margin=1.01)
    event_anomaly_sql = windowed_anomaly_sql_duckdb(
        "events", window_sec=21600, trail=4, factor=2)

    from zen3geo_spark.functions.geo import polygon_measures_sql_duckdb
    geom_measures_sql = polygon_measures_sql_duckdb(_edges_values())

    # metric radius self-join / geohash / host-spread twins (share pts_cte)
    from zen3geo_spark.functions.geo import geohash_cte_sql_duckdb
    radius_join_sql = pts_cte + radius_join_sql_duckdb("pts", 140_000.0, 5)
    geohash_rollup_sql = f"""{pts_cte}
, g2 as ({geohash_cte_sql_duckdb('pts', 'lat_us', 'lon_us', 2, 'gh2')})
, g5 as ({geohash_cte_sql_duckdb('g2', 'lat_us', 'lon_us', 5, 'gh5')})
select gh2, count(*) as n_points, sum(lat_us) as sum_lat_us,
       sum(lon_us) as sum_lon_us, min(gh5) as min_gh5
from g5 group by 1
"""
    _hg_lat = micro_from_str_sql("lat_str", "duckdb")
    _hg_lon = micro_from_str_sql("lon_str", "duckdb")
    host_geo_spread_sql = f"""
    with pages as ({pages_cte_sql(N_PAGES)}),
    tagged as (
      select {URL_HOST_SQL} as host,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 1) as lat_str,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 2) as lon_str
      from pages
    ),
    hp as (
      select host, {_hg_lat} as lat_us, {_hg_lon} as lon_us
      from tagged where lat_str <> ''
    ),
    hc as (
      select host, lat_us, lon_us,
             {cell_id_sql('lat_us', 'lon_us', 6, 'duckdb')} as cell6
      from hp
    )
    select host, count(*) as n_points, count(distinct cell6) as n_cells6,
           min(lat_us) as min_lat_us, max(lat_us) as max_lat_us,
           min(lon_us) as min_lon_us, max(lon_us) as max_lon_us
    from hc group by 1
    """

    from zen3geo_spark.operators.similarity import semantic_dedup_sql_duckdb
    semdedup_sql = semantic_dedup_sql_duckdb("embeddings", 16, 0.43)

    from zen3geo_spark.functions.text import tf_cosine_pairs_sql_duckdb
    tf_cosine_sql = tf_cosine_pairs_sql_duckdb(
        "(select * from documents where doc_id < 400)", threshold=0.8)

    # spread twin: the world_bin image as a CTE, then the shared
    # offset-explode/clip/combine fragment
    from zen3geo_spark.operators.rasterize import spread_sql_duckdb
    spread_points_sql = f"""{pts_cte}
    , binned as (
      select least(cast(floor((lon_us / 1000000.0 - (-180.0)) / (180.0 - (-180.0)) * 360) as int), 359) as col0,
             least(cast(floor((lat_us / 1000000.0 - (-90.0)) / (90.0 - (-90.0)) * 180) as int), 179) as yi
      from pts
    ),
    img as (
      select (180 - 1 - yi)::int as row, col0::int as col,
             cast(count(*) as double) as value
      from binned group by yi, col0
    )
    {spread_sql_duckdb('img', 360, 180, 1, 'add')}
    """

    # geo-velocity twin: same window, same haversine text, same km/h floor
    from zen3geo_spark.operators.spatial_join import haversine_m_sql
    _gv_hav = haversine_m_sql("p_lat", "p_lon", "lat_us", "lon_us", "duckdb")
    _gv_speed = f"((({_gv_hav}) / 1000.0) / (cast(pid - p_pid as double) / 3600.0))"
    geo_velocity_sql = f"""
    with pages as ({pages_cte_sql(N_PAGES)}),
    tagged as (
      select {URL_HOST_SQL} as host, {URL_PID_SQL} as pid,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 1) as lat_str,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 2) as lon_str
      from pages
    ),
    pts as (
      select host, pid, {micro_from_str_sql('lat_str', 'duckdb')} as lat_us,
             {micro_from_str_sql('lon_str', 'duckdb')} as lon_us
      from tagged where lat_str <> ''
    ),
    hop as (
      select host, pid, lat_us, lon_us,
             lag(lat_us) over (partition by host order by pid) as p_lat,
             lag(lon_us) over (partition by host order by pid) as p_lon,
             lag(pid) over (partition by host order by pid) as p_pid
      from pts
    ),
    k as (
      select host, cast(floor({_gv_speed}) as bigint) as kmh
      from hop where p_pid is not null
    )
    select host, count(*) as n_hops, max(kmh) as max_kmh,
           sum(case when kmh >= 1000 then 1 else 0 end) as n_impossible
    from k group by host
    """

    from zen3geo_spark.operators.curation import (
        pii_scrub_sql_duckdb, synth_blocklist_sql_duckdb,
    )

    # same injection formula as q_pii_redact (cast spelled for DuckDB)
    pii_inject = _PII_INJECT_EXPR.replace("as string", "as varchar")
    pii_redact_sql = f"""
    with injected as (
      select doc_id, source, {pii_inject} as text
      from documents
    ),
    scrubbed as ({pii_scrub_sql_duckdb("injected")})
    select source,
           count(*) as n_docs,
           count(*) filter (where n_email + n_phone + n_ipv4 > 0)
               as docs_with_pii,
           sum(n_email) as n_emails,
           sum(n_phone) as n_phones,
           sum(n_ipv4) as n_ips,
           sum(length(clean_text)) as clean_len
    from scrubbed group by source
    """

    from zen3geo_spark.functions.sketch import count_min_sql_duckdb

    count_min_sql = count_min_sql_duckdb(
        "documents", CM_PROBES, depth=4, width=512)

    from zen3geo_spark.operators.linkgraph import pagerank_sql_duckdb

    pagerank_sql = pagerank_sql_duckdb(n_hosts=1000, iters=5)

    from zen3geo_spark.functions.text import (
        linear_classifier_sql_duckdb, subword_count_sql_duckdb,
    )

    subword_tokens_sql = f"""
    select lang, count(*) as n_docs,
           sum({token_count_sql('text', 'duckdb')}) as ws_tokens,
           sum({subword_count_sql_duckdb('text')}) as subword_tokens
    from documents group by lang
    """

    quality_classifier_sql = linear_classifier_sql_duckdb(
        "documents", dim=256)

    asof_join_sql = """
    with clicks as (
      select user_id, ts, event_id, value from events
      where event_type = 'click'
    ),
    errors as (
      select user_id, ts, event_id, value from events
      where event_type = 'error'
    )
    select c.user_id, c.event_id, c.ts,
           e.event_id as err_event_id, e.ts as err_ts,
           e.value as err_value
    from clicks c asof left join errors e
      on c.user_id = e.user_id and c.ts >= e.ts
    """

    url_blocklist_sql = f"""
    with pages as ({pages_cte_sql(N_PAGES)}),
    blocklist as ({synth_blocklist_sql_duckdb()}),
    tagged as (
      select p.lang, b.category as block_category,
             regexp_extract(p.url, '^https?://([^/]+)/', 1) as host
      from pages p
      left join blocklist b
        on regexp_extract(p.url, '^https?://([^/]+)/', 1) = b.host
    )
    select lang, block_category, count(*) as n_pages,
           count(distinct host) as n_hosts
    from tagged group by lang, block_category
    """

    # stac_asset_engines oracle: regenerate the deterministic sidecar
    # formulas in pure SQL (no file reads) — same pattern as
    # binary_assets below
    stac_asset_engines_sql = """
    with items as (
      select id as item_id, 'c' || cast(id % 3 as varchar) as collection,
             (id * 5000003) % 180000001 - 90000000 as lat_us,
             (id * 9000007) % 360000001 - 180000000 as lon_us
      from range(20) t(id)
    ),
    px as (
      select i.item_id, cast((i.item_id * 11 + j.j * 17) % 256 as double) as v
      from items i, range(15) j(j) where j.j < 10 + i.item_id % 5
    ),
    stats as (
      select item_id, count(*) as n_px, sum(v) as sum_v
      from px group by item_id
    )
    select i.item_id, i.collection, i.lat_us, i.lon_us, s.n_px, s.sum_v
    from items i join stats s using (item_id)
    """

    binary_assets_sql = f"""
    with a as (select id as asset_id, 20 + id % 8 as w, 12 + id % 4 as h
               from range({N_PGM_ASSETS}) t(id)),
    px as (
      select asset_id, h, w,
             cast((asset_id * 11 + i * 17) % 256 as double) as v
      from a, range(405) r(i) where i < w * h
    )
    select asset_id, cast(h as int) as height, cast(w as int) as width,
           round(avg(v), 6) as mean_px, min(v) as min_px, max(v) as max_px
    from px group by asset_id, h, w
    """

    word_jaccard_exact_sql = """
    with toks as (
      select doc_id, unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) as tok,
             len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) as n_sh
      from documents where doc_id < 200
    ),
    inter as (
      select l.doc_id as a_id, r.doc_id as b_id, l.n_sh as n_a, r.n_sh as n_b,
             count(*) as n_inter
      from toks l join toks r on r.tok = l.tok and l.doc_id < r.doc_id
      group by 1, 2, 3, 4
    )
    select a_id, b_id,
           round(cast(n_inter as double) / (n_a + n_b - n_inter), 6) as jaccard
    from inter
    where cast(n_inter as double) / (n_a + n_b - n_inter) >= 0.5
    """

    from zen3geo_spark.operators.dedup import components_sql_duckdb
    # simhash_ctes without the leading "with" keyword, injected flat into
    # the recursive WITH list
    simhash_ctes_flat = simhash_ctes.strip()
    assert simhash_ctes_flat.startswith("with ")
    simhash_ctes_flat = simhash_ctes_flat[5:] + \
        ", prs as (select a_id, b_id from cand where bit_count(xor(sa, sb)) <= 8)"
    dedup_clusters_sql = components_sql_duckdb(
        "select a_id as u, b_id as v from prs "
        "union all select b_id as u, a_id as v from prs",
        "select doc_id as node from documents",
        prelude_ctes=simhash_ctes_flat)

    # leakage-safe split twin: same content fingerprint, same 40-bit
    # polynomial bucket, same 90/10 cut
    from zen3geo_spark.operators.dedup import hash40_sql_duckdb
    _ls_fp = fingerprint_sql("text", "duckdb")
    _ls_bucket = hash40_sql_duckdb("fp")
    leakage_safe_split_sql = f"""
    with fps as (select doc_id, source, {_ls_fp} as fp from documents),
    s as (select source,
                 case when ({_ls_bucket}) % 100 < 90 then 'train'
                      else 'val' end as split,
                 fp
          from fps)
    select source, split, count(*) as n_docs,
           count(distinct fp) as n_contents
    from s group by source, split
    """

    # geo×lang mix twin: the PIP core as a derived table joined back to
    # the page dim, share = n / per-polygon sum (bigint→double division,
    # identical IEEE result both engines)
    geo_lang_mix_sql = f"""
    with pages as ({pages_cte_sql(N_PAGES, with_id=True)}),
    hits as ({pip_core}),
    per as (
      select h.geom_id, p.lang, count(*) as n_pages
      from hits h join pages p on p.id = h.point_id
      group by h.geom_id, p.lang
    )
    select geom_id, lang, n_pages,
           round(n_pages / sum(n_pages) over (partition by geom_id), 6)
             as share
    from per
    """

    # multi-ring PIP twin: identical even-odd parity over the union of
    # ring edges (donut hole + two-part multipolygon)
    _me = _multi_edges_values()
    pip_multi_ring_sql = f"""
    {pts_cte}
    select p.point_id, e.geom_id
    from pts p join {_me}
      on ((e.y1 > p.lat_us) != (e.y2 > p.lat_us))
    group by p.point_id, e.geom_id, p.lat_us, p.lon_us
    having sum(case when p.lon_us < cast(e.x2 - e.x1 as double) * cast(p.lat_us - e.y1 as double)
                                     / cast(e.y2 - e.y1 as double) + e.x1
                    then 1 else 0 end) % 2 = 1
    """

    # geo-backfill twin: same tagged-page modal cell per host, same
    # inherit join for untagged pages
    _gb_cell = cell_id_sql("lat_us", "lon_us", 4, "duckdb")
    _gb_lat = micro_from_str_sql("lat_str", "duckdb")
    _gb_lon = micro_from_str_sql("lon_str", "duckdb")
    geo_backfill_sql = f"""
    with pages as ({pages_cte_sql(N_PAGES)}),
    base as (
      select regexp_extract(url, '^https?://([^/]+)/', 1) as host,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 1) as lat_str,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 2) as lon_str
      from pages
    ),
    tagged as (
      select host, {_gb_cell} as cell from (
        select host, {_gb_lat} as lat_us, {_gb_lon} as lon_us
        from base where lat_str <> ''
      )
    ),
    modal as (
      select host, cell from (
        select host, cell,
               row_number() over (partition by host
                                  order by count(*) desc, cell asc) as rk
        from tagged group by host, cell
      ) where rk = 1
    )
    select m.cell, count(*) as n_backfilled
    from base b join modal m on b.host = m.host
    where b.lat_str = ''
    group by m.cell
    """

    # recrawl-cadence twin: same lag gaps, same integer lower median
    recrawl_cadence_sql = f"""
    {pts_cte}
    , g as (
      select point_id % 1000 as host_id, point_id as pid,
             point_id - lag(point_id) over (partition by point_id % 1000
                                            order by point_id) as gap
      from pts
    ),
    gaps as (select host_id, pid, gap from g where gap is not null),
    stats as (
      select host_id, count(*) as n_gaps, min(gap) as min_gap,
             max(gap) as max_gap
      from gaps group by host_id
    ),
    med as (
      select host_id, gap as med_gap from (
        select host_id, gap,
               row_number() over (partition by host_id
                                  order by gap, pid) as rn
        from gaps
      ) r join stats using (host_id)
      where r.rn = (stats.n_gaps + 1) // 2
    )
    select host_id, n_gaps, min_gap, max_gap, med_gap
    from stats join med using (host_id)
    """

    # quadkey twin: same iy/ix integer grid, same base-4 digit extract
    _qk_digits = ", ".join(
        f"cast((((iy >> {z}) & 1) * 2 + ((ix >> {z}) & 1)) as varchar)"
        for z in range(5, -1, -1))
    quadkeys_sql = f"""
    {pts_cte}
    , t as (select ((lat_us + 90000000) * 64) // 180000001 as iy,
                   ((lon_us + 180000000) * 64) // 360000001 as ix
            from pts)
    select concat({_qk_digits}) as quadkey, count(*) as n_pages
    from t group by 1
    """

    # compact-cells twin: same closed-form coarsest-complete-ancestor
    # plan (operators/cells.py), UNION-ALL-unrolled level range
    from zen3geo_spark.operators.cells import (
        compact_cells_sql, grid_dbscan_edges_sql,
    )
    _cc_cells = cell_id_sql("lat_us", "lon_us", 5, "duckdb")
    # flatten the generated WITH into pts_cte's WITH list
    _cc_body = compact_cells_sql(
        f"select {_cc_cells} as cell from pts", 5, 2).strip()
    assert _cc_body.startswith("with ")
    compact_cells_sql_q = f"""
    {pts_cte}
    , {_cc_body[5:]}
    """
    # round-trip twin: the ORIGINAL distinct res-5 cell set — a hash
    # match proves uncompact(compact(S)) is the identity
    compact_roundtrip_sql_q = f"""
    {pts_cte}
    select distinct {_cc_cells} as cell from pts
    """
    _gd_cell6 = cell_id_sql("lat_us", "lon_us", 6, "duckdb")
    _gd_pre = pts_cte.strip()
    assert _gd_pre.startswith("with ")
    _gd_pre_flat = _gd_pre[5:].rstrip().rstrip(",") + (
        f", _core as (select {_gd_cell6} as cell, count(*) as n_pts "
        "from pts group by 1 having count(*) >= 2)")
    _gd_comp = components_sql_duckdb(
        grid_dbscan_edges_sql("select cell from _core", 6),
        "select cell as node from _core",
        prelude_ctes=_gd_pre_flat)
    grid_dbscan_sql_q = f"""
    select c.node as cell, c.component as cluster, k.n_pts
    from ({_gd_comp}) c
    join (with {_gd_pre_flat} select * from _core) k on c.node = k.cell
    """

    # WARC round-trip twin: the four parsed values computed DIRECTLY
    # from the source table (md5 over the varchar pre-image of the
    # UTF-8 payload bytes — DuckDB's md5 is varchar-only)
    warc_roundtrip_sql_q = f"""
    with pages as ({pages_cte_sql(N_PAGES)})
    select url,
           strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') as warc_date,
           cast(octet_length(html) as bigint) as content_length,
           md5(concat('<html><body>', text, '</body></html>')) as payload_md5
    from pages
    """

    stream_dedup_sql_q = f"""
    select distinct {fingerprint_sql('text', 'duckdb')} as fp from documents
    """

    from zen3geo_spark.operators.cells import cover_polygon_cells_sql
    polygon_cover_sql_q = cover_polygon_cells_sql(edges, res=8, min_res=3)

    _ct_cell4 = cell_id_sql("lat_us", "lon_us", 4, "duckdb")
    _ct_lat = micro_from_str_sql("lat_str", "duckdb")
    _ct_lon = micro_from_str_sql("lon_str", "duckdb")
    crawl_transitions_sql_q = f"""
    with pages as ({pages_cte_sql(N_PAGES, with_id=True)}),
    tagged as (
      select id, {URL_HOST_SQL} as host,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 1) as lat_str,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 2) as lon_str
      from pages
    ),
    pts as (
      select id, host, {_ct_lat} as lat_us, {_ct_lon} as lon_us
      from tagged where lat_str <> ''
    ),
    cl as (select id, host, {_ct_cell4} as cell from pts),
    tr as (
      select host, cell as to_cell,
             lag(cell) over (partition by host order by id) as from_cell
      from cl
    )
    select from_cell, to_cell, count(*) as n_hops,
           count(distinct host) as n_hosts
    from tr where from_cell is not null
    group by from_cell, to_cell
    """

    from zen3geo_spark.operators.cells import cover_segment_cells_sql
    _tc_segs = f"""
    with pages as ({pages_cte_sql(N_PAGES, with_id=True)}),
    tagged as (
      select id, {URL_HOST_SQL} as host,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 1) as lat_str,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 2) as lon_str
      from pages
    ),
    pts as (
      select id, host, {_ct_lat} as lat_us, {_ct_lon} as lon_us
      from tagged where lat_str <> ''
    ),
    lagged as (
      select id as seg_id,
             lag(lon_us) over (partition by host order by id) as x1,
             lag(lat_us) over (partition by host order by id) as y1,
             lon_us as x2, lat_us as y2
      from pts
    )
    select seg_id, x1, y1, x2, y2 from lagged where x1 is not null
    """
    trajectory_cover_sql_q = f"""
    select cell, count(*) as n_segments
    from ({cover_segment_cells_sql(_tc_segs, 5)})
    group by cell
    """

    from zen3geo_spark.operators.cells import cover_disk_cells_sql
    disk_cover_sql_q = cover_disk_cells_sql(
        f"{_points_cte()} select point_id, lat_us, lon_us from pts "
        "where point_id < 30",
        radius_us=5_000_000, res=6)

    # coverage delta / cover rollup twins: raw cell sets -> anti-join /
    # bounded ancestor chain, same grouped-compact helper
    _cv_cell5 = cell_id_sql("lat_us", "lon_us", 5, "duckdb")
    _cv_added = f"""
      select cell from (
        select distinct {_cv_cell5} as cell from pts where point_id % 2 = 1
      ) o
      where cell not in (
        select distinct {_cv_cell5} as cell from pts where point_id % 2 = 0
      )
    """
    _cv_body = compact_cells_sql(_cv_added, 5, 2).strip()
    assert _cv_body.startswith("with ")
    coverage_delta_sql_q = f"""
    {_points_cte()}
    , {_cv_body[5:]}
    """

    from zen3geo_spark.operators.spatial_join import str_pack_sql_duckdb
    # planning-time N: pages with >= 1 well-formed geotag (id % 7 != 3),
    # the same scalar the Spark side counts at runtime
    _n_tagged = sum(1 for i in range(N_PAGES) if i % 7 != 3)
    str_pack_sql_q = f"""
    {_points_cte()}
    {str_pack_sql_duckdb('pts', leaf_cap=64, n=_n_tagged)}
    """

    _cell6 = cell_id_sql("lat_us", "lon_us", 6, "duckdb")
    layout_rle_audit_sql_q = f"""{_points_cte()},
    cl as (select point_id, {_cell6} as cell from pts),
    u as (
      select count(*) - sum(case when cell = prev then 1 else 0 end)
               as runs_url_order
      from (select cell, lag(cell) over (order by point_id) as prev
            from cl)
    ),
    z as (
      select count(*) - sum(case when cell = prev then 1 else 0 end)
               as runs_zorder
      from (select cell, lag(cell) over (order by cell, point_id) as prev
            from cl)
    )
    select runs_url_order, runs_zorder,
           1000 * runs_url_order // runs_zorder as collapse_milli
    from u, z
    """

    late_data_audit_sql_q = """
    with ev as (
      select event_type, event_id,
             cast(floor(epoch(ts)) as bigint) as es
      from events
    ),
    run as (
      select event_type, es,
             max(es) over (partition by event_type order by event_id
                           rows between unbounded preceding
                           and 1 preceding) as hwm
      from ev
    )
    select event_type, count(*) as n_events,
           sum(case when es < hwm - 7200 then 1 else 0 end) as n_late_2h,
           max(case when hwm > es then hwm - es else 0 end)
             as max_lateness_s
    from run group by event_type
    """

    equi_depth_hist_sql_q = """
    with li as (
      select cast(round(l_extendedprice * 100) as bigint) as cents,
             l_orderkey * 10 + l_linenumber as rid
      from lineitem
    ),
    nw as (select (count(*) + 31) // 32 as w from li),
    r as (
      select cents, row_number() over (order by cents, rid) as pos
      from li
    )
    select (pos - 1) // w as bucket,
           min(cents) as lo, max(cents) as hi,
           count(*) as n_rows, count(distinct cents) as ndv
    from r, nw group by 1
    """

    from zen3geo_spark.operators.linkgraph import (
        synth_host_edges_sql_duckdb as _she_sql,
    )
    join_card_est_sql_q = f"""
    with a as (
      select ({URL_PID_SQL}) % 1000 as k
      from ({pages_cte_sql(N_PAGES)})
    ),
    b as (select dst as k from ({_she_sql(1000)})),
    ha as (select k // 8 as b8, count(*) as na,
                  count(distinct k) as nda from a group by 1),
    hb as (select k // 8 as b8, count(*) as nb,
                  count(distinct k) as ndb from b group by 1),
    est as (
      select sum(na * nb // greatest(nda, ndb)) as est_rows
      from ha join hb using (b8)
    ),
    act as (
      select sum(ca * cb) as true_rows from
        (select k, count(*) as ca from a group by k) x
        join (select k, count(*) as cb from b group by k) y using (k)
    )
    select est_rows, true_rows,
           1000 * est_rows // true_rows as ratio_milli
    from est, act
    """

    str_query_sql_q = f"""
    {_points_cte()},
    leaves as ({str_pack_sql_duckdb('pts', leaf_cap=64, n=_n_tagged)}),
    qb as ({_STR_QBOX_SQL}),
    cand as (
      select q_id, count(*) as n_cand_leaves, sum(n_pts) as n_cand_points
      from qb join leaves
        on minx_us <= x2 and maxx_us >= x1
       and miny_us <= y2 and maxy_us >= y1
      group by q_id
    ),
    exact as (
      select q_id, count(*) as n_exact
      from qb join pts
        on lon_us between x1 and x2 and lat_us between y1 and y2
      group by q_id
    )
    select q.q_id, coalesce(c.n_cand_leaves, 0) as n_cand_leaves,
           coalesce(c.n_cand_points, 0) as n_cand_points,
           coalesce(e.n_exact, 0) as n_exact
    from qb q left join cand c on q.q_id = c.q_id
    left join exact e on q.q_id = e.q_id
    """

    from zen3geo_spark.functions.bpe import (
        bpe_train_sql_duckdb, word_counts_sql_duckdb,
    )
    bpe_train_sql_q = bpe_train_sql_duckdb(
        f"({word_counts_sql_duckdb('documents')})", n_merges=12)
    from zen3geo_spark.functions.bpe import bpe_encode_sql_duckdb
    bpe_encode_sql_q = bpe_encode_sql_duckdb(
        f"({word_counts_sql_duckdb('documents')})", n_merges=12)

    from zen3geo_spark.operators.cells import (
        local_moran_sql_duckdb, moran_i_sql_duckdb,
    )
    moran_i_sql_q = f"""
    {_points_cte()}
    select * from ({moran_i_sql_duckdb('select lat_us, lon_us from pts', 4)})
    """
    local_moran_sql_q = f"""
    {_points_cte()}
    select * from (
      {local_moran_sql_duckdb('select lat_us, lon_us from pts', 4)}
    )
    """

    _cd_cell4 = cell_id_sql("lat_us", "lon_us", 4, "duckdb")
    _cd_lat = micro_from_str_sql("lat_str", "duckdb")
    _cd_lon = micro_from_str_sql("lon_str", "duckdb")
    cell_diversity_sql_q = f"""
    with pages as ({pages_cte_sql(N_PAGES)}),
    tagged as (
      select lang,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 1) as lat_str,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 2) as lon_str
      from pages
    ),
    pt as (
      select lang, {_cd_cell4.replace('lat_us', _cd_lat).replace('lon_us', _cd_lon)} as cell
      from tagged where lat_str <> ''
    ),
    per as (select cell, lang, count(*) as ni from pt group by 1, 2),
    rk as (
      select cell, lang, ni,
             row_number() over (partition by cell
                                order by ni desc, lang asc) as rk
      from per
    )
    select cell, sum(ni) as n,
           max(case when rk = 1 then lang end) as top_lang,
           (sum(ni) * sum(ni) - sum(ni * ni)) * 10000
             // (sum(ni) * sum(ni)) as simpson_x1e4
    from rk group by cell
    """

    _ca_cell2 = cell_id_sql("lat_us", "lon_us", 2, "duckdb")
    _ca_lat = micro_from_str_sql("lat_str", "duckdb")
    _ca_lon = micro_from_str_sql("lon_str", "duckdb")
    cell_anomaly_sql_q = f"""
    with pages as ({pages_cte_sql(N_PAGES)}),
    tagged as (
      select warc_ts,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 1) as lat_str,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 2) as lon_str
      from pages
    ),
    pt as (
      select epoch(warc_ts)::bigint // 600 as ep,
             {_ca_cell2.replace('lat_us', _ca_lat).replace('lon_us', _ca_lon)} as cell
      from tagged where lat_str <> ''
    ),
    cnts as (select cell, ep, count(*) as n from pt group by 1, 2),
    med as (
      select cell, ep, n,
             max(case when rk = (tot + 1) // 2 then n end)
               over (partition by cell) as med
      from (select cell, ep, n,
                   row_number() over (partition by cell
                                      order by n asc, ep asc) as rk,
                   count(*) over (partition by cell) as tot
            from cnts)
    ),
    mad as (
      select cell, ep, n, med,
             max(case when rk2 = (tot + 1) // 2 then abs(n - med) end)
               over (partition by cell) as mad
      from (select cell, ep, n, med,
                   row_number() over (partition by cell
                                      order by abs(n - med) asc, ep asc)
                     as rk2,
                   count(*) over (partition by cell) as tot
            from med)
    )
    select cell, ep, n, med, mad,
           abs(n - med) > greatest(3 * mad, 2) as is_anomaly
    from mad
    """

    # focal map algebra: the world-points raster as INTEGER pixels, then
    # the shared engine-neutral focal twin over it
    from zen3geo_spark.operators.raster_algebra import (
        focal_stats_sql, idw_accumulate_sql)
    _world_px_int = f"""
    {_points_cte()}
    , binned as (
      select least(cast(floor((lon_us / 1000000.0 - (-180.0))
                              / (180.0 - (-180.0)) * 360) as int), 359) as col0,
             least(cast(floor((lat_us / 1000000.0 - (-90.0))
                              / (90.0 - (-90.0)) * 180) as int), 179) as yi
      from pts
    )
    select (180 - 1 - yi)::int as row, col0::int as col,
           count(*)::bigint as value
    from binned group by yi, col0
    """
    focal_stats_sql_q = focal_stats_sql(
        _world_px_int, width=360, height=180, radius=1)
    from zen3geo_spark.operators.raster_algebra import (
        flow_accumulate_sql, flow_basin_sql, flow_dir_d8_sql,
    )
    flow_basin_sql_q = flow_basin_sql(
        _world_px_int, width=360, height=180, jumps=2)
    flow_dir_sql_q = flow_dir_d8_sql(_world_px_int, width=360, height=180)
    flow_accum_sql_q = flow_accumulate_sql(
        _world_px_int, width=360, height=180, rounds=3)

    idw_grid_sql_q = idw_accumulate_sql(
        f"{_points_cte()} select lat_us, lon_us, point_id % 10 as v from pts",
        res=5, value_col="v", scale=10 ** 15)

    from zen3geo_spark.sources.gazetteer import gazetteer_cte_sql
    _gz_cell4 = cell_id_sql("b.lat_us", "b.lon_us", 4, "duckdb")
    geocode_gazetteer_sql_q = f"""
    with gaz as ({gazetteer_cte_sql()}),
    best as (
      select name, lat_us, lon_us,
             row_number() over (partition by name
                                order by population desc, gaz_id asc) as rk,
             count(*) over (partition by name) as n_candidates
      from gaz
    ),
    pages as ({pages_cte_sql(N_PAGES)}),
    hosts as (
      select regexp_extract(url, '^https?://([^/]+)/', 1) as host,
             count(*) as n_pages
      from pages group by 1
    )
    select h.host, h.n_pages, b.n_candidates, b.lat_us, b.lon_us,
           {_gz_cell4} as cell
    from hosts h join best b on h.host = b.name and b.rk = 1
    """

    cell_trend_sql_q = f"""
    with pages as ({pages_cte_sql(N_PAGES)}),
    tagged as (
      select warc_ts,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 1) as lat_str,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 2) as lon_str
      from pages
    ),
    pt as (
      select epoch(warc_ts)::bigint // 300 - 5680224 as t,
             {_ca_cell2.replace('lat_us', _ca_lat).replace('lon_us', _ca_lon)} as cell
      from tagged where lat_str <> ''
    ),
    cnts as (select cell, t, count(*) as y from pt group by 1, 2)
    select cell, count(*) as n_epochs, cast(sum(y) as bigint) as sum_y,
           cast(count(*) * sum(t * y) - sum(t) * sum(y) as bigint) as slope_num,
           cast(count(*) * sum(t * t) - sum(t) * sum(t) as bigint) as slope_den
    from cnts group by cell
    """

    from zen3geo_spark.operators.simplify import simplify_sweep_sql
    from zen3geo_spark.operators.overlay import rect_overlay_sql
    _tracks_sql = f"""
    with pages as ({pages_cte_sql(N_PAGES)}),
    tagged as (
      select regexp_extract(url, '^https?://([^/]+)/', 1) as host,
             cast(regexp_extract(url, '/page/([0-9]+)$', 1) as bigint) as pid,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 1) as lat_str,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 2) as lon_str
      from pages
    )
    select host, pid,
           {micro_from_str_sql('lon_str', 'duckdb')} as x_us,
           {micro_from_str_sql('lat_str', 'duckdb')} as y_us
    from tagged where lat_str <> ''
    """
    simplify_track_sql_q = simplify_sweep_sql(
        _tracks_sql, key="host", seq="pid", x="x_us", y="y_us",
        min_area2=5 * 10 ** 15)

    def _rects_sql(parity: int, half: int, pfx: str) -> str:
        return f"""
        {_points_cte()}
        select point_id as {pfx}_id,
               greatest(lon_us - {half}, -180000000) as {pfx}x1,
               greatest(lat_us - {half}, -90000000) as {pfx}y1,
               least(lon_us + {half}, 180000000) as {pfx}x2,
               least(lat_us + {half}, 90000000) as {pfx}y2
        from pts where point_id % 2 = {parity}
        """
    rect_overlay_sql_q = rect_overlay_sql(
        _rects_sql(0, 1_500_000, "a"), _rects_sql(1, 1_000_000, "b"))

    from zen3geo_spark.operators.raster_algebra import slope_aspect_sql
    from zen3geo_spark.operators.map_match import map_match_sql
    slope_aspect_sql_q = slope_aspect_sql(_world_px_int, width=360, height=180)

    _seg_body = "select " + ", ".join(
        f"{e} as {k}" for k, e in _segment_col_exprs().items()) + \
        f" from (select g.range as id from range({N_SEGMENTS}) g)"
    map_match_sql_q = map_match_sql(
        f"{_points_cte()} select point_id, lat_us, lon_us from pts",
        _seg_body, res=6)

    _lp_cell3 = cell_id_sql("lat_us", "lon_us", 3, "duckdb")
    link_geo_propagate_sql_q = f"""
    {_points_cte()}
    , links as (
      select g.range as src, (g.range * 2654435761) % {N_PAGES} as dst
      from range({N_PAGES}) g
    ),
    tsrc as (select point_id as src, {_lp_cell3} as cell from pts),
    votes as (
      select l.dst, t.cell, count(*) as n_votes
      from links l join tsrc t on l.src = t.src
      where l.dst % 7 = 3
      group by 1, 2
    )
    select dst as page_id, cell, n_votes, n_tagged_in
    from (select dst, cell, n_votes,
                 cast(sum(n_votes) over (partition by dst) as bigint)
                   as n_tagged_in,
                 row_number() over (partition by dst
                                    order by n_votes desc, cell asc) as rk
          from votes)
    where rk = 1
    """

    from zen3geo_spark.operators.raster_algebra import contour_crossings_sql
    contour_sql_q = contour_crossings_sql(
        _world_px_int, width=360, height=180, threshold=2)

    from zen3geo_spark.functions.text import lang_id_sql, readability_sql
    _read_ex = readability_sql("text", "duckdb")
    readability_sql_q = (
        "with pages as (" + pages_cte_sql(N_PAGES) + ")\nselect url, "
        + ", ".join(f"{sql} as {name}" for name, sql in _read_ex.items())
        + " from pages")
    from zen3geo_spark.operators.curation import c4_segment_clean_sql_duckdb
    c4_clean_sql_q = c4_segment_clean_sql_duckdb(
        pages_cte_sql(N_PAGES), "url", "text", min_tokens=3)
    lang_mismatch_sql_q = (
        f"select lang as declared, {lang_id_sql('text', 'duckdb')} as "
        "detected, count(*) as n_docs from documents group by 1, 2")

    from zen3geo_spark.operators.raster_algebra import (
        equalize_histogram_sql,
    )
    equalize_sql_q = equalize_histogram_sql(_world_px_int, levels=16)
    from zen3geo_spark.plans.compaction import compaction_plan_sql
    compaction_plan_sql_q = compaction_plan_sql(
        """select id % 20 as part, id as file_id,
                  ((id * 48271 + 7) % 97 + 1) * 10 as mb
           from range(500) t(id)""",
        "part", "file_id", "mb", target_bytes=1024)

    from zen3geo_spark.operators.trajectory import (
        bearing_mix_sql_duckdb, track_resample_sql_duckdb,
    )
    _track_pts = f"""{_points_cte()}
    select point_id % 200 as host_id, point_id as t,
           lon_us as x, lat_us as y from pts"""
    track_resample_sql_q = track_resample_sql_duckdb(
        _track_pts, "host_id", "t", "x", "y", step=64, max_gap=1000)
    bearing_mix_sql_q = bearing_mix_sql_duckdb(
        _track_pts, "host_id", "t", "x", "y")

    from zen3geo_spark.operators.overlay import segment_intersect_sql_duckdb
    from zen3geo_spark.operators.trajectory import track_segments_sql
    _seg_a_sql = track_segments_sql(
        _track_pts, "host_id", "t", "x", "y",
        max_gap=1000, span_max=120_000_000)
    _seg_b_sql = ("select id as b_id, "
                  "cast(-180000000 + id * 15000000 as bigint) as bsx0, "
                  "cast(-80000000 as bigint) as bsy0, "
                  "cast(-175000000 + id * 15000000 as bigint) as bsx1, "
                  "cast(80000000 as bigint) as bsy1 from range(24) t(id)")
    seg_crossings_sql_q = segment_intersect_sql_duckdb(_seg_a_sql, _seg_b_sql)

    from zen3geo_spark.operators.temporal import snapshot_as_of_sql_duckdb
    _cdc_log_sql = f"""
    select concat('k', cast(id % 2000 as varchar)) as k, id as ord,
           case when id % 10 = 0 then 'D' else 'U' end as op,
           lang, id % 7 as band
    from ({pages_cte_sql(N_PAGES, with_id=True)})"""
    time_travel_sql_q = snapshot_as_of_sql_duckdb(
        _cdc_log_sql, "k", "ord", [1500, 3500, 4800], ["lang", "band"])

    stream_join_sql_q = """
    select p.user_id as l_user, p.event_id as l_id, v.event_id as r_id
    from events p join events v
      on v.user_id = p.user_id
     and v.ts >= p.ts - interval '2 hours' and v.ts < p.ts
    where p.event_type = 'purchase' and v.event_type = 'view'
    """

    from zen3geo_spark.operators.raster_algebra import change_matrix_sql

    def _epoch_raster_sql(parity: int) -> str:
        return f"""{_points_cte()}
        select least((lat_us + 90000000) // 10000000, 17) as row,
               least((lon_us + 180000000) // 10000000, 35) as col,
               least(count(*), 3) as cls
        from pts where point_id % 2 = {parity} group by 1, 2"""
    change_detect_sql_q = change_matrix_sql(
        _epoch_raster_sql(0), _epoch_raster_sql(1))

    from zen3geo_spark.operators.suffix import suffix_ranks_sql_duckdb
    suffix_ranks_sql_q = suffix_ranks_sql_duckdb("documents", rounds=8)

    from zen3geo_spark.operators.overlay import iou_match_sql_duckdb
    iou_match_sql_q = iou_match_sql_duckdb(_IOU_PRED_SQL, _IOU_GT_SQL)

    from zen3geo_spark.operators.overlay import rect_union_area_sql
    rect_union_area_sql_q = rect_union_area_sql(_UNION_RECTS_SQL)

    from zen3geo_spark.functions.sketch import hll_sql_duckdb
    _ev_keys = ("(select date_trunc('hour', ts) - to_hours(cast("
                "hour(date_trunc('hour', ts)) % 6 as bigint)) as wstart, "
                "cast(user_id as varchar) as u from events)")
    windowed_hll_sql_q = f"""
    with est as ({hll_sql_duckdb(_ev_keys, "u", ("wstart",))}),
    exact as (
      select wstart, count(distinct u) as true_distinct
      from {_ev_keys} group by wstart
    )
    select e.wstart, round(e.est_distinct, 6) as est_distinct,
           x.true_distinct, e.registers_hit
    from est e join exact x on e.wstart = x.wstart
    """

    snapshot_expiry_sql_q = """
    with snaps as (
      select id as snap_id, cast(19723 + id * 2 + id % 3 as bigint)
               as day_no
      from range(120) t(id)
    ),
    rk as (
      select snap_id, day_no,
             row_number() over (order by day_no desc, snap_id desc)
               as recent,
             row_number() over (partition by day_no // 7
                                order by day_no, snap_id) as wk_first
      from snaps
    )
    select snap_id, day_no,
           case when recent <= 7 then 'recent'
                when wk_first = 1 then 'weekly'
                else 'expire' end as action
    from rk
    """

    embed_calibration_sql_q = """
    with d as (
      select generate_subscripts(embedding, 1) - 1 as dim,
             unnest(embedding) as v
      from embeddings
    )
    select dim, count(*) as n,
           round(min(v), 6) as min_v, round(max(v), 6) as max_v,
           round(avg(cast(v as double)), 6) as mean_v
    from d group by dim
    """

    _prof = " union all ".join(
        f"""select '{c}' as col, count(*) as n_rows,
               sum(case when {c} is null then 1 else 0 end) as n_null,
               sum(case when cast({c} as varchar) = '' then 1 else 0 end)
                 as n_empty,
               count(distinct cast({c} as varchar)) as n_distinct
            from documents"""
        for c in PROFILE_COLS)
    table_profile_sql_q = _prof

    # Spark grouping_id over (lang, source): bit per dim, detail=0,
    # lang-subtotal=1 (source grouped), grand=3 — DuckDB GROUPING agrees
    rollup_report_sql_q = """
    select coalesce(lang, 'ALL') as lang,
           coalesce(source, 'ALL') as source,
           grouping(lang) * 2 + grouping(source) as gid,
           count(*) as n_docs, sum(length(text)) as n_bytes
    from documents group by rollup(lang, source)
    """

    _pvt = ", ".join(
        f"sum(case when source = '{s}' then 1 else 0 end) as {s}"
        for s in PIVOT_SOURCES)
    pivot_langs_sql_q = f"select lang, {_pvt} from documents group by lang"

    host_percentiles_sql_q = f"""
    with pages as ({pages_cte_sql(N_PAGES)}),
    hosts as (
      select {URL_HOST_SQL} as host, sum(length(text)) as bytes
      from pages group by 1
    ),
    n as (select count(*) as n from hosts),
    rk as (
      select host, bytes,
             row_number() over (order by bytes, host) as rk
      from hosts
    )
    select host, bytes,
           1000 * (rk - 1) // (n - 1) as pr_milli,
           1000 * rk // n as cume_milli
    from rk, n
    """

    from zen3geo_spark.functions.geo import hex_bin_sql
    _hexd = hex_bin_sql("lon_us", "lat_us", HEX_A, HEX_B, "duckdb")
    hex_bins_sql_q = f"""{_points_cte()},
    hx as (
      select {_hexd['q']} as q, {_hexd['r']} as r from pts
    )
    select q, r, count(*) as n_points,
           3 * {HEX_A} * q as cx,
           {HEX_B} * q + 2 * {HEX_B} * r as cy
    from hx group by q, r
    """

    _doc_cell = cell_id_sql(
        "(doc_id * 48271 + 11) % 2147483647 % 180000001 - 90000000",
        "((doc_id * 48271 + 11) % 2147483647 * 48271 + 7) % 2147483647"
        " % 360000001 - 180000000", 3, "duckdb")
    cell_topics_sql_q = f"""
    with placed as (
      select doc_id, text, {_doc_cell} as cell from documents
    ),
    toks as (
      select cell, unnest(string_split(lower(text), ' ')) as tok
      from placed
    ),
    toks_nz as (select * from toks where tok <> ''),
    ct as (select cell, tok, count(*) as n_ct from toks_nz group by 1, 2),
    c as (select cell, count(*) as n_c from toks_nz group by 1),
    t as (select tok, count(*) as n_t from toks_nz group by 1
          having count(*) >= 5),
    tot as (select count(*) as tt from toks_nz),
    j as (
      select ct.cell, ct.tok,
             1000 * ct.n_ct * tt // (c.n_c * t.n_t) as lift_milli
      from ct join c using (cell) join t using (tok), tot
    )
    select cell, rk, tok, lift_milli from (
      select cell, tok, lift_milli,
             row_number() over (partition by cell
                                order by lift_milli desc, tok) as rk
      from j
    ) where rk <= 3
    """

    skyline_hosts_sql_q = f"""
    with pages as ({pages_cte_sql(N_PAGES)}),
    hosts as (
      select {URL_HOST_SQL} as host, sum(length(text)) as x,
             sum(case when text like '% lat=%' then 1 else 0 end) as y
      from pages group by 1
    ),
    m as (
      select host, x, y,
             max(y) over (order by x desc
                          range between unbounded preceding
                          and 1 preceding) as m1,
             max(y) over (partition by x) as m2
      from hosts
    )
    select host, x, y from m
    where (m1 is null or m1 < y) and m2 <= y
    """

    url_editdist_sql_q = f"""
    with pages as ({pages_cte_sql(N_PAGES, with_id=True)}),
    p as (select {URL_HOST_SQL} as host, url, id as pid from pages)
    select a.host, a.pid as a_pid, b.pid as b_pid,
           levenshtein(a.url, b.url) as dist
    from p a join p b on a.host = b.host and a.pid < b.pid
    where levenshtein(a.url, b.url) <= 2
    """

    ohlc_bars_sql_q = """
    with ev as (
      select event_id, ts, event_type, value,
             date_trunc('hour', ts)
               - to_hours(cast(hour(date_trunc('hour', ts)) % 6 as bigint))
               as wstart
      from events
    ),
    rk as (
      select *,
             row_number() over (partition by wstart, event_type
                                order by ts, event_id) as ra,
             row_number() over (partition by wstart, event_type
                                order by ts desc, event_id desc) as rd
      from ev
    )
    select wstart, event_type, count(*) as n,
           round(max(case when ra = 1 then value end), 4) as open,
           round(max(value), 4) as high,
           round(min(value), 4) as low,
           round(max(case when rd = 1 then value end), 4) as close
    from rk group by wstart, event_type
    """

    from zen3geo_spark.functions.web import (
        ip_geo_sql_duckdb, synth_cidr_sql, table_checksum_sql_duckdb,
    )
    from zen3geo_spark.operators.dedup import hash40_sql_duckdb as _h40b
    _hosts_ip_sql = f"""
    select host, {_h40b("host", 1)} % 4294967296 as ip from (
      select distinct {URL_HOST_SQL} as host
      from ({pages_cte_sql(N_PAGES)})
    )"""
    ip_geo_sql_q = ip_geo_sql_duckdb(_hosts_ip_sql,
                                     synth_cidr_sql(600, "duckdb"))
    table_checksum_sql_q = table_checksum_sql_duckdb(pages_cte_sql(N_PAGES))

    dom_stats_sql_q = f"""
    with pages as ({pages_cte_sql(N_PAGES)}),
    tags as (
      select url, u.tag, u.pos
      from pages,
           lateral (select unnest(regexp_extract_all(decode(html),
                      '</?[a-zA-Z]+')) as tag,
                    generate_subscripts(regexp_extract_all(decode(html),
                      '</?[a-zA-Z]+'), 1) as pos) u
    ),
    d as (
      select url, tag,
             sum(case when tag like '</%' then -1 else 1 end)
               over (partition by url order by pos) as depth
      from tags
    )
    select url, count(*) as n_tags,
           count(distinct replace(replace(tag, '<', ''), '/', ''))
             as n_names,
           max(depth) as max_depth
    from d group by url
    """

    budget_alloc_sql_q = f"""
    with pages as ({pages_cte_sql(N_PAGES)}),
    hosts as (
      select {URL_HOST_SQL} as host, sum(length(text)) as score
      from pages group by 1
    ),
    tot as (select sum(score) as tot from hosts),
    base as (
      select host, score,
             (score * 10000) // tot as floor_share,
             (score * 10000) % tot as rem
      from hosts, tot
    ),
    lf as (select 10000 - sum(floor_share) as leftover from base),
    rk as (
      select *, row_number() over (order by rem desc, host) as _rk
      from base
    )
    select host, score,
           floor_share + case when _rk <= leftover then 1 else 0 end
             as alloc
    from rk, lf
    """

    from zen3geo_spark.operators.dedup import hash40_sql_duckdb as _h40b
    def _rdv_pick(n: int) -> str:
        h = _h40b("concat(url, '#', cast(s.s as varchar))", 1)
        return f"""(
      select s.s from range({n}) as s(s)
      order by {h} desc, s.s desc limit 1
    )"""
    rendezvous_shards_sql_q = f"""
    with pages as ({pages_cte_sql(N_PAGES)}),
    sh as (
      select url, {_rdv_pick(8)} as shard8, {_rdv_pick(9)} as shard9
      from pages
    )
    select shard8, count(*) as n_urls,
           sum(case when shard8 <> shard9 then 1 else 0 end) as n_moved
    from sh group by shard8
    """

    from zen3geo_spark.operators.similarity import (
        pq_search_sql_duckdb, pq_train_sql_duckdb,
    )
    pq_codes_sql_q = (pq_train_sql_duckdb("embeddings", rounds=2)
                      + "\nselect id as vec_id, s, code from codes2")
    pq_search_sql_q = pq_search_sql_duckdb("embeddings", n_queries=3,
                                           top_k=5, rounds=2)

    # closed-form twin — independent of the pointer-doubling recurrence
    redirect_resolve_sql_q = f"""
    with pages as ({pages_cte_sql(N_PAGES, with_id=True)})
    select id as src, id - id % 16 as final,
           cast(id % 16 as bigint) as hops
    from pages where id % 16 != 0
    """

    from zen3geo_spark.operators.linkgraph import (
        deterministic_walks_sql_duckdb, synth_host_edges_sql_duckdb,
    )
    graph_walks_sql_q = deterministic_walks_sql_duckdb(
        synth_host_edges_sql_duckdb(1000), n_nodes=1000, steps=4)

    from zen3geo_spark.sources.warc import cdx_index_sql_duckdb
    cdx_index_sql_q = cdx_index_sql_duckdb(
        pages_cte_sql(N_PAGES, with_id=True), records_per_file=200)

    from zen3geo_spark.operators.dedup import hash40_sql_duckdb as _h40
    fetch_schedule_sql_q = f"""
    with pages as ({pages_cte_sql(N_PAGES, with_id=True)}),
    q as (
      select url, {URL_HOST_SQL} as host, id as pid from pages
    ),
    r as (
      select url, host,
             row_number() over (partition by host order by pid) - 1 as slot,
             {_h40("host", 1)} as h
      from q
    )
    select url, host, slot, slot * (1 + h % 5) as sched_s, h % 32 as worker
    from r
    """

    # image-chip oracle: synth_media P6 pixel i = (media_id·7 + i·13)
    # mod 256 at flat index ((y·w + x)·3 + c); chips = floor grid of
    # 8x8 windows, trailing partials dropped (xbatcher semantics)
    image_chips_sql_q = """
    with media as (
      select id as media_id, cast(16 + id % 16 as int) as w,
             cast(16 + id % 8 as int) as h
      from range(300) t(id) where id % 3 = 0
    ),
    chips as (
      select media_id, w, h, cy.cy as chip_row, cx.cx as chip_col
      from media,
           lateral (select unnest(generate_series(0, h // 8 - 1)) as cy) cy,
           lateral (select unnest(generate_series(0, w // 8 - 1)) as cx) cx
    ),
    px as (
      select media_id, chip_row, chip_col,
             cast((media_id * 7
                   + (((chip_row * 8 + dy.dy) * w
                       + (chip_col * 8 + dx.dx)) * 3 + c.c) * 13) % 256
                  as double) as v
      from chips,
           (select unnest(generate_series(0, 7)) as dy) dy,
           (select unnest(generate_series(0, 7)) as dx) dx,
           (select unnest(generate_series(0, 2)) as c) c
    )
    select media_id, chip_row, chip_col,
           round(avg(v), 6) as mean_px, min(v) as min_px, max(v) as max_px
    from px group by 1, 2, 3
    """

    # sliding windows: every event lands in length/slide = 3 windows
    sliding_window_sql_q = """
    select make_timestamp(((cast(floor(epoch(ts)) as bigint) // 7200) - k.k) * 7200 * 1000000)
             as window_start,
           event_type, count(*) as n
    from events, (select unnest(generate_series(0, 2)) as k) k
    group by 1, 2
    """

    from zen3geo_spark.operators.geo_cluster import geo_kmeans_sql_duckdb
    geo_kmeans_sql_q = geo_kmeans_sql_duckdb(
        f"{_points_cte()} select lon_us, lat_us from pts",
        k=12, rounds=3)

    from zen3geo_spark.operators.temporal import funnel_counts_sql
    funnel_sql_q = funnel_counts_sql(
        "events", ["signup", "view", "click", "purchase"])
    retention_cohorts_sql_q = f"""
    with pages as ({pages_cte_sql(N_PAGES, with_id=True)}),
    act as (
      select {URL_HOST_SQL} as host, id // 500 as epoch, count(*) as n
      from pages group by 1, 2
    ),
    first as (select host, min(epoch) as cohort from act group by host)
    select cohort, epoch, count(distinct a.host) as n_hosts
    from act a join first f on a.host = f.host
    group by 1, 2
    """

    from zen3geo_spark.operators.overlay import (
        polygon_intersect_sql, synth_poly_edges_sql,
    )
    poly_intersect_sql_q = polygon_intersect_sql(
        synth_poly_edges_sql(120, 11, "diamond", "a"),
        synth_poly_edges_sql(120, 23, "square", "b"))

    from zen3geo_spark.functions.text import bigram_logppl_sql_duckdb
    bigram_logppl_sql_q = (
        "select doc, round(logppl, 6) as logppl from ("
        + bigram_logppl_sql_duckdb("documents") + ")")

    from zen3geo_spark.functions.sketch import kmv_intersect_sql_duckdb
    kmv_intersect_sql_q = kmv_intersect_sql_duckdb(
        "(select * from documents where lang = 'en')",
        "(select * from documents where lang = 'de')", k=256)

    from zen3geo_spark.functions.text import (
        pmi_pairs_sql_duckdb, textrank_sql_duckdb,
    )
    pmi_pairs_sql_q = pmi_pairs_sql_duckdb(
        "documents", min_df=3, max_df=1_000_000, min_pair=3,
        max_doc_toks=80)
    textrank_sql_q = textrank_sql_duckdb(
        "documents", min_df=3, max_df=1_000_000, iters=4)

    from zen3geo_spark.operators.temporal import cusum_screen_sql
    cusum_drift_sql_q = cusum_screen_sql(
        f"""select id % 50 as host_id, id // 500 as epoch,
                   sum(length(text)) as vol
            from ({pages_cte_sql(N_PAGES, with_id=True)})
            group by 1, 2""",
        "host_id", "epoch", "vol", drift_k=20, threshold=60)
    merge_upsert_sql_q = f"""
with pages as ({pages_cte_sql(N_PAGES, with_id=True)}),
p as (select url, id as pid, lang from pages),
base as (select url, lang, pid % 7 as band from p where pid < 4000),
upd as (select url, pid as ord,
               case when pid % 10 = 0 then 'D' else 'U' end as op,
               concat(lang, '2') as lang, pid % 7 + 1 as band
        from p where pid >= 3000)
select coalesce(b.url, u.url) as url,
       case when u.url is not null then u.lang else b.lang end as lang,
       case when u.url is not null then u.band else b.band end as band,
       case when u.url is null then 'keep'
            when b.url is null then 'insert' else 'update' end as action
from base b full outer join upd u on b.url = u.url
where u.url is null or u.op <> 'D'
"""

    from zen3geo_spark.operators.raster_algebra import (
        distance_transform_sql, polygonize_regions_sql_duckdb,
    )
    distance_transform_sql_q = distance_transform_sql(
        f"select row, col, value from ({_world_px_int}) where value >= 2",
        width=360, height=180, rounds=3)
    polygonize_sql_q = polygonize_regions_sql_duckdb(
        f"select row, col, cast(least(value, 3) as bigint) as cls "
        f"from ({_world_px_int})", width=360)

    from zen3geo_spark.operators.linkgraph import (
        bfs_hops_sql_duckdb, cocitation_sql_duckdb,
        triangle_counts_sql_duckdb,
    )
    from zen3geo_spark.operators.linkgraph import (
        cheapest_paths_sql_duckdb, kcore_sql_duckdb,
    )
    kcore_sql_q = kcore_sql_duckdb(n_hosts=1000, k=8, rounds=3)
    from zen3geo_spark.operators.linkgraph import (
        hits_sql_duckdb, neighbor_jaccard_sql_duckdb,
    )
    hits_sql_q = hits_sql_duckdb(n_hosts=1000, iters=2)
    link_jaccard_sql_q = neighbor_jaccard_sql_duckdb(
        n_hosts=1000, max_deg=64, min_common=2)
    from zen3geo_spark.operators.linkgraph import (
        synth_host_edges_dense_sql_duckdb,
    )
    from zen3geo_spark.operators.linkgraph import pagerank_sql_duckdb
    lang_authority_sql_q = f"""
with pages as ({pages_cte_sql(N_PAGES)}),
pr as ({pagerank_sql_duckdb(n_hosts=1000, iters=5)}),
p as (select lang,
             cast(regexp_extract(url, '/page/([0-9]+)$', 1) as bigint)
               % 1000 as host_num
      from pages)
select lang, count(*) as n_pages, sum(pr.rank_fp) as authority_mass
from p join pr on p.host_num = pr.node
group by lang
"""
    degree_mixing_sql_q = f"""
with edges as ({synth_host_edges_dense_sql_duckdb(1000)}),
und as (select distinct least(src, dst) as a, greatest(src, dst) as b
        from edges where src <> dst),
deg as (select node, count(*) as deg from (
          select a as node from und union all select b from und)
        group by node),
j as (select d1.deg as da, d2.deg as db from und
      join deg d1 on d1.node = und.a join deg d2 on d2.node = und.b)
select least(da, db) as deg_lo, greatest(da, db) as deg_hi,
       count(*) as n_edges
from j group by 1, 2
"""
    cheapest_paths_sql_q = cheapest_paths_sql_duckdb(
        n_hosts=1000, seed_mod=100, max_hops=4)
    triangles_sql_q = triangle_counts_sql_duckdb(n_hosts=1000)

    scd2_history_sql_q = f"""
with pages as ({pages_cte_sql(N_PAGES)}),
obs as (
  select url,
         cast(regexp_extract(url, '/page/([0-9]+)$', 1) as bigint) as pid,
         e.epoch
  from pages cross join (select epoch from range(4) t(epoch)) e),
v as (select url, epoch,
             (pid % 7) + ((epoch * (pid % 4)) // 3) as quality_band
      from obs),
c as (select *,
             lag(quality_band) over (partition by url order by epoch)
               as _prev,
             max(epoch) over (partition by url) as _last
      from v),
f as (select * from c where _prev is null or quality_band <> _prev)
select url, quality_band, epoch as valid_from,
       coalesce(lead(epoch) over (partition by url order by epoch) - 1,
                _last) as valid_to
from f
"""
    bfs_hops_sql_q = bfs_hops_sql_duckdb(
        n_hosts=1000, seed_mod=100, max_hops=4)
    cocitation_sql_q = cocitation_sql_duckdb(
        n_hosts=1000, max_out_deg=64, min_cocite=2)

    stay_points_sql_q = f"""
    with pages as ({pages_cte_sql(N_PAGES)}),
    tagged as (
      select regexp_extract(url, '^https?://([^/]+)/', 1) as host,
             cast(regexp_extract(url, '/page/([0-9]+)$', 1) as bigint) as pid,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 1) as lat_str,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 2) as lon_str
      from pages
    ),
    pt as (
      select host, pid,
             {micro_from_str_sql('lat_str', 'duckdb')} as lat_us,
             {micro_from_str_sql('lon_str', 'duckdb')} as lon_us
      from tagged where lat_str <> ''
    ),
    flagged as (
      select host, pid, lat_us, lon_us,
             case when lag(lat_us) over (partition by host order by pid)
                    is null
                  or (lat_us - lag(lat_us) over (partition by host
                                                 order by pid))
                     * (lat_us - lag(lat_us) over (partition by host
                                                   order by pid))
                   + (lon_us - lag(lon_us) over (partition by host
                                                 order by pid))
                     * (lon_us - lag(lon_us) over (partition by host
                                                   order by pid))
                     > {STAY_R2}
                  then 1 else 0 end as brk
      from pt
    ),
    grouped as (
      select host, pid, lat_us, lon_us,
             sum(brk) over (partition by host order by pid
                            rows between unbounded preceding
                            and current row) as grp
      from flagged
    ),
    runs as (
      select host, grp, count(*) as n_pages,
             min(pid) as first_pid, max(pid) as last_pid,
             cast(sum(lat_us) as bigint) as slat,
             cast(sum(lon_us) as bigint) as slon
      from grouped group by 1, 2
    )
    select host, first_pid, last_pid, n_pages,
           (slat + n_pages * 90000000) // n_pages - 90000000 as ctr_lat_us,
           (slon + n_pages * 180000000) // n_pages - 180000000 as ctr_lon_us
    from runs where n_pages >= 3
    """

    _sp_cell4 = cell_id_sql("lat_us", "lon_us", 4, "duckdb")
    snapshot_prune_sql_q = f"""
    {_points_cte()}
    select point_id % 10 as snap, {_sp_cell4} as cell,
           count(*) as n_pages
    from pts where point_id % 10 in (3, 7)
    group by 1, 2
    """

    # interval-join twin: the DIRECT theta join (exact containment) —
    # a hash match proves the bucketized equi-join decomposition exact
    interval_join_sql_q = f"""
    with iv as (
      select t.id as interval_id,
             TIMESTAMP '2024-01-01 00:00:00' + to_seconds(t.id*8640) as start_ts,
             TIMESTAMP '2024-01-01 00:00:00'
               + to_seconds(t.id*8640 + 2400 + (t.id % 5)*1200) as end_ts
      from range({INTERVALS_N}) t(id)
    )
    select iv.interval_id, count(*) as n_events,
           round(sum(e.value), 4) as sum_value
    from events e join iv
      on e.ts >= iv.start_ts and e.ts < iv.end_ts
    group by iv.interval_id
    """

    _cr_even = (f"select distinct {_cv_cell5} as cell from pts "
                "where point_id % 2 = 0")
    _cr_chain_arms = " union all ".join(
        f"select point_id, {lvl} as cell_res, "
        f"{cell_parent_sql(_cv_cell5, 5, lvl, 'duckdb')} as member from pts"
        for lvl in range(2, 6))
    # the compact helper's own WITH nests inside the _cover CTE
    # (non-recursive nested WITH referencing the outer pts — standard)
    cover_rollup_sql_q = f"""
    {_points_cte()}
    , _cover as ({compact_cells_sql(_cr_even, 5, 2)}),
    _chain as ({_cr_chain_arms})
    select c.member as cell, c.cell_res, count(*) as n_pages
    from _chain c join _cover v
      on c.member = v.cell and c.cell_res = v.cell_res
    group by c.member, c.cell_res
    """

    # skew-profile twin: identical per-res aggregates + integer ratio
    _gsp_levels = []
    for _res in (2, 4, 6):
        _gsp_cell = cell_id_sql("lat_us", "lon_us", _res, "duckdb")
        _gsp_levels.append(f"""
        select {_res} as res, count(*) as n_cells, max(n) as max_cell,
               sum(n) as n_points,
               (max(n) * count(*) * 100) // sum(n) as skew_x100
        from (select {_gsp_cell} as cell, count(*) as n
              from pts group by 1)
        """)
    geo_skew_profile_sql = f"""
    {pts_cte}
    {' union all '.join(_gsp_levels)}
    """

    # knn-classify twin: brute-force kNN over the >=30 target set, same
    # (dist2, tid) neighbor rank and (count desc, lang asc) vote
    knn_classify_sql = f"""
    {pts_cte}
    , pages_l as (
      select id as target_id, lang
      from (select id, lang from pages) t
    ),
    pairs as (
      select q.point_id as query_id, t.point_id as target_id,
             (q.lat_us - t.lat_us) * (q.lat_us - t.lat_us)
             + (q.lon_us - t.lon_us) * (q.lon_us - t.lon_us) as dist2
      from pts q join pts t on t.point_id >= 30
      where q.point_id < 30
    ),
    ranked as (
      select query_id, target_id,
             row_number() over (partition by query_id
                                order by dist2 asc, target_id asc) as rk
      from pairs
    ),
    votes as (
      select r.query_id, p.lang, count(*) as n
      from ranked r join pages_l p using (target_id)
      where r.rk <= 5
      group by r.query_id, p.lang
    )
    select query_id, lang as pred_lang, n from (
      select query_id, lang, n,
             row_number() over (partition by query_id
                                order by n desc, lang asc) as vrk
      from votes
    ) where vrk = 1
    """

    # streaming-cell-counts twin: the plain batch cell rollup — complete
    # mode on a bounded input must equal it exactly
    _scc_cell = cell_id_sql("lat_us", "lon_us", 6, "duckdb")
    stream_cell_counts_sql = f"""
    {pts_cte}
    select {_scc_cell} as cell, count(*) as n_pages from pts group by 1
    """

    # chip/label-pairs twin: the polygon burn as a derived table, then
    # the same floor-division chip rollup (chips_x = 14 // 7 = 2)
    chip_label_pairs_sql = f"""
    with burned as ({rasterize_polygon_sql})
    select cast(0 as bigint) as scene_id,
           cast((row // 5) * 2 + (col // 7) as bigint) as chip_id,
           count(*) as n_label_px
    from burned
    group by 1, 2
    """

    # wrapped-bbox twin: the SAME two split intervals, plain ORed ranges
    _wb_cell = cell_id_sql("lat_us", "lon_us", 4, "duckdb")
    wrap_bbox_scan_sql = f"""
    {pts_cte}
    select {_wb_cell} as cell, count(*) as n_pages
    from pts
    where ((lon_us >= 170000000 and lon_us <= 180000000)
           or (lon_us >= -180000000 and lon_us <= -170000000))
      and lat_us between -60000000 and 60000000
    group by 1
    """

    # cell-top-docs twin: plain one-window top-k (the salted two-phase
    # form is exactly equal), same res-4 cell + length order
    from zen3geo_spark.operators.curation import source_cap_sql_duckdb
    _ctd_cell = cell_id_sql("lat_us", "lon_us", 4, "duckdb")
    _ctd_topk = source_cap_sql_duckdb(
        "scored", k=3, id_col="point_id", source_col="cell",
        order_col="score")
    cell_top_docs_sql = f"""
    {pts_cte}
    , scored as (
      select p.point_id, {_ctd_cell} as cell, length(pg.text) as score
      from pts p join pages pg on pg.id = p.point_id
    )
    {_ctd_topk}
    """

    # spatial-block-split twin: same cell id, same decimal-string hash
    _sbs_cell = cell_id_sql("lat_us", "lon_us", 6, "duckdb")
    _sbs_bucket = hash40_sql_duckdb("cast(cell as varchar)")
    spatial_block_split_sql = f"""
    {pts_cte}
    , cells as (select {_sbs_cell} as cell from pts),
    s as (select cell,
                 case when ({_sbs_bucket}) % 100 < 80 then 'train'
                      else 'val' end as split
          from cells)
    select split, count(*) as n_pages, count(distinct cell) as n_cells
    from s group by split
    """

    # pyramid-delta twin: same fringe-only signed aggregation
    _tpd_n2 = N_PAGES * 6 // 5
    _tpd_lo = N_PAGES // 5
    _tpd_lat = micro_from_str_sql("lat_str", "duckdb")
    _tpd_lon = micro_from_str_sql("lon_str", "duckdb")
    _tpd_cell6 = cell_id_sql("lat_us", "lon_us", 6, "duckdb")
    _tpd_levels = ["select 6 as zoom, cell, delta from base"] + [
        f"select {z} as zoom, {cell_parent_sql('cell', 6, z, 'duckdb')} as cell, "
        f"sum(delta) as delta from base group by 1, 2 having sum(delta) <> 0"
        for z in (4, 2)
    ]
    tile_pyramid_delta_sql = f"""
    with pages as ({pages_cte_sql(_tpd_n2, with_id=True)}),
    tagged as (
      select id as point_id,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 1) as lat_str,
             regexp_extract(text, 'lat=(-?\\d+\\.\\d{{6}}) lon=(-?\\d+\\.\\d{{6}})', 2) as lon_str
      from pages
      where id < {_tpd_lo} or id >= {N_PAGES}
    ),
    pts as (
      select point_id, {_tpd_lat} as lat_us, {_tpd_lon} as lon_us,
             case when point_id < {_tpd_lo} then -1 else 1 end as sgn
      from tagged where lat_str <> ''
    ),
    base as (
      select {_tpd_cell6} as cell, sum(sgn) as delta from pts
      group by 1 having sum(sgn) <> 0
    )
    {' union all '.join(_tpd_levels)}
    """

    # tile-pyramid twin: base bin at zoom 6, six parent rollups FROM the
    # base aggregate (union-all of per-zoom selects, all bigint math)
    _tp_cell6 = cell_id_sql("lat_us", "lon_us", 6, "duckdb")
    _tp_levels = [
        "select 6 as zoom, cell, n_pages from base"
    ] + [
        f"select {z} as zoom, "
        f"{cell_parent_sql('cell', 6, z, 'duckdb')} as cell, "
        f"sum(n_pages) as n_pages from base group by 1, 2"
        for z in range(6)
    ]
    tile_pyramid_sql = f"""
    {pts_cte}
    , base as (
      select {_tp_cell6} as cell, count(*) as n_pages from pts group by 1
    )
    {' union all '.join(_tp_levels)}
    """

    # adaptive-cells twin: identical integer hot test
    # (n4 * n_occupied > total), identical res-8 subdivision
    _ac_c8 = cell_id_sql("lat_us", "lon_us", 8, "duckdb")
    _ac_c4 = cell_id_sql("lat_us", "lon_us", 4, "duckdb")
    adaptive_cells_sql = f"""
    {pts_cte}
    , pc as (select {_ac_c8} as c8, {_ac_c4} as c4 from pts),
    coarse as (select c4, count(*) as n4 from pc group by 1),
    stats as (select sum(n4) as tot, count(*) as nocc from coarse),
    hot as (select c4 from coarse, stats where n4 * nocc > tot)
    select case when h.c4 is not null then p.c8 else p.c4 end as cell,
           case when h.c4 is not null then 8 else 4 end as res,
           count(*) as n_pages
    from pc p left join hot h on p.c4 = h.c4
    group by 1, 2
    """

    # adaptive-quality twin: same positional p25 pick, same rollup
    _aq_score = quality_score_sql("text", "duckdb")
    adaptive_quality_sql = f"""
    with scored as (
      select doc_id, lang, {_aq_score} as score from documents
    ),
    ranked as (
      select lang, score,
             row_number() over (partition by lang
                 order by score asc, doc_id asc) as rn,
             count(*) over (partition by lang) as n
      from scored
    ),
    thr as (
      select lang, score as thr from ranked
      where rn = ((n - 1) // 4) + 1
    )
    select s.lang, count(*) as n_docs,
           sum(case when s.score >= t.thr then 1 else 0 end) as n_kept,
           round(min(t.thr), 6) as p25_thr
    from scored s join thr t on s.lang = t.lang
    group by s.lang
    """

    # keep-best twin: the clusters statement as a derived table + the
    # shared quality formula + the same (score DESC, node ASC) window
    dedup_keep_best_sql = f"""
    select component, node as doc_id, round(score, 6) as score from (
      select c.node, c.component, q.score,
             row_number() over (partition by c.component
                 order by q.score desc, c.node asc) as rk
      from ({dedup_clusters_sql}) c
      join (select doc_id, {quality_score_sql('text', 'duckdb')} as score
            from documents) q on q.doc_id = c.node
    ) where rk = 1
    """

    embed_clusters_prelude = """
    _d as (select vec_id, embedding::DOUBLE[] as v from embeddings),
    _eprs as (
      select a.vec_id as a_id, b.vec_id as b_id
      from _d a join _d b on a.vec_id < b.vec_id
      where list_cosine_similarity(a.v, b.v) >= 0.4
    )"""
    embed_dedup_clusters_sql = components_sql_duckdb(
        "select a_id as u, b_id as v from _eprs "
        "union all select b_id as u, a_id as v from _eprs",
        "select vec_id as node from embeddings",
        prelude_ctes=embed_clusters_prelude)

    # unigram-simhash variant of the simhash oracle (same CTE template,
    # grams swapped 2→1) — the audit compares unigram signals
    _simhash_sql_u1 = simhash_sql.replace(
        shingles_sql_duckdb("text", 2), shingles_sql_duckdb("text", 1))
    dedup_pr_audit_sql_q = f"""
    with pred as (
      select a_id, b_id from ({_simhash_sql_u1})
      where a_id < 200 and b_id < 200
    ),
    truth as (
      select a_id, b_id from ({word_jaccard_exact_sql})
      where jaccard >= 0.9
    ),
    np as (select count(*) as n_pred from pred),
    nt as (select count(*) as n_truth from truth),
    nb as (select count(*) as n_both
           from pred join truth using (a_id, b_id))
    select n_pred, n_truth, n_both,
           case when n_pred = 0 then null
                else 1000 * n_both // n_pred end as precision_milli,
           case when n_truth = 0 then null
                else 1000 * n_both // n_truth end as recall_milli
    from np, nt, nb
    """

    return {
        "pages_extract": (
            f"with pages as ({pages_cte_sql(N_PAGES)}) "
            "select url, "
            "regexp_extract(text, 'lat=(-?\\d+\\.\\d{6}) lon=(-?\\d+\\.\\d{6})', 1) as lat_str, "
            "regexp_extract(text, 'lat=(-?\\d+\\.\\d{6}) lon=(-?\\d+\\.\\d{6})', 2) as lon_str, "
            "lang from pages "
            "where regexp_extract(text, 'lat=(-?\\d+\\.\\d{6}) lon=(-?\\d+\\.\\d{6})', 1) <> ''"
        ),
        "pages_cell_counts": (
            f"{_points_cte()} select {cell12} as cell, count(*) as n_pages "
            "from pts group by 1"
        ),
        "pip_join": pip_core,
        "pip_join_salted": pip_core,
        "zonal_stats": zonal_stats_sql,
        "knn_brute": knn_core,
        "knn_cells": knn_core,
        "rasterize_world_points": f"{_points_cte()} {world_bin}",
        "rasterize_mean": rasterize_mean_sql,
        "rasterize_polygon": rasterize_polygon_sql,
        "rasterize_line": rasterize_line_sql,
        "zorder_cells": zorder_cells_sql_q,
        "zorder_range_scan": zorder_range_scan_sql_q,
        "hilbert_cells": hilbert_cells_sql_q,
        "rasterize_line_mean": rasterize_line_mean_sql,
        "rasterize_poly_max": rasterize_poly_max_sql,
        "bbox_image_coords": bbox_image_coords_sql,
        "binary_assets": binary_assets_sql,
        "stac_asset_engines": stac_asset_engines_sql,
        "gopher_repetition": gopher_repetition_sql,
        "bm25_scores": bm25_scores_sql,
        "inverted_index": inverted_index_sql,
        "contamination": contamination_sql,
        "dup_spans": dup_spans_sql,
        "stratified_sample": stratified_sample_sql,
        "chunk_dedup": chunk_dedup_sql,
        "pack_sequences": pack_sequences_sql,
        "source_cap": source_cap_sql,
        "robots_filter": robots_filter_sql,
        "epoch_mix": epoch_mix_sql,
        "bitext_mine": bitext_mine_sql,
        "event_anomaly": event_anomaly_sql,
        "geom_measures": geom_measures_sql,
        "radius_join": radius_join_sql,
        "geohash_rollup": geohash_rollup_sql,
        "host_geo_spread": host_geo_spread_sql,
        "semdedup": semdedup_sql,
        "geo_velocity": geo_velocity_sql,
        "tf_cosine": tf_cosine_sql,
        "spread_points": spread_points_sql,
        "dedup_keep_best": dedup_keep_best_sql,
        "adaptive_quality": adaptive_quality_sql,
        "leakage_safe_split": leakage_safe_split_sql,
        "geo_lang_mix": geo_lang_mix_sql,
        "tile_pyramid": tile_pyramid_sql,
        "adaptive_cells": adaptive_cells_sql,
        "pip_multi_ring": pip_multi_ring_sql,
        "tile_pyramid_delta": tile_pyramid_delta_sql,
        "spatial_block_split": spatial_block_split_sql,
        "cell_top_docs": cell_top_docs_sql,
        "wrap_bbox_scan": wrap_bbox_scan_sql,
        "chip_label_pairs": chip_label_pairs_sql,
        "stream_cell_counts": stream_cell_counts_sql,
        "knn_classify": knn_classify_sql,
        "geo_skew_profile": geo_skew_profile_sql,
        "mosaic_incremental": mosaic_sql,
        "quadkeys": quadkeys_sql,
        "compact_cells": compact_cells_sql_q,
        "compact_roundtrip": compact_roundtrip_sql_q,
        "grid_dbscan": grid_dbscan_sql_q,
        "warc_roundtrip": warc_roundtrip_sql_q,
        "stream_dedup": stream_dedup_sql_q,
        "polygon_cover": polygon_cover_sql_q,
        "crawl_transitions": crawl_transitions_sql_q,
        "trajectory_cover": trajectory_cover_sql_q,
        "disk_cover": disk_cover_sql_q,
        "coverage_delta": coverage_delta_sql_q,
        "cover_rollup": cover_rollup_sql_q,
        "str_pack": str_pack_sql_q,
        "interval_join": interval_join_sql_q,
        "bpe_train": bpe_train_sql_q,
        "bpe_encode": bpe_encode_sql_q,
        "moran_i": moran_i_sql_q,
        "local_moran": local_moran_sql_q,
        "snapshot_prune": snapshot_prune_sql_q,
        "cell_diversity": cell_diversity_sql_q,
        "cell_anomaly": cell_anomaly_sql_q,
        "flow_basin": flow_basin_sql_q,
        "hits": hits_sql_q,
        "link_jaccard": link_jaccard_sql_q,
        "dedup_pr_audit": dedup_pr_audit_sql_q,
        "layout_rle_audit": layout_rle_audit_sql_q,
        "late_data_audit": late_data_audit_sql_q,
        "equi_depth_hist": equi_depth_hist_sql_q,
        "join_card_est": join_card_est_sql_q,
        "str_query": str_query_sql_q,
        "windowed_hll": windowed_hll_sql_q,
        "snapshot_expiry": snapshot_expiry_sql_q,
        "embed_calibration": embed_calibration_sql_q,
        "table_profile": table_profile_sql_q,
        "rollup_report": rollup_report_sql_q,
        "pivot_langs": pivot_langs_sql_q,
        "host_percentiles": host_percentiles_sql_q,
        "shipping_priority": _Q3_SQL,
        "local_supplier_volume": _Q5_SQL,
        "hex_bins": hex_bins_sql_q,
        "cell_topics": cell_topics_sql_q,
        "skyline_hosts": skyline_hosts_sql_q,
        "url_editdist": url_editdist_sql_q,
        "rect_union_area": rect_union_area_sql_q,
        "ohlc_bars": ohlc_bars_sql_q,
        "ip_geo": ip_geo_sql_q,
        "table_checksum": table_checksum_sql_q,
        "dom_stats": dom_stats_sql_q,
        "budget_alloc": budget_alloc_sql_q,
        "rendezvous_shards": rendezvous_shards_sql_q,
        "pq_codes": pq_codes_sql_q,
        "pq_search": pq_search_sql_q,
        "redirect_resolve": redirect_resolve_sql_q,
        "iou_match": iou_match_sql_q,
        "graph_walks": graph_walks_sql_q,
        "cdx_index": cdx_index_sql_q,
        "fetch_schedule": fetch_schedule_sql_q,
        "image_chips": image_chips_sql_q,
        "sliding_window": sliding_window_sql_q,
        "geo_kmeans": geo_kmeans_sql_q,
        "funnel": funnel_sql_q,
        "retention_cohorts": retention_cohorts_sql_q,
        "suffix_ranks": suffix_ranks_sql_q,
        "poly_intersect": poly_intersect_sql_q,
        "bigram_logppl": bigram_logppl_sql_q,
        "change_detect": change_detect_sql_q,
        "kmv_intersect": kmv_intersect_sql_q,
        "time_travel": time_travel_sql_q,
        "stream_join": stream_join_sql_q,
        "seg_crossings": seg_crossings_sql_q,
        "readability": readability_sql_q,
        "c4_clean": c4_clean_sql_q,
        "lang_mismatch": lang_mismatch_sql_q,
        "equalize": equalize_sql_q,
        "compaction_plan": compaction_plan_sql_q,
        "track_resample": track_resample_sql_q,
        "bearing_mix": bearing_mix_sql_q,
        "pmi_pairs": pmi_pairs_sql_q,
        "textrank": textrank_sql_q,
        "cusum_drift": cusum_drift_sql_q,
        "merge_upsert": merge_upsert_sql_q,
        "distance_transform": distance_transform_sql_q,
        "polygonize": polygonize_sql_q,
        "flow_accum": flow_accum_sql_q,
        "flow_dir": flow_dir_sql_q,
        "lang_authority": lang_authority_sql_q,
        "degree_mixing": degree_mixing_sql_q,
        "kcore": kcore_sql_q,
        "cheapest_paths": cheapest_paths_sql_q,
        "scd2_history": scd2_history_sql_q,
        "triangles": triangles_sql_q,
        "bfs_hops": bfs_hops_sql_q,
        "cocitation": cocitation_sql_q,
        "contour": contour_sql_q,
        "stay_points": stay_points_sql_q,
        "map_match": map_match_sql_q,
        "slope_aspect": slope_aspect_sql_q,
        "link_geo_propagate": link_geo_propagate_sql_q,
        "simplify_track": simplify_track_sql_q,
        "rect_overlay": rect_overlay_sql_q,
        "focal_stats": focal_stats_sql_q,
        "idw_grid": idw_grid_sql_q,
        "geocode_gazetteer": geocode_gazetteer_sql_q,
        "cell_trend": cell_trend_sql_q,
        "recrawl_cadence": recrawl_cadence_sql,
        "geo_backfill": geo_backfill_sql,
        "pii_redact": pii_redact_sql,
        "url_blocklist": url_blocklist_sql,
        "count_min": count_min_sql,
        "asof_join": asof_join_sql,
        "pagerank": pagerank_sql,
        "subword_tokens": subword_tokens_sql,
        "quality_classifier": quality_classifier_sql,
        "ann_int8": ann_int8_sql,
        "hashed_tfidf": hashed_tfidf_sql,
        "url_host_stats": url_host_stats_sql,
        "html_extract": html_extract_sql,
        "url_canonical": url_canonical_sql,
        "crawl_delta": crawl_delta_sql,
        "bloom_frontier": bloom_frontier_sql,
        "hll_distinct": hll_distinct_sql,
        "quantile_sketch": quantile_sketch_sql,
        "dsir_weights": (
            "select doc, n_toks, round(log_importance, 6) as log_importance "
            "from (" + dsir_sql_duckdb(
                "documents",
                "source in ('src0', 'src1', 'src2', 'src3')") + ") t"
        ),
        "embed_dedup_clusters": embed_dedup_clusters_sql,
        "word_jaccard_exact": word_jaccard_exact_sql,
        "chip_grid": chip_grid_sql,
        "chip_grid_nd": chip_grid_nd_sql,
        "chip_assign": chip_assign_sql,
        "rect_clip": rect_clip_sql,
        "rect_clip_reproject": rect_clip_reproject_sql,
        "mosaic": mosaic_sql,
        "stac_search": stac_cte,
        "stac_item_read": """
            select concat('item-', cast(id as varchar)) as item_id,
                   case cast(id % 3 as int) when 0 then 'sentinel-2-l2a'
                        when 1 then 'sentinel-1-grd' else 'landsat-c2-l2' end as collection,
                   TIMESTAMP '2022-01-01 00:00:00' + to_days(cast(id as int)) as dt,
                   cast(-180 + (id * 37 % 340) as double) as minx,
                   cast(-85 + (id * 53 % 160) as double) as miny,
                   cast(-180 + (id * 37 % 340) + 10 as double) as maxx,
                   cast(-85 + (id * 53 % 160) + 8 as double) as maxy,
                   concat('sat-', cast(id % 2 as varchar)) as platform,
                   cast(2 as int) as n_assets
            from range(50) t(id)
        """,
        "collate": """
            with a as (
              select doc_id, n_chars, row_number() over (order by doc_id) as rn
              from documents where doc_id < 100
            ),
            b as (
              select vec_id, label, row_number() over (order by vec_id) as rn
              from embeddings where vec_id < 100
            )
            select a.doc_id as sample_id, b.vec_id, b.label as target,
                   a.n_chars as feature_len
            from a join b using (rn)
        """,
        "forked_stats": (
            "select source, count(*) as n_docs, "
            "round(avg(n_chars), 6) as avg_chars "
            "from documents group by source"
        ),
        "dedup_exact": (
            "select md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) as fp, "
            "min(doc_id) as keep_id, count(*) as n_dups from documents group by 1"
        ),
        "token_quality": tq,
        "kmv_distinct": kmv_sql,
        "word_jaccard": word_jaccard_sql,
        "minhash_lsh": minhash_sql,
        "incremental_neardup": incremental_neardup_sql,
        "simhash": simhash_sql,
        "ann_cosine": ann_cosine_sql,
        "ann_lsh": ann_lsh_sql,
        "ann_ivf": ann_ivf_sql,
        "lang_id": (
            f"select doc_id, {lang_id_sql('text', 'duckdb')} as lang_pred "
            "from documents"
        ),
        "unigram_logppl": (
            "select doc, round(logppl, 6) as logppl from ("
            + unigram_logppl_sql_duckdb("documents") + ") t"
        ),
        "embed_neardup": embed_neardup_sql,
        "canvas": canvas_sql,
        "stack_mosaic": stack_mosaic_sql,
        "stack_bilinear": stack_bilinear_sql,
        # windowed zarr-like readout: rows (10..25) x cols (20..50) of the
        # 40x64 deterministic lattice; float32 round-trip exact (values
        # are small ints), world coords dyadic-exact
        "zarr_like_scan": """
            select cast(y.i as int) as y_idx, cast(x.j as int) as x_idx,
                   cast((y.i * 31 + x.j * 17) % 251 as double) as value,
                   100.0 + (x.j + 0.5) * 10.0 as x,
                   500.0 - (y.i + 0.5) * 10.0 as y
            from range(10, 26) y(i), range(20, 51) x(j)
        """,
        # 8x8 lattice, 4x4 source block at the top-left; uncovered cells
        # fill with -1; values round-trip float32 (exact for these small
        # ints); centroid labels are dyadic-exact doubles
        "stack_cast_fill": """
            select cast(0 as int) as time, 'vv' as band,
                   cast(y.y_idx as int) as y_idx, cast(x.x_idx as int) as x_idx,
                   cast(cast(case when y.y_idx < 4 and x.x_idx < 4
                                  then (y.y_idx * 4 + x.x_idx) * 3.0
                                  else -1.0 end as real) as double) as value,
                   0.0 + (x.x_idx + 0.5) * 2.0 as x_coord,
                   16.0 - (y.y_idx + 0.5) * 2.0 as y_coord
            from range(8) y(y_idx), range(8) x(x_idx)
        """,
        "frame_sample": frame_sample_sql,
        "image_stats": image_stats_sql,
        "audio_stats": audio_stats_sql,
        "batcher": batcher_sql,
        "zipper": zipper_sql,
        "near_dup_verified": near_dup_verified_sql,
        "dedup_clusters": dedup_clusters_sql,
        "winnow": winnow_fingerprints_sql_duckdb("documents", "doc_id", "text", 8, 4),
        "overviews": """
            with base as (
              select cast(0 as int) as band,
                     cast(id // 32 as int) as y_idx,
                     cast(id % 32 as int) as x_idx,
                     cast((id * 7) % 97 as double) as value
              from range(1024) t(id)
            ),
            l1 as (
              select band, cast(y_idx // 2 as int) as y_idx,
                     cast(x_idx // 2 as int) as x_idx, avg(value) as value
              from base group by 1, 2, 3
            ),
            l2 as (
              select band, cast(y_idx // 2 as int) as y_idx,
                     cast(x_idx // 2 as int) as x_idx, avg(value) as value
              from l1 group by 1, 2, 3
            )
            select cast(0 as int) as level, * from base
            union all select cast(1 as int), * from l1
            union all select cast(2 as int), * from l2
        """,
        "corpus_clean": (
            "with keep as ("
            "  select md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) as fp, "
            "         min(doc_id) as keep_id, count(*) as n_dups "
            "  from documents group by 1"
            ") "
            "select d.doc_id, "
            f"round({quality_score_sql('d.text', 'duckdb')}, 6) as quality, "
            "k.n_dups "
            "from documents d join keep k on d.doc_id = k.keep_id "
            f"where {lang_id_sql('d.text', 'duckdb')} = 'en' "
            f"and {quality_score_sql('d.text', 'duckdb')} >= 0.5"
        ),
        "raster_math": (
            "select event_id, "
            "round(10.0 * log(10, nullif(value, 0.0)), 6) as db, "
            "round((((value * 3.7 + 180.0) % 360.0 + 360.0) % 360.0) - 180.0, 6) as lon_shifted "
            "from events"
        ),
        "month_split": (
            # duckdb's month-trunc yields DATE; cast back to timestamp to
            # match Spark's date_trunc
            "select cast(date_trunc('month', ts) as timestamp) as month, "
            "event_type, count(*) as n, round(sum(value), 4) as sum_value "
            "from events group by 1, 2"
        ),
        "mercator_bins": (
            f"{pts_cte} "
            f"select cast(floor({mercator_x_sql('(lon_us / 1000000.0)', 'duckdb')} / 100000.0) as bigint) as bx, "
            f"cast(floor({mercator_y_sql('(lat_us / 1000000.0)', 'duckdb')} / 100000.0) as bigint) as by, "
            "count(*) as n from pts where abs(lat_us) <= 85051129 group by 1, 2"
        ),
        "cell_rollup": (
            f"{pts_cte} select {cell_id_sql('lat_us', 'lon_us', 6, 'duckdb')} as cell6, "
            "count(*) as n_pages from pts group by 1"
        ),
        "extract_all_tags": (
            f"with pages as ({pages_cte_sql(N_PAGES)}) "
            "select url, cast(len(regexp_extract_all(text, "
            "'lat=(-?\\d+\\.\\d{6}) lon=(-?\\d+\\.\\d{6})')) as int) as n_tags "
            "from pages"
        ),
        "tumbling_window": (
            "select TIMESTAMP '1970-01-01 00:00:00' "
            "+ to_seconds(cast(floor(epoch(ts) / 21600) * 21600 as bigint)) as window_start, "
            "event_type, count(*) as n, round(sum(value), 4) as sum_value, "
            "round(avg(cast(json_extract_string(props, '$.k') as int)), 6) as avg_k "
            "from events group by 1, 2"
        ),
        # the streaming complete-mode run must equal the batch aggregate
        # on a bounded input — same oracle as tumbling_window
        "stream_tumbling": (
            "select TIMESTAMP '1970-01-01 00:00:00' "
            "+ to_seconds(cast(floor(epoch(ts) / 21600) * 21600 as bigint)) as window_start, "
            "event_type, count(*) as n, round(sum(value), 4) as sum_value, "
            "round(avg(cast(json_extract_string(props, '$.k') as int)), 6) as avg_k "
            "from events group by 1, 2"
        ),
        "tile_scan": """
            with tiles as (
              select cast(id % 16 as int) as x_idx,
                     cast((id // 16) % 16 as int) as y_idx,
                     cast((id // 256) % 2 as int) as band,
                     cast(id // 512 as int) as level,
                     cast(id % 97 as double) as value
              from range(1536) t(id)
            )
            select band, count(*) as n_px, round(sum(value), 4) as sum_val,
                   max(x_idx) as max_x
            from tiles where level = 1 and band in (0)
            group by band
        """,
        "vector_scan": """
            with geoms as (
              select id as geom_id,
                     cast(-170 + (id * 7 % 340) as double) as minx,
                     cast(-80 + (id * 11 % 160) as double) as miny,
                     cast(-170 + (id * 7 % 340) + 5 as double) as maxx,
                     cast(-80 + (id * 11 % 160) + 4 as double) as maxy
              from range(500) t(id)
            )
            select geom_id, minx, miny, maxx, maxy
            from geoms
            where minx < 40.0 and maxx > -30.0 and miny < 35.0 and maxy > -20.0
        """,
        "session_window": """
            with o as (
              select user_id, ts, value,
                     lag(ts) over (partition by user_id order by ts) as prev
              from events
            ),
            m as (
              select user_id, ts, value,
                     -- Spark merges an event landing exactly at the previous
                     -- session's end (ts == prev + gap): strict > here
                     case when prev is null
                               or ts > prev + interval '30 minutes'
                          then 1 else 0 end as new_s
              from o
            ),
            s as (
              select user_id, ts, value,
                     sum(new_s) over (partition by user_id order by ts
                                      rows unbounded preceding) as sid
              from m
            )
            select user_id, min(ts) as session_start, max(ts) as session_last,
                   count(*) as n_events, round(sum(value), 4) as sum_value
            from s group by user_id, sid
        """,
        "events_hourly": (
            "select date_trunc('hour', ts) as hour, event_type, "
            "count(*) as n, round(sum(value), 4) as sum_value "
            "from events group by 1, 2"
        ),
        "pricing_summary": (
            "select l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 2) as sum_qty, "
            "round(sum(l_extendedprice), 2) as sum_base_price, "
            "count(*) as count_order "
            "from lineitem where l_shipdate <= TIMESTAMP '1998-09-02' "
            "group by l_returnflag, l_linestatus"
        ),
        "segment_orders": (
            "select c_mktsegment, count(*) as n_orders, "
            "round(sum(o_totalprice), 2) as revenue "
            "from orders join customer on o_custkey = c_custkey "
            "group by c_mktsegment"
        ),
        "ann_ivf_trained": ann_ivf_trained_sql,
    }

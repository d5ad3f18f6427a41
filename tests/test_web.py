"""Web-pipeline functions: HTML→text byte identity, URL canonicalization,
crawl-snapshot deltas."""

from pyspark.sql import functions as F

from zen3geo_spark.functions.web import canonical_url, html_to_text
from zen3geo_spark.sources.pages import synth_pages


def test_html_extract_byte_identical_for_every_page(spark):
    # the input contract's per-row invariant: tag-stripped html == text,
    # byte for byte, per url (BASELINE.json input_hint)
    pages = synth_pages(spark, 2000)
    bad = pages.filter(html_to_text(F.col("html")) != F.col("text")).count()
    assert bad == 0


def test_html_extract_is_not_vacuous(spark):
    # the wrapper really is present in the binary column — raw decode
    # must NOT equal text, only the stripped form may
    pages = synth_pages(spark, 100)
    raw_eq = pages.filter(
        F.decode(F.col("html"), "UTF-8") == F.col("text")).count()
    assert raw_eq == 0


CANON_CASES = [
    # (input, canonical)
    ("https://Example.COM:443/a/b?utm_source=x&b=2&a=1#frag",
     "https://example.com/a/b?a=1&b=2"),
    ("http://h.test:80/p", "http://h.test/p"),
    ("https://h.test:8443/p", "https://h.test:8443/p"),  # non-default port kept
    ("http://h.test:443/p", "http://h.test:443/p"),      # 443 not http's default
    ("https://h.test/p?utm_campaign=c&utm_medium=m", "https://h.test/p"),
    ("https://h.test/p?z=1&a=2", "https://h.test/p?a=2&z=1"),
    ("https://h.test/p#only-frag", "https://h.test/p"),
    ("https://h.test/CaseInPath?Q=V", "https://h.test/CaseInPath?Q=V"),
    # RFC 3986 edges: '?' inside the fragment is NOT a query marker,
    # and a query that loses all params must not leave a trailing '?'
    ("https://h.test/p#sec?tab=2", "https://h.test/p"),
    ("https://h.test/p?utm_x=1#frag?y=2", "https://h.test/p"),
    ("https://h.test/p", "https://h.test/p"),
]


def test_canonical_url_sql_duckdb_twin_parity(spark):
    import duckdb

    from zen3geo_spark.functions.web import canonical_url_sql

    vals = ", ".join(f"('{u}')" for u, _ in CANON_CASES)
    sql = (f"select {canonical_url_sql('u', 'duckdb')} as c "
           f"from (values {vals}) v(u)")
    got = [r[0] for r in duckdb.sql(sql).fetchall()]
    assert got == [c for _, c in CANON_CASES]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], "url string")
    got = [r.c for r in
           df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [c for _, c in CANON_CASES]


def test_canonical_url_idempotent(spark):
    df = spark.createDataFrame([(c,) for _, c in CANON_CASES], "url string")
    got = [r.c for r in
           df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [c for _, c in CANON_CASES]


def test_crawl_delta_counts(spark):
    import __spark_entry__ as E

    rows = {r.host: r for r in
            E.q_crawl_delta(spark, "/root/testdata/sf0.001").collect()}
    n, lo = E.N_PAGES, E.N_PAGES // 5
    # global invariants: every host sees the same uniform id stripes
    assert sum(r.n_new for r in rows.values()) == (n * 6 // 5) - n
    assert sum(r.n_gone for r in rows.values()) == lo
    assert sum(r.n_kept for r in rows.values()) == n - lo
    assert len(rows) == 1000


# --- Bloom filter (crawl-frontier membership) ---

def _bloom_keys(spark, n=800, prefix="k"):
    return spark.range(n).selectExpr(
        f"concat('{prefix}', cast(id as string)) as url")


def test_bloom_no_false_negatives(spark):
    from zen3geo_spark.functions.sketch import bloom_build, bloom_probe

    keys = _bloom_keys(spark)
    bloom = bloom_build(keys, "url")
    missed = (bloom_probe(keys, bloom, "url")
              .filter(~F.col("bloom_pass")).count())
    assert missed == 0


def test_bloom_false_positive_rate_bounded(spark):
    from zen3geo_spark.functions.sketch import bloom_build, bloom_probe

    bloom = bloom_build(_bloom_keys(spark, 800, "in"), "url")
    out = bloom_probe(_bloom_keys(spark, 800, "out"), bloom, "url")
    fp = out.filter(F.col("bloom_pass")).count()
    # n=800, m=2^15, k=4 -> theoretical fpr ~0.0003; allow slack
    assert fp / 800 < 0.05


def test_bloom_words_match_duckdb_exactly(spark):
    import duckdb

    from zen3geo_spark.functions.sketch import (
        bloom_build, bloom_cte_sql_duckdb,
    )

    keys = _bloom_keys(spark, 300)
    got = {(r.word, r.bits) for r in bloom_build(keys, "url").collect()}
    sql = ("with seen as (select concat('k', cast(t.id as varchar)) as url "
           "from range(300) t(id)) "
           + bloom_cte_sql_duckdb("seen", "url"))
    want = {(int(w), int(b)) for w, b in duckdb.sql(sql).fetchall()}
    assert got == want


def test_bloom_probe_handles_duplicate_keys(spark):
    from zen3geo_spark.functions.sketch import bloom_build, bloom_probe

    bloom = bloom_build(_bloom_keys(spark, 100), "url")
    dup = _bloom_keys(spark, 100).unionAll(_bloom_keys(spark, 100))
    got = bloom_probe(dup, bloom, "url")
    assert got.count() == 100  # grouped, not doubled
    assert got.filter(~F.col("bloom_pass")).count() == 0


# --- HyperLogLog ---

def test_hll_estimate_accuracy(spark):
    from zen3geo_spark.functions.sketch import hll_estimate, hll_registers

    keys = spark.range(5000).selectExpr(
        "concat('key-', cast(id as string)) as k")
    est = hll_estimate(hll_registers(keys, "k")).collect()[0].est_distinct
    # m=1024 -> standard error ~3.3%; allow 4 sigma
    assert abs(est - 5000) / 5000 < 0.14


def test_hll_linear_counting_small_range(spark):
    from zen3geo_spark.functions.sketch import hll_estimate, hll_registers

    keys = spark.range(50).selectExpr(
        "concat('key-', cast(id as string)) as k")
    est = hll_estimate(hll_registers(keys, "k")).collect()[0].est_distinct
    assert abs(est - 50) / 50 < 0.10


def test_hll_arrow_and_hof_hash_paths_identical(spark):
    from zen3geo_spark.functions.sketch import hll_registers

    keys = spark.range(400).selectExpr(
        "concat('key-', cast(id as string)) as k")
    a = {(r.idx, r.reg) for r in
         hll_registers(keys, "k", use_arrow=True).collect()}
    b = {(r.idx, r.reg) for r in
         hll_registers(keys, "k", use_arrow=False).collect()}
    assert a == b


def test_hll_duplicates_do_not_change_registers(spark):
    from zen3geo_spark.functions.sketch import hll_registers

    keys = spark.range(300).selectExpr(
        "concat('key-', cast(id as string)) as k")
    dup = keys.unionAll(keys).unionAll(keys)
    a = {(r.idx, r.reg) for r in hll_registers(keys, "k").collect()}
    b = {(r.idx, r.reg) for r in hll_registers(dup, "k").collect()}
    assert a == b


def test_qsketch_bucket_contains_exact_rank_value(spark):
    """The sketch's [est_lo, est_hi] bucket must CONTAIN the exact
    rank-ceil(pct·n/100) order statistic (guaranteed by construction:
    buckets partition the positive ints and idx is monotone in v)."""
    from zen3geo_spark.functions.sketch import (
        qsketch_build, qsketch_quantiles,
    )

    # deterministic skewed values: quadratic growth spans many octaves
    vals = spark.range(1, 1001).selectExpr("id * id div 7 + 1 as v",
                                           "'g' as g")
    pcts = (10, 50, 90, 99, 100)
    got = {r.q_pct: (r.est_lo, r.est_hi, r.n) for r in
           qsketch_quantiles(qsketch_build(vals, "v", ("g",)), pcts,
                             ("g",)).collect()}
    exact = sorted(r.v for r in vals.collect())
    n = len(exact)
    for p in pcts:
        rank = (p * n + 99) // 100
        true_val = exact[rank - 1]
        lo, hi, n_got = got[p]
        assert n_got == n
        assert lo <= true_val <= hi, (p, lo, true_val, hi)
        # log-linear width bound: hi/lo ≤ 1 + 2^-5 once past the
        # exact-small-value range
        if lo >= 64:
            assert hi - lo + 1 <= max(lo >> 5, 1)


def test_qsketch_small_values_are_exact(spark):
    """Values below 2^(p+1) = 64 land in singleton buckets — the sketch
    is EXACT there (est_lo == est_hi == the true order statistic)."""
    from zen3geo_spark.functions.sketch import (
        qsketch_build, qsketch_quantiles,
    )

    vals = spark.range(1, 64).selectExpr("id as v", "'g' as g")
    got = {r.q_pct: (r.est_lo, r.est_hi) for r in
           qsketch_quantiles(qsketch_build(vals, "v", ("g",)),
                             (50, 100), ("g",)).collect()}
    assert got[50] == (32, 32)   # ceil(0.5·63) = 32
    assert got[100] == (63, 63)


def test_ip_geo_lpm_prefers_longest(spark):
    from pyspark.sql import functions as F

    from zen3geo_spark.functions.web import ip_geo_join

    hosts = spark.createDataFrame(
        [("a.test", 0x0A0A0A0A), ("b.test", 0xDEADBEEF)],
        "host string, ip long")
    # /8 covers both 10.x and 222.x? no: pick /8 for 10.0.0.0 and a /16
    # nested inside it — LPM must pick the /16 for a.test
    cidr = spark.createDataFrame(
        [(1, 8, 0x0A000000, "C8"), (2, 16, 0x0A0A0000, "C16")],
        "block_id long, prefix_len int, prefix long, country string")
    out = {r.host: (r.prefix_len, r.country)
           for r in ip_geo_join(hosts, cidr).collect()}
    assert out == {"a.test": (16, "C16")}


def test_table_checksum_order_and_partition_invariant(spark):
    from zen3geo_spark.functions.web import table_checksum
    from zen3geo_spark.sources.pages import synth_pages

    a = table_checksum(synth_pages(spark, 300)).collect()[0]
    # different partitioning + reversed generation order, same content
    b = table_checksum(
        synth_pages(spark, 300, partitions=7)
        .orderBy("url", ascending=False)).collect()[0]
    assert (a.n_rows, a.xor1, a.xor2) == (b.n_rows, b.xor1, b.xor2)
    # any single-row mutation flips the checksum
    c = table_checksum(
        synth_pages(spark, 300).withColumn(
            "lang", F.expr(
                "case when url like '%/page/7' then 'xx' else lang end"))
    ).collect()[0]
    assert (c.xor1, c.xor2) != (a.xor1, a.xor2)

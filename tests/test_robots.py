"""robots.txt longest-prefix-match evaluation (functions/web.py)."""

import duckdb
from pyspark.sql import functions as F

from zen3geo_spark.functions.web import (
    robots_audit_sql_duckdb, robots_decisions, robots_rules_synth)


def test_robots_longest_match_allow_wins(spark):
    # host h has Disallow /page/1, Allow /page/12, Disallow /
    pages = spark.createDataFrame(
        [("https://h.test/page/12",),   # allow (len 8) beats disallow (7)
         ("https://h.test/page/13",),   # disallow /page/1
         ("https://h.test/page/9",),    # blanket disallow /
         ("https://other.test/page/1",)],  # no rules for host -> allowed
        "url string")
    rules = spark.createDataFrame(
        [("h.test", "/page/1", 0), ("h.test", "/page/12", 1),
         ("h.test", "/", 0)],
        "host string, prefix string, allow int")
    got = {r["url"]: r["allowed"]
           for r in robots_decisions(pages, rules).collect()}
    assert got == {
        "https://h.test/page/12": 1,
        "https://h.test/page/13": 0,
        "https://h.test/page/9": 0,
        "https://other.test/page/1": 1,
    }


def test_robots_tie_prefers_allow(spark):
    pages = spark.createDataFrame([("https://t.test/a/x",)], "url string")
    rules = spark.createDataFrame(
        [("t.test", "/a/", 0), ("t.test", "/a/", 1)],
        "host string, prefix string, allow int")
    assert robots_decisions(pages, rules).first()["allowed"] == 1


def test_robots_audit_matches_duckdb(spark):
    from zen3geo_spark.sources.pages import pages_cte_sql, synth_pages

    n = 500
    pages = synth_pages(spark, n)
    rules = robots_rules_synth(spark, n_hosts=1000)
    got = sorted(tuple(r) for r in (
        robots_decisions(pages, rules)
        .groupBy("host")
        .agg(F.count("*").alias("n_pages"),
             F.sum("allowed").alias("n_allowed"),
             (F.count("*") - F.sum("allowed")).alias("n_blocked"))
        .collect()))
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(
        robots_audit_sql_duckdb(pages_cte_sql(n), n_hosts=1000)).fetchall())
    assert got == want
    # non-vacuous: some pages blocked, some allowed
    assert any(r[3] > 0 for r in got) and any(r[2] > 0 for r in got)

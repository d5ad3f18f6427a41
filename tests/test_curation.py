"""Corpus-curation operators: contamination check, duplicate-span
inventory, deterministic stratified sampling (operators/curation.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from zen3geo_spark.operators.curation import (
    contamination_check, contamination_sql_duckdb, duplicate_span_inventory,
    duplicate_span_sql_duckdb, sample_hash, stratified_sample,
    stratified_sample_sql_duckdb, stratified_sample_summary, word_ngrams,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    # unpersist on teardown: a leaked cached full-column scan would be
    # substituted into later tests' plans and break the column-pruning
    # gates in test_plans.py
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    yield df
    df.unpersist()


def _duck(sql):
    con = duckdb.connect()
    con.execute(
        f"create view documents as "
        f"select * from read_parquet('{SF}/documents.parquet')")
    return con.execute(sql).fetchall()


def test_word_ngrams_golden(spark):
    df = spark.createDataFrame(
        [(1, "A b c d"), (2, "x y"), (3, "")], "id long, text string")
    rows = {r["id"]: r["g"] for r in df.select(
        "id", word_ngrams(F.col("text"), 3).alias("g")).collect()}
    assert rows[1] == ["a b c", "b c d"]
    # shorter than n: EMPTY, not a descending-sequence artifact
    assert rows[2] == []
    assert rows[3] == []


def test_contamination_golden(spark):
    # doc 0 is benchmark (0 % 97 == 0); docs 1-3 are corpus
    df = spark.createDataFrame(
        [(0, "a b c d e f"),          # bench grams: "a b c d e", "b c d e f"
         (1, "a b c d e x y z w v"),  # 6 grams, 1 contaminated (pos 1)
         (2, "q r s t u"),            # 1 gram, 0 contaminated
         (3, "a b")],                 # <5 words: absent from output
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["n_contaminated"])
           for r in contamination_check(df, n=5, bench_mod=97).collect()}
    assert got == {1: (6, 1), 2: (1, 0)}


def test_contamination_matches_duckdb(docs):
    got = sorted(tuple(r) for r in contamination_check(docs).collect())
    want = sorted(_duck(contamination_sql_duckdb("documents")))
    assert got == want and len(got) > 0


def test_dup_spans_matches_duckdb(docs):
    got = [tuple(r) for r in duplicate_span_inventory(docs).collect()]
    want = _duck(duplicate_span_sql_duckdb("documents"))
    # the (count desc, gram asc) order is total → exact list equality
    assert got == want and len(got) == 20


def test_stratified_summary_matches_duckdb(docs):
    rates = {"en": 100, "es": 50}
    got = sorted(tuple(r) for r in
                 stratified_sample_summary(docs, rates).collect())
    want = sorted(_duck(stratified_sample_sql_duckdb("documents", rates)))
    assert got == want and len(got) > 0


def test_stratified_sample_deterministic_and_consistent(docs):
    rates = {"en": 100, "es": 50}
    kept = stratified_sample(docs, rates)
    # rate semantics: en keeps everything
    n_en = docs.filter(F.col("lang") == "en").count()
    assert kept.filter(F.col("lang") == "en").count() == n_en
    # deterministic: same ids both runs
    ids1 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert ids1 == ids2 and 0 < len(ids1) < docs.count()
    # the summary's n_kept equals the filter's actual kept count
    summ = stratified_sample_summary(docs, rates)
    assert (summ.agg(F.sum("n_kept")).first()[0] == len(ids1))


def test_sample_hash_matches_duckdb(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    got = sorted((r["doc_id"], r["h"]) for r in df.select(
        "doc_id", sample_hash(F.col("doc_id")).alias("h")).collect())
    want = sorted(duckdb.sql(
        "select id as doc_id, (id * 2654435761 + 12345) % 100 as h "
        "from range(1000) t(id)").fetchall())
    assert got == [(d, int(h)) for d, h in want]
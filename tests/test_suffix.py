"""Distributed suffix-array prefix doubling (operators/suffix.py)."""

import duckdb


def test_suffix_ranks_match_brute_force(spark):
    """Ranks after enough rounds == brute-force sorted suffix order of
    the sentinel-concatenated corpus."""
    from zen3geo_spark.operators.suffix import SENTINEL, suffix_ranks

    docs = [(7, "b a b a b"), (9, "a b"), (11, "c")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc, r.pos): (r.gpos, r.rank)
           for r in suffix_ranks(df, rounds=4).collect()}

    # brute force: concatenate token streams + per-doc sentinels in
    # doc-major order, rank every suffix lexicographically
    stream, keys = [], []
    for doc, text in docs:
        toks = text.split()
        for i, t in enumerate(toks):
            stream.append(t)
            keys.append((doc, i + 1))
        stream.append(SENTINEL + str(doc))
        keys.append((doc, len(toks) + 1))
    suffixes = sorted(range(len(stream)), key=lambda i: stream[i:])
    brute_rank = {}
    for rk, i in enumerate(suffixes, 1):
        brute_rank[keys[i]] = rk
    assert len(got) == len(keys)
    for key, (gpos, rank) in got.items():
        assert rank == brute_rank[key], (key, rank, brute_rank[key])
    # total order reached: all ranks distinct
    assert len({r for _, r in got.values()}) == len(got)


def test_suffix_ranks_twin_exact(spark):
    from zen3geo_spark.operators.suffix import (
        suffix_ranks, suffix_ranks_sql_duckdb,
    )

    df = spark.createDataFrame(
        [(1, "x y x y z"), (2, "y z y")], "doc_id long, text string")
    got = sorted((r.doc, r.pos, r.gpos, r.rank)
                 for r in suffix_ranks(df, rounds=3).collect())
    duck = sorted(duckdb.sql(
        suffix_ranks_sql_duckdb(
            "(select 1 as doc_id, 'x y x y z' as text "
            "union all select 2, 'y z y')", rounds=3)).fetchall())
    assert duck == got

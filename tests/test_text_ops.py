"""Text-analysis functions + dedup/similarity operators over the driver's
documents/embeddings tables (sf0.001 — small, fast)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from zen3geo_spark.functions.text import (
    fingerprint, fingerprint_sql, lang_id, quality_score, quality_score_sql,
    token_count, token_count_sql,
)
from zen3geo_spark.operators.dedup import (
    dedup_exact, minhash_lsh_candidates, ngram_jaccard, simhash_near_dups,
)
from zen3geo_spark.operators.similarity import (
    cosine_topk_bruteforce, cosine_topk_lsh,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_token_count_matches_duckdb(docs):
    got = sorted(
        (r["doc_id"], r["n"])
        for r in docs.select("doc_id", token_count(F.col("text")).alias("n")).collect()
    )
    want = sorted(duckdb.sql(
        f"select doc_id, {token_count_sql('text', 'duckdb')} as n "
        f"from read_parquet('{SF}/documents.parquet')"
    ).fetchall())
    assert got == want


def test_fingerprint_matches_duckdb(docs):
    got = sorted(
        (r["doc_id"], r["fp"])
        for r in docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()
    )
    want = sorted(duckdb.sql(
        f"select doc_id, {fingerprint_sql('text', 'duckdb')} as fp "
        f"from read_parquet('{SF}/documents.parquet')"
    ).fetchall())
    assert got == want


def test_quality_score_matches_duckdb(docs):
    got = {
        r["doc_id"]: r["q"]
        for r in docs.select("doc_id", quality_score(F.col("text")).alias("q")).collect()
    }
    want = dict(duckdb.sql(
        f"select doc_id, {quality_score_sql('text', 'duckdb')} as q "
        f"from read_parquet('{SF}/documents.parquet')"
    ).fetchall())
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_lang_id_runs(docs):
    out = docs.select(lang_id(F.col("text")).alias("pred")).groupBy("pred").count().collect()
    langs = {r["pred"] for r in out}
    assert "en" in langs  # the synthetic docs are English-ish word soup


def test_dedup_exact(spark, docs):
    dup = docs.select("doc_id", "text").union(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    out = dedup_exact(dup)
    assert out.count() == docs.count()
    assert out.agg(F.max("n_dups")).collect()[0][0] == 2
    # representative is the lower id
    assert out.agg(F.max("keep_id")).collect()[0][0] < 100000


def test_minhash_lsh_finds_exact_dups(spark, docs):
    dup = docs.limit(50).select("doc_id", "text").union(
        docs.limit(50).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    pairs = {(r["a_id"], r["b_id"]) for r in minhash_lsh_candidates(dup).collect()}
    for i in [r["doc_id"] for r in docs.limit(50).collect()]:
        assert (i, i + 100000) in pairs


def test_ngram_jaccard_exact_dups_score_one(spark, docs):
    dup = docs.limit(20).select("doc_id", "text").union(
        docs.limit(20).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    out = {(r["a_id"], r["b_id"]): r["jaccard"]
           for r in ngram_jaccard(dup, threshold=0.99).collect()}
    for i in [r["doc_id"] for r in docs.limit(20).collect()]:
        assert out.get((i, i + 100000)) == pytest.approx(1.0)


def test_simhash_near_dups(spark, docs):
    dup = docs.limit(20).select("doc_id", "text").union(
        docs.limit(20).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    pairs = {(r["a_id"], r["b_id"]) for r in simhash_near_dups(dup).collect()}
    for i in [r["doc_id"] for r in docs.limit(20).collect()]:
        assert (i, i + 100000) in pairs


def test_cosine_topk_self_is_nearest(spark, emb):
    q = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    out = cosine_topk_bruteforce(q, emb, k=3).filter(F.col("rk") == 1).collect()
    for r in out:
        assert r["target_id"] == r["query_id"]
        assert r["cos"] == pytest.approx(1.0)


def test_lsh_ann_recall_at_smallscale(spark, emb):
    """LSH candidates must recover the true top-1 (self) and mostly the
    true top-3 on 500 vectors."""
    q = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    brute = {(r["query_id"], r["target_id"])
             for r in cosine_topk_bruteforce(q, emb, k=3).collect()}
    ann = {(r["query_id"], r["target_id"])
           for r in cosine_topk_lsh(q, emb, k=3, dim=64, n_planes=4,
                                    n_tables=8).collect()}
    recall = len(brute & ann) / len(brute)
    assert recall >= 0.6
    for qid, tid in brute:
        if qid == tid:
            assert (qid, tid) in ann  # self always found


def test_hash_kernel_parity_mixed_case(spark):
    """The pandas hash kernels, their Column twins, and the DuckDB oracle
    expressions must agree on MIXED-CASE and unicode input (the lowercase
    normalization lives in all three paths)."""
    from zen3geo_spark.operators.dedup import (
        gram_hash60_sql_duckdb, gram_hashes40_sql_duckdb,
        minhash_signature, minhash_signature_pd, minhash_signature_sql_duckdb,
        shingles_sql_duckdb, simhash64, simhash64_agg, simhash64_sql_duckdb,
        simhash_pd,
    )

    rows = [(0, "The Quick BROWN Fox jumps"), (1, "héllo WÖRLD ünïcode text"),
            (2, "plain lowercase words here"), (3, "  Trim ME  ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sig_col = {r["doc_id"]: list(r["s"]) for r in
               df.select("doc_id", minhash_signature(F.col("text"), 8, 2).alias("s")).collect()}
    sig_pd = {r["doc_id"]: list(r["s"]) for r in
              df.select("doc_id", minhash_signature_pd(8, 2)(F.col("text")).alias("s")).collect()}
    assert sig_col == sig_pd

    grams = shingles_sql_duckdb("text", 2)
    con = duckdb.connect()
    con.sql("create table t as select * from (values (0, 'The Quick BROWN Fox jumps'),"
            "(1, 'héllo WÖRLD ünïcode text'), (2, 'plain lowercase words here'),"
            "(3, '  Trim ME  ')) v(doc_id, text)")
    sig_duck = dict(con.sql(
        f"with sh as (select doc_id, {grams} as grams from t), "
        f"h as (select doc_id, {gram_hashes40_sql_duckdb('grams')} as hs from sh) "
        f"select doc_id, {minhash_signature_sql_duckdb('hs', 8)} from h").fetchall())
    assert sig_pd == {k: list(v) for k, v in sig_duck.items()}

    sh_col = {r["doc_id"]: r["s"] for r in
              df.select("doc_id", simhash64(F.col("text"), 2).alias("s")).collect()}
    sh_pd = {r["doc_id"]: r["s"] for r in
             df.select("doc_id", simhash_pd(2)(F.col("text")).alias("s")).collect()}
    sh_agg = {r["doc"]: r["sh"] for r in simhash64_agg(df, shingle_n=2).collect()}
    assert sh_col == sh_pd == sh_agg
    sh_duck = dict(con.sql(
        f"with sh as (select doc_id, {grams} as grams from t), "
        f"h as (select doc_id, list_transform(grams, g -> {gram_hash60_sql_duckdb('g')}) as hs, "
        f"       len(grams) as n from sh) "
        f"select doc_id, {simhash64_sql_duckdb('hs', 'n')} from h").fetchall())
    assert sh_pd == sh_duck


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing guarantee: documents sharing a substring of length
    >= k + w - 1 share at least one fingerprint; disjoint texts don't."""
    from pyspark.sql import functions as F
    from zen3geo_spark.operators.dedup import winnow_fingerprints_pd

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (0, f"AAA {shared} BBB"),
        (1, f"xyz123 {shared} qqqq"),
        (2, "completely different content with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp_udf = winnow_fingerprints_pd(k=8, w=4)
    fps = {r["doc_id"]: set(r["fp"]) for r in
           df.select("doc_id", fp_udf(F.col("text")).alias("fp")).collect()}
    assert fps[0] & fps[1]          # shared substring -> shared fingerprint
    assert not (fps[0] & fps[2])    # disjoint text -> disjoint fingerprints
    # determinism
    fps2 = {r["doc_id"]: set(r["fp"]) for r in
            df.select("doc_id", fp_udf(F.col("text")).alias("fp")).collect()}
    assert fps == fps2


def test_connected_components_known_graph(spark):
    """Chains, a cycle, and singletons resolve to min-id components; the
    pointer-jumping path converges a long chain quickly."""
    from zen3geo_spark.operators.dedup import connected_components

    # chain 1-2-3-4-5-6-7-8, cycle 10-11-12-10, isolated 20; plus nodes df
    edges = [(i, i + 1) for i in range(1, 8)] + [(10, 11), (11, 12), (12, 10)]
    e = spark.createDataFrame(edges, "a_id long, b_id long")
    n = spark.createDataFrame([(i,) for i in [20, 1, 10]], "node long")
    out = {r["node"]: r["component"]
           for r in connected_components(e, nodes=n).collect()}
    for v in range(1, 9):
        assert out[v] == 1
    for v in (10, 11, 12):
        assert out[v] == 10
    assert out[20] == 20


def test_poly_hash_parity_property():
    """Property: the NumPy polynomial hash equals the DuckDB ord/substr
    SQL for arbitrary unicode strings (incl. >GRAM_CAP lengths, empties,
    multibyte code points)."""
    import duckdb as _dd
    from hypothesis import given, settings, strategies as st
    from zen3geo_spark.operators.dedup import (
        _poly_hash_batch, _POWS1_NP, _POWS2_NP, hash40_sql_duckdb,
    )

    con = _dd.connect()

    @settings(max_examples=40, deadline=None)
    @given(st.text(max_size=100))
    def check(s):
        h1 = int(_poly_hash_batch([s], _POWS1_NP)[0])
        h2 = int(_poly_hash_batch([s], _POWS2_NP)[0])
        q = f"select {hash40_sql_duckdb('?', 1)}, {hash40_sql_duckdb('?', 2)}"
        got = con.execute(q, [s] * q.count("?")).fetchone()
        assert (got[0], got[1]) == (h1, h2), repr(s)

    check()


def test_minhash_bucket_cap_bounds_pathological_skew(spark):
    """One bucket of identical boilerplate docs would otherwise produce
    B² candidate rows; the max_bucket guard drops it while genuine
    near-dup pairs in small buckets survive."""
    boiler = [(i, "same boilerplate page content here") for i in range(200)]
    real = [(1000, "unique interesting article text one"),
            (1001, "unique interesting article text one more")]
    df = spark.createDataFrame(boiler + real, "doc_id long, text string")
    uncapped = minhash_lsh_candidates(df, num_hashes=8, bands=4, shingle_n=2)
    capped = minhash_lsh_candidates(df, num_hashes=8, bands=4, shingle_n=2,
                                    max_bucket=50)
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un >= 200 * 199 / 2        # the boilerplate clique is quadratic
    assert n_cap < 200                  # guard removed the pathological bucket
    got = {(r["a_id"], r["b_id"]) for r in capped.collect()}
    assert (1000, 1001) in got          # real near-dups still found


def test_kmv_sketch_accuracy_and_exact_smallkeys(spark):
    """KMV estimator: exact below k, within ~3/sqrt(k) relative error
    above k (k=64 → ~37% bound; typical much tighter)."""
    from zen3geo_spark.operators.dedup import kmv_distinct

    rows = ([("small", f"v{i}") for i in range(30)]
            + [("big", f"value-{i * 7919}") for i in range(3000)])
    df = spark.createDataFrame(rows, "key string, val string")
    got = {r["key"]: r for r in kmv_distinct(df, "key", "val", k=64).collect()}
    assert got["small"]["est_distinct"] == 30.0  # < k → exact
    est = got["big"]["est_distinct"]
    assert abs(est - 3000) / 3000 < 3 / (64 ** 0.5), est


def test_connected_components_warns_when_unconverged(spark):
    """Exiting the loop with changed > 0 must warn loudly — the labels
    would otherwise be silently non-minimal (ADVICE round 2)."""
    import warnings

    from zen3geo_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "a_id long, b_id long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        # local_contraction=False: at test scale AQE coalesces the edge
        # list to one partition, so the union-find pass alone would solve
        # the chain and the loop would (correctly) not warn
        out = connected_components(chain, max_iters=1,
                                   local_contraction=False)
        assert any("converge" in str(x.message) for x in w)
    # and the converged run does NOT warn
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = connected_components(chain)
        assert not any("converge" in str(x.message) for x in w)
    assert out.filter(F.col("component") != 0).count() == 0


def test_word_jaccard_df_blocking_recall_bound(spark):
    """The max_df_frac blocking DROPS true pairs whose shared tokens are
    all above the df cutoff (boilerplate-only near-dups) — the documented
    recall bound of the blocked path; the exact path finds them."""
    rows = ([(i, "common boilerplate words here") for i in range(8)]
            + [(100, "unique alpha beta gamma delta")])
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = ngram_jaccard(docs, shingle_n=1, threshold=0.9)
    # every one of the 8 identical docs pairs with jaccard 1.0
    assert exact.count() == 8 * 7 // 2
    blocked = ngram_jaccard(docs, shingle_n=1, threshold=0.9,
                            max_df_frac=0.5)
    # all shared tokens sit in 8/9 > 50% of docs → zero blocking keys
    assert blocked.count() == 0


def test_hash_parity_non_bmp_all_three_paths(spark):
    """Non-BMP (emoji/astral) hash parity: the NumPy kernel (which
    kmv_distinct and the LSH signatures route through), DuckDB's
    ord()-based SQL, AND the Spark Column path must all agree — Spark 4's
    split('')/ascii operate on Unicode code points, not UTF-16 units, so
    the surrogate-pair divergence flagged in review does not occur."""
    import duckdb as _dk

    from zen3geo_spark.operators.dedup import (
        _POWS1_NP, _poly_hash_batch, gram_hash40, hash40_sql_duckdb,
    )

    s = "a\U0001F600b\U00020000"  # astral chars — surrogate pairs in UTF-16
    kernel = int(_poly_hash_batch([s], _POWS1_NP)[0])
    duck = _dk.sql(
        f"select {hash40_sql_duckdb('v', 1)} from (select '{s}' as v)"
    ).fetchone()[0]
    assert kernel == duck
    column = spark.range(1).select(
        gram_hash40(F.lit(s)).alias("h")).collect()[0]["h"]
    assert column == kernel


def test_ngram_repetition_stats_hand_computed(spark):
    """'a b a b a' bigrams: [a b, b a, a b, b a] -> top 2/4; trigrams:
    [a b a, b a b, a b a] -> dup (3-2)/3."""
    from zen3geo_spark.functions.text import ngram_repetition_stats

    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "w x y z q r")], "doc_id long, text string")
    got = {r["doc"]: r for r in ngram_repetition_stats(docs).collect()}
    assert got[1]["top_bigram_frac"] == 0.5
    assert got[1]["dup_trigram_frac"] == round(1 / 3, 6)
    assert not got[1]["keep"]          # repetitive doc filtered
    assert got[2]["top_bigram_frac"] == 0.2
    assert got[2]["dup_trigram_frac"] == 0.0
    assert got[2]["keep"]


def test_bm25_rare_term_outranks_common(spark):
    """A doc hitting the rarer term scores above one hitting the common
    term with equal tf/dl (idf monotonicity)."""
    from zen3geo_spark.functions.text import bm25_scores

    rows = [(i, "common filler words here") for i in range(8)]
    rows += [(8, "rare common pad pad"), (9, "common common pad pad")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc"]: r["bm25"]
           for r in bm25_scores(docs, ["rare", "common"]).collect()}
    assert got[8] > got[9]
    assert set(got) == set(range(10))  # every doc hits 'common'


def test_hashed_tfidf_semantics(spark):
    """Weights positive, buckets bounded by dim, idf ordering: a term
    appearing in every doc gets the minimum idf, so a doc made only of
    ubiquitous terms scores below one with a unique term (equal tf)."""
    from zen3geo_spark.functions.text import hashed_tfidf

    docs = spark.createDataFrame(
        [(0, "every doc"), (1, "every doc"), (2, "every unique")],
        "doc_id long, text string")
    rows = hashed_tfidf(docs, dim=16).collect()
    assert all(0 <= r["bucket"] < 16 for r in rows)
    assert all(r["w"] > 0 for r in rows)
    per_doc = {}
    for r in rows:
        per_doc[r["doc"]] = per_doc.get(r["doc"], 0.0) + r["w"]
    assert per_doc[2] > per_doc[0]  # 'unique' carries higher idf


def test_subword_count_golden_and_cross_engine(spark):
    """GPT-2-ish pre-tokenizer: contraction splits, letter/digit runs,
    single punctuation; identical match stream in Java regex and RE2."""
    import duckdb as _dd

    from zen3geo_spark.functions.text import (
        subword_count, subword_count_sql_duckdb,
    )

    cases = [
        (1, "don't stop"),            # don + 't + stop = 3
        (2, "it's 2024, v2!"),        # it + 's + 2024 + , + v + 2 + ! = 7
        (3, "we'll we've we're"),     # 3 * 2 = 6
        (4, ""),                      # 0
        (5, "a'q"),                   # a + ' + q = 3 (not a contraction)
    ]
    df = spark.createDataFrame(cases, "id long, text string")
    got = {r["id"]: r["n"] for r in df.select(
        "id", subword_count(F.col("text")).alias("n")).collect()}
    assert got == {1: 3, 2: 7, 3: 6, 4: 0, 5: 3}
    con = _dd.connect()
    con.execute("create table t (id bigint, text varchar)")
    con.executemany("insert into t values (?, ?)", cases)
    want = dict(con.execute(
        f"select id, {subword_count_sql_duckdb('text')} from t").fetchall())
    assert got == want


def test_linear_classifier_exact_margins(spark):
    """Integer margins match a pure-Python recompute (same hash, same
    weight formula) and the DuckDB twin."""
    import duckdb as _dd

    from zen3geo_spark.functions.text import (
        _CLS_A, _CLS_B, _CLS_MOD, _CLS_OFF, linear_classifier_margin,
        linear_classifier_sql_duckdb,
    )
    from zen3geo_spark.operators.dedup import _POWS1_NP, _poly_hash_batch

    rows = [(i, f"alpha beta{i % 4} gamma gamma x{i % 3}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc"]: (r["margin"], r["label"])
           for r in linear_classifier_margin(docs, dim=32).collect()}

    def w(tok):
        b = int(_poly_hash_batch([tok], _POWS1_NP)[0]) % 32
        return (b * _CLS_A + _CLS_B) % _CLS_MOD - _CLS_OFF

    for doc_id, text in rows:
        m = sum(w(t) for t in text.lower().split())
        assert got[doc_id] == (m, m > 0)

    con = _dd.connect()
    con.execute("create table d (doc_id bigint, text varchar)")
    con.executemany("insert into d values (?, ?)", rows)
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        linear_classifier_sql_duckdb("d", dim=32)).fetchall()}
    assert got == want


def test_dsir_importance_prefers_target_token_mix(spark):
    from pyspark.sql import functions as F

    from zen3geo_spark.functions.text import dsir_importance

    rows = [
        # target slice: token mix {aa, bb}
        (0, "aa bb aa bb", True),
        (1, "bb aa aa", True),
        # matches the target mix without being in the slice -> high w
        (2, "aa bb bb aa", False),
        # alien token mix -> low w
        (3, "zz zz qq qq zz", False),
        (4, "qq zz qq", False),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {r.doc: r.log_importance
           for r in dsir_importance(docs, F.col("tgt")).collect()}
    assert got[2] > got[3] and got[2] > got[4]
    # target-slice docs themselves score at least as high as the aliens
    assert min(got[0], got[1]) > max(got[3], got[4])


def test_dsir_importance_smoothing_keeps_unseen_tokens_finite(spark):
    import math

    from pyspark.sql import functions as F

    from zen3geo_spark.functions.text import dsir_importance

    docs = spark.createDataFrame(
        [(0, "aa aa", True), (1, "zz zz", False)],
        "doc_id long, text string, tgt boolean")
    got = {r.doc: r.log_importance
           for r in dsir_importance(docs, F.col("tgt")).collect()}
    # 'zz' never appears in the target; Laplace smoothing keeps it finite
    assert all(math.isfinite(v) for v in got.values())
    assert got[0] > got[1]


def test_inverted_index_hand_corpus(spark):
    """Delta-encoded positional postings against a hand computation."""
    from zen3geo_spark.functions.text import inverted_index

    docs = spark.createDataFrame(
        [(10, "b a b"), (13, "a c  b"), (20, "c a")],
        "doc_id bigint, text string")
    got = {r.token: (r.df, r.postings) for r in
           inverted_index(docs, min_df=1, max_df=10).collect()}
    # positions index the \s+ split — whitespace RUNS collapse to one
    # delimiter on both engines, so "a c  b" tokenizes to a@0 c@1 b@2
    assert got["a"] == (3, "10:1|3:0|7:1")
    assert got["b"] == (2, "10:0,2|3:2")
    assert got["c"] == (2, "13:1|7:0")


def test_inverted_index_df_band_filters(spark):
    from zen3geo_spark.functions.text import inverted_index

    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "x")], "doc_id bigint, text string")
    toks = {r.token for r in
            inverted_index(docs, min_df=2, max_df=2).collect()}
    assert toks == {"y"}  # x has df=3 (pruned high), y df=2 (kept)


def test_tf_cosine_pairs_exact_and_blocked(spark):
    """Integer TF-cosine: identical docs score 1.0, known overlap scores
    the hand-computed value; max_df drops a stopword from the DOT while
    norms stay full-vector (the documented recall trade)."""
    from zen3geo_spark.functions.text import tf_cosine_pairs

    docs = spark.createDataFrame([
        (0, "a b c"),
        (1, "a b c"),            # identical to 0 → cos 1.0
        (2, "a a a a"),          # shares only 'a' with 0/1
        (3, "x y z"),            # disjoint from everything (df=1 tokens)
    ], "doc_id long, text string")
    got = {(r["a_id"], r["b_id"]): (r["dot"], r["cos"])
           for r in tf_cosine_pairs(docs, threshold=0.0).collect()}
    assert got[(0, 1)] == (3, 1.0)
    # cos(0,2): dot=1*4=4, n2a=3, n2b=16 → 4/sqrt(48)
    assert got[(0, 2)][0] == 4
    assert abs(got[(0, 2)][1] - 4 / (48 ** 0.5)) < 1e-6
    assert not any(3 in p for p in got)  # df=1 tokens join no pair

    # block 'a' (df=3) from the dot: pair (0,2) loses its only shared
    # token and disappears; (0,1) keeps b,c → dot=2, norms still full
    blocked = {(r["a_id"], r["b_id"]): (r["dot"], r["cos"])
               for r in tf_cosine_pairs(docs, threshold=0.0,
                                        max_df=2).collect()}
    assert (0, 2) not in blocked
    assert blocked[(0, 1)][0] == 2
    assert abs(blocked[(0, 1)][1] - 2 / 3) < 1e-6


def test_bpe_train_matches_reference_algorithm(spark):
    """Distributed BPE merges == the textbook Sennrich loop, including
    overlapping pair counts ('aaa' -> ('a','a') x2) and greedy
    non-overlapping merge ('aaa' -> 'aa a')."""
    from zen3geo_spark.functions.bpe import bpe_train

    vocab = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
             ("loww", 1), ("aaa", 4), ("banana", 2)]
    words = spark.createDataFrame(vocab, "word string, n long")
    got = [(r.rank, r.pair_a, r.pair_b, r.n_occ)
           for r in bpe_train(words, 8).collect()]

    seqs = {w: list(w) for w, _ in vocab}
    want = []
    for rank in range(1, 9):
        pc = {}
        for w, n in vocab:
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + n
        if not pc:
            break
        (pa, pb), c = min(pc.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        want.append((rank, pa, pb, c))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == pa and s[i + 1] == pb:
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    assert got == want


def test_pmi_pairs_brute_force(spark):
    """Exact sufficient statistics vs an itertools reference."""
    from itertools import combinations

    from zen3geo_spark.functions.text import pmi_pairs

    texts = ["a b c", "a b d", "a c d", "b c d", "a b", "c d x"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    # min_df=2 drops the singleton 'x'; no doc exceeds the tok cap
    out = {(r.tok_a, r.tok_b): (r.n_ab, r.n_a, r.n_b, r.n_docs)
           for r in pmi_pairs(docs, min_df=2, max_df=10, min_pair=1,
                              max_doc_toks=10).collect()}
    sets = [set(t.split()) - {"x"} for t in texts]
    n_a = {}
    for s in sets:
        for t in s:
            n_a[t] = n_a.get(t, 0) + 1
    want = {}
    for s in sets:
        for x, y in combinations(sorted(s), 2):
            want[(x, y)] = want.get((x, y), 0) + 1
    want = {p: (c, n_a[p[0]], n_a[p[1]], len(texts)) for p, c in want.items()}
    assert out == want


def test_pmi_pairs_hot_doc_guard(spark):
    """A doc with too many distinct banded tokens is excluded from the
    pair universe AND from the marginals (coherence)."""
    from zen3geo_spark.functions.text import pmi_pairs

    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e"), (2, "a b")],
        "doc_id long, text string")
    out = {(r.tok_a, r.tok_b): (r.n_ab, r.n_a, r.n_b, r.n_docs)
           for r in pmi_pairs(docs, min_df=2, max_df=10, min_pair=1,
                              max_doc_toks=3).collect()}
    # docs 0 and 1 carry 5 banded tokens each (> 3) -> excluded from the
    # pair universe AND the marginals; doc 2 alone remains
    assert out == {("a", "b"): (1, 1, 1, 1)}


def test_textrank_matches_python_reference(spark):
    """Pure-Python integer PageRank over the same adjacency graph."""
    from zen3geo_spark.functions.text import textrank_keywords

    texts = ["spark joins tables fast", "tables need joins",
             "spark tables scale", "joins scale fast spark"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r.token: r.rank_fp
           for r in textrank_keywords(docs, min_df=2, max_df=10,
                                      iters=3).collect()}

    mass, dn, dd, iters = 1_000_000_000, 85, 100, 3
    dfc = {}
    for t in texts:
        for tok in set(t.split()):
            dfc[tok] = dfc.get(tok, 0) + 1
    keep = {t for t, c in dfc.items() if 2 <= c <= 10}
    und = set()
    for t in texts:
        seq = [w for w in t.split() if w in keep]
        for x, y in zip(seq, seq[1:]):
            if x != y:
                und.add((min(x, y), max(x, y)))
    nodes = sorted(keep)
    n = len(nodes)
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    r = {v: mass // n for v in nodes}
    base = (mass - dn * mass // dd) // n
    for _ in range(iters):
        in_mass = {v: 0 for v in nodes}
        for a, b in und:
            in_mass[b] += r[a] // deg[a]
            in_mass[a] += r[b] // deg[b]
        r = {v: base + (dn * in_mass[v]) // dd for v in nodes}
    assert got == r
    # connectivity sanity: the rank spread is real, not uniform
    assert max(got.values()) > min(got.values())


def test_textrank_isolated_token_holds_base_mass(spark):
    """A banded token that never survives next to another banded token
    gets exactly the base (teleport) mass."""
    from zen3geo_spark.functions.text import textrank_keywords

    # 'z' appears in 2 docs but always alone after banding
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "z"), (3, "z")],
        "doc_id long, text string")
    got = {r.token: r.rank_fp
           for r in textrank_keywords(docs, min_df=2, max_df=10,
                                      iters=2).collect()}
    base = (1_000_000_000 - 85 * 1_000_000_000 // 100) // 3
    assert got["z"] == base
    assert got["a"] == got["b"] > base


def test_bigram_logppl_golden(spark):
    import math

    from zen3geo_spark.functions.text import bigram_logppl

    # corpus: doc1 = "a b a b", doc2 = "a a"
    # unigram counts: a=4, b=2; V=2; bigrams: (a,b)=2 (b,a)=1 (a,a)=1
    df = spark.createDataFrame([(1, "a b a b"), (2, "a a")],
                               "doc_id long, text string")
    got = {r.doc: r.logppl for r in bigram_logppl(df).collect()}
    p_ab = (2 + 1) / (4 + 2)   # c(a,b)+1 / c(a)+V
    p_ba = (1 + 1) / (2 + 2)
    p_aa = (1 + 1) / (4 + 2)
    exp1 = -(math.log(p_ab) * 2 + math.log(p_ba)) / 3
    exp2 = -math.log(p_aa)
    assert abs(got[1] - exp1) < 1e-12 and abs(got[2] - exp2) < 1e-12
    # repeated boilerplate scores LESS perplexing than it would under
    # the unigram model alone: doc1's (a,b) transitions are predictable
    assert got[2] > 0 and got[1] > 0

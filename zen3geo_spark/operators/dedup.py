"""Deduplication suite for web-scale corpora.

Exact (hash groupBy), MinHash+LSH (shingle → minhash → band → bucket-join),
SimHash, and n-gram Jaccard — all over the ``documents`` table shape
``(doc_id, text, ...)``. Hashing uses md5 (bit-identical in Spark and
DuckDB) so every stage is oracle-checkable; minhash signatures are the
lexicographic MIN of per-seed-salted md5 hex digests — a uniform random
permutation proxy with no engine-specific hash function.

Scale notes: every stage is a hash aggregate or equi-join on a derived
key — no cross products. Candidate generation for near-dup is strictly
band-bucket (LSH) or length-bucket blocked; verification joins only within
buckets.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

from zen3geo_spark.functions.text import fingerprint
from zen3geo_spark.operators._util import ensure_parallelism as _ensure_parallelism

# mirrors Java/RE2 \s (ASCII whitespace) used by the Spark/DuckDB shingle
# split — Python's default \s is unicode-wide
_WS = re.compile(r"\s+", flags=re.ASCII)


def _shingle_list(text: str, n: int) -> list[str]:
    """Python twin of ``shingles``: distinct word n-grams, identical to the
    Spark Column version including the short-text edge (one gram = the
    whole word list; empty text → one '' gram)."""
    words = _WS.split(text.strip())
    k = max(len(words) - n, 0) + 1
    return list(dict.fromkeys(" ".join(words[j:j + n]) for j in range(k)))


def dedup_exact(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per identical normalized text.

    One hash aggregate; at 100 TB this is the cheapest dedup pass and runs
    first to shrink everything downstream.
    """
    return (
        docs.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct, order-free)."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, n), " ")
    )
    return F.array_distinct(grams)


def minhash_signature(text: Column, num_hashes: int = 16, shingle_n: int = 3) -> Column:
    """Array of ``num_hashes`` minhash values: min(md5(seed || shingle))."""
    sh = shingles(text, shingle_n)

    def salted(j: int):
        seed = f"seed{j}:"
        return lambda s: F.md5(F.concat(F.lit(seed), s))

    sigs = [F.array_min(F.transform(sh, salted(j))) for j in range(num_hashes)]
    return F.array(*sigs)


def minhash_signature_pd(num_hashes: int, shingle_n: int):
    """Arrow-vectorized twin of ``minhash_signature``: per-seed min of
    salted md5 hex digests, computed with hashlib inside a pandas UDF.
    Value-identical to the Column version (md5 of utf-8 bytes, string min
    is lexicographic in both) but ~20x faster — Catalyst higher-order
    lambdas run interpreted, and md5-per-shingle is the hot loop."""
    seeds = [f"seed{j}:".encode() for j in range(num_hashes)]

    @F.pandas_udf(ArrayType(StringType()))
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            grams = [g.encode() for g in _shingle_list(t, shingle_n)]
            out.append([min(hashlib.md5(s + g).hexdigest() for g in grams)
                        for s in seeds])
        return pd.Series(out)

    return sig


def simhash_pd(shingle_n: int):
    """Arrow-vectorized twin of ``simhash64``/``simhash64_agg``: hashlib
    md5 per shingle + numpy majority-bit math. Value-identical (integer
    arithmetic throughout), ~20x faster than the Column paths."""

    @F.pandas_udf("long")
    def sh(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        bit_idx = np.arange(60)
        for i, t in enumerate(texts):
            grams = _shingle_list(t, shingle_n)
            hs = np.fromiter(
                (int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams),
                dtype=np.int64, count=len(grams))
            ones = ((hs[:, None] >> bit_idx[None, :]) & 1).sum(axis=0)
            out[i] = ((ones * 2 > len(grams)).astype(np.int64) << bit_idx).sum()
        return pd.Series(out)

    return sh


def winnow_fingerprints_pd(k: int = 8, w: int = 4):
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    public algorithm): hash all character k-grams of the whitespace-
    normalized text (48-bit md5 prefix), slide a w-window over the hash
    sequence, keep each window's minimum; the distinct sorted minima are
    the document's fingerprint set. Guarantees any shared substring of
    length >= k + w - 1 yields a shared fingerprint. Arrow-batched
    pandas; value-identical to ``winnow_fingerprints_sql_duckdb``."""

    @F.pandas_udf(ArrayType(LongType()))
    def fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            norm = _WS.sub(" ", t.strip()).lower()
            n_g = max(len(norm) - k + 1, 1)
            hs = np.fromiter(
                (int(hashlib.md5(norm[i:i + k].encode()).hexdigest()[:12], 16)
                 for i in range(n_g)),
                dtype=np.int64, count=n_g)
            if len(hs) <= w:
                mins = np.array([hs.min()])
            else:
                mins = np.lib.stride_tricks.sliding_window_view(hs, w).min(axis=1)
            out.append(np.unique(mins).tolist())
        return pd.Series(out)

    return fp


def winnow_fingerprints_sql_duckdb(rel: str, id_col: str, col: str,
                                   k: int = 8, w: int = 4) -> str:
    """DuckDB query mirroring ``winnow_fingerprints_pd``: yields
    (id_col, fp) rows. Staged CTEs — inlining the list expressions into
    one expression would re-evaluate the whole hash list per window
    element (no CSE across lambda references), which is O(n^2) md5s."""
    return f"""
    with _n as (
      select {id_col}, lower(regexp_replace(trim({col}), '\\s+', ' ', 'g')) as norm
      from {rel}
    ),
    _g as (
      select {id_col},
             list_transform(generate_series(1, greatest(length(norm) - {k}, 0) + 1),
                            i -> substr(norm, i, {k})) as grams
      from _n
    ),
    _h as (
      select {id_col},
             list_transform(grams, g -> cast('0x' || substr(md5(g), 1, 12) as bigint)) as hs
      from _g
    ),
    _w as (
      select {id_col},
             list_transform(generate_series(1, greatest(len(hs) - {w}, 0) + 1),
                            j -> list_min(hs[j : j + {w - 1}])) as wins
      from _h
    )
    select {id_col}, unnest(list_sort(list_distinct(wins))) as fp from _w
    """


def minhash_lsh_candidates(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 16,
                           bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of the minhash signature.

    rows_per_band = num_hashes / bands. Output: (a_id, b_id) with a < b,
    distinct. The band bucket join is an equi-join on the band hash —
    shuffle keyed by bucket, never all-pairs.
    """
    rows_per_band = num_hashes // bands
    sig_udf = minhash_signature_pd(num_hashes, shingle_n)
    d = _ensure_parallelism(docs).select(
        F.col(id_col).alias("doc"), sig_udf(F.col(text_col)).alias("sig"))
    banded = d.select(
        "doc",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(F.array_join(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band), "|"
                    )).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    pairs = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "bucket"])
        .filter(F.col("l.doc") < F.col("r.doc"))
        .select(F.col("l.doc").alias("a_id"), F.col("r.doc").alias("b_id"))
        .distinct()
    )
    return pairs


def ngram_jaccard(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  shingle_n: int = 3, threshold: float = 0.8,
                  block_col: Column | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity over candidate pairs.

    Blocked by ``block_col`` (default: shared shingle) to avoid all-pairs:
    explode shingles → self-join on shingle → per-pair intersection count /
    union. Returns pairs with jaccard >= threshold.
    """
    sh = _ensure_parallelism(docs).select(
        F.col(id_col).alias("doc"),
        F.size(shingles(F.col(text_col), shingle_n)).alias("n_sh"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    inter = (
        sh.alias("l").join(sh.alias("r"), "sh")
        .filter(F.col("l.doc") < F.col("r.doc"))
        .groupBy(F.col("l.doc").alias("a_id"), F.col("r.doc").alias("b_id"),
                 F.col("l.n_sh").alias("n_a"), F.col("r.n_sh").alias("n_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return inter.select(
        "a_id", "b_id",
        (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def shingles_sql_duckdb(col: str, n: int) -> str:
    """DuckDB expression mirroring ``shingles``: distinct word n-grams.

    Spark generates i in 0..greatest(size-n, 0) and takes slice(words,
    i+1, n); here i in 1..greatest(len-n, 0)+1 with the inclusive slice
    words[i : i+n-1] — identical gram sets, including the short-text case
    (one gram = the whole word list)."""
    words = f"regexp_split_to_array(lower(trim({col})), '\\s+')"
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({words}) - {n}, 0) + 1), "
        f"i -> array_to_string(({words})[i:i+{n - 1}], ' ')))"
    )


def minhash_signature_sql_duckdb(grams: str, num_hashes: int) -> str:
    """DuckDB expression mirroring ``minhash_signature`` over a grams-list
    expression: per-seed min of salted md5 hex digests."""
    sigs = ", ".join(
        f"list_min(list_transform({grams}, g -> md5('seed{j}:' || g)))"
        for j in range(num_hashes)
    )
    return f"[{sigs}]"


def simhash64_sql_duckdb(hs: str, n: str) -> str:
    """DuckDB expression mirroring ``simhash64`` given ``hs`` (list of
    bigint shingle hashes) and ``n`` (shingle count): bit b set when the
    majority of shingle hashes have bit b set; same (v % 2^(b+1)) >= 2^b
    bit test as the Spark side."""
    terms = []
    for b in range(60):
        lo, hi = 1 << b, 1 << (b + 1)
        terms.append(
            f"(case when 2 * len(list_filter({hs}, v -> (v % {hi}) >= {lo})) > {n} "
            f"then {1 << b} else 0 end)"
        )
    return "(" + " + ".join(terms) + ")"


def verify_jaccard_pairs(cand: DataFrame, docs: DataFrame,
                         shingle_n: int = 2, threshold: float | None = None,
                         text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact n-gram Jaccard over CANDIDATE pairs (a_id, b_id) via Arrow
    set-intersection — the verify stage after LSH blocking.

    The relational alternative (explode shingles, equi-join on shingle,
    group per pair) multiplies every candidate pair by its shingle count
    before aggregating; for verification the pair list is already small,
    so one broadcast-join of the texts plus a per-pair set intersection in
    pandas is orders of magnitude cheaper. Values are identical (exact
    integer set math feeding the same ratio).
    """
    d = docs.select(F.col(id_col).alias("_vid"), F.col(text_col).alias("_vtext"))
    joined = (
        cand.join(F.broadcast(d).withColumnRenamed("_vid", "a_id")
                  .withColumnRenamed("_vtext", "_ta"), "a_id")
        .join(F.broadcast(d).withColumnRenamed("_vid", "b_id")
              .withColumnRenamed("_vtext", "_tb"), "b_id")
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            jac = []
            for ta, tb in zip(pdf["_ta"], pdf["_tb"]):
                sa = set(_shingle_list(ta, shingle_n))
                sb = set(_shingle_list(tb, shingle_n))
                inter = len(sa & sb)
                jac.append(inter / (len(sa) + len(sb) - inter))
            out = pdf[["a_id", "b_id"]].copy()
            out["jaccard"] = jac
            yield out if threshold is None else out[out["jaccard"] >= threshold]

    return joined.mapInPandas(run, schema="a_id long, b_id long, jaccard double")


def simhash64(text: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash from shingle md5s: bit b of the result is 1 when the
    majority of shingles have bit b set in their md5-derived 64-bit hash.

    Pure array expressions (conv of the md5 hex prefix → bigint); no UDF.
    """
    sh = shingles(text, shingle_n)
    h = F.transform(sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"))
    n = F.size(sh)
    def bit_pred(b: int):
        # single-arg lambda via closure: a `b=b` default would make PySpark
        # treat it as the two-arg (value, index) lambda form
        lo, hi = 1 << b, 1 << (b + 1)
        return lambda v: (v % F.lit(hi)) >= F.lit(lo)

    bits = []
    for b in range(60):
        # bit test as pure arithmetic ((v % 2^(b+1)) >= 2^b)
        ones = F.size(F.filter(h, bit_pred(b)))
        bits.append(F.when(ones * 2 > n, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def simhash64_agg(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", shingle_n: int = 2) -> DataFrame:
    """Value-identical to ``simhash64`` but computed as explode + 60
    codegen'd sum aggregates instead of per-row array lambdas (HOF lambdas
    run interpreted; this path is ~10x faster and map-side-combines, so the
    shuffle carries one row of bit counters per doc). Returns (doc, sh)."""
    ex = _ensure_parallelism(docs).select(
        F.col(id_col).alias("doc"),
        F.size(shingles(F.col(text_col), shingle_n)).alias("n"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("g"),
    )
    h = ex.select(
        "doc", "n",
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    ones = [
        F.sum(((F.col("h") % F.lit(1 << (b + 1))) >= F.lit(1 << b)).cast("int")).alias(f"_o{b}")
        for b in range(60)
    ]
    per = h.groupBy("doc", "n").agg(*ones)
    sh = None
    for b in range(60):
        bit = (F.when(F.col(f"_o{b}") * 2 > F.col("n"), F.lit(1 << b).cast("long"))
               .otherwise(F.lit(0).cast("long")))
        sh = bit if sh is None else sh + bit
    return per.select("doc", sh.alias("sh"))


def simhash_near_dups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3, shingle_n: int = 2) -> DataFrame:
    """Near-dup pairs by SimHash: block on 16-bit chunks (a pair within
    hamming distance 3 shares at least one of 4 chunks — pigeonhole), then
    verify exact hamming distance. Equi-join on chunk, never all-pairs."""
    sh_udf = simhash_pd(shingle_n)
    d = _ensure_parallelism(docs).select(
        F.col(id_col).alias("doc"), sh_udf(F.col(text_col)).alias("sh"))
    chunks = d.select(
        "doc", "sh",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftright("sh", c * 15).bitwiseAND(F.lit((1 << 15) - 1)).alias("key"))
            for c in range(4)
        ])).alias("ck"),
    ).select("doc", "sh", "ck.chunk", "ck.key")
    cand = (
        chunks.alias("l").join(chunks.alias("r"), ["chunk", "key"])
        .filter(F.col("l.doc") < F.col("r.doc"))
        .select(F.col("l.doc").alias("a_id"), F.col("r.doc").alias("b_id"),
                F.col("l.sh").alias("sh_a"), F.col("r.sh").alias("sh_b"))
        .distinct()
    )
    return cand.select(
        "a_id", "b_id",
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)

"""Corpus-curation operators for web-scale training-data pipelines.

Three ops a 100 TB text pipeline runs before training, none of which the
reference repo covers (zen3geo stops at the geospatial loader layer —
these extend the engine's LLM-pipeline surface alongside
``operators/dedup.py`` and ``functions/text.py``):

- **Test-set contamination check** (``contamination_check``): per
  document, how many of its word n-gram positions also occur in a
  designated benchmark split — the standard decontamination pass (the
  GPT-3 appendix-C / "Documenting large webtext corpora" 13-gram idea,
  here parameterized on ``n``).
- **Duplicate-span inventory** (``duplicate_span_inventory``): the
  most-repeated word n-grams across the corpus with document- and
  source-spread — the cheap map-reduce approximation of the
  suffix-array duplicate-substring report ("Deduplicating Training Data
  Makes Language Models Better"): a group-by over n-gram spans instead
  of a suffix array, which Spark aggregates map-side at any scale.
- **Deterministic stratified downsampling** (``stratified_sample``):
  keep-rate per stratum (e.g. language), decided by an arithmetic hash
  of the document id, so the sample is reproducible row-for-row across
  engines, retries, and cluster sizes — no ``rand()``.

Everything stays in whole-stage codegen: the n-gram expansion is
``transform(sequence(...))`` over one ``split`` array, the benchmark
vocabulary is a broadcast semi-join (benchmark sets are small by
construction), the sample hash is integer arithmetic. No Python, no UDF,
no shuffle bigger than the final per-key aggregate. Each op ships a
DuckDB SQL twin (same arithmetic, same tokenization) for the value-hash
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Multiplicative sampling hash (Knuth): h = (id * A + B) mod 100.
# Identical int64 arithmetic in Spark and DuckDB. Domain bound: the
# product must stay inside int64, i.e. id < 2^63 / A ~= 3.5e9 — fine for
# any per-shard id; for a 10^12-row corpus hash a stable 64-bit doc key
# with a splitmix-style mixer instead (DuckDB twin would then need the
# same mixer spelled out, as hash40_sql_duckdb does for text grams).
_HASH_A = 2654435761
_HASH_B = 12345


def word_ngrams(text: Column, n: int) -> Column:
    """All positional word ``n``-grams of ``text`` (lowercased, split on
    single spaces — the corpus tokenization used across text.py/dedup.py),
    as an array of space-joined strings; empty array when the document
    has fewer than ``n`` words.

    The ``when`` guard matters: ``sequence(1, k)`` runs DESCENDING for
    k < 1 in Spark, which would fabricate grams for short docs.
    """
    words = F.split(F.lower(text), " ")
    k = F.size(words) - (n - 1)
    return F.when(
        k >= 1,
        F.transform(F.sequence(F.lit(1), k),
                    lambda i: F.concat_ws(" ", F.slice(words, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def _ngrams_cte_duckdb(rel: str, n: int, id_col: str = "doc_id",
                       text_col: str = "text",
                       extra_cols: str = "") -> str:
    """DuckDB CTE body producing (id, [extra_cols,] gram) rows identical
    to ``word_ngrams`` + explode: 1-based inclusive list slicing,
    generate_series empty when the doc is shorter than ``n`` words."""
    return (
        f"w as (select {id_col}, {extra_cols + ', ' if extra_cols else ''}"
        f"string_split(lower({text_col}), ' ') as w from {rel}),\n"
        f"g as (select {id_col}, {extra_cols + ', ' if extra_cols else ''}"
        f"len(w) - {n - 1} as n_grams,\n"
        f"       array_to_string(w[i:i+{n - 1}], ' ') as gram\n"
        f"     from w, unnest(generate_series(1, len(w) - {n - 1})) as t(i))"
    )


# ---------------------------------------------------------------------------
# 1. test-set contamination
# ---------------------------------------------------------------------------

def contamination_check(docs: DataFrame, n: int = 5, bench_mod: int = 97,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Per corpus document: total word-``n``-gram positions and how many
    of them occur anywhere in the benchmark split (documents whose id is
    divisible by ``bench_mod`` — a deterministic holdout stand-in; a real
    pipeline passes the actual benchmark table).

    Returns (id, n_grams, n_contaminated) for every corpus (non-benchmark)
    document with at least ``n`` words.

    Scale shape: the benchmark n-gram vocabulary is benchmark-sized
    (KBs-MBs even for real eval suites) → ``broadcast``; the corpus side
    is one scan → array expand → broadcast left join → map-side-combinable
    count aggregate keyed by doc id. Nothing shuffles at corpus width
    except the final per-doc agg, and the scan prunes to (id, text).
    """
    is_bench = F.pmod(F.col(id_col), F.lit(bench_mod)) == 0
    base = (docs.select(F.col(id_col), is_bench.alias("_is_bench"),
                        word_ngrams(F.col(text_col), n).alias("_grams"))
            .filter(F.size("_grams") > 0))
    bench_vocab = (base.filter(F.col("_is_bench"))
                   .select(F.explode("_grams").alias("gram"))
                   .distinct()
                   .withColumn("_hit", F.lit(1)))
    corpus = base.filter(~F.col("_is_bench"))
    exploded = corpus.select(
        id_col, F.size("_grams").alias("_n"), F.explode("_grams").alias("gram"))
    return (exploded.join(F.broadcast(bench_vocab), "gram", "left")
            .groupBy(id_col)
            .agg(F.max("_n").alias("n_grams"),
                 F.count("_hit").alias("n_contaminated")))


def contamination_sql_duckdb(rel: str, n: int = 5, bench_mod: int = 97,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> str:
    """DuckDB twin of :func:`contamination_check`."""
    return f"""
with {_ngrams_cte_duckdb(rel, n, id_col, text_col)},
bench as (select distinct gram from g where {id_col} % {bench_mod} = 0),
corpus as (select * from g where {id_col} % {bench_mod} <> 0)
select {id_col},
       max(n_grams) as n_grams,
       count(*) filter (where gram in (select gram from bench))
           as n_contaminated
from corpus
group by {id_col}
"""


# ---------------------------------------------------------------------------
# 2. duplicate-span inventory
# ---------------------------------------------------------------------------

def duplicate_span_inventory(docs: DataFrame, n: int = 8, top_k: int = 20,
                             id_col: str = "doc_id", text_col: str = "text",
                             source_col: str = "source") -> DataFrame:
    """Top-``top_k`` most-repeated word ``n``-gram spans with their
    occurrence count, distinct-document spread, and distinct-source
    spread — ordered (count desc, gram asc), a total order, so the cut is
    deterministic.

    Scale shape: one scan → expand → group-by gram (map-side partial
    aggregation absorbs the heavy repeats — the very spans we're looking
    for — before the shuffle) → TakeOrdered top-k (per-partition heaps +
    a top_k-sized driver merge, never a global sort materialization).
    """
    ex = (docs.select(F.col(id_col), F.col(source_col),
                      F.explode(word_ngrams(F.col(text_col), n)).alias("gram")))
    return (ex.groupBy("gram")
            .agg(F.count("*").alias("n_occurrences"),
                 F.countDistinct(id_col).alias("n_docs"),
                 F.countDistinct(source_col).alias("n_sources"))
            .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
            .limit(top_k))


def duplicate_span_sql_duckdb(rel: str, n: int = 8, top_k: int = 20,
                              id_col: str = "doc_id", text_col: str = "text",
                              source_col: str = "source") -> str:
    """DuckDB twin of :func:`duplicate_span_inventory`."""
    return f"""
with {_ngrams_cte_duckdb(rel, n, id_col, text_col, extra_cols=source_col)}
select gram,
       count(*) as n_occurrences,
       count(distinct {id_col}) as n_docs,
       count(distinct {source_col}) as n_sources
from g
group by gram
order by n_occurrences desc, gram asc
limit {top_k}
"""


# ---------------------------------------------------------------------------
# 3. deterministic stratified downsampling
# ---------------------------------------------------------------------------

def sample_hash(id_col: Column) -> Column:
    """Deterministic percent-bucket of a document id (0-99)."""
    return F.pmod(id_col * F.lit(_HASH_A) + F.lit(_HASH_B), F.lit(100))


def stratified_sample(docs: DataFrame, rates: dict[str, int],
                      default_rate: int = 10, id_col: str = "doc_id",
                      strat_col: str = "lang") -> DataFrame:
    """Keep each document iff its hash bucket falls under its stratum's
    keep-rate (percent). Returns ``docs`` filtered — reproducible
    row-for-row across engines, retries, and cluster sizes (no rand()),
    which is what makes downsampling decisions auditable at 100 TB.

    Pure codegen: a CASE over the stratum column and one integer
    hash — the filter pushes down to the scan alongside any other
    predicate.
    """
    return docs.filter(
        sample_hash(F.col(id_col)) < _rate_case(rates, default_rate, strat_col))


def stratified_sample_summary(docs: DataFrame, rates: dict[str, int],
                              default_rate: int = 10, id_col: str = "doc_id",
                              strat_col: str = "lang",
                              group_cols: tuple[str, ...] = ("lang", "source"),
                              ) -> DataFrame:
    """Per-(stratum, source) totals and kept counts — the audit table a
    pipeline materializes next to the sampled output."""
    kept = sample_hash(F.col(id_col)) < _rate_case(rates, default_rate,
                                                   strat_col)
    return (docs.groupBy(*group_cols)
            .agg(F.count("*").alias("n_total"),
                 F.count(F.when(kept, 1)).alias("n_kept")))


def _rate_case(rates: dict[str, int], default_rate: int,
               strat_col: str) -> Column:
    rate = F.lit(default_rate)
    for k in sorted(rates):
        rate = F.when(F.col(strat_col) == k, F.lit(rates[k])).otherwise(rate)
    return rate


def stratified_sample_sql_duckdb(rel: str, rates: dict[str, int],
                                 default_rate: int = 10,
                                 id_col: str = "doc_id",
                                 strat_col: str = "lang",
                                 group_cols: tuple[str, ...] = ("lang",
                                                                "source"),
                                 ) -> str:
    """DuckDB twin of :func:`stratified_sample_summary` (same hash, same
    CASE)."""
    case = "case " + " ".join(
        f"when {strat_col} = '{k}' then {rates[k]}" for k in sorted(rates)
    ) + f" else {default_rate} end"
    cols = ", ".join(group_cols)
    return f"""
select {cols},
       count(*) as n_total,
       count(*) filter (
           where ({id_col} * {_HASH_A} + {_HASH_B}) % 100 < {case}
       ) as n_kept
from {rel}
group by {cols}
"""

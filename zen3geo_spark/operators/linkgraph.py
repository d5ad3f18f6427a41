"""Host-level link-graph analytics: deterministic fixed-point PageRank.

Crawl pipelines rank hosts by link authority to prioritize fetch queues
and weight quality scores. Floating-point PageRank is order-dependent
(partial-aggregation sums), so a distributed run and a single-threaded
oracle drift in the low bits. Here every iteration is INTEGER
arithmetic — ranks carry 10^9 fixed-point mass, per-edge contributions
use floor division, and the damping mix is ``(85·in + …) // 100`` — so
Spark's partially-aggregated sums and DuckDB's sequential sums are
exactly equal (int64 sums are associative), and the driver's value-hash
gate holds bit-for-bit after any number of rounds.

Scale shape: the edge list broadcasts per iteration only if small; the
general plan is rank ⋈ edges on src (equi-join), groupBy dst — one
shuffle of |E| rows per round, the same cost as any iterative
Pregel-style superstep. Lineage is cut per round with
``localCheckpoint(eager=False)`` exactly like
``dedup.connected_components``, so the final plan is O(1) regardless of
iteration count (no-recompute-on-block-loss caveat documented there
applies here too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RANK_MASS = 1_000_000_000  # total fixed-point rank mass (10^9)
DAMP_NUM, DAMP_DEN = 85, 100


def synth_host_edges(spark: SparkSession, n_hosts: int = 1000) -> DataFrame:
    """Deterministic host link graph: host h links to (h·7+1), (h·13+3),
    (h·29+7) mod n (self-loops dropped, duplicates collapsed — the same
    three formulas the DuckDB twin unrolls)."""
    base = spark.range(n_hosts).selectExpr(
        "id as src",
        f"array((id*7+1) % {n_hosts}, (id*13+3) % {n_hosts}, "
        f"(id*29+7) % {n_hosts}) as dsts")
    return (base.select("src", F.explode("dsts").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct())


def synth_host_edges_sql_duckdb(n_hosts: int = 1000) -> str:
    """DuckDB twin of :func:`synth_host_edges`."""
    return f"""
select distinct src, dst from (
  select id as src, unnest([(id*7+1) % {n_hosts}, (id*13+3) % {n_hosts},
                            (id*29+7) % {n_hosts}]) as dst
  from range({n_hosts}) t(id)
) where src <> dst
"""


def pagerank_fixed_point(edges: DataFrame, n_nodes: int,
                         iters: int = 5) -> DataFrame:
    """``iters`` damped PageRank supersteps in 10^9 fixed-point integer
    arithmetic → DataFrame (node, rank_fp). Nodes are 0..n_nodes-1;
    every node must have out-degree ≥ 1 (true of the synthetic graph;
    dangling-mass redistribution would otherwise be one extra aggregate).

    r⁰ = MASS // n;  rᵗ⁺¹(v) = base + (85 · Σ_{u→v} (rᵗ(u) // deg(u))) // 100
    with base = (15 · (MASS // n)) // 100 — every op integer, every sum
    exact, both engines bit-equal.
    """
    spark = edges.sparkSession
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ed = edges.join(deg, on="src").localCheckpoint(eager=False)

    init = RANK_MASS // n_nodes
    base = ((RANK_MASS - DAMP_NUM * RANK_MASS // DAMP_DEN) // n_nodes)
    nodes = spark.range(n_nodes).withColumnRenamed("id", "node")
    ranks = nodes.withColumn("rank_fp", F.lit(init).cast("long"))

    # `div` is Spark's INTEGER division over longs (truncation; all
    # operands here are non-negative, so it equals DuckDB's floor `//`).
    # Float `/` + cast would round the low bits and break the bit-exact
    # cross-engine contract.
    for _ in range(iters):
        contrib = (ed.join(ranks.withColumnRenamed("node", "src"),
                           on="src")
                   .select("dst",
                           F.expr("rank_fp div deg").alias("c"))
                   .groupBy("dst").agg(F.sum("c").alias("in_mass")))
        ranks = (nodes.join(contrib.withColumnRenamed("dst", "node"),
                            on="node", how="left")
                 .select("node",
                         F.expr(f"cast({base} as bigint) + "
                                f"({DAMP_NUM} * coalesce(in_mass, 0))"
                                f" div {DAMP_DEN}").alias("rank_fp"))
                 .localCheckpoint(eager=False))
    return ranks


def pagerank_sql_duckdb(n_hosts: int = 1000, iters: int = 5) -> str:
    """DuckDB twin: the same supersteps unrolled as CTE levels (the
    driver-built-SQL pattern used for the trained-IVF Lloyd rounds)."""
    init = RANK_MASS // n_hosts
    base = (RANK_MASS - DAMP_NUM * RANK_MASS // DAMP_DEN) // n_hosts
    parts = [
        f"edges as ({synth_host_edges_sql_duckdb(n_hosts)})",
        "deg as (select src, count(*) as deg from edges group by src)",
        "ed as (select e.src, e.dst, d.deg from edges e "
        "join deg d using (src))",
        f"nodes as (select id as node from range({n_hosts}) t(id))",
        f"r0 as (select node, cast({init} as bigint) as rank_fp "
        f"from nodes)",
    ]
    for t in range(iters):
        parts.append(
            f"c{t} as (select ed.dst, sum(r.rank_fp // ed.deg) as in_mass "
            f"from ed join r{t} r on ed.src = r.node group by ed.dst)")
        parts.append(
            f"r{t + 1} as (select n.node, cast({base} + "
            f"({DAMP_NUM} * coalesce(c.in_mass, 0)) // {DAMP_DEN} "
            f"as bigint) as rank_fp "
            f"from nodes n left join c{t} c on n.node = c.dst)")
    return ("with " + ",\n".join(parts)
            + f"\nselect node, rank_fp from r{iters}")

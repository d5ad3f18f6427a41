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


def synth_host_edges_dense(spark: SparkSession,
                           n_hosts: int = 1000) -> DataFrame:
    """Denser deterministic variant for triangle-bearing topology: the
    pure multiplicative graph above is triangle-free at the tested
    sizes, so this adds ring (h→h+1) and chord (h→h+2) links — every
    {h, h+1, h+2} is a triangle — on top of two multiplicative hops."""
    base = spark.range(n_hosts).selectExpr(
        "id as src",
        f"array((id+1) % {n_hosts}, (id+2) % {n_hosts}, "
        f"(id*7+1) % {n_hosts}, (id*13+3) % {n_hosts}) as dsts")
    return (base.select("src", F.explode("dsts").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct())


def synth_host_edges_dense_sql_duckdb(n_hosts: int = 1000) -> str:
    """DuckDB twin of :func:`synth_host_edges_dense`."""
    return f"""
select distinct src, dst from (
  select id as src, unnest([(id+1) % {n_hosts}, (id+2) % {n_hosts},
                            (id*7+1) % {n_hosts}, (id*13+3) % {n_hosts}]) as dst
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


def bfs_hops(edges: DataFrame, n_nodes: int, seed_mod: int = 100,
             max_hops: int = 4) -> DataFrame:
    """Bounded-hop BFS over the host link graph: minimum hop distance
    from the seed set (node % seed_mod == 0) to every node reachable in
    ``max_hops`` supersteps → DataFrame (node, hop). The crawl-frontier
    shape: "everything within K clicks of the seed list".

    Scale shape: each superstep is one equi-join of the CURRENT frontier
    (not the whole reach set) against the edge list plus one anti-join
    against the settled set — |frontier| ⋈ |E| per round, the standard
    Pregel BFS cost. All arithmetic is integer, every row either exists
    or not (no FP), so the DuckDB unrolled-CTE twin matches bit-for-bit.
    Per-round ``localCheckpoint(eager=False)`` keeps the plan O(1) in
    rounds (same no-recompute caveat as ``pagerank_fixed_point``)."""
    spark = edges.sparkSession
    ed = edges.localCheckpoint(eager=False)
    dist = (spark.range(n_nodes)
            .filter(F.col("id") % seed_mod == 0)
            .select(F.col("id").alias("node"),
                    F.lit(0).cast("int").alias("hop")))
    frontier = dist
    for t in range(1, max_hops + 1):
        nxt = (ed.join(frontier.select(F.col("node").alias("src")),
                       on="src")
               .select(F.col("dst").alias("node")).distinct())
        new = (nxt.join(dist.select("node"), on="node", how="left_anti")
               .withColumn("hop", F.lit(t).cast("int"))
               .localCheckpoint(eager=False))
        dist = dist.union(new).localCheckpoint(eager=False)
        frontier = new
    return dist


def bfs_hops_sql_duckdb(n_hosts: int = 1000, seed_mod: int = 100,
                        max_hops: int = 4) -> str:
    """DuckDB twin of :func:`bfs_hops` (unrolled CTE supersteps)."""
    parts = [
        f"edges as ({synth_host_edges_sql_duckdb(n_hosts)})",
        f"d0 as (select id as node, cast(0 as int) as hop "
        f"from range({n_hosts}) t(id) where id % {seed_mod} = 0)",
        "f0 as (select node from d0)",
    ]
    for t in range(1, max_hops + 1):
        parts.append(
            f"n{t} as (select distinct e.dst as node "
            f"from edges e join f{t - 1} f on e.src = f.node)")
        parts.append(
            f"f{t} as (select n.node from n{t} n where not exists "
            f"(select 1 from d{t - 1} d where d.node = n.node))")
        parts.append(
            f"d{t} as (select * from d{t - 1} union all "
            f"select node, cast({t} as int) as hop from f{t})")
    return "with " + ",\n".join(parts) + f"\nselect node, hop from d{max_hops}"


def cocitation_pairs(edges: DataFrame, max_out_deg: int = 64,
                     min_cocite: int = 2) -> DataFrame:
    """Co-citation pairs: (a, b) host pairs linked FROM the same source,
    counted over sources → DataFrame (host_a, host_b, cocite_n). The
    related-domain / link-spam-ring signal crawl pipelines derive from
    the link graph.

    Scale shape: the self-join on src fans out quadratically in
    out-degree, so sources with out-degree > ``max_out_deg`` are dropped
    FIRST (one aggregate + semi-join) — the same hot-block guard as
    ngram_jaccard's document-frequency prefilter; a directory page
    linking 10^5 hosts would otherwise create 10^10 pairs. The pair join
    itself is an equi-join on src (bounded ≤ max_out_deg² rows per
    source), then a map-side-combinable count. All integer ⇒ bit-exact
    vs the DuckDB twin."""
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    ok = (edges.join(deg.filter(F.col("out_deg") <= max_out_deg)
                     .select("src"), on="src")
          .localCheckpoint(eager=False))
    e1 = ok.select("src", F.col("dst").alias("host_a"))
    e2 = ok.select("src", F.col("dst").alias("host_b"))
    return (e1.join(e2, on="src")
            .filter(F.col("host_a") < F.col("host_b"))
            .groupBy("host_a", "host_b")
            .agg(F.count("*").alias("cocite_n"))
            .filter(F.col("cocite_n") >= min_cocite))


def cocitation_sql_duckdb(n_hosts: int = 1000, max_out_deg: int = 64,
                          min_cocite: int = 2) -> str:
    """DuckDB twin of :func:`cocitation_pairs` (same out-degree guard)."""
    return f"""
with edges as ({synth_host_edges_sql_duckdb(n_hosts)}),
deg as (select src from edges group by src
        having count(*) <= {max_out_deg}),
ok as (select e.src, e.dst from edges e join deg d using (src))
select e1.dst as host_a, e2.dst as host_b,
       count(*) as cocite_n
from ok e1 join ok e2 using (src)
where e1.dst < e2.dst
group by 1, 2
having count(*) >= {min_cocite}
"""


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over the UNDIRECTED host
    graph → DataFrame (node, tri_n). Triangle density separates organic
    link neighborhoods from link farms (spam rings are near-cliques),
    the classic web-graph audit signal.

    Scale shape: the textbook degree-ordered orientation — every
    undirected edge is oriented from its lower-(degree, id) endpoint to
    the higher one, so each triangle is enumerated EXACTLY once (at its
    lowest-ranked corner) and the wedge fan-out per node is bounded by
    O(sqrt(|E|)) instead of max-degree: a 10^6-degree hub host emits no
    wedges at all unless its neighbors out-rank it, which at most
    O(sqrt(|E|)) of them can. Plan: two equi-joins (wedge build on u,
    closure probe on the canonical (v, w) pair) + one explode/group-by —
    no all-pairs anywhere. All integer ⇒ bit-exact vs the DuckDB twin.
    """
    und = (edges.filter(F.col("src") != F.col("dst"))
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .distinct()
           .localCheckpoint(eager=False))
    deg = (und.select(F.col("a").alias("node"))
           .unionAll(und.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count("*").alias("deg")))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    # a < b always holds, so a deg tie orients a→b on both engines.
    eo = (und.join(da, on="a").join(db, on="b")
          .select(F.when(F.col("da") <= F.col("db"), F.col("a"))
                  .otherwise(F.col("b")).alias("u"),
                  F.when(F.col("da") <= F.col("db"), F.col("b"))
                  .otherwise(F.col("a")).alias("x"))
          .localCheckpoint(eager=False))
    e1 = eo.select("u", F.col("x").alias("v"))
    e2 = eo.select("u", F.col("x").alias("w"))
    wedges = (e1.join(e2, on="u")
              .filter(F.col("v") < F.col("w")))
    tri = wedges.join(und, (F.col("v") == F.col("a"))
                      & (F.col("w") == F.col("b"))).select("u", "v", "w")
    corners = (tri.select(F.col("u").alias("node"))
               .unionAll(tri.select(F.col("v").alias("node")))
               .unionAll(tri.select(F.col("w").alias("node"))))
    return corners.groupBy("node").agg(F.count("*").alias("tri_n"))


def triangle_counts_sql_duckdb(n_hosts: int = 1000) -> str:
    """DuckDB twin of :func:`triangle_counts` (same orientation rule,
    over the dense triangle-bearing synthetic graph)."""
    return f"""
with edges as ({synth_host_edges_dense_sql_duckdb(n_hosts)}),
und as (select distinct least(src, dst) as a, greatest(src, dst) as b
        from edges where src <> dst),
deg as (select node, count(*) as deg from (
          select a as node from und union all select b from und)
        group by node),
eo as (select case when d1.deg <= d2.deg then und.a else und.b end as u,
              case when d1.deg <= d2.deg then und.b else und.a end as x
       from und join deg d1 on d1.node = und.a
                join deg d2 on d2.node = und.b),
wedges as (select e1.u, e1.x as v, e2.x as w
           from eo e1 join eo e2 on e1.u = e2.u and e1.x < e2.x),
tri as (select w1.u, w1.v, w1.w from wedges w1
        join und on w1.v = und.a and w1.w = und.b)
select node, count(*) as tri_n from (
  select u as node from tri
  union all select v from tri
  union all select w from tri)
group by node
"""


def cheapest_paths(edges: DataFrame, n_nodes: int, seed_mod: int = 100,
                   max_hops: int = 4) -> DataFrame:
    """Bounded-hop Bellman–Ford: minimum path COST (integer edge
    weights) from the seed set (node % seed_mod == 0) over paths of at
    most ``max_hops`` edges → DataFrame (node, cost). The weighted
    sibling of :func:`bfs_hops` — fetch-latency-weighted crawl routing
    instead of click distance. Edge weight is the engine-shared formula
    ``(src*31 + dst*17) % 97 + 1``.

    Scale shape: each round is one equi-join of the CURRENT distance
    table against the edge list plus a min-combine — the relax step is
    map-side combinable (partial min per partition), so shuffle volume
    per round is bounded by distinct dst nodes, not by |dist ⋈ E|.
    All integer ⇒ bit-exact vs the unrolled DuckDB twin. Per-round
    ``localCheckpoint(eager=False)`` keeps the plan O(1) in rounds."""
    spark = edges.sparkSession
    ed = (edges
          .withColumn("w", (F.col("src") * 31 + F.col("dst") * 17) % 97 + 1)
          .localCheckpoint(eager=False))
    dist = (spark.range(n_nodes)
            .filter(F.col("id") % seed_mod == 0)
            .select(F.col("id").alias("node"),
                    F.lit(0).cast("long").alias("cost")))
    for _ in range(max_hops):
        relax = (ed.join(dist.select(F.col("node").alias("src"), "cost"),
                         on="src")
                 .select(F.col("dst").alias("node"),
                         (F.col("cost") + F.col("w")).alias("cost")))
        dist = (dist.unionAll(relax)
                .groupBy("node").agg(F.min("cost").alias("cost"))
                .localCheckpoint(eager=False))
    return dist


def cheapest_paths_sql_duckdb(n_hosts: int = 1000, seed_mod: int = 100,
                              max_hops: int = 4) -> str:
    """DuckDB twin of :func:`cheapest_paths` (unrolled relax rounds)."""
    parts = [
        f"edges as ({synth_host_edges_sql_duckdb(n_hosts)})",
        "ed as (select src, dst, (src*31 + dst*17) % 97 + 1 as w "
        "from edges)",
        f"d0 as (select id as node, cast(0 as bigint) as cost "
        f"from range({n_hosts}) t(id) where id % {seed_mod} = 0)",
    ]
    for t in range(1, max_hops + 1):
        parts.append(
            f"d{t} as (select node, min(cost) as cost from ("
            f"select node, cost from d{t - 1} "
            f"union all "
            f"select e.dst as node, d.cost + e.w as cost "
            f"from ed e join d{t - 1} d on e.src = d.node) group by node)")
    return ("with " + ",\n".join(parts)
            + f"\nselect node, cost from d{max_hops}")


def kcore_peel(edges: DataFrame, k: int = 3, rounds: int = 3) -> DataFrame:
    """Bounded k-core peeling over the UNDIRECTED host graph: ``rounds``
    iterations of "drop every node with degree < k", returning the
    surviving nodes with their post-peel degree → (node, deg). The
    dense-core extraction crawl pipelines use to separate the web's
    mutually-linked center from pendant spam tendrils (full k-core =
    peel to fixpoint; bounded rounds keep the job's cost and the DuckDB
    twin's unrolling finite and is the standard big-graph compromise).

    Scale shape: each round is one degree aggregate (map-side
    combinable) + two broadcast-or-shuffle semi-joins of the edge list
    against the surviving-node set — no fanout anywhere, cost O(|E|)
    per round. Per-round ``localCheckpoint(eager=False)`` keeps the
    plan O(1) in rounds. All integer ⇒ bit-exact vs the twin."""
    und = (edges.filter(F.col("src") != F.col("dst"))
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .distinct()
           .localCheckpoint(eager=False))
    g = und
    for _ in range(rounds):
        deg = (g.select(F.col("a").alias("node"))
               .unionAll(g.select(F.col("b").alias("node")))
               .groupBy("node").agg(F.count("*").alias("deg")))
        keep = deg.filter(F.col("deg") >= k).select("node")
        g = (g.join(keep.withColumnRenamed("node", "a"), on="a",
                    how="left_semi")
             .join(keep.withColumnRenamed("node", "b"), on="b",
                   how="left_semi")
             .localCheckpoint(eager=False))
    return (g.select(F.col("a").alias("node"))
            .unionAll(g.select(F.col("b").alias("node")))
            .groupBy("node").agg(F.count("*").alias("deg")))


def kcore_sql_duckdb(n_hosts: int = 1000, k: int = 3,
                     rounds: int = 3) -> str:
    """DuckDB twin of :func:`kcore_peel` (unrolled peel rounds over the
    dense triangle-bearing synthetic graph)."""
    parts = [
        f"edges as ({synth_host_edges_dense_sql_duckdb(n_hosts)})",
        "g0 as (select distinct least(src, dst) as a, "
        "greatest(src, dst) as b from edges where src <> dst)",
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"d{t} as (select node from ("
            f"select a as node from g{t - 1} "
            f"union all select b from g{t - 1}) "
            f"group by node having count(*) >= {k})")
        parts.append(
            f"g{t} as (select g.a, g.b from g{t - 1} g "
            f"where exists (select 1 from d{t} x where x.node = g.a) "
            f"and exists (select 1 from d{t} y where y.node = g.b))")
    return ("with " + ",\n".join(parts)
            + f"\nselect node, count(*) as deg from ("
            + f"select a as node from g{rounds} "
            + f"union all select b from g{rounds}) group by node")


def hits_fixed_point(edges: DataFrame, n_nodes: int,
                     iters: int = 2) -> DataFrame:
    """Bounded HITS (Kleinberg hubs-and-authorities) in integer
    fixed-point → DataFrame (node, hub_fp, auth_fp). The directory-page
    vs destination-page separation PageRank cannot express: a crawl
    seed-list builder wants high-HUB pages (link OUT to many good
    hosts), a quality weigher wants high-AUTHORITY ones.

    Determinism: the classic L2 normalization is FP and
    order-dependent, so each half-step instead rescales by the CURRENT
    MAX score — ``s' = s_raw * SCALE // max(s_raw)`` — which is
    integer, keeps every score in [0, SCALE], and preserves the
    ranking exactly (max-norm is a valid HITS normalization; the
    principal eigenvector direction is unchanged). int64 sums are
    associative, so Spark's partial aggregates and DuckDB's sequential
    sums agree bit-for-bit.

    Scale shape: each half-step is one equi-join of the edge list
    against the score table plus a map-side-combinable sum — O(|E|)
    per round, the Pregel superstep cost — and the max is a one-row
    aggregate broadcast back via a constant-key join (never a
    driver-side collect of scores). Per-round
    ``localCheckpoint(eager=False)`` keeps the plan O(1) in rounds
    (same no-recompute caveat as :func:`pagerank_fixed_point`)."""
    spark = edges.sparkSession
    ed = edges.localCheckpoint(eager=False)
    scale = 1_000_000
    nodes = spark.range(n_nodes).withColumnRenamed("id", "node")
    hub = nodes.withColumn("hub_fp", F.lit(scale).cast("long"))

    def _rescaled(raw: DataFrame, col: str) -> DataFrame:
        mx = raw.agg(F.max("raw").alias("mx")).withColumn("k", F.lit(1))
        return (nodes.join(raw, on="node", how="left")
                .withColumn("k", F.lit(1))
                .join(F.broadcast(mx), on="k")
                .select("node",
                        F.expr(f"coalesce(raw, 0) * {scale} div mx")
                        .cast("long").alias(col)))

    for _ in range(iters):
        a_raw = (ed.join(hub.withColumnRenamed("node", "src"), on="src")
                 .groupBy(F.col("dst").alias("node"))
                 .agg(F.sum("hub_fp").alias("raw")))
        auth = _rescaled(a_raw, "auth_fp").localCheckpoint(eager=False)
        h_raw = (ed.join(auth.withColumnRenamed("node", "dst"), on="dst")
                 .groupBy(F.col("src").alias("node"))
                 .agg(F.sum("auth_fp").alias("raw")))
        hub = _rescaled(h_raw, "hub_fp").localCheckpoint(eager=False)
    return (hub.join(auth, on="node")
            .select("node", "hub_fp", "auth_fp"))


def hits_sql_duckdb(n_hosts: int = 1000, iters: int = 2) -> str:
    """DuckDB twin of :func:`hits_fixed_point` (unrolled half-steps,
    max via scalar subquery — same integer rescale)."""
    scale = 1_000_000
    parts = [
        f"edges as ({synth_host_edges_sql_duckdb(n_hosts)})",
        f"nodes as (select id as node from range({n_hosts}) t(id))",
        f"h0 as (select node, cast({scale} as bigint) as hub_fp "
        f"from nodes)",
    ]
    for t in range(iters):
        parts.append(
            f"ar{t} as (select e.dst as node, sum(h.hub_fp) as raw "
            f"from edges e join h{t} h on e.src = h.node group by e.dst)")
        parts.append(
            f"a{t + 1} as (select n.node, cast(coalesce(r.raw, 0) * {scale}"
            f" // (select max(raw) from ar{t}) as bigint) as auth_fp "
            f"from nodes n left join ar{t} r on n.node = r.node)")
        parts.append(
            f"hr{t} as (select e.src as node, sum(a.auth_fp) as raw "
            f"from edges e join a{t + 1} a on e.dst = a.node "
            f"group by e.src)")
        parts.append(
            f"h{t + 1} as (select n.node, cast(coalesce(r.raw, 0) * {scale}"
            f" // (select max(raw) from hr{t}) as bigint) as hub_fp "
            f"from nodes n left join hr{t} r on n.node = r.node)")
    return ("with " + ",\n".join(parts)
            + f"\nselect h.node, h.hub_fp, a.auth_fp "
            + f"from h{iters} h join a{iters} a on h.node = a.node")


def neighbor_jaccard(edges: DataFrame, max_deg: int = 64,
                     min_common: int = 2) -> DataFrame:
    """Neighbor-set Jaccard link similarity over the UNDIRECTED host
    graph: for host pairs sharing ≥ ``min_common`` neighbors, the exact
    (n_common, n_union) sufficient statistics → DataFrame (host_a,
    host_b, n_common, n_union). The classic link-prediction /
    mirror-site signal: two hosts cited by the same neighborhoods are
    related even if they never link each other. The integer pair IS the
    Jaccard (j = n_common / n_union) — emitting the ratio would be FP
    and break the cross-engine hash for nothing.

    Scale shape: pairs are generated through the common NEIGHBOR
    (wedge equi-join), never all-pairs, and nodes with degree >
    ``max_deg`` are dropped from the wedge-center role first — the
    same hot-block guard as :func:`cocitation_pairs`: a 10^5-degree
    hub would otherwise emit 10^10 wedges. Union size comes from the
    degree table (n_union = da + db − n_common), so no second pass
    over neighbor sets. All integer ⇒ bit-exact vs the twin."""
    und = (edges.filter(F.col("src") != F.col("dst"))
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .distinct()
           .localCheckpoint(eager=False))
    # symmetric adjacency (node, nbr)
    adj = (und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
           .unionAll(und.select(F.col("b").alias("node"),
                                F.col("a").alias("nbr"))))
    deg = adj.groupBy("node").agg(F.count("*").alias("deg"))
    ok_centers = deg.filter(F.col("deg") <= max_deg).select("node")
    cadj = adj.join(ok_centers.withColumnRenamed("node", "nbr")
                   .select(F.col("nbr")), on="nbr", how="left_semi")
    w1 = cadj.select(F.col("nbr").alias("c"), F.col("node").alias("host_a"))
    w2 = cadj.select(F.col("nbr").alias("c"), F.col("node").alias("host_b"))
    common = (w1.join(w2, on="c")
              .filter(F.col("host_a") < F.col("host_b"))
              .groupBy("host_a", "host_b")
              .agg(F.count("*").alias("n_common"))
              .filter(F.col("n_common") >= min_common))
    da = deg.select(F.col("node").alias("host_a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("host_b"), F.col("deg").alias("db"))
    return (common.join(da, on="host_a").join(db, on="host_b")
            .select("host_a", "host_b", "n_common",
                    (F.col("da") + F.col("db") - F.col("n_common"))
                    .alias("n_union")))


def neighbor_jaccard_sql_duckdb(n_hosts: int = 1000, max_deg: int = 64,
                                min_common: int = 2) -> str:
    """DuckDB twin of :func:`neighbor_jaccard` (same center guard)."""
    return f"""
with edges as ({synth_host_edges_dense_sql_duckdb(n_hosts)}),
und as (select distinct least(src, dst) as a, greatest(src, dst) as b
        from edges where src <> dst),
adj as (select a as node, b as nbr from und
        union all select b as node, a as nbr from und),
deg as (select node, count(*) as deg from adj group by node),
okc as (select node from deg where deg <= {max_deg}),
cadj as (select adj.node, adj.nbr from adj
         where exists (select 1 from okc where okc.node = adj.nbr)),
common as (
  select w1.node as host_a, w2.node as host_b, count(*) as n_common
  from cadj w1 join cadj w2 on w1.nbr = w2.nbr
  where w1.node < w2.node
  group by 1, 2
  having count(*) >= {min_common})
select c.host_a, c.host_b, c.n_common,
       d1.deg + d2.deg - c.n_common as n_union
from common c join deg d1 on d1.node = c.host_a
              join deg d2 on d2.node = c.host_b
"""


def deterministic_walks(edges: DataFrame, n_nodes: int,
                        steps: int = 4) -> DataFrame:
    """Random-walk corpus sampling over the link graph (the
    DeepWalk/node2vec preprocessing pass) made REPRODUCIBLE: one walk
    starts at every node, and step t moves to the out-neighbor
    minimizing the shared 40-bit polynomial hash of "cur|dst|t" —
    pseudo-random neighbor choice that is a pure function of the edge
    and step, so the walk corpus is identical across engines, retries,
    and cluster sizes (``rand()``-seeded samplers are not, which is why
    stratified_sample uses the same discipline).

    Per step: one equi-join walks⋈edges on the current node + one
    per-walk argmin aggregate (map-side combinable min_by) — cost
    |walks|·avg_degree rows, never materializing multi-step paths.
    Walks ending on a sink node simply stop (inner join drops them —
    mirrored by the twin). Output: (walk_id, step, node) for every
    visited position.
    """
    from zen3geo_spark.operators.dedup import gram_hash40

    spark = edges.sparkSession
    cur = spark.range(n_nodes).selectExpr("id as walk_id", "id as node")
    frames = [cur.selectExpr("walk_id", "cast(0 as int) as step", "node")]
    for t in range(1, steps + 1):
        h = gram_hash40(
            F.concat_ws("|", F.col("node").cast("string"),
                        F.col("dst").cast("string"), F.lit(str(t))), 1)
        nxt = (cur.join(edges, cur["node"] == edges["src"])
               .withColumn("_h", h)
               .groupBy("walk_id")
               .agg(F.min_by(F.col("dst"),
                             F.struct(F.col("_h"), F.col("dst")))
                    .alias("node"))
               .localCheckpoint(eager=False))
        frames.append(nxt.selectExpr(
            "walk_id", f"cast({t} as int) as step", "node"))
        cur = nxt
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def deterministic_walks_sql_duckdb(edges_sql: str, n_nodes: int,
                                   steps: int = 4) -> str:
    """DuckDB twin of :func:`deterministic_walks` (same hash, same
    (h, dst) argmin, unrolled)."""
    from zen3geo_spark.operators.dedup import hash40_sql_duckdb

    h = hash40_sql_duckdb(
        "concat(cast(w.node as varchar), '|', cast(e.dst as varchar), "
        "'|', '{t}')", 1)
    parts = [f"_e as ({edges_sql})",
             f"w0 as (select id as walk_id, id as node "
             f"from range({n_nodes}) t(id))"]
    for t in range(1, steps + 1):
        ht = h.replace("'{t}'", f"'{t}'")
        parts.append(f"""w{t} as (
      select walk_id, dst as node from (
        select w.walk_id, e.dst,
               row_number() over (partition by w.walk_id
                                  order by {ht}, e.dst) as rk
        from w{t - 1} w join _e e on w.node = e.src
      ) where rk = 1)""")
    sels = " union all ".join(
        f"select walk_id, cast({t} as int) as step, node from w{t}"
        for t in range(steps + 1))
    return "with " + ",\n".join(parts) + "\n" + sels


def resolve_redirects(edges: DataFrame, rounds: int = 5) -> DataFrame:
    """HTTP redirect-chain resolution — the canonical-URL fixup every
    crawl ingest runs (Common Crawl resolves 3xx chains before
    indexing). ``edges`` = (src, dst) with AT MOST one outgoing edge
    per src (a page redirects to one target); returns (src, final,
    hops) following each chain to its non-redirecting terminal.

    Pointer DOUBLING, not step-by-step walking: each round composes the
    mapping with itself (one self-equi-join on the unique src key +
    hop-count addition), so chains of length L resolve in ⌈log2 L⌉
    rounds — 5 rounds cover 32-hop chains at any corpus size, and each
    round's join is skew-free (unique keys both sides). Per-round
    ``localCheckpoint`` keeps the final plan O(1) in round count.
    Cycles (redirect loops) never terminate semantically; after
    ``rounds`` doublings a loop member reports 2^rounds accumulated
    hops — callers cap/flag on that sentinel (mirrored by the twin).
    """
    m = edges.selectExpr("src", "dst as nxt", "cast(1 as long) as hops")
    for _ in range(rounds):
        m2 = m.selectExpr("src as _j_src", "nxt as _j_nxt",
                          "hops as _j_hops")
        m = (m.join(m2, m["nxt"] == m2["_j_src"], "left")
             .selectExpr("src",
                         "coalesce(_j_nxt, nxt) as nxt",
                         "hops + coalesce(_j_hops, 0) as hops")
             .localCheckpoint(eager=False))
    return m.selectExpr("src", "nxt as final", "hops")

"""Fixed-point PageRank (operators/linkgraph.py)."""

import duckdb

from zen3geo_spark.operators.linkgraph import (
    DAMP_DEN, DAMP_NUM, RANK_MASS, pagerank_fixed_point, pagerank_sql_duckdb,
    synth_host_edges,
)


def _py_pagerank(n, iters):
    """Single-threaded pure-Python reference (same integer recurrence)."""
    edges = set()
    for h in range(n):
        for d in ((h * 7 + 1) % n, (h * 13 + 3) % n, (h * 29 + 7) % n):
            if d != h:
                edges.add((h, d))
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = (RANK_MASS - DAMP_NUM * RANK_MASS // DAMP_DEN) // n
    r = [RANK_MASS // n] * n
    for _ in range(iters):
        in_mass = [0] * n
        for s, d in edges:
            in_mass[d] += r[s] // deg[s]
        r = [base + (DAMP_NUM * m) // DAMP_DEN for m in in_mass]
    return r


def test_pagerank_matches_python_reference(spark):
    n, iters = 200, 4
    edges = synth_host_edges(spark, n_hosts=n)
    got = {r["node"]: r["rank_fp"]
           for r in pagerank_fixed_point(edges, n_nodes=n,
                                         iters=iters).collect()}
    want = _py_pagerank(n, iters)
    assert got == {i: want[i] for i in range(n)}


def test_pagerank_mass_and_spread(spark):
    """Floor division only ever LOSES mass (≤ 1 unit per div), so total
    rank stays within n·iters-ish of the initial mass; and the graph is
    non-regular enough that ranks actually differentiate."""
    n = 300
    edges = synth_host_edges(spark, n_hosts=n)
    rows = pagerank_fixed_point(edges, n_nodes=n, iters=5).collect()
    total = sum(r["rank_fp"] for r in rows)
    assert total <= RANK_MASS
    assert total >= RANK_MASS - 10 * n * 5  # lost < a few units/node/iter
    assert len({r["rank_fp"] for r in rows}) > 10


def test_pagerank_duckdb_twin_small(spark):
    """Cross-engine bit-equality at a non-default size/iteration count
    (the driver gate covers 1000×5)."""
    n, iters = 120, 3
    got = sorted(
        (r["node"], r["rank_fp"])
        for r in pagerank_fixed_point(synth_host_edges(spark, n),
                                      n_nodes=n, iters=iters).collect())
    want = sorted(duckdb.sql(pagerank_sql_duckdb(n, iters)).fetchall())
    assert got == want


def test_pagerank_final_plan_constant_in_iters(spark):
    """Per-round localCheckpoint cuts lineage: the executed plan of the
    8-iteration run is no deeper than the 2-iteration run's."""
    n = 50
    def plan_len(iters):
        df = pagerank_fixed_point(synth_host_edges(spark, n), n, iters)
        return len(df._jdf.queryExecution().executedPlan().toString()
                   .splitlines())
    assert plan_len(8) <= plan_len(2) + 5


def _py_bfs(n, seed_mod, max_hops):
    edges = {}
    for h in range(n):
        for d in ((h * 7 + 1) % n, (h * 13 + 3) % n, (h * 29 + 7) % n):
            if d != h:
                edges.setdefault(h, set()).add(d)
    dist = {v: 0 for v in range(n) if v % seed_mod == 0}
    frontier = set(dist)
    for t in range(1, max_hops + 1):
        nxt = {d for s in frontier for d in edges.get(s, ())} - set(dist)
        for v in nxt:
            dist[v] = t
        frontier = nxt
    return dist


def test_bfs_hops_matches_python_reference(spark):
    from zen3geo_spark.operators.linkgraph import bfs_hops
    n = 300
    got = {r["node"]: r["hop"]
           for r in bfs_hops(synth_host_edges(spark, n), n_nodes=n,
                             seed_mod=50, max_hops=3).collect()}
    assert got == _py_bfs(n, 50, 3)


def test_bfs_hops_min_distance_and_monotone(spark):
    """hop is the MINIMUM distance: every node at hop t>0 has an
    in-neighbor at hop t-1 and none at < t-1."""
    from zen3geo_spark.operators.linkgraph import bfs_hops
    n = 200
    dist = {r["node"]: r["hop"]
            for r in bfs_hops(synth_host_edges(spark, n), n_nodes=n,
                              seed_mod=100, max_hops=4).collect()}
    py = _py_bfs(n, 100, 4)
    assert dist == py
    for v, h in dist.items():
        if h == 0:
            assert v % 100 == 0
        else:
            preds = [s for s in range(n)
                     if v in ((s * 7 + 1) % n, (s * 13 + 3) % n,
                              (s * 29 + 7) % n) and s != v]
            assert min(dist.get(p, 10 ** 9) for p in preds) == h - 1


def test_bfs_hops_duckdb_twin(spark):
    import duckdb as _dd
    from zen3geo_spark.operators.linkgraph import (
        bfs_hops, bfs_hops_sql_duckdb,
    )
    n = 150
    got = sorted((r["node"], r["hop"])
                 for r in bfs_hops(synth_host_edges(spark, n), n_nodes=n,
                                   seed_mod=30, max_hops=3).collect())
    want = sorted(_dd.sql(bfs_hops_sql_duckdb(n, 30, 3)).fetchall())
    assert got == want


def test_cocitation_matches_python_reference(spark):
    from zen3geo_spark.operators.linkgraph import cocitation_pairs
    n = 400
    edges = set()
    for h in range(n):
        for d in ((h * 7 + 1) % n, (h * 13 + 3) % n, (h * 29 + 7) % n):
            if d != h:
                edges.add((h, d))
    from collections import defaultdict
    out = defaultdict(set)
    for s, d in edges:
        out[s].add(d)
    counts = defaultdict(int)
    for s, ds in out.items():
        if len(ds) > 64:
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                counts[(ds[i], ds[j])] += 1
    want = {k: v for k, v in counts.items() if v >= 2}
    got = {(r["host_a"], r["host_b"]): r["cocite_n"]
           for r in cocitation_pairs(
               synth_host_edges(spark, n), max_out_deg=64,
               min_cocite=2).collect()}
    assert got == want


def test_cocitation_out_degree_guard(spark):
    """A directory-page source with out-degree above the cap contributes
    NO pairs (the quadratic hot block is dropped, not truncated)."""
    from pyspark.sql import functions as F
    from zen3geo_spark.operators.linkgraph import cocitation_pairs
    hub = spark.range(10).select(
        F.lit(999).alias("src"), F.col("id").alias("dst"))
    small = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 2), (4, 3)], "src long, dst long")
    got = {(r["host_a"], r["host_b"]): r["cocite_n"]
           for r in cocitation_pairs(hub.union(small), max_out_deg=5,
                                     min_cocite=2).collect()}
    assert got == {(2, 3): 2}


def _py_edges(n):
    """Python twin of synth_host_edges_dense (the triangle-bearing graph)."""
    es = set()
    for h in range(n):
        for d in ((h + 1) % n, (h + 2) % n, (h * 7 + 1) % n,
                  (h * 13 + 3) % n):
            if d != h:
                es.add((h, d))
    return es


def _py_triangles(n):
    """Brute-force per-node triangle counts over the undirected graph."""
    und = {(min(a, b), max(a, b)) for a, b in _py_edges(n)}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for a, b in und:
        for c in adj[a] & adj[b]:
            if c > b:  # each triangle once: a < b < c
                for v in (a, b, c):
                    counts[v] = counts.get(v, 0) + 1
    return counts


def test_triangle_counts_match_brute_force(spark):
    from zen3geo_spark.operators.linkgraph import (
        synth_host_edges_dense, triangle_counts,
    )

    n = 300
    got = {r["node"]: r["tri_n"]
           for r in triangle_counts(
               synth_host_edges_dense(spark, n)).collect()}
    want = _py_triangles(n)
    assert got == want
    assert sum(got.values()) % 3 == 0 and got  # 3 corners per triangle


def test_triangle_duckdb_twin_matches(spark):
    from zen3geo_spark.operators.linkgraph import (
        triangle_counts, triangle_counts_sql_duckdb,
    )

    from zen3geo_spark.operators.linkgraph import synth_host_edges_dense

    n = 240
    got = sorted(
        (r["node"], r["tri_n"])
        for r in triangle_counts(
            synth_host_edges_dense(spark, n)).collect())
    want = sorted(map(tuple, duckdb.sql(
        triangle_counts_sql_duckdb(n_hosts=n)).fetchall()))
    assert got == want


def test_cheapest_paths_match_brute_force(spark):
    """Pure-Python bounded Bellman-Ford over the same graph/weights."""
    from zen3geo_spark.operators.linkgraph import cheapest_paths

    n, seed_mod, hops = 200, 40, 4
    es = set()
    for h in range(n):
        for d in ((h * 7 + 1) % n, (h * 13 + 3) % n, (h * 29 + 7) % n):
            if d != h:
                es.add((h, d))
    dist = {v: 0 for v in range(n) if v % seed_mod == 0}
    for _ in range(hops):
        nxt = dict(dist)
        for s, d in es:
            if s in dist:
                c = dist[s] + (s * 31 + d * 17) % 97 + 1
                if d not in nxt or c < nxt[d]:
                    nxt[d] = c
        dist = nxt
    edges = synth_host_edges(spark, n_hosts=n)
    got = {r["node"]: r["cost"]
           for r in cheapest_paths(edges, n_nodes=n, seed_mod=seed_mod,
                                   max_hops=hops).collect()}
    assert got == dist
    # weighted min-cost never exceeds any single sampled path cost and
    # seeds stay at 0
    assert all(got[v] == 0 for v in range(0, n, seed_mod))


def test_kcore_peel_matches_brute_force(spark):
    """Pure-Python peel over the same dense graph; cascading removal."""
    from zen3geo_spark.operators.linkgraph import (
        kcore_peel, synth_host_edges_dense,
    )

    n, k, rounds = 300, 8, 3
    und = set()
    for h in range(n):
        for d in ((h + 1) % n, (h + 2) % n, (h * 7 + 1) % n,
                  (h * 13 + 3) % n):
            if d != h:
                und.add((min(h, d), max(h, d)))
    g = set(und)
    for _ in range(rounds):
        deg = {}
        for a, b in g:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, c in deg.items() if c >= k}
        g = {(a, b) for a, b in g if a in keep and b in keep}
    want = {}
    for a, b in g:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    got = {r["node"]: r["deg"]
           for r in kcore_peel(synth_host_edges_dense(spark, n),
                               k=k, rounds=rounds).collect()}
    assert got == want
    assert 0 < len(got) < n  # the peel actually removed something


def test_hits_matches_python_reference(spark):
    """Pure-Python HITS with the same integer max-norm recurrence."""
    from zen3geo_spark.operators.linkgraph import hits_fixed_point

    n, iters, scale = 200, 2, 1_000_000
    edges = set()
    for h in range(n):
        for d in ((h * 7 + 1) % n, (h * 13 + 3) % n, (h * 29 + 7) % n):
            if d != h:
                edges.add((h, d))
    hub = [scale] * n
    auth = [0] * n
    for _ in range(iters):
        raw = [0] * n
        for s, d in edges:
            raw[d] += hub[s]
        mx = max(raw)
        auth = [r * scale // mx for r in raw]
        raw = [0] * n
        for s, d in edges:
            raw[s] += auth[d]
        mx = max(raw)
        hub = [r * scale // mx for r in raw]
    got = {r["node"]: (r["hub_fp"], r["auth_fp"])
           for r in hits_fixed_point(
               synth_host_edges(spark, n), n_nodes=n, iters=iters).collect()}
    assert got == {i: (hub[i], auth[i]) for i in range(n)}
    assert max(v[0] for v in got.values()) == scale  # max-norm hit its cap


def test_hits_hub_vs_authority_separation(spark):
    """A pure directory page (links out, no in-links) must score hub>0,
    auth=0; a pure destination the reverse."""
    from zen3geo_spark.operators.linkgraph import hits_fixed_point

    rows = [(0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    edges = spark.createDataFrame(rows, "src: long, dst: long")
    got = {r["node"]: (r["hub_fp"], r["auth_fp"])
           for r in hits_fixed_point(edges, n_nodes=4, iters=2).collect()}
    assert got[0][1] == 0 and got[0][0] > 0   # pure hub
    assert got[1][1] == 0 and got[1][0] > 0
    assert got[3][0] == 0 and got[3][1] > 0   # pure authority (no out-links)


def test_neighbor_jaccard_matches_brute_force(spark):
    from zen3geo_spark.operators.linkgraph import (
        neighbor_jaccard, synth_host_edges_dense,
    )

    n, max_deg, min_common = 300, 64, 2
    und = set()
    for h in range(n):
        for d in ((h + 1) % n, (h + 2) % n, (h * 7 + 1) % n,
                  (h * 13 + 3) % n):
            if d != h:
                und.add((min(h, d), max(h, d)))
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    ok = {v for v, s in nbrs.items() if len(s) <= max_deg}
    want = {}
    from itertools import combinations
    for c in ok:
        for x, y in combinations(sorted(nbrs[c]), 2):
            want[(x, y)] = want.get((x, y), 0) + 1
    want = {
        p: (c, len(nbrs[p[0]]) + len(nbrs[p[1]]) - c)
        for p, c in want.items() if c >= min_common
    }
    got = {(r["host_a"], r["host_b"]): (r["n_common"], r["n_union"])
           for r in neighbor_jaccard(
               synth_host_edges_dense(spark, n), max_deg=max_deg,
               min_common=min_common).collect()}
    assert got == want
    assert all(c <= u for c, u in got.values())


def test_neighbor_jaccard_hot_center_guard(spark):
    """A star hub above max_deg contributes no wedges through itself."""
    from zen3geo_spark.operators.linkgraph import neighbor_jaccard

    rows = [(99, i) for i in range(10)]  # hub 99, degree 10
    edges = spark.createDataFrame(rows, "src: long, dst: long")
    out = neighbor_jaccard(edges, max_deg=5, min_common=1).collect()
    assert out == []  # only possible wedge center is the hub, guarded off


def test_deterministic_walks_follow_edges_and_repeat(spark):
    from zen3geo_spark.operators.linkgraph import (
        deterministic_walks, synth_host_edges,
    )

    edges = synth_host_edges(spark, 50)
    eset = {(r.src, r.dst) for r in edges.collect()}
    out = deterministic_walks(edges, n_nodes=50, steps=3)
    rows = {(r.walk_id, r.step): r.node for r in out.collect()}
    # every step moves along a real edge
    for (wid, step), node in rows.items():
        if step == 0:
            assert node == wid
        else:
            assert (rows[(wid, step - 1)], node) in eset
    # rerun is bit-identical (reproducibility is the whole point)
    again = {(r.walk_id, r.step): r.node
             for r in deterministic_walks(edges, 50, steps=3).collect()}
    assert again == rows


def test_resolve_redirects_chains_and_cycle_sentinel(spark):
    from zen3geo_spark.operators.linkgraph import resolve_redirects

    # chain 5->4->3->2->1->0 (0 terminal), plus a 2-cycle 10<->11
    edges = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 2), (2, 1), (1, 0), (10, 11), (11, 10)],
        "src long, dst long")
    out = {r.src: (r.final, r.hops)
           for r in resolve_redirects(edges, rounds=4).collect()}
    assert out[5] == (0, 5) and out[1] == (0, 1) and out[3] == (0, 3)
    # cycle members report the 2^rounds hop sentinel (never terminal)
    assert out[10][1] == 16 and out[11][1] == 16

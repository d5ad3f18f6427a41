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

"""As-of join (operators/temporal.py) and count-min sketch
(functions/sketch.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from zen3geo_spark.operators.temporal import asof_join


def test_asof_join_golden(spark):
    """Hand-checked backward as-of: equal-ts matches inclusively (>=),
    no-prior-row → NULLs, per-key isolation."""
    left = spark.createDataFrame(
        [(1, 5, "l5"), (1, 10, "l10"), (1, 20, "l20"), (2, 7, "l7")],
        "k long, ts long, lv string")
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 15, "r15"), (2, 99, "r99")],
        "k long, ts long, rv string")
    got = {(r["k"], r["ts"]): (r["rv_r"], r["ts_r"])
           for r in asof_join(left, right, keys=["k"]).collect()}
    assert got == {
        (1, 5): (None, None),        # nothing at or before 5
        (1, 10): ("r10", 10),        # equal ts matches (>=)
        (1, 20): ("r15", 15),        # latest prior, not first
        (2, 7): (None, None),        # key isolation: r99 is later
    }


def test_asof_join_matches_duckdb_asof(spark):
    """Randomized series vs DuckDB's native ASOF LEFT JOIN."""
    left = [(i % 7, (i * 37) % 1000, i) for i in range(300)]
    right = [(i % 7, (i * 53 + 11) % 1000, 1000 + i) for i in range(150)]
    ldf = spark.createDataFrame(left, "k long, ts long, lid long")
    rdf = spark.createDataFrame(right, "k long, ts long, rid long")
    got = sorted(
        (r["k"], r["ts"], r["lid"], r["rid_r"])
        for r in asof_join(ldf, rdf, keys=["k"]).collect())
    con = duckdb.connect()
    con.execute("create table l (k bigint, ts bigint, lid bigint)")
    con.execute("create table r (k bigint, ts bigint, rid bigint)")
    con.executemany("insert into l values (?,?,?)", left)
    con.executemany("insert into r values (?,?,?)", right)
    want = sorted(con.execute(
        "select l.k, l.ts, l.lid, r.rid from l asof left join r "
        "on l.k = r.k and l.ts >= r.ts").fetchall())
    assert got == want


def test_asof_join_single_shuffle_plan(spark):
    """The whole as-of is ONE exchange on the key (union is plan-level;
    the window sorts in-partition) — no range join, no nested loop."""
    ldf = spark.range(100).selectExpr("id % 5 as k", "id as ts", "id as lid")
    rdf = spark.range(50).selectExpr("id % 5 as k", "id * 2 as ts",
                                     "id as rid")
    plan = (asof_join(ldf, rdf, keys=["k"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1


def test_count_min_properties(spark):
    """CM guarantees: est ≥ true for every present token, bounded size,
    unseen tokens estimate 0 (width ≫ distinct vocab here, so the d
    independent cells can't all collide)."""
    from zen3geo_spark.functions.sketch import (
        corpus_tokens, count_min_build, count_min_estimate,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta " + ("gamma " * (i % 3))) for i in range(50)],
        "doc_id long, text string")
    sketch = count_min_build(docs, depth=4, width=256)
    cells = sketch.collect()
    assert len(cells) <= 4 * 256
    # total per row j == total token count (sketch conserves mass)
    tot = corpus_tokens(docs).count()
    per_row = {r["j"]: r["s"] for r in
               sketch.groupBy("j").agg(F.sum("cnt").alias("s")).collect()}
    assert per_row == {j: tot for j in range(4)}

    probes = spark.createDataFrame(
        [("alpha",), ("gamma",), ("zzz_unseen",)], "token string")
    est = {r["token"]: r["est"] for r in
           count_min_estimate(sketch, probes, depth=4, width=256).collect()}
    true = {r["token"]: r["cnt"] for r in
            corpus_tokens(docs).groupBy("token")
            .agg(F.count("*").alias("cnt")).collect()}
    assert est["alpha"] >= true["alpha"]
    assert est["gamma"] >= true["gamma"]
    assert est["zzz_unseen"] == 0
    # 3 distinct tokens in 256 buckets: no collisions, estimates exact
    assert est["alpha"] == true["alpha"]
    assert est["gamma"] == true["gamma"]


def test_count_min_cells_match_duckdb(spark):
    """The sketch GRID itself (not just estimates) is engine-portable:
    every (j, bucket, cnt) cell hash-matches the DuckDB build."""
    from zen3geo_spark.functions.sketch import count_min_build

    rows = [(i, f"tok{i % 11} tok{i % 7} shared") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 count_min_build(docs, depth=3, width=64).collect())
    con = duckdb.connect()
    con.execute("create table d (doc_id bigint, text varchar)")
    con.executemany("insert into d values (?,?)", rows)
    from zen3geo_spark.operators.dedup import hash40_sql_duckdb
    h1, h2 = hash40_sql_duckdb("token", 1), hash40_sql_duckdb("token", 2)
    want = sorted(con.execute(f"""
        with toks as (select unnest(string_split(lower(text), ' ')) as token
                      from d),
        hashed as (select {h1} as h1, {h2} as h2 from toks
                   where token <> ''),
        cells as (select j, (h1 + j * h2) % 64 as bucket
                  from hashed,
                       (select unnest(generate_series(0, 2)) as j))
        select j, bucket, count(*) from cells group by j, bucket
    """).fetchall())
    assert got == want


def test_interval_join_equals_theta_join(spark):
    """Bucketized range join == direct theta join, including events on
    exact boundaries (start inclusive, end exclusive), overlapping
    intervals (multi-match), and unmatched events/intervals."""
    import datetime as dt

    from pyspark.sql import functions as F

    from zen3geo_spark.operators.temporal import interval_join

    t0 = dt.datetime(2024, 3, 1)
    evs = [(i, t0 + dt.timedelta(seconds=137 * i + (i % 3) * 0.25))
           for i in range(400)]
    ivs = [(k, t0 + dt.timedelta(seconds=900 * k),
            t0 + dt.timedelta(seconds=900 * k + 1800 + (k % 2) * 600))
           for k in range(40)]  # every pair of neighbors overlaps
    # boundary probes: exactly at a start and exactly at an end
    evs += [(1000, ivs[3][1]), (1001, ivs[5][2])]
    ev = spark.createDataFrame(evs, "event_id long, ts timestamp")
    iv = spark.createDataFrame(
        ivs, "interval_id long, start_ts timestamp, end_ts timestamp")

    got = sorted((r.event_id, r.interval_id) for r in interval_join(
        ev, iv, bucket_secs=700).select("event_id", "interval_id").collect())
    want = sorted((e, k) for e, ts in evs for k, s, t in ivs if s <= ts < t)
    assert got == want
    assert (1000, 3) in got and all(p != (1001, 5) for p in got)
    assert any(len([1 for g in got if g[0] == e]) > 1 for e, _ in evs)


def test_scd2_compact_golden(spark):
    """Hand-built history: runs collapse, inclusive valid_to, the open
    current interval carries the key's max ordinal."""
    from zen3geo_spark.operators.temporal import scd2_compact

    rows = [
        # url A: 5,5,7,7,5 → [0,1]=5 [2,3]=7 [4,4]=5
        ("A", 0, 5), ("A", 1, 5), ("A", 2, 7), ("A", 3, 7), ("A", 4, 5),
        # url B: constant → one open interval [0,2]
        ("B", 0, 9), ("B", 1, 9), ("B", 2, 9),
        # url C: single observation
        ("C", 7, 1),
    ]
    obs = spark.createDataFrame(rows, "url string, epoch long, v long")
    got = sorted(map(tuple, scd2_compact(obs, "url", "epoch", "v")
                     .collect()))
    assert got == sorted([
        ("A", 5, 0, 1), ("A", 7, 2, 3), ("A", 5, 4, 4),
        ("B", 9, 0, 2),
        ("C", 1, 7, 7),
    ])


def test_scd2_compact_single_exchange(spark):
    """Both windows ride ONE url-keyed Exchange (shared partitioning)."""
    from zen3geo_spark.operators.temporal import scd2_compact

    obs = spark.createDataFrame(
        [("A", 0, 5), ("A", 1, 6)], "url string, epoch long, v long")
    plan = scd2_compact(obs, "url", "epoch", "v") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1


def test_cusum_closed_form_equals_sequential_recurrence(spark):
    """The prefix-sum-minus-running-min rewrite must equal the textbook
    sequential recurrence C_t = max(0, C_{t-1} + d_t) exactly."""
    from zen3geo_spark.operators.temporal import cusum_screen

    vals = [10, 10, 11, 9, 10, 16, 17, 18, 15, 10, 4, 3, 10]
    rows = [(1, t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, t long, v long")
    out = {r.t: (r.c_plus, r.c_minus)
           for r in cusum_screen(df, "k", "t", "v", drift_k=1,
                                 threshold=-1).collect()}
    mu = sum(vals) // len(vals)
    cp = cm = 0
    for t, v in enumerate(vals):
        cp = max(0, cp + v - mu - 1)
        cm = max(0, cm + mu - v - 1)
        assert out[t] == (cp, cm), t


def test_cusum_flags_sustained_shift_not_noise(spark):
    """A level shift of +3 for 6 epochs crosses the alarm; alternating
    ±1 noise around the mean never accumulates."""
    from zen3geo_spark.operators.temporal import cusum_screen

    shifted = [10] * 10 + [13] * 6 + [10] * 4
    noisy = [10 + (1 if t % 2 else -1) for t in range(20)]
    rows = ([(1, t, v) for t, v in enumerate(shifted)]
            + [(2, t, v) for t, v in enumerate(noisy)])
    df = spark.createDataFrame(rows, "k long, t long, v long")
    out = cusum_screen(df, "k", "t", "v", drift_k=1, threshold=4).collect()
    assert {r.k for r in out} == {1}
    assert all(r.t >= 12 for r in out)  # alarm fires during the shift


def test_merge_upsert_actions_golden(spark):
    from zen3geo_spark.operators.temporal import merge_upsert

    base = spark.createDataFrame(
        [("a", "en", 1), ("b", "de", 2), ("c", "ja", 3)],
        "url string, lang string, band long")
    upd = spark.createDataFrame(
        [("b", 10, "U", "de2", 5),     # update
         ("c", 10, "D", "x", 0),       # delete
         ("d", 10, "U", "fr", 7),      # insert
         ("e", 10, "D", "x", 0)],      # delete of absent key: no-op
        "url string, ord long, op string, lang string, band long")
    out = {r.url: (r.lang, r.band, r.action)
           for r in merge_upsert(base, upd, "url", "ord").collect()}
    assert out == {"a": ("en", 1, "keep"),
                   "b": ("de2", 5, "update"),
                   "d": ("fr", 7, "insert")}


def test_merge_upsert_last_op_wins_collapse(spark):
    """Several ops per key in one batch: greatest ord wins; an ord tie
    resolves by the struct's lexicographic order (deterministic)."""
    from zen3geo_spark.operators.temporal import merge_upsert

    base = spark.createDataFrame([("a", "en", 1), ("b", "de", 2)],
                                 "url string, lang string, band long")
    upd = spark.createDataFrame(
        [("a", 1, "U", "v1", 5), ("a", 2, "D", "x", 0),   # later D wins
         ("b", 1, "D", "x", 0), ("b", 2, "U", "v2", 6),   # later U wins
         ("b", 2, "U", "v3", 7)],                         # tie: 'v3' > 'v2'
        "url string, ord long, op string, lang string, band long")
    out = {r.url: (r.lang, r.band, r.action)
           for r in merge_upsert(base, upd, "url", "ord").collect()}
    assert out == {"b": ("v3", 7, "update")}


def test_snapshot_as_of_golden(spark):
    import duckdb
    from zen3geo_spark.operators.temporal import (
        snapshot_as_of, snapshot_as_of_sql_duckdb,
    )
    log_rows = [
        ("a", 1, "U", "en", 1), ("a", 5, "U", "de", 2), ("a", 9, "D", "de", 2),
        ("b", 2, "U", "ja", 3), ("b", 8, "U", "ja", 4),
        ("c", 7, "D", "en", 0), ("c", 10, "U", "ms", 5),
    ]
    log = spark.createDataFrame(
        log_rows, "k string, ord long, op string, lang string, band long")
    got = sorted((r.version, r.k, r.lang, r.band) for r in
                 snapshot_as_of(log, "k", "ord", [4, 8, 12],
                                ["lang", "band"]).collect())
    assert got == [
        (4, "a", "en", 1), (4, "b", "ja", 3),
        (8, "a", "de", 2), (8, "b", "ja", 4),
        (12, "b", "ja", 4), (12, "c", "ms", 5),
    ]
    vals = ", ".join(str(t) for t in log_rows)
    duck = sorted(duckdb.sql(snapshot_as_of_sql_duckdb(
        f"select * from (values {vals}) t(k, ord, op, lang, band)",
        "k", "ord", [4, 8, 12], ["lang", "band"])).fetchall())
    assert duck == got


def test_funnel_ordering_constraint(spark):
    import duckdb
    from zen3geo_spark.operators.temporal import (
        funnel_counts, funnel_counts_sql,
    )
    rows = [
        # u1: full ordered chain
        (1, "2024-01-01 00:00:00", "signup"),
        (1, "2024-01-01 01:00:00", "click"),
        (1, "2024-01-01 02:00:00", "purchase"),
        # u2: purchase BEFORE click -> stops at click
        (2, "2024-01-01 00:00:00", "signup"),
        (2, "2024-01-01 00:30:00", "purchase"),
        (2, "2024-01-01 01:00:00", "click"),
        # u3: never signed up -> counts nowhere
        (3, "2024-01-01 00:00:00", "click"),
        (3, "2024-01-01 01:00:00", "purchase"),
        # u4: signup only
        (4, "2024-01-01 05:00:00", "signup"),
    ]
    ev = spark.createDataFrame(
        [(u, t, e) for u, t, e in rows],
        "user_id long, ts string, event_type string").selectExpr(
        "user_id", "cast(ts as timestamp) as ts", "event_type")
    got = {r.stage: r.n_users for r in funnel_counts(
        ev, ["signup", "click", "purchase"]).collect()}
    assert got == {"signup": 3, "click": 2, "purchase": 1}
    vals = ", ".join(f"({u}, timestamp '{t}', '{e}')" for u, t, e in rows)
    duck = dict((s, n) for _, s, n in duckdb.sql(funnel_counts_sql(
        f"(select * from (values {vals}) t(user_id, ts, event_type))",
        ["signup", "click", "purchase"])).fetchall())
    assert duck == got

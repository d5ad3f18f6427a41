"""Custom stateful streaming operator: state carries across micro-batches
and across separate availableNow runs."""

import pytest
from pyspark.sql import functions as F

from zen3geo_spark.streaming.stateful import latest_totals, run_stateful


def test_stateful_running_totals_across_runs(spark, tmp_path):
    ev_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    first = ev.filter(F.col("event_id") < 500)
    second = ev.filter((F.col("event_id") >= 500) & (F.col("event_id") < 900))

    first.write.mode("overwrite").parquet(ev_dir)
    run_stateful(spark, ev_dir, out_dir, ck)
    got1 = {r["user_id"]: (r["n_events"], r["total_value"])
            for r in latest_totals(spark, out_dir).collect()}
    exp1 = {r["user_id"]: (r["n"], r["s"]) for r in
            first.groupBy("user_id").agg(
                F.count("*").alias("n"), F.sum("value").alias("s")).collect()}
    assert set(got1) == set(exp1)
    for u in exp1:
        assert got1[u][0] == exp1[u][0]
        assert got1[u][1] == pytest.approx(exp1[u][1], rel=1e-9)

    # second incremental run: state CONTINUES (totals = first+second)
    second.write.mode("append").parquet(ev_dir)
    run_stateful(spark, ev_dir, out_dir, ck)
    got2 = {r["user_id"]: (r["n_events"], r["total_value"])
            for r in latest_totals(spark, out_dir).collect()}
    both = first.unionByName(second)
    exp2 = {r["user_id"]: (r["n"], r["s"]) for r in
            both.groupBy("user_id").agg(
                F.count("*").alias("n"), F.sum("value").alias("s")).collect()}
    assert set(got2) == set(exp2)
    for u in exp2:
        assert got2[u][0] == exp2[u][0]
        assert got2[u][1] == pytest.approx(exp2[u][1], rel=1e-9)


def test_streaming_dedup_keep_first_across_runs(spark, tmp_path):
    """Streaming exact dedup: only the first doc per fingerprint is
    admitted, within a run AND across a later incremental run."""
    from zen3geo_spark.streaming.stateful import run_streaming_dedup

    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "dedup_out")
    ck = str(tmp_path / "dedup_ck")

    rows1 = [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha  beta ")]
    rows2 = [(4, "alpha beta"), (5, "epsilon zeta"), (6, "gamma delta")]
    spark.createDataFrame(rows1, "doc_id long, text string") \
        .write.mode("overwrite").parquet(docs_dir)
    run_streaming_dedup(spark, docs_dir, out_dir, ck)
    got1 = {r["fp"]: r["keep_id"] for r in spark.read.parquet(out_dir).collect()}
    # doc 3 normalizes to doc 1's content (whitespace collapse) -> 2 fps
    assert sorted(got1.values()) == [1, 2]

    spark.createDataFrame(rows2, "doc_id long, text string") \
        .write.mode("append").parquet(docs_dir)
    run_streaming_dedup(spark, docs_dir, out_dir, ck)
    got2 = {r["fp"]: r["keep_id"] for r in spark.read.parquet(out_dir).collect()}
    # only the genuinely new content (doc 5) was admitted in run 2
    assert sorted(got2.values()) == [1, 2, 5]


def test_streaming_lsh_candidates_across_runs(spark, tmp_path):
    """Bucket anchors persist in the state store: an exact/near duplicate
    arriving in a LATER availableNow run pairs against the first run's
    anchor; in-run duplicates pair within their first batch."""
    import pandas as pd

    from zen3geo_spark.streaming.stateful import run_streaming_lsh

    docs_dir, out_dir = tmp_path / "docs", tmp_path / "cand"
    ckpt = tmp_path / "ckpt"
    docs_dir.mkdir()
    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta",
        1: "one two three four five six seven eight nine",
        2: "one two three four five six seven eight nine",  # dup of 1
        3: "completely different content with unique words entirely",
    }
    pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}
                 ).to_parquet(docs_dir / "part0.parquet", index=False)
    run_streaming_lsh(spark, str(docs_dir), str(out_dir), str(ckpt))
    got1 = {(r["a_id"], r["b_id"])
            for r in spark.read.parquet(str(out_dir)).distinct().collect()}
    assert (1, 2) in got1
    # second run: a duplicate of doc 0 arrives later
    pd.DataFrame({"doc_id": [100],
                  "text": [texts[0]]}).to_parquet(
        docs_dir / "part1.parquet", index=False)
    run_streaming_lsh(spark, str(docs_dir), str(out_dir), str(ckpt))
    got2 = {(r["a_id"], r["b_id"])
            for r in spark.read.parquet(str(out_dir)).distinct().collect()}
    assert (0, 100) in got2       # paired against the run-1 anchor
    assert got1 <= got2

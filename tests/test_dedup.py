

def test_incremental_neardup_flags(spark):
    from zen3geo_spark.operators.dedup import incremental_neardup_flags

    base = "the quick brown fox jumps over the lazy dog again and again"
    old = spark.createDataFrame(
        [(0, base), (2, "completely different content about spark plans")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, base),                                  # exact dup of old 0
         (3, base + " tail"),                        # near-dup of old 0
         (5, "unrelated fresh text nothing shared whatsoever here")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["collided"] for r in incremental_neardup_flags(
        old, new, num_hashes=8, bands=4, shingle_n=2).collect()}
    assert got[1] == 1
    assert got[3] == 1   # shares at least one band with old 0
    assert got[5] == 0
    assert len(got) == 3  # every new doc gets a row


def test_cluster_keep_best_highest_score_then_lowest_id(spark):
    from zen3geo_spark.operators.dedup import cluster_keep_best

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7), (9, 9)],
        "node long, component long")
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5),   # comp 1 → node 2 (best score)
         (7, 0.4), (8, 0.4),             # comp 7 → tie, keep node 7
         (9, 0.1)],                      # singleton keeps itself
        "node long, score double")
    got = sorted((r["component"], r["node"], r["score"])
                 for r in cluster_keep_best(comp, scores).collect())
    assert got == [(1, 2, 0.9), (7, 7, 0.4), (9, 9, 0.1)]

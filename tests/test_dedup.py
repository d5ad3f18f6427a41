

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



def test_semdedup_marks_planted_near_dups(spark):
    """Identical vectors land in one cluster and the higher ids point
    at the min-id survivor; an orthogonal vector is kept."""
    import numpy as np
    from pyspark.sql import Row

    from ocr_inference_spark.dedup import semdedup

    rng = np.random.RandomState(7)
    rows = []
    shared = rng.randn(8).astype("float32")
    for i in range(3):  # three copies of the same vector
        rows.append(Row(vec_id=i, embedding=[float(x) for x in shared]))
    ortho = np.zeros(8, dtype="float32")
    ortho[0] = 1.0
    # orthogonal to nothing in particular but dissimilar to `shared`
    rows.append(Row(vec_id=10, embedding=[float(x) for x in ortho - shared * 0]))
    for i in range(11, 30):  # background noise vectors
        rows.append(
            Row(vec_id=i, embedding=[float(x) for x in rng.randn(8)])
        )
    df = spark.createDataFrame(rows)
    out = {r["vec_id"]: r for r in semdedup(df, k=4, threshold=0.95).collect()}
    assert len(out) == len(rows)  # every row reported
    assert out[0]["dup_of"] is None  # min-id survivor kept
    assert out[1]["dup_of"] == 0 and out[2]["dup_of"] == 0
    assert (
        out[0]["cluster_id"] == out[1]["cluster_id"] == out[2]["cluster_id"]
    )
    assert out[10]["dup_of"] is None  # dissimilar vector kept

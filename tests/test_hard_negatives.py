"""Hard-negative mining (operators/similarity.py hard_negatives)."""

from pyspark.sql import functions as F

from bruin_spark.operators import similarity as S


def test_hard_negatives_labels_differ_and_rank_by_cosine(spark):
    import bench

    emb = bench.planted_mixture_embeddings(spark, n=256).withColumn(
        "label", (F.col("vec_id") % 4).cast("int")
    )
    queries = emb.filter("vec_id % 16 = 0").withColumnRenamed("vec_id", "query_id")
    out = S.hard_negatives(emb, queries, k=5, n_centroids=8, n_probe=2)
    rows = out.collect()
    assert rows
    qlabels = {r["query_id"]: r["label"] for r in queries.collect()}
    by_q = {}
    for r in rows:
        assert r["nn_label"] != qlabels[r["query_id"]]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        cos = [r["cosine"] for r in rs]
        assert cos == sorted(cos, reverse=True), q
        assert len(rs) <= 5


def test_hard_negatives_agree_with_filtered_bruteforce_on_probed_cells(spark):
    """Within the probed cells the result IS the filtered exact top-k:
    compare against cosine_topk restricted to different-label vectors
    when n_probe = n_centroids (probe everything -> exact)."""
    import bench

    emb = bench.planted_mixture_embeddings(spark, n=128).withColumn(
        "label", (F.col("vec_id") % 3).cast("int")
    )
    queries = emb.filter("vec_id % 16 = 0").withColumnRenamed("vec_id", "query_id")
    got = {
        (r["query_id"], r["rank"]): r["nn_id"]
        for r in S.hard_negatives(
            emb, queries, k=3, n_centroids=4, n_probe=4
        ).collect()
    }
    exact_all = S.cosine_topk(emb, queries, k=128)
    qlab = queries.select(F.col("query_id").alias("qid"), F.col("label").alias("ql"))
    clab = emb.select(F.col("vec_id").alias("nn_id"), F.col("label").alias("cl"))
    from pyspark.sql.window import Window

    filtered = (
        exact_all.join(qlab, exact_all["query_id"] == qlab["qid"])
        .join(clab, "nn_id")
        .filter(F.col("cl") != F.col("ql"))
        .withColumn(
            "r2",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cosine").desc(), F.col("nn_id")
                )
            ),
        )
        .filter(F.col("r2") <= 3)
    )
    want = {(r["query_id"], r["r2"]): r["nn_id"] for r in filtered.collect()}
    assert got == want

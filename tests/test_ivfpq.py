"""IVF-PQ (IVFADC / IVFADC+R, Jégou et al. 2011) quality and shape
gates — operators/similarity.py ivf_pq_topk."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bruin_spark.operators import similarity as S


def _planted(spark, n=512):
    import bench

    emb = bench.planted_mixture_embeddings(spark, n=n)
    queries = emb.filter("vec_id % 16 = 0").withColumnRenamed("vec_id", "query_id")
    return emb, queries


def _recall(approx, exact):
    return approx.join(exact, ["query_id", "nn_id"]).count() / exact.count()


def test_ivfpq_rerank_recall_gate(spark):
    """On separable planted clusters, the +R stage recovers what PQ
    quantization error loses: ADC top-32 re-ranked exactly clears 0.9
    recall at m=8 (measured 0.95), and even the coarse m=4 config
    clears 0.8 (measured ~0.84).  A broken cell assignment, residual,
    or ADC table craters these to <0.4."""
    emb, queries = _planted(spark)
    exact = S.cosine_topk(emb, queries, k=5).select("query_id", "nn_id")
    a8 = S.ivf_pq_topk(
        emb, queries, k=5, n_centroids=8, n_probe=2, m=8, n_codes=16, rerank=32
    ).select("query_id", "nn_id")
    assert _recall(a8, exact) >= 0.9
    a4 = S.ivf_pq_topk(
        emb, queries, k=5, n_centroids=8, n_probe=2, m=4, n_codes=16, rerank=32
    ).select("query_id", "nn_id")
    assert _recall(a4, exact) >= 0.8


def test_ivfpq_candidates_confined_to_probed_cells(spark):
    """Every returned neighbor lives in one of the query's n_probe
    nearest cells — the inverted-file contract that caps candidate
    cost at ~n_probe/n_centroids of the corpus."""
    emb, queries = _planted(spark, n=256)
    out = S.ivf_pq_topk(emb, queries, k=5, n_centroids=8, n_probe=2)
    corpus_u = S.with_unit_vectors(emb)
    cents = S.deterministic_centroids(corpus_u, 8)
    assigned = S.ivf_assign(corpus_u, cents).select(
        F.col("vec_id").alias("nn_id"), F.col("centroid_id").alias("nn_cell")
    )
    qs_u = S.with_unit_vectors(queries)
    q_assign = (
        qs_u.join(F.broadcast(cents))
        .withColumn("_s", S._dot(F.col("unit_vec"), F.col("centroid_vec")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("_s").desc(), F.col("centroid_id")
                )
            ),
        )
        .filter(F.col("_rn") <= 2)
        .select("query_id", F.col("centroid_id").alias("probe_cell"))
    )
    joined = out.join(assigned, "nn_id").join(
        q_assign,
        (out["query_id"] == q_assign["query_id"])
        & (F.col("nn_cell") == F.col("probe_cell")),
        "left_semi",
    )
    assert joined.count() == out.count()


def test_ivfpq_rerank_orders_by_exact_cosine(spark):
    """Under rerank, ranks are a descending exact-cosine order and the
    cosine values match a direct computation."""
    emb, queries = _planted(spark, n=256)
    out = S.ivf_pq_topk(
        emb, queries, k=5, n_centroids=8, n_probe=2, rerank=16
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    exact_u = {
        r["vec_id"]: r["unit_vec"]
        for r in S.with_unit_vectors(emb).select("vec_id", "unit_vec").collect()
    }
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        cos = [r["cosine"] for r in rows]
        assert cos == sorted(cos, reverse=True), q
        for r in rows:
            want = round(
                sum(a * b for a, b in zip(exact_u[q], exact_u[r["nn_id"]])), 6
            )
            assert abs(r["cosine"] - want) < 1e-6, (q, r["nn_id"])

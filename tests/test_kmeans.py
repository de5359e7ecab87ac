"""Tests for the distributed spherical k-means training loop."""

import math

from pyspark.sql import functions as F

from bruin_spark.operators.similarity import ivf_assign, ivf_topk, kmeans_train


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, unit_vec array<double>")


def test_kmeans_converges_to_cluster_directions(spark):
    s = 1 / math.sqrt(2)
    # two tight angular clusters: near +x and near +y
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.995, 0.0998]),   # ~6 degrees off +x
        (2, [0.995, -0.0998]),
        (3, [0.0, 1.0]),
        (4, [0.0998, 0.995]),
        (5, [-0.0998, 0.995]),
    ]
    df = _vecs(spark, rows)
    cents = kmeans_train(df, n_centroids=2, n_iter=4)
    got = {r["centroid_id"]: r["centroid_vec"] for r in cents.collect()}
    assert len(got) == 2
    # each trained centroid is unit-norm and aligned with one cluster
    dirs = sorted((round(v[0], 2), round(v[1], 2)) for v in got.values())
    for v in got.values():
        assert abs(math.hypot(*v) - 1.0) < 1e-9
    assert dirs[0][1] > 0.9  # +y cluster
    assert dirs[1][0] > 0.9  # +x cluster

    # assignment under the trained centroids recovers the clusters
    assigned = ivf_assign(df, cents)
    groups = {}
    for r in assigned.collect():
        groups.setdefault(r["centroid_id"], set()).add(r["vec_id"])
    assert sorted(map(sorted, groups.values())) == [[0, 1, 2], [3, 4, 5]]
    assert abs(s) > 0  # keep the import honest


def test_kmeans_keeps_empty_cell_centroid(spark):
    # 3 centroids over 2 real clusters: the seed centroid that loses all
    # members must survive with its previous vector, not vanish
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.995, 0.0998]),
        (2, [0.0, 1.0]),
        (3, [0.0998, 0.995]),
    ]
    df = _vecs(spark, rows)
    cents = kmeans_train(df, n_centroids=3, n_iter=3)
    assert cents.count() == 3
    assert all(r["centroid_vec"] is not None for r in cents.collect())


def test_ivf_topk_with_training_matches_bruteforce_on_separated_data(spark):
    import random

    rng = random.Random(7)
    corpus = []
    for i in range(40):
        base = [1.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0]
        corpus.append((i, [b + rng.uniform(-0.05, 0.05) for b in base]))
    cdf = spark.createDataFrame(corpus, "vec_id bigint, embedding array<double>")
    qdf = spark.createDataFrame(
        [(100, [1.0, 0.02, 0.0])], "query_id bigint, embedding array<double>"
    )
    out = ivf_topk(cdf, qdf, k=3, n_centroids=2, n_probe=1, train_iters=3).collect()
    assert len(out) == 3
    # with trained centroids and 1 probe, every neighbor comes from the
    # +x cluster (even ids)
    assert all(r["nn_id"] % 2 == 0 for r in out)


def test_quantize_embeddings_roundtrip_error_bound(spark):
    from pyspark.sql import functions as F

    from bruin_spark.operators.similarity import quantize_embeddings

    rows = [
        (1, [0.0, 0.5, 1.0]),
        (2, [-2.0, 0.0, 2.0]),
        (3, [3.0, 3.0, 3.0]),  # constant vector
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert out[1]["qvec"] == [0, 127, 255]
    assert out[3]["qvec"] == [0, 0, 0]  # vmax == vmin guard
    # dequantization error bounded by one bucket width
    for rid, vec in rows:
        r = out[rid]
        width = (r["vmax"] - r["vmin"]) / 255 if r["vmax"] > r["vmin"] else 0
        for orig, q in zip(vec, r["qvec"]):
            deq = r["vmin"] + q * width
            assert abs(deq - orig) <= width + 1e-12
    # map-only plan
    plan = quantize_embeddings(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_ivf_recall_gate(spark, sf_dir):
    """IVF quality gate: recall@K vs exact brute force on the serving
    batch must clear the bench floor (bench.IVF_MIN_RECALL). The floor
    is regression-shaped — near-random synthetic embeddings cap the
    ceiling, but a broken cell assignment craters recall to ~0.1."""
    import bench
    from bruin_spark.operators import similarity as S
    from bruin_spark.workloads.similarity import (
        K,
        N_CENTROIDS,
        N_PROBE,
        QUERY_MOD,
        _emb,
    )

    emb = _emb(spark, sf_dir)
    queries = (
        emb.filter(f"vec_id % {QUERY_MOD} = 0")
        .orderBy("vec_id")
        .limit(64)
        .withColumnRenamed("vec_id", "query_id")
    )
    exact = S.cosine_topk(emb, queries, k=K).select("query_id", "nn_id")
    approx = S.ivf_topk(
        emb, queries, k=K, n_centroids=N_CENTROIDS, n_probe=N_PROBE
    ).select("query_id", "nn_id")
    recall = approx.join(exact, ["query_id", "nn_id"]).count() / exact.count()
    assert recall >= bench.IVF_MIN_RECALL, recall


def test_ivf_recall_planted_mixture(spark):
    """Planted Gaussian-mixture gate (r8 verdict ask #5): on separable
    data whose true neighbors are in-cluster by construction, a correct
    IVF recovers essentially every exact neighbor — recall >= 0.9 here
    is a MEANINGFUL regression detector, unlike the near-random corpus
    above whose structural ceiling (~0.6) could hide a subtle
    cell-assignment bug that still clears 0.45.  Smaller n than the
    bench fixture for test speed; same construction/seed."""
    import bench
    from bruin_spark.operators import similarity as S

    emb = bench.planted_mixture_embeddings(spark, n=512)
    queries = emb.filter("vec_id % 16 = 0").withColumnRenamed("vec_id", "query_id")
    exact = S.cosine_topk(emb, queries, k=5).select("query_id", "nn_id")
    approx = S.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=2).select(
        "query_id", "nn_id"
    )
    recall = approx.join(exact, ["query_id", "nn_id"]).count() / exact.count()
    assert recall >= bench.IVF_PLANTED_MIN_RECALL, recall


# -- product quantization + ADC --------------------------------------------------


def test_pq_encode_seed_vectors_self_code(spark):
    """A codebook seed vector encodes to its own code in every
    subspace (its subspace distance to itself is exactly 0)."""
    import random

    from bruin_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
        with_unit_vectors,
    )

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    df = with_unit_vectors(
        spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    ).select("vec_id", "unit_vec")
    cb = pq_codebooks(df, m=2, n_codes=4)
    codes = {r["vec_id"]: r["codes"] for r in pq_encode(df, cb, m=2).collect()}
    assert len(codes) == 30 and all(len(c) == 2 for c in codes.values())
    # seeds are the 4 lowest ids, code = rank by id
    for rank, vid in enumerate(sorted(codes)[:4]):
        assert codes[vid] == [rank, rank], vid


def test_pq_adc_scores_match_hand_computation(spark):
    """ADC distance == sum over subspaces of the query-to-assigned-code
    L2^2, computed by hand from the same codebooks."""
    import math
    import random

    from bruin_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
        with_unit_vectors,
    )

    rng = random.Random(9)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(20)]
    df = with_unit_vectors(
        spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    ).select("vec_id", "unit_vec")
    cb = pq_codebooks(df, m=3, n_codes=5)
    codes_df = pq_encode(df, cb, m=3)
    queries = df.filter("vec_id = 7").withColumnRenamed("vec_id", "query_id")
    got = pq_adc_topk(codes_df, cb, queries, m=3, k=20).collect()
    assert len(got) == 20 and [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == list(range(1, 21))

    cbl = {(r["j"], r["code"]): r["code_vec"] for r in cb.collect()}
    unit = {r["vec_id"]: r["unit_vec"] for r in df.collect()}
    codes = {r["vec_id"]: r["codes"] for r in codes_df.collect()}

    def sub(v, j):
        s = len(v) // 3
        return v[j * s : (j + 1) * s]

    q = unit[7]
    for r in got:
        want = sum(
            sum((a - b) ** 2 for a, b in zip(sub(q, j), cbl[(j, codes[r["nn_id"]][j])]))
            for j in range(3)
        )
        assert math.isclose(r["adc_dist"], round(want, 6), abs_tol=2e-6)


def test_d4_prototype_prune(spark):
    """Per-cluster prototype pruning: at least prune_frac of every
    cluster goes, ties prune together, and the flag is exactly the
    threshold comparison (operators/similarity.py d4_prototype_prune)."""
    import numpy as np

    from bruin_spark.operators.similarity import d4_prototype_prune

    rng = np.random.RandomState(7)
    rows = [
        (i, (rng.randn(8) + (i % 4) * 3.0).tolist())  # 4 loose clusters
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = d4_prototype_prune(df, n_centroids=4, prune_frac=0.25).collect()
    assert len(out) == 200
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        pruned = [r for r in members if not r["keep"]]
        kept = [r for r in members if r["keep"]]
        # at least a quarter of the cluster is pruned...
        assert len(pruned) >= 0.25 * len(members) - 1e-9, cid
        # ...and it is exactly the HIGH-cosine (prototypical) tail
        if kept and pruned:
            assert max(r["proto_cos"] for r in kept) < min(
                r["proto_cos"] for r in pruned
            )

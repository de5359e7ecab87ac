"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Dot products run as ``aggregate(zip_with(...))`` built-ins (JVM-side,
  codegen). The k-selection is a window row_number per query — at scale
  replace the global window with a per-partition top-k + re-merge (AQE
  keeps the shuffle small since only k rows per partition survive).
- ``lsh_topk``: the scale path — random-hyperplane LSH bucketing; only
  vectors sharing a bucket are scored. Hyperplanes are derived
  deterministically from md5 so results are reproducible.
- ``embedding_near_dup``: near-duplicate pairs above a cosine threshold,
  LSH-bucketed candidate generation at scale.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F

from bruin_spark.checkpointing import materialize, release


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding", out: str = "unit_vec") -> DataFrame:
    """Pre-normalize once so cosine becomes a plain dot product.

    The norm is materialized as its own column before the divide: nesting
    the aggregate expression inside the transform lambda would re-evaluate
    it per element AND trips ANSI-mode codegen on the nested lambda
    binding. Zero vectors normalize to zero vectors (cosine 0).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    tmp = "__bruin_norm"
    return (
        df.withColumn(tmp, _norm(v))
        .withColumn(
            out,
            F.transform(
                v,
                lambda x: F.when(F.col(tmp) == 0, F.lit(0.0)).otherwise(x / F.col(tmp)),
            ),
        )
        .drop(tmp)
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact, O(n²) — baseline only;
    use embedding_near_dup's LSH path at scale)."""
    u = with_unit_vectors(df, vec_col).select(F.col(id_col).alias("id"), "unit_vec")
    return (
        u.alias("a")
        .join(u.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(_dot(F.col("a.unit_vec"), F.col("b.unit_vec")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k nearest neighbours (cosine) for each query vector."""
    corpus = with_unit_vectors(df, vec_col).select(F.col(id_col).alias("nn_id"), F.col("unit_vec").alias("cv"))
    qs = with_unit_vectors(queries, vec_col).select(
        F.col(query_id_col).alias("query_id"), F.col("unit_vec").alias("qv")
    )
    scored = (
        F.broadcast(qs)
        .crossJoin(corpus)
        .select(
            "query_id",
            "nn_id",
            F.round(_dot(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 (no RNG state).

    Component p[i][j] ∈ {-1, +1} from one md5 bit — sign-random
    projections are enough for cosine LSH.
    """
    planes = []
    for i in range(n_planes):
        vals = []
        j = 0
        while len(vals) < dim:
            digest = hashlib.md5(f"plane:{i}:{j}".encode()).digest()
            for byte in digest:
                for b in range(8):
                    if len(vals) >= dim:
                        break
                    vals.append(1.0 if (byte >> b) & 1 else -1.0)
            j += 1
        planes.append(vals)
    return planes


def lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    out: str = "bucket",
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1), map-only.

    Pass ``dim`` (the embedding dimensionality) to keep plan building
    action-free; without it a one-row probe infers it — a driver
    round-trip per plan build that a pipeline on a busy cluster should
    avoid."""
    if dim is None:
        probe = df.select(vec_col).first()
        if probe is None or probe[0] is None:
            raise ValueError(
                f"cannot infer embedding dimension: {vec_col!r} is empty or "
                "NULL in the first row (filter nulls upstream, or pass dim=)"
            )
        dim = len(probe[0])
    planes = _hyperplanes(dim, n_planes)
    bucket = F.lit(0)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(p) for p in plane])
        bit = F.when(_dot(v, arr) > 0, F.lit(2**i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return df.withColumn(out, bucket)


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's bucket.

    With b buckets this cuts scored candidates ~b×; recall is tunable via
    n_planes (fewer planes → bigger buckets → higher recall).
    """
    corpus = lsh_bucket(with_unit_vectors(df, vec_col), vec_col, n_planes, dim=dim).select(
        F.col(id_col).alias("nn_id"), F.col("unit_vec").alias("cv"), "bucket"
    )
    qs = lsh_bucket(with_unit_vectors(queries, vec_col), vec_col, n_planes, dim=dim).select(
        F.col(query_id_col).alias("query_id"), F.col("unit_vec").alias("qv"), "bucket"
    )
    scored = (
        F.broadcast(qs)
        .join(corpus, "bucket")
        .select("query_id", "nn_id", F.round(_dot(F.col("qv"), F.col("cv")), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "cosine", "rank")
    )


def embedding_near_dup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 4,
    exact: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold).

    exact=True: full O(n²) scoring (baseline / oracle parity).
    exact=False: LSH-bucketed — pairs must share a bucket; at 8 planes a
    0.95-cosine pair collides with probability ≈ (1 - θ/π)^8 ≈ 0.72 per
    table, so production use unions a few plane-sets; here one set keeps
    the example simple.
    """
    if exact:
        return cosine_pairs(df, id_col, vec_col, threshold)
    u = lsh_bucket(with_unit_vectors(df, vec_col), vec_col, n_planes, dim=dim).select(
        F.col(id_col).alias("id"), "unit_vec", "bucket"
    )
    return (
        u.alias("a")
        .join(u.alias("b"), (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(_dot(F.col("a.unit_vec"), F.col("b.unit_vec")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    threshold: float = 0.9,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then compare vectors
    ONLY within a cluster — a vector is a semantic duplicate when a
    SMALLER-id vector in its cluster has cosine ≥ threshold, and the
    min-id qualifying neighbor is recorded as its ``dup_of``.

    Returns one row per vector:
    (id, cluster_id, keep, dup_of, dup_cos) — keep=false iff dup_of set.

    100 TB shape: the quadratic term is bounded by the largest CLUSTER,
    never the corpus — production scales n_centroids with corpus size so
    clusters stay bounded, exactly as SemDeDup does on LAION.  The
    within-cluster self-join is a plain equi-join on cluster id (AQE
    splits a skewed cluster), assignment is the broadcast max_by argmax
    shared with the IVF index, and dup selection is a map-side-
    combinable min(struct) — no windows, no driver loops.
    """
    u = with_unit_vectors(df, vec_col).select(F.col(id_col).alias("id"), "unit_vec")
    cents = deterministic_centroids(u, n_centroids, id_col="id")
    # the assignment subtree is referenced three times below (both
    # self-join sides + the final left join) with DIFFERENT column
    # pruning, which defeats exchange reuse — materialize it so the
    # corpus scan and the broadcast argmax run once.  materialize (not
    # .cache()): a cache entry lives in the CacheManager until an
    # explicit unpersist, so a long-lived session would accumulate one
    # corpus-sized MEMORY_AND_DISK entry per distinct input, and the
    # returned lazy plan would silently depend on the entry staying
    # alive.  Checkpointed blocks are released by the ContextCleaner
    # when the result is garbage collected; lineage visibility for plan
    # audits comes from the sweep's checkpoint_scope("none") mode.
    assigned = materialize(ivf_assign(u, cents, id_col="id"), eager=True)
    a = assigned.select("id", "unit_vec", "centroid_id")
    pairs = (
        a.alias("x")
        .join(
            a.alias("y"),
            (F.col("x.centroid_id") == F.col("y.centroid_id"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("y.id").alias("id"),
            F.col("x.id").alias("cand"),
            F.round(_dot(F.col("x.unit_vec"), F.col("y.unit_vec")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    # min over (cand, cos): cand is unique per (id, cand) pair, so the
    # struct min is the smallest qualifying neighbor with ITS cosine
    dups = pairs.groupBy("id").agg(
        F.min(F.struct(F.col("cand"), F.col("cos"))).alias("_d")
    )
    return (
        assigned.join(dups, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("centroid_id").alias("cluster_id"),
            F.col("_d").isNull().alias("keep"),
            F.col("_d.cand").alias("dup_of"),
            F.col("_d.cos").alias("dup_cos"),
        )
    )


def d4_prototype_prune(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    prune_frac: float = 0.25,
) -> DataFrame:
    """D4-style density/prototype pruning (Tirumala et al. 2023,
    arXiv:2308.12284 — SemDeDup then SSL-prototype pruning): within
    each embedding cluster, drop the ``prune_frac`` most PROTOTYPICAL
    examples — the points with the highest cosine to their own
    centroid carry the least marginal information once near-duplicates
    are gone, and removing them measurably improves LM data quality in
    the paper.

    Returns one row per vector: ``(id_col, cluster_id, proto_cos,
    keep)`` with ``keep = proto_cos < thr`` where ``thr`` is the
    cluster's discrete ``1 - prune_frac`` quantile of the ROUND-6
    centroid cosine (ties prune together, so at least ``prune_frac``
    of each cluster goes).

    100 TB shape: assignment is the shared broadcast max_by argmax
    (:func:`ivf_assign`); the per-cluster threshold is ONE
    percentile_approx aggregate over k clusters (constant-size GK
    summaries — no per-cluster sort, no window over the corpus) joined
    back broadcast.  Composes after :func:`semantic_dedup` exactly as
    D4 prescribes: dedup first, then prune prototypes of what remains.
    """
    u = with_unit_vectors(df, vec_col).select(F.col(id_col).alias("id"), "unit_vec")
    cents = deterministic_centroids(u, n_centroids, id_col="id")
    assigned = ivf_assign(u, cents, id_col="id")
    # the scored subtree feeds BOTH the threshold aggregate and the
    # final join — materialize it so the corpus scan + assignment run
    # once (same rationale as semantic_dedup's assignment cut)
    scored = materialize(
        assigned.join(F.broadcast(cents), "centroid_id").select(
            "id",
            "centroid_id",
            F.round(
                _dot(F.col("unit_vec"), F.col("centroid_vec")), 6
            ).alias("proto_cos"),
        ),
        eager=True,
    )
    # accuracy >> n makes percentile_approx return EXACTLY the discrete
    # quantile element (DuckDB quantile_disc), so the entry stays a
    # full-hash oracle; the summaries stay constant-size at any scale
    thr = scored.groupBy("centroid_id").agg(
        F.percentile_approx(
            "proto_cos", F.lit(1.0 - float(prune_frac)), F.lit(10_000_000)
        ).alias("_thr")
    )
    return scored.join(F.broadcast(thr), "centroid_id").select(
        F.col("id").alias(id_col),
        F.col("centroid_id").alias("cluster_id"),
        F.col("proto_cos"),
        (F.col("proto_cos") < F.col("_thr")).alias("keep"),
    )


# -- IVF (inverted-file) ANN --------------------------------------------------


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "unit_vec",
    id_col: str = "vec_id",
    cent_id: str = "centroid_id",
    cent_vec: str = "centroid_vec",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine; ties break
    toward the smaller centroid id, which must be numeric).

    Centroids broadcast (they're small by construction); the argmax is a
    ``max_by`` aggregation, so partial (map-side) aggregation collapses
    the k-per-vector scored rows to ONE row per vector before the
    shuffle — a window argmax would shuffle and sort the full
    corpus x centroids frame instead.
    """
    others = [c for c in df.columns if c != id_col]
    scored = df.join(F.broadcast(centroids)).withColumn(
        "_score", _dot(F.col(vec_col), F.col(cent_vec))
    )
    tie_key = F.struct(F.col("_score"), (-F.col(cent_id)).alias("_neg"))
    agged = scored.groupBy(id_col).agg(
        F.max_by(F.col(cent_id), tie_key).alias(cent_id),
        *[F.first(F.col(c)).alias(c) for c in others],
    )
    return agged.select(*df.columns, cent_id)


def deterministic_centroids(
    df: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "unit_vec",
) -> DataFrame:
    """Pick the n lowest-id vectors as centroids.

    Deterministic and oracle-reproducible. Production swaps this for
    k-means|| (pyspark.ml.clustering.KMeans) — the index structure and
    probe path below are unchanged.
    """
    return (
        df.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out: str = "qvec",
) -> DataFrame:
    """Per-vector int8-range scalar quantization: 4x smaller embedding
    storage — at 100 TB the difference between embeddings fitting in the
    page cache or not.

    ``q[i] = least(255, floor((v[i] - vmin) * 255 / (vmax - vmin)))``
    with the per-vector ``vmin`` / ``vmax`` kept alongside for
    dequantization (``v ≈ vmin + q * (vmax - vmin) / 255``).  floor, not
    round: only exact range endpoints land on integer boundaries, so the
    assignment is engine-exact (IEEE double ops in a fixed order).
    Map-only built-in array expressions — zero Python, zero shuffle.
    A constant vector (vmax == vmin) quantizes to all zeros.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vmin, vmax = F.array_min(v), F.array_max(v)
    df = (
        df.withColumn("_v", v)
        .withColumn("vmin", vmin)
        .withColumn("vmax", vmax)
    )
    scale = F.col("vmax") - F.col("vmin")
    q = F.when(
        scale == 0.0,
        F.transform(F.col("_v"), lambda x: F.lit(0).cast("int")),
    ).otherwise(
        F.transform(
            F.col("_v"),
            lambda x: F.least(
                F.lit(255), F.floor((x - F.col("vmin")) * 255.0 / scale).cast("int")
            ).cast("int"),
        )
    )
    return df.withColumn(out, q).drop("_v")


def kmeans_train(
    df: DataFrame,
    n_centroids: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "unit_vec",
) -> DataFrame:
    """Distributed spherical k-means (Lloyd) -> (centroid_id, centroid_vec).

    The IVF training loop: init with deterministic_centroids, then per
    iteration (a) assign via ivf_assign — broadcast centroids + max_by,
    so the k-scored rows collapse map-side to one row per vector before
    the shuffle — and (b) update via posexplode -> per-(centroid, dim)
    mean (wordcount-shaped agg, partial map-side) -> re-assembled,
    re-normalized array.  Per-iteration cost is two shuffles whose rows
    are |corpus| and k x dim; centroids stay a k-row DataFrame,
    materialized per round (checkpointing.materialize: localCheckpoint
    by default, durable checkpoint(dir) in 'reliable' mode) so plan
    lineage stays flat.  A cell that loses all members
    keeps its previous centroid (left join + coalesce), matching
    standard empty-cluster handling.
    """
    # required=True: cents is referenced by BOTH the assignment join and
    # the empty-cluster fallback (left join + coalesce) each round, and
    # the loop is iterative — in 'none' checkpoint mode the uncut plan
    # would double per iteration (the CC/BPE exponential-growth class)
    cents = materialize(
        deterministic_centroids(df, n_centroids, id_col, vec_col),
        eager=True,
        required=True,
    )
    for _ in range(n_iter):
        assigned = ivf_assign(df, cents, vec_col=vec_col, id_col=id_col)
        dims = (
            assigned.select("centroid_id", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("val").alias("m"))
        )
        means = (
            dims.groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda x: x["m"]
                ).alias("_mean_vec")
            )
            .withColumn("_mean_norm", _norm(F.col("_mean_vec")))
            .withColumn(
                "_new_vec",
                # zero-mean guard (opposing members cancel exactly): keep
                # the raw mean instead of dividing to NaN, matching
                # with_unit_vectors' zero-norm behavior. The norm is
                # materialized as a COLUMN first: an aggregate HOF nested
                # inside the transform lambda would re-sum the whole
                # vector per element (O(dim^2)) and trips ANSI-mode
                # codegen (same hazard with_unit_vectors documents).
                F.transform(
                    F.col("_mean_vec"),
                    lambda v: F.when(F.col("_mean_norm") == 0.0, v).otherwise(
                        v / F.col("_mean_norm")
                    ),
                ),
            )
        )
        prev = cents
        cents = materialize(
            cents.join(means, "centroid_id", "left").select(
                "centroid_id",
                F.coalesce(F.col("_new_vec"), F.col("centroid_vec")).alias(
                    "centroid_vec"
                ),
            ),
            eager=True,
            required=True,
        )
        # drop the prior round's pinned blocks (and, in 'reliable'
        # mode, its checkpoint files) — only the newest cents is live
        release(prev)
    return cents


def _probe_cells(
    qs_u: DataFrame,
    cents: DataFrame,
    n_probe: int,
    query_id_col: str,
    cols: list,
) -> DataFrame:
    """Each query's ``n_probe`` nearest coarse cells — the shared probe
    stage of ivf_topk / ivf_pq_topk / hard_negatives (one tie order,
    one bounded |Q|×n_centroids broadcast, maintained in ONE place).
    Input must carry ``unit_vec``; ``cols`` is the caller's FINAL
    projection, applied as the helper's single select so the optimized
    plan is identical to the pre-helper form (plan hashes are tracked
    round-over-round)."""
    q_scored = qs_u.join(F.broadcast(cents)).withColumn(
        "_score", _dot(F.col("unit_vec"), F.col("centroid_vec"))
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("_score").desc(), F.col("centroid_id")
    )
    return (
        q_scored.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select(*cols)
    )


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: corpus is partitioned into centroid cells;
    each query scores only the ``n_probe`` nearest cells' vectors.

    Candidate cost drops from |corpus| to ~|corpus|·n_probe/n_centroids
    per query. The cell join is an equi-join on centroid_id, so at scale
    it shuffles once on a low-cardinality key that AQE can coalesce.
    """
    corpus_u = with_unit_vectors(df, vec_col)
    cents = deterministic_centroids(corpus_u, n_centroids, id_col)
    if train_iters > 0:
        # refine the seed centroids with Lloyd iterations — better cell
        # balance/recall; default 0 keeps the deterministic oracle path
        cents = kmeans_train(corpus_u, n_centroids, n_iter=train_iters, id_col=id_col)
    corpus = ivf_assign(corpus_u, cents, id_col=id_col).select(
        F.col(id_col).alias("nn_id"), F.col("unit_vec").alias("cv"), "centroid_id"
    )
    qs_u = with_unit_vectors(queries, vec_col)
    q_cells = _probe_cells(
        qs_u,
        cents,
        n_probe,
        query_id_col,
        [
            F.col(query_id_col).alias("query_id"),
            F.col("unit_vec").alias("qv"),
            "centroid_id",
        ],
    )
    scored = (
        F.broadcast(q_cells)
        .join(corpus, "centroid_id")
        .select("query_id", "nn_id", F.round(_dot(F.col("qv"), F.col("cv")), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "cosine", "rank")
    )


def projection_signs(dim_in: int, dim_out: int, salt: str = "rp") -> list[list[float]]:
    """The deterministic ±1 sign matrix: md5(salt:i:j) parity. Computed
    once at plan-build time and inlined as literals — the matrix is the
    broadcast side of the projection, engine-portable bit-for-bit."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{salt}:{i}:{j}".encode()).hexdigest()[:2], 16) % 2 == 0
            else -1.0
            for i in range(dim_in)
        ]
        for j in range(dim_out)
    ]


def random_projection(
    df: DataFrame,
    dim_in: int = 64,
    dim_out: int = 16,
    vec_col: str = "embedding",
    salt: str = "rp",
    prefix: str = "c",
) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection: dense dim-reduction
    ``dim_in -> dim_out`` preserving pairwise distances within
    ``O(sqrt(log n / dim_out))`` — the standard pre-step that makes
    brute-force / LSH similarity 4x cheaper per vector at 100 TB.

    Map-only: each output component is a literal-signed sum over the
    input components (one flat codegen expression per component, summed
    left-to-right so the float result is engine-exact), scaled by
    ``1/sqrt(dim_out)`` and rounded to 6 decimals. No shuffle, no
    Python, no data-dependent hashing.
    """
    signs = projection_signs(dim_in, dim_out, salt)
    scale = 1.0 / (dim_out ** 0.5)
    out = df
    for j in range(dim_out):
        acc = None
        for i in range(dim_in):
            term = F.element_at(F.col(vec_col), i + 1).cast("double")
            if signs[j][i] < 0:
                term = -term
            acc = term if acc is None else acc + term
        out = out.withColumn(f"{prefix}{j}", F.round(acc * F.lit(scale), 6))
    norm = None
    for j in range(dim_out):
        sq = F.col(f"{prefix}{j}") * F.col(f"{prefix}{j}")
        norm = sq if norm is None else norm + sq
    return out.withColumn("proj_norm", F.round(F.sqrt(norm), 6))


# -- product quantization (PQ) + asymmetric distance (ADC) ----------------------


def _sub_expr(vec_col: str, j: int, m: int) -> str:
    """SQL expr for subspace ``j`` of an array column split into ``m``
    equal slices (requires m | dim, enforced by the callers' data)."""
    return (
        f"slice({vec_col}, {j} * (size({vec_col}) div {m}) + 1,"
        f" size({vec_col}) div {m})"
    )


def _l2sq(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, v: acc + v)


def pq_codebooks(
    df: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "unit_vec",
) -> DataFrame:
    """Product-quantization codebooks ``(j, code, code_vec)``: the
    ``n_codes`` lowest-id vectors' subspace slices, code = rank by id.

    Same deterministic-seed discipline as :func:`deterministic_centroids`
    (oracle-reproducible; production swaps per-subspace k-means via
    :func:`kmeans_train` — the encode/ADC path below is unchanged).
    The row_number runs on the LIMITed ``n_codes``-row relation, not
    the corpus.
    """
    sel = (
        df.orderBy(id_col)
        .limit(n_codes)
        .withColumn("code", F.row_number().over(Window.orderBy(F.col(id_col))) - 1)
    )
    subs = F.array(
        *[
            F.struct(F.lit(j).alias("j"), F.expr(_sub_expr(vec_col, j, m)).alias("code_vec"))
            for j in range(m)
        ]
    )
    return sel.select("code", F.explode(subs).alias("_s")).select(
        F.col("_s.j").alias("j"), "code", F.col("_s.code_vec").alias("code_vec")
    )


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "unit_vec",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Encode each vector to ``m`` codebook ids: ``(id_col, *carry,
    codes)`` with ``codes[j]`` the L2-nearest code of subspace ``j``
    (ties to the smaller code).

    100 TB shape: the corpus explodes to m sub-vector rows, scores the
    BROADCAST codebook (m·n_codes rows), and the per-(vec, subspace)
    argmin is a map-side-combinable ``max_by`` — the shuffle carries m
    rows per vector, then one groupBy reassembles the m-byte code
    word.  8-32x smaller than the embedding column; the scan-speed
    payoff is :func:`pq_adc_topk`.

    ``carry``: extra per-vector columns (functionally dependent on the
    id, e.g. the IVF cell assignment) that ride through the encode as
    additional grouping keys — cheaper than re-deriving the input
    relation afterwards just to join one column back on (the join's
    probe side would re-run the whole upstream pipeline).
    """
    subs = F.array(
        *[
            F.struct(F.lit(j).alias("j"), F.expr(_sub_expr(vec_col, j, m)).alias("sub"))
            for j in range(m)
        ]
    )
    ex = df.select(
        F.col(id_col), *[F.col(c) for c in carry], F.explode(subs).alias("_s")
    ).select(
        id_col, *carry, F.col("_s.j").alias("j"), F.col("_s.sub").alias("sub")
    )
    scored = ex.join(F.broadcast(codebooks), "j").withColumn(
        "_d", _l2sq(F.col("sub"), F.col("code_vec"))
    )
    tie = F.struct((-F.col("_d")).alias("_nd"), (-F.col("code")).alias("_nc"))
    per_sub = scored.groupBy(id_col, *carry, "j").agg(
        F.max_by(F.col("code"), tie).alias("code")
    )
    return per_sub.groupBy(id_col, *carry).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "code"))), lambda s: s["code"]
        ).alias("codes")
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    m: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "unit_vec",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k by Asymmetric Distance Computation: each query
    precomputes its per-subspace distance table against the codebooks
    (m·n_codes doubles — built on the BOUNDED codebook relation, never
    the corpus), the tables broadcast, and every corpus row's distance
    is ``m`` array lookups — no per-row float math against the
    original embeddings, which never leave disk.

    Returns ``(query_id, nn_id, adc_dist, rank)`` — rank 1 = nearest
    (smallest summed L2).  Per-query selection is a rank window over
    the scored frame (same baseline shape as :func:`cosine_topk`; at
    extreme scale swap the window for per-partition top-k + merge).
    """
    qsubs = F.array(
        *[
            F.struct(F.lit(j).alias("j"), F.expr(_sub_expr(vec_col, j, m)).alias("sub"))
            for j in range(m)
        ]
    )
    qex = queries.select(F.col(query_id_col).alias("query_id"), F.explode(qsubs).alias("_s")).select(
        "query_id", F.col("_s.j").alias("j"), F.col("_s.sub").alias("sub")
    )
    qdists = qex.join(F.broadcast(codebooks), "j").withColumn(
        "_d", _l2sq(F.col("sub"), F.col("code_vec"))
    )
    per_j = qdists.groupBy("query_id", "j").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("code", "_d"))), lambda s: s["_d"]
        ).alias("arr")
    )
    qtab = per_j.groupBy("query_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "arr"))), lambda s: s["arr"]
        ).alias("tbl")
    )
    scored = (
        F.broadcast(qtab)
        .crossJoin(codes.select(F.col(id_col).alias("nn_id"), "codes"))
        .withColumn(
            "adc_dist",
            F.expr(
                # element_at is 1-based throughout (bracket indexing is
                # 0-based in Spark SQL — mixing them is a classic trap)
                f"aggregate(sequence(0, {m - 1}), 0d,"
                " (acc, j) -> acc + element_at(element_at(tbl, j + 1),"
                " element_at(codes, j + 1) + 1))"
            ),
        )
    )
    # rank on the ROUNDED distance: two corpus rows with the same code
    # word tie EXACTLY by construction, but the raw per-engine float
    # sums can differ in the last ulp (summation order), flipping
    # tie-adjacent ranks cross-engine — round-6 makes ties exact ties
    # on both engines, broken identically by nn_id
    scored = scored.withColumn("adc_dist", F.round(F.col("adc_dist"), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "adc_dist", "rank")
    )


def ivf_pq_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rerank: int | None = None,
) -> DataFrame:
    """IVFADC (Jégou et al. 2011): coarse inverted-file quantizer +
    product quantization of the RESIDUALS + asymmetric distance — the
    composition behind FAISS's IndexIVFPQ and the standard
    billion-scale ANN layout.

    Per query: probe the ``n_probe`` nearest coarse cells; within each
    probed cell build the ADC table against the query's residual
    ``q - c`` (residuals carry far less variance than raw vectors, so
    the same code budget quantizes them much more accurately); every
    candidate's distance is ``m`` array lookups over its stored code
    word.

    100 TB shape — this operator is why the layout exists:
    - the corpus is stored as (centroid_id, m code bytes) — neither
      the embeddings nor the residuals are re-read at query time;
    - the candidate join is an equi-join on ``centroid_id``
      (partition-prunable when the code table is written partitioned
      by cell), touching ~n_probe/n_centroids of the corpus;
    - codebooks and the per-(query, cell) ADC tables are bounded by
      construction (m·n_codes rows / m·n_codes doubles) and broadcast;
    - every per-vector reduce (cell argmax, per-subspace argmin) is a
      map-side-combinable ``max_by``.

    Deterministic seeds keep the oracle exact: centroids = the
    ``n_centroids`` lowest-id unit vectors; codebook seeds = the next
    ``n_codes`` lowest-id RESIDUALS (the centroid rows themselves
    quantize to the zero residual, so they are skipped — production
    swaps per-subspace k-means, the probe/ADC path is unchanged).

    ``rerank=r`` adds the paper's +R stage (§IV): the ADC top-``r``
    shortlist per query is re-scored with EXACT cosine against the
    original vectors and the final top-k ranks by that — quantization
    error stops costing recall at the price of re-reading ``r·|Q|``
    embeddings (bounded by the query batch, never the corpus; the
    shortlist broadcasts into the fetch join).

    Returns ``(query_id, nn_id, adc_dist, rank)`` — rank 1 = nearest —
    or ``(query_id, nn_id, cosine, rank)`` under ``rerank``.
    """
    corpus_u = with_unit_vectors(df, vec_col)
    cents = deterministic_centroids(corpus_u, n_centroids, id_col)
    assigned = ivf_assign(corpus_u, cents, id_col=id_col)
    resid = assigned.join(F.broadcast(cents), "centroid_id").withColumn(
        "rvec", F.zip_with("unit_vec", "centroid_vec", lambda x, y: x - y)
    )
    # ONE evaluation of the scan→normalize→assign→residual pipeline:
    # it feeds the codebook-seed cut AND the encode (previously also a
    # centroid_id join-back — three executions of the corpus pipeline
    # per call).  Materializing the (id, centroid_id, rvec) projection
    # is the IVFADC index BUILD artifact anyway — production persists
    # exactly this relation (partitioned by cell).
    resid = materialize(
        resid.select(id_col, "centroid_id", "rvec"), eager=True
    )

    # codebook seeds: rank over the (n_centroids + n_codes)-row LIMIT,
    # never the corpus
    seeds = (
        resid.orderBy(id_col)
        .limit(n_centroids + n_codes)
        .withColumn("_rn", F.row_number().over(Window.orderBy(F.col(id_col))))
        .filter(F.col("_rn") > n_centroids)
    )
    subs = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.expr(_sub_expr("rvec", j, m)).alias("code_vec"),
            )
            for j in range(m)
        ]
    )
    cbs = seeds.select(
        (F.col("_rn") - n_centroids - 1).alias("code"), F.explode(subs).alias("_s")
    ).select(F.col("_s.j").alias("j"), "code", F.col("_s.code_vec").alias("code_vec"))

    # the cell assignment rides through the encode as a carried key —
    # no join-back against a second evaluation of the corpus pipeline
    corpus_codes = pq_encode(
        resid, cbs, m=m, id_col=id_col, vec_col="rvec", carry=("centroid_id",)
    ).select(F.col(id_col).alias("nn_id"), "codes", "centroid_id")

    # -- query side: probe cells, residualize, ADC tables per (q, cell)
    qs_u = with_unit_vectors(queries, vec_col)
    q_cells = _probe_cells(
        qs_u,
        cents,
        n_probe,
        query_id_col,
        [
            F.col(query_id_col).alias("query_id"),
            F.zip_with("unit_vec", "centroid_vec", lambda x, y: x - y).alias("qr"),
            "centroid_id",
        ],
    )
    qsubs = F.array(
        *[
            F.struct(F.lit(j).alias("j"), F.expr(_sub_expr("qr", j, m)).alias("sub"))
            for j in range(m)
        ]
    )
    qex = q_cells.select("query_id", "centroid_id", F.explode(qsubs).alias("_s")).select(
        "query_id", "centroid_id", F.col("_s.j").alias("j"), F.col("_s.sub").alias("sub")
    )
    qdists = qex.join(F.broadcast(cbs), "j").withColumn(
        "_d", _l2sq(F.col("sub"), F.col("code_vec"))
    )
    per_j = qdists.groupBy("query_id", "centroid_id", "j").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("code", "_d"))), lambda s: s["_d"]
        ).alias("arr")
    )
    qtab = per_j.groupBy("query_id", "centroid_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "arr"))), lambda s: s["arr"]
        ).alias("tbl")
    )
    scored = (
        F.broadcast(qtab)
        .join(corpus_codes, "centroid_id")
        .withColumn(
            "adc_dist",
            F.expr(
                f"aggregate(sequence(0, {m - 1}), 0d,"
                " (acc, j) -> acc + element_at(element_at(tbl, j + 1),"
                " element_at(codes, j + 1) + 1))"
            ),
        )
    )
    # rank (and the +R shortlist cut) on the ROUNDED distance: same-code
    # candidates tie exactly; raw float sums differ in the last ulp per
    # engine, flipping tie-adjacent ranks — see pq_adc_topk
    scored = scored.withColumn("adc_dist", F.round(F.col("adc_dist"), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("nn_id"))
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "nn_id", "adc_dist", "rank")
        )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(rerank))
        .select("query_id", "nn_id")
    )
    # fetch raw embeddings for the shortlist FIRST, normalize after the
    # broadcast join: the unit-vector fold runs on r·|Q| candidate rows
    # instead of every corpus row (identical per-row arithmetic)
    cand = with_unit_vectors(
        F.broadcast(shortlist).join(
            df.select(F.col(id_col).alias("nn_id"), F.col(vec_col)), "nn_id"
        ),
        vec_col,
        out="cv",
    )
    qvs = qs_u.select(
        F.col(query_id_col).alias("query_id"), F.col("unit_vec").alias("qv")
    )
    exact = cand.join(F.broadcast(qvs), "query_id").select(
        "query_id",
        "nn_id",
        F.round(_dot(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nn_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "cosine", "rank")
    )


def hard_negatives(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training (the DPR recipe,
    Karpukhin et al. 2020 §4.2): for each query, the top-k most
    SIMILAR vectors whose label differs — the negatives that actually
    teach the encoder, versus random negatives it already separates.

    Runs on the IVF index (same coarse cells as :func:`ivf_topk`): each
    query scores only its ``n_probe`` nearest cells, the label
    inequality prunes before ranking, and the per-query top-k is a rank
    window over the probed candidates.  Hardest negatives are the
    near-duplicates of the query's neighborhood, which is exactly
    where the probed cells are — the inverted file loses only easy
    negatives.

    Returns ``(query_id, nn_id, nn_label, cosine, rank)``.
    """
    corpus_u = with_unit_vectors(df, vec_col)
    cents = deterministic_centroids(corpus_u, n_centroids, id_col)
    corpus = ivf_assign(corpus_u, cents, id_col=id_col).select(
        F.col(id_col).alias("nn_id"),
        F.col("unit_vec").alias("cv"),
        F.col(label_col).alias("nn_label"),
        "centroid_id",
    )
    qs_u = with_unit_vectors(queries, vec_col)
    q_cells = _probe_cells(
        qs_u,
        cents,
        n_probe,
        query_id_col,
        [
            F.col(query_id_col).alias("query_id"),
            F.col("unit_vec").alias("qv"),
            F.col(label_col).alias("q_label"),
            "centroid_id",
        ],
    )
    scored = (
        F.broadcast(q_cells)
        .join(corpus, "centroid_id")
        .filter(F.col("nn_label") != F.col("q_label"))
        .select(
            "query_id",
            "nn_id",
            "nn_label",
            F.round(_dot(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "nn_label", "cosine", "rank")
    )


def bitext_margin_pairs(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019; the CCMatrix
    criterion): for every source vector, its nearest target under the
    RATIO margin

        margin(x, y) = cos(x, y) / ((avgK(x) + avgK(y)) / 2)

    where ``avgK(x)`` is the mean cosine of x's k nearest targets (and
    ``avgK(y)`` of y's k nearest sources).  Dividing by the local
    neighborhood density is what separates true translation pairs from
    hubs — vectors globally close to everything score margins ≈ 1 and
    are rejected; a real pair clears its neighborhood.

    Determinism across engines: every per-vector average folds a
    SORTED cosine list (``aggregate(array_sort(collect_list(...)))``;
    the oracle sums ``list(...ORDER BY...)`` in the same order), so the
    doubles agree bit-for-bit and the margin is safe to threshold on
    raw.  Cosines round to 6 before entering the lists.

    Returns one row per source: ``(src_id, tgt_id, cosine, margin)``
    — thresholding the margin is a curation decision left to the
    caller.

    Scale shape: the X×Y scoring is the exact brute-force baseline
    (same class as cosine_topk — swap the candidate generator for the
    IVF probe join at billion scale; margins only need each side's
    k-NN lists, which the probe set supplies); both k-NN reductions
    are map-side-combinable min-struct folds over the scored frame,
    computed from ONE scoring pass.
    """
    xs = with_unit_vectors(src, vec_col).select(
        F.col(id_col).alias("x"), F.col("unit_vec").alias("xv")
    )
    ys = with_unit_vectors(tgt, vec_col).select(
        F.col(id_col).alias("y"), F.col("unit_vec").alias("yv")
    )
    scored = (
        F.broadcast(xs)
        .crossJoin(ys)
        .select("x", "y", F.round(_dot(F.col("xv"), F.col("yv")), 6).alias("cos"))
    )
    scored = materialize(scored, eager=True)

    wx = Window.partitionBy("x").orderBy(F.col("cos").desc(), F.col("y"))
    wy = Window.partitionBy("y").orderBy(F.col("cos").desc(), F.col("x"))
    # each rank filter sits DIRECTLY on its own window so Spark plans
    # WindowGroupLimit in partial+final mode: every map partition keeps
    # only its top-k rows per key BEFORE the exchange, so each side
    # shuffles ~k rows per vector instead of the full X×Y scored frame.
    # (The previous shape stacked both windows on one frame and eagerly
    # pinned ALL |X|·|Y| ranked rows just so the k-filters could run
    # later — two unpruned corpus-squared shuffles plus a full-frame
    # checkpoint.)
    rxd = scored.withColumn("rx", F.row_number().over(wx)).filter(F.col("rx") <= k)
    # rxd feeds both avgK(x) and the best-pair cut — TWO subtrees of the
    # single final job, so the pin must be EAGER (materialize's
    # contract): a lazy local checkpoint lets both branches compute
    # partitions concurrently before the cache fills, duplicating the
    # window pass.  Cheap: rxd is ≤ k·|X| rows over the pinned `scored`.
    rxd = materialize(rxd, eager=True)
    ryd = scored.withColumn("ry", F.row_number().over(wy)).filter(F.col("ry") <= k)

    def _avg_sorted(df, key):
        # fold the SORTED k-cosine list: identical summation order on
        # both engines -> bit-identical averages
        lst = F.array_sort(F.collect_list("cos"))
        return df.groupBy(key).agg(
            (
                F.aggregate(lst, F.lit(0.0), lambda acc, v: acc + v)
                / F.size(lst)
            ).alias(f"avg_{key}")
        )

    ax = _avg_sorted(rxd, "x")
    ay = _avg_sorted(ryd, "y")
    best = rxd.filter(F.col("rx") == 1).select("x", "y", "cos")
    out = (
        best.join(ax, "x")
        .join(ay, "y")
        .select(
            F.col("x").alias("src_id"),
            F.col("y").alias("tgt_id"),
            F.col("cos").alias("cosine"),
            F.round(
                F.col("cos") / ((F.col("avg_x") + F.col("avg_y")) / F.lit(2.0)), 6
            ).alias("margin"),
        )
    )
    return out

"""Similarity-search workloads over `embeddings`, with DuckDB oracles.

Cosines are computed with the SAME formula on both sides
(normalize-then-dot, sequential fold over the vector) and rounded to 4
decimals before ranking, so ranks are deterministic and engine-identical
(ties broken by neighbour id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bruin_spark.operators import similarity as S
from bruin_spark.session import read_parquet

K = 5
QUERY_MOD = 100  # vec_id % 100 == 0 → query set
THRESHOLD = 0.55
N_PLANES = 4
DIM = 64  # driver testdata embedding dimensionality (TESTDATA.md)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    return read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))


# DuckDB: unit vector + sequential-fold dot product mirroring Spark's
# aggregate(zip_with(...)) exactly.
_DUCK_UNIT = """
list_transform(embedding::DOUBLE[],
  x -> coalesce(x / nullif(sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y * y))), 0), 0.0))
"""


def _duck_dot(a: str, b: str) -> str:
    return f"list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i]))"


def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(f"vec_id % {QUERY_MOD} = 0").withColumnRenamed("vec_id", "query_id")
    return S.cosine_topk(emb, queries, k=K)


TOPK_ORACLE = f"""
WITH u AS (SELECT vec_id, {_DUCK_UNIT} AS uv FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
         ROUND({_duck_dot('q.uv', 'c.uv')}, 6) AS cosine
  FROM u q CROSS JOIN u c
  WHERE q.vec_id % {QUERY_MOD} = 0
)
SELECT query_id, nn_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank
  FROM scored
) WHERE rank <= {K}
"""


def sim_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.embedding_near_dup(_emb(spark, sf_dir), threshold=THRESHOLD, exact=True)


NEAR_DUP_ORACLE = f"""
WITH u AS (SELECT vec_id, {_DUCK_UNIT} AS uv FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND({_duck_dot('a.uv', 'b.uv')}, 6) AS cosine
FROM u a JOIN u b ON a.vec_id < b.vec_id
WHERE ROUND({_duck_dot('a.uv', 'b.uv')}, 6) >= {THRESHOLD}
"""


def sim_lsh_bucket_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket histogram — verifies the bucketing function itself."""
    from pyspark.sql import functions as F

    b = S.lsh_bucket(_emb(spark, sf_dir), n_planes=N_PLANES, dim=DIM)
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id")
    )


def _lsh_bucket_oracle() -> str:
    dim = 64
    planes = S._hyperplanes(dim, N_PLANES)
    terms = []
    for i, plane in enumerate(planes):
        arr = "[" + ", ".join(str(v) for v in plane) + "]"
        dot = _duck_dot("v.dv", f"({arr}::DOUBLE[])")
        terms.append(f"(CASE WHEN {dot} > 0 THEN {2**i} ELSE 0 END)")
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings)
SELECT {' + '.join(terms)} AS bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
FROM v
GROUP BY 1
"""


def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(f"vec_id % {QUERY_MOD} = 0").withColumnRenamed("vec_id", "query_id")
    return S.lsh_topk(emb, queries, k=K, n_planes=N_PLANES, dim=DIM)


def _lsh_topk_oracle() -> str:
    dim = 64
    planes = S._hyperplanes(dim, N_PLANES)
    terms = []
    for i, plane in enumerate(planes):
        arr = "[" + ", ".join(str(v) for v in plane) + "]"
        # Spark's lsh_topk buckets on the RAW vector (sign is
        # scale-invariant); mirror that exactly
        dot = _duck_dot("dv", f"({arr}::DOUBLE[])")
        terms.append(f"(CASE WHEN {dot} > 0 THEN {2**i} ELSE 0 END)")
    bucket = " + ".join(terms)
    return f"""
WITH u AS (SELECT vec_id, embedding::DOUBLE[] AS dv, {_DUCK_UNIT} AS uv FROM embeddings),
b AS (SELECT vec_id, uv, {bucket} AS bucket FROM u),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
         ROUND({_duck_dot('q.uv', 'c.uv')}, 6) AS cosine
  FROM b q JOIN b c ON q.bucket = c.bucket
  WHERE q.vec_id % {QUERY_MOD} = 0
)
SELECT query_id, nn_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank
  FROM scored
) WHERE rank <= {K}
"""


N_CENTROIDS = 8
N_PROBE = 2


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(f"vec_id % {QUERY_MOD} = 0").withColumnRenamed("vec_id", "query_id")
    return S.ivf_topk(emb, queries, k=K, n_centroids=N_CENTROIDS, n_probe=N_PROBE)


# DuckDB replica of the IVF index: centroids = unit vectors of the
# N_CENTROIDS lowest vec_ids; corpus rows assigned to argmax-cosine
# centroid; each query probes its N_PROBE best cells.
IVF_ORACLE = f"""
WITH u AS (SELECT vec_id, {_DUCK_UNIT} AS uv FROM embeddings),
cents AS (
  SELECT vec_id AS centroid_id, uv AS cv FROM u ORDER BY vec_id LIMIT {N_CENTROIDS}
),
assigned AS (
  SELECT vec_id, uv, centroid_id FROM (
    SELECT v.vec_id, v.uv, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_duck_dot('v.uv', 'c.cv')} DESC, c.centroid_id
           ) AS rn
    FROM u v CROSS JOIN cents c
  ) WHERE rn = 1
),
q_cells AS (
  SELECT query_id, uv AS qv, centroid_id FROM (
    SELECT v.vec_id AS query_id, v.uv, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_duck_dot('v.uv', 'c.cv')} DESC, c.centroid_id
           ) AS rn
    FROM u v CROSS JOIN cents c
    WHERE v.vec_id % {QUERY_MOD} = 0
  ) WHERE rn <= {N_PROBE}
),
scored AS (
  SELECT q.query_id, a.vec_id AS nn_id,
         ROUND({_duck_dot('q.qv', 'a.uv')}, 6) AS cosine
  FROM q_cells q JOIN assigned a ON q.centroid_id = a.centroid_id
)
SELECT query_id, nn_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank
  FROM scored
) WHERE rank <= {K}
"""


SEM_DEDUP_T = 0.3  # synthetic embeddings are near-random: 0.3 is the ~99th pct of within-cluster cosine, so ~1% of pairs qualify


def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: cluster on the deterministic IVF
    centroids, mark each vector whose cluster holds a smaller-id
    neighbor at cosine >= threshold (the quadratic term stays bounded
    by the largest cluster, never the corpus)."""
    return S.semantic_dedup(
        _emb(spark, sf_dir), n_centroids=N_CENTROIDS, threshold=SEM_DEDUP_T
    )


SEM_DEDUP_ORACLE = f"""
WITH u AS (SELECT vec_id, {_DUCK_UNIT} AS uv FROM embeddings),
cents AS (
  SELECT vec_id AS centroid_id, uv AS cv FROM u ORDER BY vec_id LIMIT {N_CENTROIDS}
),
assigned AS (
  SELECT vec_id, uv, centroid_id FROM (
    SELECT v.vec_id, v.uv, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_duck_dot('v.uv', 'c.cv')} DESC, c.centroid_id
           ) AS rn
    FROM u v CROSS JOIN cents c
  ) WHERE rn = 1
),
pairs AS (
  SELECT y.vec_id AS vec_id, x.vec_id AS cand,
         ROUND({_duck_dot('x.uv', 'y.uv')}, 6) AS cos
  FROM assigned x JOIN assigned y
    ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
  WHERE ROUND({_duck_dot('x.uv', 'y.uv')}, 6) >= {SEM_DEDUP_T}
),
d AS (
  SELECT vec_id, cand, cos FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cand) AS rn
    FROM pairs
  ) WHERE rn = 1
)
SELECT a.vec_id, a.centroid_id AS cluster_id,
       d.vec_id IS NULL AS keep,
       d.cand AS dup_of, d.cos AS dup_cos
FROM assigned a LEFT JOIN d ON d.vec_id = a.vec_id
"""


D4_PRUNE_FRAC = 0.25


def emb_d4_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4-style prototype pruning: within each cluster, drop the 25%
    of vectors most similar to their own centroid (the redundant
    'prototypical' mass; operators/similarity.py d4_prototype_prune).
    Composes after emb_semantic_dedup in the D4 recipe."""
    return S.d4_prototype_prune(
        _emb(spark, sf_dir), n_centroids=N_CENTROIDS, prune_frac=D4_PRUNE_FRAC
    )


D4_PRUNE_ORACLE = f"""
WITH u AS (SELECT vec_id, {_DUCK_UNIT} AS uv FROM embeddings),
cents AS (
  SELECT vec_id AS centroid_id, uv AS cv FROM u ORDER BY vec_id LIMIT {N_CENTROIDS}
),
assigned AS (
  SELECT vec_id, uv, centroid_id, cv FROM (
    SELECT v.vec_id, v.uv, c.centroid_id, c.cv,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_duck_dot('v.uv', 'c.cv')} DESC, c.centroid_id
           ) AS rn
    FROM u v CROSS JOIN cents c
  ) WHERE rn = 1
),
scored AS (
  SELECT vec_id, centroid_id, ROUND({_duck_dot('uv', 'cv')}, 6) AS proto_cos
  FROM assigned
),
thr AS (
  SELECT centroid_id, quantile_disc(proto_cos, {1.0 - D4_PRUNE_FRAC}) AS t
  FROM scored GROUP BY 1
)
SELECT s.vec_id, s.centroid_id AS cluster_id, s.proto_cos,
       s.proto_cos < t.t AS keep
FROM scored s JOIN thr t USING (centroid_id)
"""


QUERIES = {
    "emb_semantic_dedup": (emb_semantic_dedup, SEM_DEDUP_ORACLE),
    "emb_d4_prune": (emb_d4_prune, D4_PRUNE_ORACLE),
    "sim_ivf_topk": (sim_ivf_topk, IVF_ORACLE),
    "sim_topk_bruteforce": (sim_topk_bruteforce, TOPK_ORACLE),
    "sim_near_dup_exact": (sim_near_dup_exact, NEAR_DUP_ORACLE),
    "sim_lsh_bucket_sizes": (sim_lsh_bucket_sizes, _lsh_bucket_oracle()),
    "sim_lsh_topk": (sim_lsh_topk, _lsh_topk_oracle()),
}


def emb_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration from the deterministic seed centroids:
    broadcast argmax assignment (max_by, map-side partials) then an
    element-wise mean per (centroid, dimension) — the k-means update
    that production IVF training iterates.  Emitted long-form
    (centroid_id, pos, mean_val) so the oracle compares scalars, not
    float arrays."""
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    u = S.with_unit_vectors(emb).select("vec_id", "unit_vec")
    cents = S.deterministic_centroids(u, N_CENTROIDS)
    assigned = S.ivf_assign(u, cents)
    ex = assigned.select(
        "centroid_id", F.posexplode("unit_vec").alias("pos", "val")
    )
    return ex.groupBy("centroid_id", "pos").agg(
        F.round(F.avg("val"), 6).alias("mean_val")
    )


KMEANS_STEP_ORACLE = f"""
WITH u AS (SELECT vec_id, {_DUCK_UNIT} AS uv FROM embeddings),
cents AS (
  SELECT vec_id AS centroid_id, uv AS cv FROM u ORDER BY vec_id LIMIT {N_CENTROIDS}
),
assigned AS (
  SELECT vec_id, uv, centroid_id FROM (
    SELECT v.vec_id, v.uv, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_duck_dot('v.uv', 'c.cv')} DESC, c.centroid_id
           ) AS rn
    FROM u v CROSS JOIN cents c
  ) WHERE rn = 1
),
ex AS (
  SELECT centroid_id, (t.i - 1)::INT AS pos, uv[t.i] AS val
  FROM assigned, UNNEST(generate_series(1, len(uv))) AS t(i)
)
SELECT centroid_id, pos, ROUND(AVG(val), 6) AS mean_val
FROM ex GROUP BY centroid_id, pos
"""

QUERIES["emb_kmeans_step"] = (emb_kmeans_step, KMEANS_STEP_ORACLE)


def emb_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization summary: per-vector range + quantized checksum
    (qsum/qmax prove the bucket assignment matches cross-engine)."""
    from pyspark.sql import functions as F

    q = S.quantize_embeddings(_emb(spark, sf_dir))
    return q.select(
        "vec_id",
        F.round("vmin", 6).alias("vmin"),
        F.round("vmax", 6).alias("vmax"),
        F.aggregate("qvec", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("qsum"),
        F.array_max("qvec").alias("qmax"),
    )


QUANTIZE_ORACLE = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS ve,
         list_min(embedding::DOUBLE[]) AS vmin,
         list_max(embedding::DOUBLE[]) AS vmax
  FROM embeddings
),
q AS (
  SELECT vec_id, vmin, vmax,
         CASE WHEN vmax = vmin
              THEN list_transform(ve, x -> 0)
              ELSE list_transform(ve, x -> LEAST(255, FLOOR((x - vmin) * 255.0 / (vmax - vmin))::INT))
         END AS qvec
  FROM v
)
SELECT vec_id, ROUND(vmin, 6) AS vmin, ROUND(vmax, 6) AS vmax,
       list_sum(qvec)::BIGINT AS qsum, list_max(qvec)::INT AS qmax
FROM q
"""

QUERIES["emb_quantize_stats"] = (emb_quantize_stats, QUANTIZE_ORACLE)


RP_DIM_OUT = 16


def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL sign projection 64 -> 16 per vector, map-only, plus the
    projected norm; deterministic literal sign matrix."""
    from bruin_spark.operators.similarity import random_projection

    out = random_projection(_emb(spark, sf_dir), dim_in=64, dim_out=RP_DIM_OUT)
    return out.select(
        "vec_id", *[f"c{j}" for j in range(RP_DIM_OUT)], "proj_norm"
    )


def _rp_oracle() -> str:
    from bruin_spark.operators.similarity import projection_signs

    signs = projection_signs(64, RP_DIM_OUT)
    scale = 1.0 / (RP_DIM_OUT ** 0.5)
    comps = []
    for j in range(RP_DIM_OUT):
        terms = []
        for i in range(64):
            t = f"embedding[{i + 1}]::DOUBLE"
            terms.append(f"- {t}" if signs[j][i] < 0 else f"+ {t}")
        # left-to-right sum, identical association to the Spark side
        expr = " ".join(terms).lstrip("+ ")
        comps.append(f"ROUND(({expr}) * {scale!r}, 6) AS c{j}")
    norm = " + ".join(f"c{j} * c{j}" for j in range(RP_DIM_OUT))
    cols = ", ".join(f"c{j}" for j in range(RP_DIM_OUT))
    return f"""
WITH proj AS (SELECT vec_id, {', '.join(comps)} FROM embeddings)
SELECT vec_id, {cols}, ROUND(SQRT({norm}), 6) AS proj_norm FROM proj
"""


QUERIES["emb_random_projection"] = (emb_random_projection, _rp_oracle())


# -- product quantization + ADC search ------------------------------------------

PQ_M = 4
PQ_CODES = 16


def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed approximate top-k: deterministic-seed codebooks,
    m-subspace encode (corpus stored as m small ints per vector), ADC
    scoring via broadcast per-query distance tables — the
    memory-bound ANN path (operators/similarity.py pq_*)."""
    emb = _emb(spark, sf_dir)
    u = S.with_unit_vectors(emb).select("vec_id", "unit_vec")
    cb = S.pq_codebooks(u, m=PQ_M, n_codes=PQ_CODES)
    codes = S.pq_encode(u, cb, m=PQ_M)
    queries = u.filter(f"vec_id % {QUERY_MOD} = 0").withColumnRenamed(
        "vec_id", "query_id"
    )
    return S.pq_adc_topk(codes, cb, queries, m=PQ_M, k=K)


def _duck_l2(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


PQ_ADC_ORACLE = f"""
WITH u AS (SELECT vec_id, {_DUCK_UNIT} AS uv FROM embeddings),
cb0 AS (
  SELECT vec_id, uv, (ROW_NUMBER() OVER (ORDER BY vec_id) - 1)::INT AS code
  FROM (SELECT * FROM u ORDER BY vec_id LIMIT {PQ_CODES})
),
cb AS (
  SELECT t.j, code,
         list_slice(uv, t.j * (len(uv) // {PQ_M}) + 1,
                    (t.j + 1) * (len(uv) // {PQ_M})) AS code_vec
  FROM cb0, UNNEST([i FOR i IN generate_series(0, {PQ_M - 1})]) AS t(j)
),
subs AS (
  SELECT vec_id, t.j,
         list_slice(uv, t.j * (len(uv) // {PQ_M}) + 1,
                    (t.j + 1) * (len(uv) // {PQ_M})) AS sub
  FROM u, UNNEST([i FOR i IN generate_series(0, {PQ_M - 1})]) AS t(j)
),
enc AS (
  SELECT vec_id, j, code FROM (
    SELECT s.vec_id, s.j, c.code,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id, s.j
             ORDER BY {_duck_l2('s.sub', 'c.code_vec')} ASC, c.code ASC
           ) AS rn
    FROM subs s JOIN cb c ON s.j = c.j
  ) WHERE rn = 1
),
qdist AS (
  SELECT s.vec_id AS query_id, s.j, c.code,
         {_duck_l2('s.sub', 'c.code_vec')} AS d
  FROM subs s JOIN cb c ON s.j = c.j
  WHERE s.vec_id % {QUERY_MOD} = 0
),
scored AS (
  SELECT q.query_id, e.vec_id AS nn_id, SUM(q.d) AS adc
  FROM enc e JOIN qdist q ON e.j = q.j AND e.code = q.code
  GROUP BY 1, 2
),
ranked AS (
  -- rank on the ROUNDED sum: same-code candidates tie exactly, and the
  -- raw SUM's float order is engine-nondeterministic at the last ulp
  SELECT query_id, nn_id, ROUND(adc, 6) AS adc_dist,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ROUND(adc, 6) ASC, nn_id) AS rank
  FROM scored
)
SELECT query_id, nn_id, adc_dist, rank::INT AS rank
FROM ranked WHERE rank <= {K}
"""

QUERIES["sim_pq_adc_topk"] = (sim_pq_adc_topk, PQ_ADC_ORACLE)


# -- IVF-PQ (IVFADC, Jégou et al. 2011): coarse cells + residual PQ + ADC --------


def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAISS-IndexIVFPQ-shaped ANN: probe n_probe coarse cells, score
    PQ codes of the RESIDUALS with per-(query, cell) ADC tables
    (operators/similarity.py ivf_pq_topk)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(f"vec_id % {QUERY_MOD} = 0").withColumnRenamed(
        "vec_id", "query_id"
    )
    return S.ivf_pq_topk(
        emb,
        queries,
        k=K,
        n_centroids=N_CENTROIDS,
        n_probe=N_PROBE,
        m=PQ_M,
        n_codes=PQ_CODES,
    )


def _ivfpq_oracle() -> str:
    dim_slice = (
        "list_slice({v}, t.j * (len({v}) // %(m)d) + 1,"
        " (t.j + 1) * (len({v}) // %(m)d))" % {"m": PQ_M}
    )
    return f"""
WITH u AS (SELECT vec_id, {_DUCK_UNIT} AS uv FROM embeddings),
cents AS (
  SELECT vec_id AS centroid_id, uv AS cv FROM u ORDER BY vec_id LIMIT {N_CENTROIDS}
),
assigned AS (
  SELECT vec_id, uv, centroid_id FROM (
    SELECT v.vec_id, v.uv, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_duck_dot('v.uv', 'c.cv')} DESC, c.centroid_id
           ) AS rn
    FROM u v CROSS JOIN cents c
  ) WHERE rn = 1
),
resid AS (
  SELECT a.vec_id, a.centroid_id,
         list_transform(generate_series(1, len(a.uv)), i -> a.uv[i] - c.cv[i]) AS rv
  FROM assigned a JOIN cents c USING (centroid_id)
),
cb0 AS (
  SELECT rv, (ROW_NUMBER() OVER (ORDER BY vec_id) - 1)::INT AS code
  FROM (SELECT * FROM resid ORDER BY vec_id LIMIT {PQ_CODES} OFFSET {N_CENTROIDS})
),
cb AS (
  SELECT t.j, code, {dim_slice.format(v='rv')} AS code_vec
  FROM cb0, UNNEST([i FOR i IN generate_series(0, {PQ_M - 1})]) AS t(j)
),
subs AS (
  SELECT vec_id, centroid_id, t.j, {dim_slice.format(v='rv')} AS sub
  FROM resid, UNNEST([i FOR i IN generate_series(0, {PQ_M - 1})]) AS t(j)
),
enc AS (
  SELECT vec_id, centroid_id, j, code FROM (
    SELECT s.vec_id, s.centroid_id, s.j, c.code,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id, s.j
             ORDER BY {_duck_l2('s.sub', 'c.code_vec')} ASC, c.code ASC
           ) AS rn
    FROM subs s JOIN cb c ON s.j = c.j
  ) WHERE rn = 1
),
q_resid AS (
  SELECT query_id, centroid_id,
         list_transform(generate_series(1, len(uv)), i -> uv[i] - cv[i]) AS qr
  FROM (
    SELECT v.vec_id AS query_id, v.uv, c.centroid_id, c.cv,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_duck_dot('v.uv', 'c.cv')} DESC, c.centroid_id
           ) AS rn
    FROM u v CROSS JOIN cents c
    WHERE v.vec_id % {QUERY_MOD} = 0
  ) WHERE rn <= {N_PROBE}
),
qdist AS (
  SELECT s.query_id, s.centroid_id, s.j, c.code,
         {_duck_l2('s.sub', 'c.code_vec')} AS d
  FROM (
    SELECT query_id, centroid_id, t.j, {dim_slice.format(v='qr')} AS sub
    FROM q_resid, UNNEST([i FOR i IN generate_series(0, {PQ_M - 1})]) AS t(j)
  ) s JOIN cb c ON s.j = c.j
),
scored AS (
  SELECT q.query_id, e.vec_id AS nn_id, SUM(q.d) AS adc
  FROM enc e
  JOIN qdist q ON e.j = q.j AND e.code = q.code AND e.centroid_id = q.centroid_id
  GROUP BY 1, 2
),
ranked AS (
  -- rank on the ROUNDED sum: same-code candidates tie exactly, and the
  -- raw SUM's float order is engine-nondeterministic at the last ulp
  SELECT query_id, nn_id, ROUND(adc, 6) AS adc_dist,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ROUND(adc, 6) ASC, nn_id) AS rank
  FROM scored
)
SELECT query_id, nn_id, adc_dist, rank::INT AS rank
FROM ranked WHERE rank <= {K}
"""


QUERIES["sim_ivfpq_topk"] = (sim_ivfpq_topk, _ivfpq_oracle())


PQ_RERANK = 16  # ADC shortlist size for the +R stage


def sim_ivfpq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC+R (Jégou et al. 2011 §IV): the ADC top-16 shortlist per
    query is re-scored with exact cosine; recall stops paying for
    quantization error at the cost of re-reading 16·|Q| vectors."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(f"vec_id % {QUERY_MOD} = 0").withColumnRenamed(
        "vec_id", "query_id"
    )
    return S.ivf_pq_topk(
        emb,
        queries,
        k=K,
        n_centroids=N_CENTROIDS,
        n_probe=N_PROBE,
        m=PQ_M,
        n_codes=PQ_CODES,
        rerank=PQ_RERANK,
    )


def _ivfpq_rerank_oracle() -> str:
    base = _ivfpq_oracle()
    # reuse everything up to `ranked`, swap the SELECT for the +R stage
    cut = base.index("SELECT query_id, nn_id, adc_dist, rank::INT AS rank")
    return base[:cut] + f""",
shortlist AS (
  SELECT query_id, nn_id FROM ranked WHERE rank <= {PQ_RERANK}
),
rescored AS (
  SELECT s.query_id, s.nn_id,
         ROUND({_duck_dot('q.uv', 'c.uv')}, 6) AS cosine
  FROM shortlist s
  JOIN u q ON q.vec_id = s.query_id
  JOIN u c ON c.vec_id = s.nn_id
)
SELECT query_id, nn_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank
  FROM rescored
) WHERE rank <= {K}
"""


QUERIES["sim_ivfpq_rerank_topk"] = (sim_ivfpq_rerank_topk, _ivfpq_rerank_oracle())


# -- hard-negative mining (DPR-style contrastive training data) ------------------


def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most-similar DIFFERENT-label vectors per query over the
    IVF probe set (operators/similarity.py hard_negatives)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(f"vec_id % {QUERY_MOD} = 0").withColumnRenamed(
        "vec_id", "query_id"
    )
    return S.hard_negatives(
        emb, queries, k=K, n_centroids=N_CENTROIDS, n_probe=N_PROBE
    )


HARD_NEG_ORACLE = f"""
WITH u AS (SELECT vec_id, label, {_DUCK_UNIT} AS uv FROM embeddings),
cents AS (
  SELECT vec_id AS centroid_id, uv AS cv FROM u ORDER BY vec_id LIMIT {N_CENTROIDS}
),
assigned AS (
  SELECT vec_id, label, uv, centroid_id FROM (
    SELECT v.vec_id, v.label, v.uv, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_duck_dot('v.uv', 'c.cv')} DESC, c.centroid_id
           ) AS rn
    FROM u v CROSS JOIN cents c
  ) WHERE rn = 1
),
q_cells AS (
  SELECT query_id, q_label, uv AS qv, centroid_id FROM (
    SELECT v.vec_id AS query_id, v.label AS q_label, v.uv, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_duck_dot('v.uv', 'c.cv')} DESC, c.centroid_id
           ) AS rn
    FROM u v CROSS JOIN cents c
    WHERE v.vec_id % {QUERY_MOD} = 0
  ) WHERE rn <= {N_PROBE}
),
scored AS (
  SELECT q.query_id, a.vec_id AS nn_id, a.label AS nn_label,
         ROUND({_duck_dot('q.qv', 'a.uv')}, 6) AS cosine
  FROM q_cells q JOIN assigned a ON q.centroid_id = a.centroid_id
  WHERE a.label <> q.q_label
)
SELECT query_id, nn_id, nn_label, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank
  FROM scored
) WHERE rank <= {K}
"""

QUERIES["sim_hard_negatives"] = (sim_hard_negatives, HARD_NEG_ORACLE)


# -- margin-based bitext mining (Artetxe & Schwenk 2019) -------------------------

_BITEXT_K = 4


def sim_bitext_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCMatrix-style mining between two label halves of the embedding
    store (labels 0-4 = source side, 5-9 = target side): each source's
    best target with its ratio margin (operators/similarity.py
    bitext_margin_pairs)."""
    emb = _emb(spark, sf_dir)
    src = emb.filter("label < 5")
    tgt = emb.filter("label >= 5")
    return S.bitext_margin_pairs(src, tgt, k=_BITEXT_K)


BITEXT_ORACLE = f"""
WITH u AS (SELECT vec_id, label, {_DUCK_UNIT} AS uv FROM embeddings),
scored AS (
  SELECT x.vec_id AS x, y.vec_id AS y,
         ROUND({_duck_dot('x.uv', 'y.uv')}, 6) AS cos
  FROM u x JOIN u y ON x.label < 5 AND y.label >= 5
),
ranked AS (
  SELECT x, y, cos,
         ROW_NUMBER() OVER (PARTITION BY x ORDER BY cos DESC, y) AS rx,
         ROW_NUMBER() OVER (PARTITION BY y ORDER BY cos DESC, x) AS ry
  FROM scored
),
ax AS (
  SELECT x, list_sum(list_sort(list(cos))) / len(list(cos)) AS avg_x
  FROM ranked WHERE rx <= {_BITEXT_K} GROUP BY x
),
ay AS (
  SELECT y, list_sum(list_sort(list(cos))) / len(list(cos)) AS avg_y
  FROM ranked WHERE ry <= {_BITEXT_K} GROUP BY y
)
SELECT b.x AS src_id, b.y AS tgt_id, b.cos AS cosine,
       ROUND(b.cos / ((avg_x + avg_y) / 2.0), 6) AS margin
FROM (SELECT x, y, cos FROM ranked WHERE rx = 1) b
JOIN ax ON b.x = ax.x
JOIN ay ON b.y = ay.y
"""

QUERIES["sim_bitext_margin"] = (sim_bitext_margin, BITEXT_ORACLE)

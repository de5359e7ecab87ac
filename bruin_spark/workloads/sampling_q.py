"""Deterministic-sampling workloads (oracle-paired: the md5 bucket
assignment is engine-independent, so DuckDB derives the identical splits)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from bruin_spark.operators.sampling import (
    N_BUCKETS,
    assign_split,
    bucket_sql,
    deterministic_sample,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bruin_spark.session import read_parquet

    return read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))


def split_counts_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 split of the corpus; per (split, lang) doc counts and total
    chars — the reproducibility contract a curation pipeline reports."""
    docs = assign_split(_docs(spark, sf_dir), "doc_id")
    return docs.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


SPLIT_COUNTS_ORACLE = f"""
SELECT CASE
         WHEN {bucket_sql('doc_id', 'split')} < {int(0.9 * N_BUCKETS)} THEN 'train'
         WHEN {bucket_sql('doc_id', 'split')} < {int(0.95 * N_BUCKETS)} THEN 'val'
         ELSE 'test'
       END AS split,
       lang,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars
FROM documents
GROUP BY 1, 2
"""


def sample_docs_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 10 % corpus sample (id-hash bucketing, map-only)."""
    return deterministic_sample(_docs(spark, sf_dir), "doc_id", 0.10, salt="s1").select(
        "doc_id", "lang", "n_chars"
    )


SAMPLE_ORACLE = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {bucket_sql('doc_id', 's1')} < {int(0.10 * N_BUCKETS)}
"""


_QUOTAS = {"en": 50, "es": 30}
_DEFAULT_QUOTA = 10


def sample_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix shaping: cap en at 50 docs, es at 30, everything
    else at 10 — hash-rank selection, stable across runs and engines."""
    from bruin_spark.operators.sampling import stratified_quota_sample

    out = stratified_quota_sample(
        _docs(spark, sf_dir), "doc_id", "lang", _QUOTAS, default_quota=_DEFAULT_QUOTA
    )
    return out.select("doc_id", "lang")


def _quota_oracle() -> str:
    cases = " ".join(f"WHEN '{s}' THEN {q}" for s, q in _QUOTAS.items())
    return f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {bucket_sql('doc_id', 'quota')}, doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= CASE lang {cases} ELSE {_DEFAULT_QUOTA} END
"""


def split_alignment_docs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table split consistency: hashing the shared id assigns a
    document and its embedding to the SAME split without any join at
    assignment time — the property that lets a 100 TB corpus and its
    embedding store be split independently yet stay aligned.  Output is
    the (doc_split, emb_split) contingency table: all mass must sit on
    the diagonal."""
    import os

    from bruin_spark.session import read_parquet

    docs = assign_split(_docs(spark, sf_dir), "doc_id")
    emb = read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))
    emb = assign_split(emb, "vec_id").withColumnRenamed("split", "emb_split")
    joined = docs.select("doc_id", "split").join(
        emb.select(F.col("vec_id").alias("doc_id"), "emb_split"), "doc_id"
    )
    return joined.groupBy("split", "emb_split").agg(F.count(F.lit(1)).alias("n"))


_SPLIT_CASE = f"""CASE
  WHEN {bucket_sql('{id}', 'split')} < {int(0.9 * N_BUCKETS)} THEN 'train'
  WHEN {bucket_sql('{id}', 'split')} < {int(0.95 * N_BUCKETS)} THEN 'val'
  ELSE 'test' END"""

SPLIT_ALIGNMENT_ORACLE = f"""
SELECT d.split, e.emb_split, COUNT(*) AS n
FROM (SELECT doc_id, {_SPLIT_CASE.replace('{id}', 'doc_id')} AS split FROM documents) d
JOIN (SELECT vec_id, {_SPLIT_CASE.replace('{id}', 'vec_id')} AS emb_split FROM embeddings) e
  ON d.doc_id = e.vec_id
GROUP BY 1, 2
"""


_MIX_TOTAL = 250
_MIX_T = 2.0  # temperature flattening: w_d = sqrt(count_d)


def sample_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-mixture sampling (DoReMi/Pile-style): ~250 docs at
    temperature 2.0 over lang — low-resource languages upweighted via
    sqrt(count) weights, budget water-filled across domains, rows picked
    by monotone hash rank. Oracle replicates the water-fill with plain
    window SQL."""
    from bruin_spark.operators.sampling import domain_mixture_sample

    out = domain_mixture_sample(
        _docs(spark, sf_dir), "doc_id", "lang", _MIX_TOTAL, temperature=_MIX_T
    )
    return out.select("doc_id", "lang")


_MIX_ORACLE = f"""
WITH counts AS (
  SELECT lang AS domain, CAST(COUNT(*) AS DOUBLE) AS avail FROM documents GROUP BY 1
),
wts AS (
  SELECT domain, avail, ROUND(POWER(avail, 1.0/{_MIX_T}), 6) AS w FROM counts
),
ordered AS (
  SELECT domain, avail, w, avail / w AS ratio,
         ROW_NUMBER() OVER (ORDER BY avail / w, domain) AS rn,
         COALESCE(SUM(avail) OVER (ORDER BY avail / w, domain
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pa,
         SUM(w) OVER (ORDER BY avail / w, domain
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS sw
  FROM wts
),
cand AS (
  SELECT *, ({_MIX_TOTAL} - pa) / sw AS lam_cand FROM ordered
),
lvl0 AS (
  SELECT *, MIN(CASE WHEN lam_cand <= ratio THEN rn END) OVER () AS first_valid
  FROM cand
),
lvl AS (
  SELECT *, MAX(CASE WHEN rn = first_valid THEN lam_cand END) OVER () AS lam
  FROM lvl0
),
quotas AS (
  SELECT domain,
         CASE WHEN lam IS NULL OR rn < first_valid THEN CAST(avail AS BIGINT)
              ELSE LEAST(CAST(avail AS BIGINT),
                         CAST(FLOOR(ROUND(lam * w, 6)) AS BIGINT)) END AS quota
  FROM lvl
)
SELECT doc_id, lang FROM (
  SELECT d.doc_id, d.lang,
         ROW_NUMBER() OVER (
           PARTITION BY d.lang
           ORDER BY {bucket_sql('d.doc_id', 'mix')}, d.doc_id
         ) AS rn
  FROM documents d
) d
JOIN quotas q ON d.lang = q.domain
WHERE d.rn <= q.quota
"""




_WS_K = 40


def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES):
    n_chars-weighted — longer documents proportionally more likely —
    selected via TakeOrderedAndProject, no full sort (see
    operators/sampling.py weighted_sample)."""
    from bruin_spark.operators.sampling import weighted_sample

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    return weighted_sample(docs, "n_chars", k=_WS_K, salt="ws")


def _weighted_oracle() -> str:
    u = f"(({bucket_sql('doc_id', 'ws')}) + 0.5) / {float(N_BUCKETS)}"
    return f"""
SELECT doc_id, lang, n_chars,
       ROUND(-ln({u}) / n_chars::DOUBLE, 6) AS sample_key
FROM documents
WHERE n_chars IS NOT NULL AND n_chars > 0
ORDER BY -ln({u}) / n_chars::DOUBLE ASC, doc_id ASC
LIMIT {_WS_K}
"""


QUERIES = {
    "sample_domain_mixture": (sample_domain_mixture, _MIX_ORACLE),
    "split_counts_by_lang": (split_counts_by_lang, SPLIT_COUNTS_ORACLE),
    "split_alignment_docs_embeddings": (
        split_alignment_docs_embeddings,
        SPLIT_ALIGNMENT_ORACLE,
    ),
    "sample_docs_10pct": (sample_docs_10pct, SAMPLE_ORACLE),
    "sample_stratified_quota": (sample_stratified_quota, _quota_oracle()),
    "sample_weighted_topk": (sample_weighted_topk, _weighted_oracle()),
}


# -- UniMax language-budget allocation (Chung et al. 2023) -----------------------

_UNIMAX_EPOCHS = 3.0


def sample_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax budget allocation over the corpus languages: budget =
    2x corpus size, max 3 epochs per language — the low-resource
    languages saturate at 3 epochs, the rest share the remainder
    evenly (operators/sampling.py unimax_quotas)."""
    from bruin_spark.operators.sampling import unimax_quotas

    docs = _docs(spark, sf_dir)
    budget = 2 * docs.count()  # single-row driver probe
    return unimax_quotas(
        docs, "lang", budget=budget, epoch_cap=_UNIMAX_EPOCHS
    ).orderBy("lang")


def _unimax_oracle() -> str:
    return f"""
WITH counts AS (
  SELECT lang, COUNT(*)::DOUBLE AS avail FROM documents GROUP BY lang
), budget AS (
  SELECT 2.0 * COUNT(*) AS b FROM documents
), capped AS (
  SELECT lang, avail, ROUND(avail * {_UNIMAX_EPOCHS}, 6) AS cap FROM counts
), annotated AS (
  SELECT lang, avail, cap,
         ROW_NUMBER() OVER (ORDER BY cap, lang) AS rn,
         (b - COALESCE(SUM(cap) OVER (ORDER BY cap, lang
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0))
           / (COUNT(*) OVER () - ROW_NUMBER() OVER (ORDER BY cap, lang) + 1)
           AS lam_cand
  FROM capped CROSS JOIN budget
), fv AS (
  SELECT *, MIN(CASE WHEN lam_cand <= cap THEN rn END) OVER () AS first_valid
  FROM annotated
), levels AS (
  SELECT *, MAX(CASE WHEN rn = first_valid THEN lam_cand END) OVER () AS lam
  FROM fv
)
SELECT lang,
       avail::BIGINT AS avail,
       FLOOR(ROUND(cap, 6))::BIGINT AS cap,
       alloc_i::BIGINT AS alloc,
       ROUND(alloc_i / avail, 6) AS epochs
FROM (
  SELECT lang, avail, cap,
         FLOOR(ROUND(CASE WHEN lam IS NULL OR rn < first_valid THEN cap
                          ELSE LEAST(cap, lam) END, 6)) AS alloc_i
  FROM levels
)
ORDER BY lang
"""


QUERIES["sample_unimax"] = (sample_unimax, _unimax_oracle())


def sample_unimax_draw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the UniMax allocation as a per-document EPOCH
    schedule: every document of language l repeats ``alloc_l //
    avail_l`` times, and the ``alloc_l % avail_l`` hash-rank-smallest
    documents repeat once more — the deterministic draw a data loader
    consumes.

    Composition: unimax_quotas (k-row closed-form budget) -> the
    remainder documents selected by stratified_quota_sample, which
    supplies the TWO-PHASE hot-language path (hash-threshold cut
    before the rank window) instead of a raw per-language window sort
    — the ntile-style single-task-per-language shape stays out of the
    plan whenever the remainder is small against the language (the
    common case; a remainder near the full language size is a top-|l|
    selection and inherently touches every row).  Only the k-language
    quota table reaches the driver."""
    from bruin_spark.operators.sampling import (
        stratified_quota_sample,
        unimax_quotas,
    )

    docs = _docs(spark, sf_dir)
    budget = 2 * docs.count()  # single-row driver probe
    quotas = unimax_quotas(
        docs, "lang", budget=budget, epoch_cap=_UNIMAX_EPOCHS
    ).collect()  # k languages — small by definition
    full = {r["lang"]: int(r["alloc"]) // int(r["avail"]) for r in quotas}
    rem = {r["lang"]: int(r["alloc"]) % int(r["avail"]) for r in quotas}

    base = docs.select("doc_id", "lang")
    extra = stratified_quota_sample(
        base, "doc_id", "lang", rem, default_quota=0, salt="unimax"
    ).select("doc_id", F.lit(1).alias("_x"))

    full_expr = None
    for lang, n in full.items():
        cond = F.col("lang") == lang
        full_expr = F.when(cond, n) if full_expr is None else full_expr.when(cond, n)
    full_expr = full_expr.otherwise(0) if full_expr is not None else F.lit(0)
    return (
        base.join(extra, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            (full_expr + F.coalesce(F.col("_x"), F.lit(0))).alias("n_repeats"),
        )
        .filter(F.col("n_repeats") > 0)
    )


def _unimax_draw_oracle() -> str:
    # the same allocation CTE chain as the sample_unimax oracle,
    # followed by the stratified hash-rank repeat rule
    return f"""
WITH counts AS (
  SELECT lang, COUNT(*)::DOUBLE AS avail FROM documents GROUP BY lang
), budget AS (
  SELECT 2.0 * COUNT(*) AS b FROM documents
), capped AS (
  SELECT lang, avail, ROUND(avail * {_UNIMAX_EPOCHS}, 6) AS cap FROM counts
), annotated AS (
  SELECT lang, avail, cap,
         ROW_NUMBER() OVER (ORDER BY cap, lang) AS rn,
         (b - COALESCE(SUM(cap) OVER (ORDER BY cap, lang
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0))
           / (COUNT(*) OVER () - ROW_NUMBER() OVER (ORDER BY cap, lang) + 1)
           AS lam_cand
  FROM capped CROSS JOIN budget
), fv AS (
  SELECT *, MIN(CASE WHEN lam_cand <= cap THEN rn END) OVER () AS first_valid
  FROM annotated
), levels AS (
  SELECT *, MAX(CASE WHEN rn = first_valid THEN lam_cand END) OVER () AS lam
  FROM fv
), alloc AS (
  SELECT lang, avail::BIGINT AS avail,
         FLOOR(ROUND(CASE WHEN lam IS NULL OR rn < first_valid THEN cap
                          ELSE LEAST(cap, lam) END, 6))::BIGINT AS alloc
  FROM levels
), qmap AS (
  SELECT lang, alloc // avail AS n_full, alloc % avail AS rem FROM alloc
), ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {bucket_sql('doc_id', 'unimax')}, doc_id
         ) AS rk
  FROM documents
)
SELECT doc_id, r.lang,
       (n_full + CASE WHEN rk <= rem THEN 1 ELSE 0 END)::BIGINT AS n_repeats
FROM ranked r JOIN qmap q ON r.lang = q.lang
WHERE n_full + CASE WHEN rk <= rem THEN 1 ELSE 0 END > 0
"""


QUERIES["sample_unimax_draw"] = (sample_unimax_draw, _unimax_draw_oracle())

"""Hashed linear quality classifier — the fastText-shaped filter stage.

The published LLM curation pipelines gate documents with a cheap linear
classifier over hashed bag-of-n-gram features (fastText in CCNet
"target = Wikipedia" form; the same shape reported for LLaMA's quality
filter and phi's educational-value filter).  This module implements the
two halves Spark-first:

- :func:`train_bucket_logodds` — closed-form naive-Bayes log-odds per
  hash bucket against a labeled target subset (add-one smoothing; the
  same estimator DSIR uses for importance weights, exposed here as a
  reusable B-row weight table).  Training a logistic regression by SGD
  is deliberately out of scope: the closed form is one
  map-side-combinable aggregation, deterministic, and cross-engine
  reproducible, while matching the ranking behavior of the shallow
  classifiers these pipelines actually use.
- :func:`classifier_scores` — apply ANY ``(bucket, w)`` weight table
  (trained here or imported from an external fastText/sklearn model
  quantized onto the hash buckets): mean-pooled logit
  ``bias + Σ k·w / Σ k`` (fastText averages its bucket embeddings the
  same way), sigmoid probability, thresholded keep label.

100 TB shape: featurization is the map-only hashed_features projection
(operators/dsir.py); the weight table is B constant rows broadcast to
the scoring join; per-document scoring is one (doc, bucket, k)
pre-aggregation plus one sum per document — one corpus-scale shuffle
end-to-end, no Python anywhere.

Reference anchor: bruin's quality surface stops at column checks
(pkg/ansisql/checks.go); this extends the training-data curation family
(SURVEY.md §2 extras) with the learned-filter stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from bruin_spark.checkpointing import materialize
from bruin_spark.operators.dsir import hashed_features


def train_bucket_logodds(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    use_bigrams: bool = True,
) -> DataFrame:
    """Closed-form bucket weights ``(bucket, w)`` from a labeled corpus:
    ``w = ln( p̂_target(bucket) / p̂_rest(bucket) )`` with add-one
    smoothing.  B constant rows — broadcastable at any corpus size."""
    flagged = docs.select(
        F.col(id_col), F.col(text_col), target.cast("boolean").alias("_is_t")
    )
    feats = hashed_features(
        flagged, id_col, text_col, n_buckets, use_bigrams, carry=("_is_t",)
    )
    buckets = feats.groupBy("bucket").agg(
        F.sum(F.when(~F.col("_is_t"), 1).otherwise(0)).alias("c_raw"),
        F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("c_tgt"),
    )
    totals = buckets.agg(F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt"))
    return buckets.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.log(
            ((F.col("c_tgt") + F.lit(1)) / (F.col("t_tgt") + F.lit(n_buckets)))
            / ((F.col("c_raw") + F.lit(1)) / (F.col("t_raw") + F.lit(n_buckets)))
        ).alias("w"),
    )


def train_and_score(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    use_bigrams: bool = True,
    bias: float = 0.0,
    threshold: float = 0.5,
) -> DataFrame:
    """Self-trained classification in ONE featurization pass: train the
    bucket log-odds against ``target`` and score the SAME corpus.

    Output is IDENTICAL to ``classifier_scores(docs,
    train_bucket_logodds(docs, target, ...), ...)`` — the weight table
    is derived from the same per-(doc, bucket) counts the scoring join
    consumes (``Σ_occurrences 1`` grouped by bucket equals ``Σ k`` over
    the (doc, bucket, k) rows) — but the expensive featurization
    (tokenize + unigram/bigram explode + md5 bucket hash per
    occurrence) runs ONCE instead of once for training and once for
    scoring (guide §2.3 / the dsir_weights shared-``doc_feats`` shape).
    """
    flagged = docs.select(
        F.col(id_col), F.col(text_col), target.cast("boolean").alias("_is_t")
    )
    feats = hashed_features(
        flagged, id_col, text_col, n_buckets, use_bigrams, carry=("_is_t",)
    )
    # (doc, bucket, k) with the target flag carried: feeds BOTH the
    # bucket model and the scoring join (pinned — lazy, the weight
    # broadcast is the first consumer)
    doc_feats = materialize(
        feats.groupBy(id_col, "_is_t", "bucket").agg(
            F.count(F.lit(1)).alias("k")
        ),
        eager=False,
    )
    buckets = doc_feats.groupBy("bucket").agg(
        F.sum(F.when(~F.col("_is_t"), F.col("k")).otherwise(F.lit(0))).alias("c_raw"),
        F.sum(F.when(F.col("_is_t"), F.col("k")).otherwise(F.lit(0))).alias("c_tgt"),
    )
    totals = buckets.agg(F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt"))
    weights = buckets.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.log(
            ((F.col("c_tgt") + F.lit(1)) / (F.col("t_tgt") + F.lit(n_buckets)))
            / ((F.col("c_raw") + F.lit(1)) / (F.col("t_raw") + F.lit(n_buckets)))
        ).alias("w"),
    )
    scored = (
        doc_feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_feats"),
            F.sum(F.col("k") * F.coalesce(F.col("w"), F.lit(0.0))).alias("_sw"),
        )
    )
    logit = F.lit(bias) + F.col("_sw") / F.col("n_feats")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
            F.round(logit, 6).alias("logit"),
            F.round(prob, 6).alias("prob"),
            (prob >= F.lit(threshold)).alias("keep"),
        )
    )


def classifier_scores(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    use_bigrams: bool = True,
    bias: float = 0.0,
    threshold: float = 0.5,
) -> DataFrame:
    """Score every document under a hashed linear classifier.

    Returns ``(id_col, n_feats, logit, prob, keep)``: mean-pooled
    logit, sigmoid probability rounded to 6 places, and
    ``keep = prob >= threshold``.  Buckets absent from ``weights``
    contribute 0 (a sparse/pruned model is fine).  Every document
    keeps a row (``n_feats`` >= 1 — even empty text hashes its one
    empty token).
    """
    feats = hashed_features(docs, id_col, text_col, n_buckets, use_bigrams)
    doc_feats = materialize(
        feats.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("k")),
        eager=False,
    )
    scored = (
        doc_feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_feats"),
            F.sum(F.col("k") * F.coalesce(F.col("w"), F.lit(0.0))).alias("_sw"),
        )
    )
    logit = F.lit(bias) + F.col("_sw") / F.col("n_feats")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
            F.round(logit, 6).alias("logit"),
            F.round(prob, 6).alias("prob"),
            (prob >= F.lit(threshold)).alias("keep"),
        )
    )

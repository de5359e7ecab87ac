"""DSIR-style importance weights for data selection.

Data Selection via Importance Resampling (Xie et al., 2023): score
every raw-corpus document by how target-like it is under two hashed
n-gram bag-of-words models — ``log p_target(doc) - log p_raw(doc)``
where both models are multinomials over B hash buckets estimated from
feature counts with add-one smoothing.  Selection then keeps the
top-weighted documents (or Gumbel-resamples; compose with
``operators.sampling`` for that step).

The 100 TB shape:

- featurization (tokenize, hash unigrams + bigrams into B buckets) is
  one map-only projection — no shuffle, no UDF (md5-based bucket
  hashing, same portable contract as the dedup operators);
- the two models are ONE map-side-combinable groupBy over B buckets
  (B is a constant — the tables never grow with the corpus);
- totals are a 1-row aggregate broadcast-cross-joined back (no
  driver collect), bucket weights broadcast to the scoring join;
- per-doc scoring is the (doc, bucket, k) pre-aggregation joined to
  the B-row weight table, then one sum per document — exactly one
  corpus-scale shuffle end-to-end (the doc groupBy).

Reference surface anchor: the reference engine has no training-data
operators (bruin delegates compute to warehouses); this implements the
published method Spark-first as part of the LLM-curation suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from bruin_spark.checkpointing import materialize
from bruin_spark.operators.dedup import _md5_60bit_key  # portable md5 hash
from bruin_spark.operators.text import tokens


def _bucket(col: Column, n_buckets: int) -> Column:
    return F.pmod(_md5_60bit_key(col), F.lit(n_buckets))


def hashed_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    use_bigrams: bool = True,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *carry, bucket) rows: one per unigram occurrence, plus one
    per adjacent-bigram occurrence when ``use_bigrams`` (the paper's
    feature space).  Bigrams hash the space-joined pair so the bucket
    is a pure function of the two tokens.  ``carry`` columns ride
    through the explode — cheaper than re-joining per-doc flags onto
    the exploded (tokens-sized) table afterwards."""
    extra = [F.col(c) for c in carry]
    base = docs.select(F.col(id_col), *extra, tokens(text_col).alias("_t"))
    uni = base.select(F.col(id_col), *extra, F.explode(F.col("_t")).alias("_w")).select(
        F.col(id_col), *extra, _bucket(F.col("_w"), n_buckets).alias("bucket")
    )
    if not use_bigrams:
        return uni
    pairs = base.filter(F.size("_t") >= 2).select(
        F.col(id_col),
        *extra,
        F.explode(
            F.expr(
                "transform(sequence(1, size(_t) - 1),"
                " i -> concat(element_at(_t, i), ' ', element_at(_t, i + 1)))"
            )
        ).alias("_bg"),
    )
    bi = pairs.select(
        F.col(id_col), *extra, _bucket(F.col("_bg"), n_buckets).alias("bucket")
    )
    return uni.unionByName(bi)


def dsir_weights(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    use_bigrams: bool = True,
) -> DataFrame:
    """Per-document importance log-weight against a target subset.

    ``target`` is a boolean Column over ``docs`` marking the
    target-distribution examples (e.g. a trusted high-quality source).
    Returns ``(id_col, is_target, n_feats, log_weight)`` where
    ``log_weight = Σ_feats ln( p_target(bucket) / p_raw(bucket) )``
    with add-one smoothing; documents with zero features keep a row
    with ``n_feats = 0`` and NULL weight.
    """
    flagged = docs.select(
        F.col(id_col), F.col(text_col), target.cast("boolean").alias("is_target")
    )
    feats = hashed_features(
        flagged, id_col, text_col, n_buckets, use_bigrams, carry=("is_target",)
    )

    # (doc, bucket, k): collapse duplicates before the weight join.
    # doc_feats feeds BOTH the bucket models and the scoring join, so
    # it is pinned (lazy: the bucket-model broadcast job is the first
    # consumer and materializes it inside its own job) — otherwise the
    # tokenize/explode/shuffle subtree runs once per consumer.  A/B
    # under full-materialization timing: pinned <= recompute even at
    # toy scale, and at corpus scale the (doc, bucket, k) table is far
    # narrower than re-reading the text twice.
    doc_feats = materialize(
        feats.groupBy(id_col, "is_target", "bucket").agg(
            F.count(F.lit(1)).alias("k")
        ),
        eager=False,
    )
    # the paper's split: p̂ fit on the target examples, q̂ on the raw
    # pool being selected from (everything else)
    buckets = doc_feats.groupBy("bucket").agg(
        F.sum(F.when(~F.col("is_target"), F.col("k")).otherwise(F.lit(0))).alias("c_raw"),
        F.sum(F.when(F.col("is_target"), F.col("k")).otherwise(F.lit(0))).alias("c_tgt"),
    )
    totals = buckets.agg(
        F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt")
    )
    weights = (
        buckets.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.log(
                ((F.col("c_tgt") + F.lit(1)) / (F.col("t_tgt") + F.lit(n_buckets)))
                / ((F.col("c_raw") + F.lit(1)) / (F.col("t_raw") + F.lit(n_buckets)))
            ).alias("w"),
        )
    )
    scored = (
        doc_feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_feats"),
            F.sum(F.col("k") * F.col("w")).alias("_lw"),
        )
    )
    return (
        flagged.select(id_col, "is_target")
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.col("is_target"),
            F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
            F.round(F.col("_lw"), 6).alias("log_weight"),
        )
    )

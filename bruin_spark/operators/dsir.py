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
from bruin_spark.operators.text import run_length_counts, tokens


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


def _bucket_arr(n_buckets: int, use_bigrams: bool) -> Column:
    """``array<bigint>`` of hashed feature buckets of the bound token
    array column ``_t`` — one per unigram occurrence plus one per
    adjacent-bigram occurrence when ``use_bigrams``.  The array form of
    :func:`hashed_features`' exploded rows (same md5 bucket per
    feature; concat of a NULL unigram array keeps NULL-text documents
    rowless exactly like explode did)."""
    uni = F.transform(
        F.col("_t"), lambda w: F.pmod(_md5_60bit_key(w), F.lit(n_buckets))
    )
    if not use_bigrams:
        return uni
    # CASE-guarded: sequence(1, 0) DESCENDS, so a short array would
    # index out of bounds under ANSI mode (same guard as the explode
    # form's size filter)
    bg = F.when(
        F.size("_t") >= 2,
        F.expr(
            "transform(sequence(1, size(_t) - 1),"
            " i -> concat(element_at(_t, i), ' ', element_at(_t, i + 1)))"
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    bi = F.transform(bg, lambda g: F.pmod(_md5_60bit_key(g), F.lit(n_buckets)))
    return F.concat(uni, bi)


def doc_bucket_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    use_bigrams: bool = True,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *carry, bucket, k) — per-document hashed-feature counts,
    MAP-ONLY (r15).

    ``hashed_features(...).groupBy(id, *carry, bucket).count()``
    grouped by a key containing the document id — a within-document
    aggregation whose exploded rows are co-located by construction, so
    the exchange shuffled one row per feature OCCURRENCE to merge rows
    that were already together (guide §2.4).  The bucket array is
    computed per row and folded by the sorted-run-length walk instead:
    run lengths ARE the per-bucket counts.  Row parity with the
    explode + groupBy form: NULL-text documents produce a NULL bucket
    array and explode drops them, exactly as explode of a NULL token
    array did."""
    extra = [F.col(c) for c in carry]
    return (
        docs.select(F.col(id_col), *extra, tokens(text_col).alias("_t"))
        .select(
            F.col(id_col),
            *extra,
            F.explode(
                run_length_counts(
                    F.array_sort(_bucket_arr(n_buckets, use_bigrams)), "bigint"
                )
            ).alias("_bk"),
        )
        .select(
            F.col(id_col),
            *extra,
            F.col("_bk.v").alias("bucket"),
            F.col("_bk.k").alias("k"),
        )
    )


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
    # (doc, bucket, k): collapsed map-only (see doc_bucket_counts).
    # doc_feats feeds BOTH the bucket models and the scoring join, so
    # it is pinned (lazy: the bucket-model broadcast job is the first
    # consumer and materializes it inside its own job) — otherwise the
    # tokenize/walk subtree runs once per consumer.  At corpus scale
    # the (doc, bucket, k) table is far narrower than re-reading the
    # text twice.
    doc_feats = materialize(
        doc_bucket_counts(
            flagged, id_col, text_col, n_buckets, use_bigrams, carry=("is_target",)
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

"""Test-set decontamination: flag training documents that share word
n-grams with a held-out evaluation corpus.

The standard LLM-pipeline shape (n-gram overlap decontamination): the
eval set is tiny next to the training corpus, so its distinct shingles
are BROADCAST; the corpus side is one scan -> explode -> broadcast hash
join (map-side, no corpus shuffle), and only documents with at least one
hit reach the per-doc aggregation.  At 100 TB the only shuffle carries
(doc_id, partial_count) rows for the contaminated sliver of the corpus.

No reference analog (bruin has no corpus operators); built on the same
shingle expression as the dedup family (operators/text.py shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bruin_spark.operators.text import shingles


def ngram_overlap_contamination(
    corpus: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """Per corpus document: how many of its distinct ``n``-gram shingles
    appear anywhere in ``test``, and whether that makes it contaminated.

    Returns all corpus columns + ``n_hits`` (int) + ``contaminated``
    (bool).  Clean documents keep ``n_hits = 0`` via the left join, so
    the output is exactly one row per corpus document.
    """
    test_sh = (
        test.select(F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle"))
        .distinct()
    )
    hits = (
        corpus.select(
            F.col(id_col).alias("_cid"),
            F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle"),
        )
        .join(F.broadcast(test_sh), "shingle")
        .groupBy("_cid")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    out = corpus.join(hits, corpus[id_col] == hits["_cid"], "left").drop("_cid")
    return out.withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)).cast("int")).withColumn(
        "contaminated", F.col("n_hits") >= min_hits
    )


def fuzzy_contamination(
    corpus: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Paraphrase-robust decontamination: flag corpus documents whose
    DISTINCT-shingle Jaccard similarity against ANY eval document
    reaches ``threshold`` — the fuzzy complement of
    :func:`ngram_overlap_contamination` (which needs a verbatim n-gram
    hit; this catches lightly-edited eval leakage).

    Returns one row per corpus document: ``(id_col, best_eval_id,
    max_jaccard, contaminated_fuzzy)`` with NULL/0.0 for documents
    sharing no shingle.  ``best_eval_id`` ties break on the smaller
    eval id (deterministic).

    100 TB shape: EXACT Jaccard is affordable here precisely because
    the eval side is small by construction — its (shingle, eval_id,
    eval_size) table broadcasts, the corpus-side explode joins
    map-side, and the per-(doc, eval) intersection counts are bounded
    by |eval| per document.  The only corpus-scale shuffle carries
    (doc, eval, partial-count) rows for documents that share at least
    one shingle.  No MinHash estimate error, no band tuning.
    """
    t_sh = test.select(
        F.col(id_col).alias("_tid"),
        F.array_distinct(shingles(text_col, n)).alias("_tsh"),
    ).select(
        "_tid", F.size("_tsh").alias("_tsize"), F.explode("_tsh").alias("shingle")
    )
    c_sh = corpus.select(
        F.col(id_col).alias("_cid"),
        F.array_distinct(shingles(text_col, n)).alias("_csh"),
    ).select(
        "_cid", F.size("_csh").alias("_csize"), F.explode("_csh").alias("shingle")
    )
    pair_stats = (
        c_sh.join(F.broadcast(t_sh), "shingle")
        .groupBy("_cid", "_tid")
        .agg(
            F.count(F.lit(1)).alias("_common"),
            F.first("_csize").alias("_csize"),
            F.first("_tsize").alias("_tsize"),
        )
        .withColumn(
            "_j",
            F.col("_common")
            / (F.col("_csize") + F.col("_tsize") - F.col("_common")).cast("double"),
        )
    )
    # best eval match per doc: algebraic max over a struct (jaccard
    # DESC, eval id ASC via negation) — no window over the corpus
    best = pair_stats.groupBy("_cid").agg(
        F.max(F.struct(F.col("_j"), (-F.col("_tid")).alias("_nt"))).alias("_b")
    ).select(
        F.col("_cid"),
        (-F.col("_b._nt")).alias("best_eval_id"),
        F.col("_b._j").alias("_rawj"),
    )
    # threshold gates on the RAW jaccard (the rounded output column
    # would diverge from any re-derivation at round-boundary values)
    return (
        corpus.select(F.col(id_col))
        .join(best, F.col(id_col) == F.col("_cid"), "left")
        .drop("_cid")
        .select(
            F.col(id_col),
            F.col("best_eval_id"),
            F.coalesce(F.round(F.col("_rawj"), 6), F.lit(0.0)).alias("max_jaccard"),
            (F.coalesce(F.col("_rawj"), F.lit(0.0)) >= threshold).alias(
                "contaminated_fuzzy"
            ),
        )
    )

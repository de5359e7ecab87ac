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

"""The curation funnel: one keep/drop decision per document, composed
from the individual training-data quality operators.

This is the operator a 100 TB corpus pipeline actually runs: not one
signal at a time, but every pre-filter fused into a single decision
table with machine-readable drop reasons (the shape used to audit how
much data each rule removes, and to re-cut the corpus by loosening one
threshold without recomputing the others).

Composition and plan shape:
- quality + fingerprint signals are map-only expressions over one scan;
- repetition is two wordcount-shaped aggregations (map-side combine
  absorbs the repetition itself);
- exact-duplicate detection is a map-side-combinable groupBy min over
  the fingerprint joined back (the canonical survivor is the min doc
  id, as in ``exact_dedup``) — skew-safe on boilerplate-heavy corpora;
- decontamination broadcasts the eval set's shingles (the eval set is
  tiny by construction) — map-side hash join, no corpus shuffle;
- the final assembly joins on the doc id, so every shuffle in the
  funnel shares one key and AQE coalesces them.

Reference parity: bruin has no curation ops (its warehouses own
execution); this is part of the training-data surface this engine adds
(SURVEY.md §2 training-data extras).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bruin_spark.operators.text import (
    fingerprint,
    quality_features,
    repetition_features,
)

#: default thresholds — Gopher/C4-flavored heuristics
MIN_TOKENS = 10
MIN_QUALITY = 0.5
MAX_TOP2GRAM = 0.2


def curation_decisions(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = MIN_TOKENS,
    min_quality: float = MIN_QUALITY,
    max_top2gram: float = MAX_TOP2GRAM,
    decon_n: int = 5,
) -> DataFrame:
    """One row per document: signals + sorted ``drop_reasons`` + ``keep``.

    Reasons (each independent, so loosening one threshold re-cuts the
    corpus without recomputing the rest): ``too_short``, ``low_quality``,
    ``repetitive``, ``exact_duplicate`` (non-canonical copy; the min-id
    copy of each fingerprint group is kept), ``contaminated`` (shares an
    n-gram with ``eval_docs``, when given).
    """
    # quality + fingerprint are map-only expressions: compute them in ONE
    # scan/projection instead of joining two per-doc side tables on id
    base = fingerprint(quality_features(docs, text_col), text_col).select(
        id_col, "n_tokens_q", "quality_score", "doc_fingerprint"
    )
    r = repetition_features(docs, id_col, text_col).select(
        id_col, "top_2gram_frac"
    )
    # canonical id per fingerprint via map-side-combinable groupBy min +
    # join back (AQE-splittable), NOT an unbounded-frame window: a
    # boilerplate text owning 20% of the corpus would stream every copy
    # through one window reducer task.  The key is COALESCEd to a sentinel
    # because fingerprint(NULL text) is NULL, and a NULL key never
    # equi-joins to itself — without the sentinel, NULL-text docs silently
    # vanish from the inner join (same class as dedup._text_group_key).
    base = base.withColumn(
        "_fp_key", F.coalesce(F.col("doc_fingerprint"), F.lit("__null__"))
    )
    mins = base.groupBy("_fp_key").agg(
        F.min(id_col).alias("_canonical_id")
    )
    canon = base.join(mins, "_fp_key").select(
        id_col,
        "n_tokens_q",
        "quality_score",
        (F.col(id_col) != F.col("_canonical_id")).alias("_is_exact_dup"),
    )

    out = canon.join(r, id_col)

    if eval_docs is not None:
        from bruin_spark.operators.contamination import ngram_overlap_contamination

        decon = ngram_overlap_contamination(
            docs, eval_docs, id_col, text_col, n=decon_n
        ).select(id_col, "contaminated")
        out = out.join(decon, id_col, "left")
    else:
        out = out.withColumn("contaminated", F.lit(False))

    reasons = F.array_sort(
        F.filter(
            F.array(
                # NULL-safe: NULL text has NULL n_tokens_q, which must
                # read as 0 tokens (too_short), not "no opinion"
                F.when(
                    F.coalesce(F.col("n_tokens_q"), F.lit(0)) < min_tokens,
                    "too_short",
                ),
                F.when(F.col("quality_score") < min_quality, "low_quality"),
                F.when(F.col("top_2gram_frac") > max_top2gram, "repetitive"),
                F.when(F.col("_is_exact_dup"), "exact_duplicate"),
                F.when(F.coalesce(F.col("contaminated"), F.lit(False)), "contaminated"),
            ),
            lambda x: x.isNotNull(),
        )
    )
    return (
        out.withColumn("drop_reasons", F.concat_ws(",", reasons))
        .withColumn("keep", F.col("drop_reasons") == "")
        .select(
            id_col,
            F.col("n_tokens_q").alias("n_tokens"),
            "quality_score",
            "top_2gram_frac",
            "drop_reasons",
            "keep",
        )
    )

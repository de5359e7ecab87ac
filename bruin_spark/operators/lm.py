"""N-gram language-model quality scoring (CCNet-style perplexity filter).

The standard LLM-training-data quality signal: train a smoothed bigram
LM on the corpus (or a trusted reference corpus), score every document
by its average token log-probability, and filter/bucket on the score —
low-probability documents are gibberish/boilerplate, suspiciously
high-probability documents are templated spam.

100 TB shape:
- Model training is TWO map-side-combinable aggregations over the
  exploded token stream (unigram counts, adjacent-pair counts) — the
  same single-corpus-pass discipline as the BPE trainer.
- Vocabulary pruning (``top_v``) maps tail tokens to ``<unk>`` BEFORE
  counting, which is what makes the model tables *bounded* — O(top_v)
  unigrams, O(observed pairs over a top_v alphabet) bigrams — and
  therefore broadcastable to the scoring join. Without pruning the
  bigram table grows with the corpus (Heaps' law) and the scoring join
  degrades to a key shuffle; both modes are supported, pruned is the
  production setting.
- The unk-mapping itself is a broadcast left join applied to the
  bigram's two sides INDEPENDENTLY (mapping is per-token, so it
  commutes with pairing) — the corpus-side stream is never
  re-assembled positionally.
- Scoring is one groupBy(doc, a, b) pre-aggregation (duplicate bigrams
  collapse map-side) + broadcast joins against the model + one groupBy
  per document. Every expression is a Spark built-in; no Python in the
  hot path.

Determinism: counts are exact integers; add-alpha smoothing uses exact
binary fractions (alpha=0.5 by default), so ``ln((c_ab + α)/(c_a +
α·V))`` is the same IEEE double on any engine. Per-document sums of a
handful of doubles differ only in addition order (≪1e-9), absorbed by
round(…, 6) on the output columns.

Smoothing: add-alpha (Lidstone) over a vocabulary of size V — chosen
over Kneser-Ney precisely because it is exactly reproducible in plain
SQL (the DuckDB oracle re-expresses it verbatim).

Ref parity anchor: the reference has no LM scorer (quality checks stop
at column-level rules, pkg/ansisql/checks.go); this extends the
training-data curation family (operators/text.py quality_features,
curation funnel) with the corpus-statistics quality signal those
heuristics can't express.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from bruin_spark.checkpointing import materialize
from bruin_spark.operators.text import tokens

UNK = "<unk>"


def _pairs(tok_col: str) -> Column:
    """Adjacent (a, b) token pairs of the named array column, as
    structs.  Caller guarantees size >= 2 (Spark's sequence(1, 0)
    DESCENDS, so a shorter array would index out of bounds)."""
    return F.expr(
        f"transform(sequence(1, size({tok_col}) - 1),"
        f" i -> struct(element_at({tok_col}, i) as a,"
        f" element_at({tok_col}, i + 1) as b))"
    )


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    top_v: int | None = None,
) -> DataFrame:
    """Score each document under an add-alpha bigram LM trained on the
    same corpus.

    Returns ``(id_col, n_bigrams, avg_logprob, perplexity)`` —
    ``avg_logprob`` is the mean natural-log bigram probability,
    ``perplexity = exp(-avg_logprob)``; documents with fewer than two
    tokens carry ``n_bigrams = 0`` and NULL scores.

    ``top_v``: keep only the ``top_v`` most frequent tokens (count
    DESC, token ASC ties) as the vocabulary; all other tokens become
    ``<unk>`` for BOTH training and scoring. This bounds the model
    tables (broadcastable at any corpus size) — the production setting.
    """
    base = docs.select(F.col(id_col), tokens(text_col).alias("t"))
    toks = base.select(F.explode("t").alias("w"))

    if top_v is not None:
        vocab = (
            toks.groupBy("w")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), F.col("w").asc())
            .limit(top_v)
            .select("w")
        )
        # the vocab feeds the unigram job and the pair job — pin it
        # once; LAZY, so the first consuming job materializes it inline
        # (scan + checkpoint-write + aggregate in one pass)
        vocab = materialize(vocab, eager=False)

        def _map_token(df: DataFrame, col: str) -> DataFrame:
            kept = f"__kept_{col}"
            v = vocab.select(F.col("w").alias(kept))
            return (
                df.join(F.broadcast(v), df[col] == F.col(kept), "left")
                .withColumn(col, F.coalesce(F.col(kept), F.lit(UNK)))
                .drop(kept)
            )

        toks = _map_token(toks, "w")
    else:

        def _map_token(df: DataFrame, col: str) -> DataFrame:
            return df

    # -- model: unigram and bigram counts (map-side combinable) -------
    unigrams = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c_a"))
    # lazy pin: the V-probe count below is the first consumer and
    # materializes it in its own job; the scoring join then reuses it
    unigrams = materialize(unigrams, eager=False)
    # V: vocabulary size used by the smoother = distinct trained tokens
    # (single-row driver probe, same budget class as BPE's per-merge row)
    v_size = unigrams.count()

    # size guard first: Spark's sequence(1, 0) DESCENDS ([1, 0]), so a
    # single-token document would index past the array under ANSI mode;
    # size(NULL) is NULL, so NULL texts drop here too
    raw_pairs = (
        base.filter(F.size("t") >= 2)
        .select(F.col(id_col), F.explode(_pairs("t")).alias("p"))
        .select(id_col, F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    raw_pairs = _map_token(_map_token(raw_pairs, "a"), "b")
    # collapse duplicate (doc, a, b) early: the scoring join and the
    # model aggregation both run on the collapsed table
    doc_pairs = raw_pairs.groupBy(id_col, "a", "b").agg(
        F.count(F.lit(1)).alias("k")
    )
    doc_pairs = materialize(doc_pairs, eager=True)
    bigrams = doc_pairs.groupBy("a", "b").agg(F.sum("k").alias("c_ab"))

    # -- scoring -------------------------------------------------------
    # model tables are vocab-bounded under top_v → broadcast; without
    # top_v Spark plans a key shuffle (AQE may still broadcast small ones)
    bi = F.broadcast(bigrams) if top_v is not None else bigrams
    uni = F.broadcast(unigrams) if top_v is not None else unigrams
    logp = F.log(
        (F.col("c_ab") + F.lit(alpha))
        / (F.col("c_a") + F.lit(alpha) * F.lit(float(v_size)))
    )
    scored = (
        doc_pairs.join(bi, ["a", "b"])  # trained on same corpus → total
        .join(uni, F.col("a") == F.col("w"))
        .select(F.col(id_col), F.col("k"), logp.alias("lp"))
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_bigrams"),
            (F.sum(F.col("k") * F.col("lp")) / F.sum("k")).alias("_avg"),
        )
    )
    # left join back so <2-token documents keep a row (NULL scores)
    out = (
        docs.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.round(F.col("_avg"), 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("_avg")), 6).alias("perplexity"),
        )
    )
    return out


def perplexity_buckets(
    docs: DataFrame,
    n_buckets: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    alpha: float = 0.5,
    top_v: int | None = None,
    approx: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """CCNet's perplexity bucketing (Wenzek et al. 2020 §4.3): score
    every document under the corpus bigram LM, then split each
    language into equal-count perplexity buckets — head (lowest
    perplexity, most fluent), middle, tail.  Training pipelines keep
    head+middle or re-weight buckets.

    Returns ``(id_col, lang, perplexity, ppl_bucket, ppl_band)``;
    documents the LM cannot score (<2 tokens) keep their row with a
    NULL bucket.

    Two bucketing modes:

    - ``approx=False`` (exact, CCNet-faithful): ``ntile`` window
      partitioned by language, ordered by (rounded perplexity, id) —
      deterministic, exactly-equal bucket counts, cross-engine stable.
      The window sort funnels each language through ONE task, so this
      mode is for corpora where the hottest language fits a partition
      sort.
    - ``approx=True`` (the 100 TB path): per-language bucket
      thresholds via ``percentile_approx`` — a map-side-combinable
      GK-sketch aggregation producing ONE row per language — broadcast
      back, with buckets assigned in a map-only projection.  NO window
      anywhere in the plan (plan-asserted in tests); the per-language
      reducer merges constant-size sketches instead of sorting the
      language's documents.  Boundary documents (exact threshold ties
      / sketch rank error ≤ n/accuracy) may land one bucket off the
      ntile assignment; everything away from boundaries agrees.
    """
    from pyspark.sql import Window

    scored = bigram_lm_scores(
        docs, text_col=text_col, id_col=id_col, alpha=alpha, top_v=top_v
    ).select(id_col, "perplexity")
    flagged = docs.select(F.col(id_col), F.col(lang_col).alias("lang"))
    # pinned: both the bucketing branch and the outer left join consume
    # this LM-scoring subtree — unpinned, the corpus-scale scoring
    # join would execute once per consumer (same pattern as
    # dsir_weights' doc_feats)
    joined = materialize(flagged.join(scored, id_col, "left"), eager=False)

    if approx:
        # thresholds at i/n quantiles, one sketch row per language;
        # the groupBy(lang) reducer merges bounded GK summaries —
        # never the language's rows — so the hot language costs the
        # same as a cold one
        pcts = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
        thresholds = (
            joined.filter(F.col("perplexity").isNotNull())
            .groupBy("lang")
            .agg(
                F.percentile_approx(
                    "perplexity", pcts, F.lit(approx_accuracy)
                ).alias("_thr")
            )
        )
        # bucket = 1 + |{thresholds strictly below this doc}|: map-only
        # JVM fold over the (n_buckets - 1)-element broadcast array
        bucket = F.when(
            F.col("perplexity").isNotNull(),
            F.aggregate(
                F.col("_thr"),
                F.lit(1),
                lambda acc, t: acc
                + F.when(F.col("perplexity") > t, 1).otherwise(0),
            ),
        )
        # NULL-SAFE join: groupBy keeps NULL lang as its own group (as
        # the exact mode's Window.partitionBy does), but an equi-join
        # would drop it — NULL-lang docs must bucket, not silently fail
        thr = F.broadcast(thresholds.withColumnRenamed("lang", "_tlang"))
        labeled = joined.join(
            thr, joined["lang"].eqNullSafe(thr["_tlang"]), "left"
        ).select(
            F.col(id_col),
            F.col("lang"),
            F.col("perplexity"),
            bucket.alias("ppl_bucket"),
        )
    else:
        w = Window.partitionBy("lang").orderBy(
            F.col("perplexity"), F.col(id_col)
        )
        bucketed = (
            joined.filter(F.col("perplexity").isNotNull())
            .withColumn("ppl_bucket", F.ntile(n_buckets).over(w))
        )
        labeled = joined.join(
            bucketed.select(id_col, "ppl_bucket"), id_col, "left"
        ).select(
            F.col(id_col),
            F.col("lang"),
            F.col("perplexity"),
            F.col("ppl_bucket"),
        )

    band = (
        F.when(F.col("ppl_bucket") == 1, F.lit("head"))
        .when(F.col("ppl_bucket") == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return labeled.select(
        F.col(id_col),
        F.col("lang"),
        F.col("perplexity"),
        F.col("ppl_bucket"),
        F.when(F.col("ppl_bucket").isNotNull(), band).alias("ppl_band"),
    )

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
- The unk-mapping applies to the bigram's two sides INDEPENDENTLY
  (mapping is per-token, so it commutes with pairing) — the
  corpus-side stream is never re-assembled positionally.  For vocabs
  up to ``INSET_MAX_VOCAB`` it is a literal IN-set expression (pure
  map-side, no join node on the corpus stream); above that it is a
  broadcast left join.
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

# Vocabulary-size cutoff for inlining the unk map as a literal IN-set
# expression instead of a broadcast left join.  The vocab is bounded by
# ``top_v`` (a parameter, known before anything runs), so up to this
# size it is collected to the driver (same bounded-collect budget class
# as the v_size / n_total single-row probes) and the map becomes a pure
# map-side expression — no broadcast exchange, no relation build, no
# join node on the corpus-scale token/pair/trigram streams (guide §2.4:
# remove the shuffle machinery outright when the small side is tiny).
# Catalyst turns the IN into an InSet hash probe above
# spark.sql.optimizer.inSetConversionThreshold, so per-row cost matches
# the join's hash probe without the exchange.  Above the cutoff the
# broadcast-join form is kept: a 100k-literal expression tree bloats
# the plan and the task closure for no win over a broadcast.
INSET_MAX_VOCAB = 4096


def _unk_map_expr(col: str, vocab: list[str]) -> Column:
    """``col`` if it is in ``vocab`` else ``<unk>`` — the literal-IN-set
    form of the unk map.  NULL tokens map to UNK exactly like the
    broadcast-left-join form (NULL isin(...) is NULL -> otherwise)."""
    if not vocab:
        return F.lit(UNK)
    return F.when(F.col(col).isin(vocab), F.col(col)).otherwise(F.lit(UNK))


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
    complete_ids: bool = True,
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

    ``complete_ids=False`` skips the final "left join back so every
    document keeps a row" pass: the output then has rows ONLY for
    documents with >= 1 bigram (values identical where present).  For
    a caller that immediately left-joins the scores onto its own
    full-document table — :func:`perplexity_buckets` does exactly that
    — the completion join is redundant: it costs one extra corpus-id
    scan plus a doc-count-scale join (2 Exchanges) to manufacture NULL
    rows the caller's left join would produce anyway (guide §2.4).

    NOTE: under ``top_v <= INSET_MAX_VOCAB`` this function is an EAGER
    builder — the vocabulary IN-set is collected at plan-construction
    time, so merely constructing the plan runs a real Spark job and any
    build-time error surfaces before the caller's first action
    (plan-only tooling: expect jobs from this call).
    """
    base = docs.select(F.col(id_col), tokens(text_col).alias("t"))
    toks = base.select(F.explode("t").alias("w"))

    if top_v is not None:
        # ONE corpus-scale token aggregation serves BOTH the vocab
        # selection and the unigram model: the per-distinct-token counts
        # are computed once, the top_v cut is a k-row TakeOrdered over
        # them, and the unk-mapped unigram table is a re-aggregation of
        # the |distinct tokens| count rows — never a second explode +
        # shuffle of the token STREAM (guide §2.3 "aggregate before you
        # shuffle"; the previous shape tokenized and shuffled the corpus
        # twice, once for vocab and once for unigrams, with identical
        # resulting counts: Σ_occurrences 1 grouped by mapped token ==
        # Σ_distinct-token counts grouped by mapped token).
        wc = materialize(
            toks.groupBy("w").agg(F.count(F.lit(1)).alias("c")), eager=False
        )
        if top_v <= INSET_MAX_VOCAB:
            # the vocab is ≤ top_v rows: collect it once (this is also
            # the job that materializes the pinned wc) and apply the
            # unk map as a literal IN-set expression — zero broadcast
            # joins on the corpus-scale pair stream below
            vocab_list = [
                r[0]
                for r in wc.orderBy(F.col("c").desc(), F.col("w").asc())
                .limit(top_v)
                .collect()
            ]

            def _map_token(df: DataFrame, col: str) -> DataFrame:
                return df.withColumn(col, _unk_map_expr(col, vocab_list))

        else:
            vocab = (
                wc.orderBy(F.col("c").desc(), F.col("w").asc())
                .limit(top_v)
                .select("w")
            )
            # the vocab feeds the unigram derivation and the pair job —
            # pin it once; LAZY, so the first consuming job materializes
            # it inline (scan + checkpoint-write + aggregate in one pass)
            vocab = materialize(vocab, eager=False)

            def _map_token(df: DataFrame, col: str) -> DataFrame:
                kept = f"__kept_{col}"
                v = vocab.select(F.col("w").alias(kept))
                return (
                    df.join(F.broadcast(v), df[col] == F.col(kept), "left")
                    .withColumn(col, F.coalesce(F.col(kept), F.lit(UNK)))
                    .drop(kept)
                )

        unigrams = (
            _map_token(wc, "w").groupBy("w").agg(F.sum("c").alias("c_a"))
        )
    else:

        def _map_token(df: DataFrame, col: str) -> DataFrame:
            return df

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
    if not complete_ids:
        # scored has one row per document with >= 1 bigram, and the
        # model joins are lossless (trained on the same corpus), so
        # every value below matches the completed output's row for
        # that document exactly
        return scored.select(
            F.col(id_col),
            F.col("n_bigrams"),
            F.round(F.col("_avg"), 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("_avg")), 6).alias("perplexity"),
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

    # complete_ids=False: the left join onto `flagged` below restores
    # the missing (<2-token) documents with NULL perplexity — exactly
    # what the completed output would carry — so the scorer's own
    # completion join (one corpus-id scan + a doc-scale join) is
    # redundant here and skipped (guide §2.4)
    scored = bigram_lm_scores(
        docs,
        text_col=text_col,
        id_col=id_col,
        alpha=alpha,
        top_v=top_v,
        complete_ids=False,
    ).select(id_col, "perplexity")
    flagged = docs.select(F.col(id_col), F.col(lang_col).alias("lang"))
    # pinned: both the bucketing branch and the outer left join consume
    # this LM-scoring subtree — unpinned, the corpus-scale scoring
    # join would execute once per consumer (same pattern as
    # dsir_weights' doc_feats).  EAGER: the two consumers are subtrees
    # of the single final job, materialize's documented eager case — a
    # lazy pin lets AQE submit both upstream map stages concurrently
    # and compute `joined` twice before the cache fills (measured:
    # eager drops 31 tasks on both ccnet entries at sf0.1).
    joined = materialize(flagged.join(scored, id_col, "left"), eager=True)

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


def _trigrams(tok_col: str) -> Column:
    """Adjacent (a, b, w) token triples of the named array column, as
    structs.  Caller guarantees size >= 3 (sequence(1, 0) DESCENDS)."""
    return F.expr(
        f"transform(sequence(1, size({tok_col}) - 2),"
        f" i -> struct(element_at({tok_col}, i) as a,"
        f" element_at({tok_col}, i + 1) as b,"
        f" element_at({tok_col}, i + 2) as w))"
    )


def stupid_backoff_scores(
    docs: DataFrame,
    train_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_v: int = 16,
    backoff: float = 0.4,
) -> DataFrame:
    """Trigram stupid-backoff scoring (Brants et al. 2007 §4): train
    n-gram counts on a TRUSTED slice of the corpus (``train_filter``;
    the CCNet shape — LM trained on Wikipedia, applied to the crawl),
    score every document by its mean log trigram score under

        S(w | a, b) = c3(a,b,w)/c2(a,b)          if the trigram was seen
                    = 0.4 * c2(b,w)/c1(b)        else if the bigram was
                    = 0.4 * (0.4 * c1(w)/N)      else (total whenever
                                                  '<unk>' itself was
                                                  trained, i.e. the
                                                  training slice has
                                                  out-of-vocabulary
                                                  tokens — always true
                                                  under top_v pruning
                                                  of a real corpus)

    Stupid backoff is chosen over Katz/Kneser-Ney exactly as the paper
    argues: the score needs no discount bookkeeping, so it is
    count-ratio arithmetic — distributed-friendly AND bit-reproducible
    in plain SQL (the DuckDB oracle re-expresses it verbatim; both
    engines evaluate ``0.4 * (0.4 * (c/n))`` in the same association
    order, so the doubles agree exactly).

    Returns ``(id_col, n_trigrams, n_tri_hits, n_bi_hits, n_uni_hits,
    avg_logscore, score_ppl)`` — hit counts say which backoff level
    served each position; documents with <3 tokens carry
    ``n_trigrams = 0`` and NULL scores.  ``avg_logscore`` averages over
    the SCORABLE positions only: in the degenerate case where even the
    unigram level is untrained (no '<unk>' unigram because the training
    slice had <= top_v distinct tokens), unscorable positions drop from
    both the numerator and the denominator instead of silently biasing
    the mean toward zero.

    100 TB shape:
    - ``top_v`` unk-pruning bounds EVERY model table by the trained
      alphabet (≤ (top_v+1)^3 trigrams) — all three model joins
      broadcast at any corpus size, exactly the property the paper's
      distributed serving layer needed.
    - Counting is three map-side-combinable aggregations over the
      TRAINING slice only (filter pushed to the scan).
    - Scoring pre-collapses the corpus stream to (doc, a, b, w, k) —
      one doc-keyed shuffle; repeated trigrams score once.
    - The unk map applies to a/b/w independently (per-token, commutes
      with the windowing), so the stream is never re-assembled.
    """
    base = docs.select(F.col(id_col), tokens(text_col).alias("t"))
    train = docs.filter(train_filter).select(tokens(text_col).alias("t"))
    train_toks = train.select(F.explode("t").alias("w"))

    # ONE training-slice token aggregation serves both the vocab cut and
    # the unigram model (same derivation as bigram_lm_scores: re-group
    # the |distinct tokens| count rows under the unk map instead of
    # exploding and shuffling the token stream a second time)
    wc = materialize(
        train_toks.groupBy("w").agg(F.count(F.lit(1)).alias("c")), eager=False
    )
    if top_v <= INSET_MAX_VOCAB:
        # tiny vocab (bounded by the top_v parameter): collect it once
        # and inline the unk map as a literal IN-set — this removes
        # NINE broadcast joins from the call (three over the
        # corpus-scale scoring trigram stream, six over the training
        # streams), leaving only the vocab-bounded model joins
        vocab_list = [
            r[0]
            for r in wc.orderBy(F.col("c").desc(), F.col("w").asc())
            .limit(top_v)
            .collect()
        ]

        def _map_token(df: DataFrame, col: str) -> DataFrame:
            return df.withColumn(col, _unk_map_expr(col, vocab_list))

    else:
        vocab = (
            wc.orderBy(F.col("c").desc(), F.col("w").asc())
            .limit(top_v)
            .select("w")
        )
        vocab = materialize(vocab, eager=False)

        def _map_token(df: DataFrame, col: str) -> DataFrame:
            kept = f"__kept_{col}"
            v = vocab.select(F.col("w").alias(kept))
            return (
                df.join(F.broadcast(v), df[col] == F.col(kept), "left")
                .withColumn(col, F.coalesce(F.col(kept), F.lit(UNK)))
                .drop(kept)
            )

    # -- model counts over the training slice (all map-side combinable)
    uni = _map_token(wc, "w").groupBy("w").agg(F.sum("c").alias("c1"))
    uni = materialize(uni, eager=False)
    # N: total trained tokens (single-row driver probe, same budget
    # class as bigram_lm_scores' v_size)
    n_total = uni.agg(F.sum("c1")).collect()[0][0] or 0

    tr_pairs = train.filter(F.size("t") >= 2).select(
        F.explode(_pairs("t")).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    bi = (
        _map_token(_map_token(tr_pairs, "a"), "b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    bi = materialize(bi, eager=False)

    tr_tris = train.filter(F.size("t") >= 3).select(
        F.explode(_trigrams("t")).alias("g")
    ).select(
        F.col("g.a").alias("a"), F.col("g.b").alias("b"), F.col("g.w").alias("w")
    )
    tri = (
        _map_token(_map_token(_map_token(tr_tris, "a"), "b"), "w")
        .groupBy("a", "b", "w")
        .agg(F.count(F.lit(1)).alias("c3"))
    )

    # -- scoring stream: pre-collapsed per document ---------------------
    raw = (
        base.filter(F.size("t") >= 3)
        .select(F.col(id_col), F.explode(_trigrams("t")).alias("g"))
        .select(
            id_col,
            F.col("g.a").alias("a"),
            F.col("g.b").alias("b"),
            F.col("g.w").alias("w"),
        )
    )
    raw = _map_token(_map_token(_map_token(raw, "a"), "b"), "w")
    doc_tris = raw.groupBy(id_col, "a", "b", "w").agg(
        F.count(F.lit(1)).alias("k")
    )

    # model joins: all vocab-bounded -> broadcast
    c2ab = bi.select(
        F.col("a").alias("_a2"), F.col("b").alias("_b2"), F.col("c2").alias("c2ab")
    )
    c2bw = bi.select(
        F.col("a").alias("_b3"), F.col("b").alias("_w3"), F.col("c2").alias("c2bw")
    )
    c1b = uni.select(F.col("w").alias("_ub"), F.col("c1").alias("c1b"))
    c1w = uni.select(F.col("w").alias("_uw"), F.col("c1").alias("c1w"))
    joined = (
        doc_tris.join(
            F.broadcast(tri), ["a", "b", "w"], "left"
        )
        .join(
            F.broadcast(c2ab),
            (F.col("a") == F.col("_a2")) & (F.col("b") == F.col("_b2")),
            "left",
        )
        .join(
            F.broadcast(c2bw),
            (F.col("b") == F.col("_b3")) & (F.col("w") == F.col("_w3")),
            "left",
        )
        .join(F.broadcast(c1b), F.col("b") == F.col("_ub"), "left")
        .join(F.broadcast(c1w), F.col("w") == F.col("_uw"), "left")
    )
    bk = F.lit(backoff)
    score = (
        F.when(
            F.col("c3").isNotNull(), F.col("c3") / F.col("c2ab")
        )
        .when(
            F.col("c2bw").isNotNull(), bk * (F.col("c2bw") / F.col("c1b"))
        )
        .otherwise(bk * (bk * (F.col("c1w") / F.lit(n_total))))
    )
    level = (
        F.when(F.col("c3").isNotNull(), F.lit(3))
        .when(F.col("c2bw").isNotNull(), F.lit(2))
        .otherwise(F.lit(1))
    )
    scored = (
        joined.select(
            F.col(id_col),
            F.col("k"),
            F.log(score).alias("ls"),
            level.alias("lvl"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("k").alias("n_trigrams"),
            F.sum(F.when(F.col("lvl") == 3, F.col("k")).otherwise(0)).alias(
                "n_tri_hits"
            ),
            F.sum(F.when(F.col("lvl") == 2, F.col("k")).otherwise(0)).alias(
                "n_bi_hits"
            ),
            F.sum(F.when(F.col("lvl") == 1, F.col("k")).otherwise(0)).alias(
                "n_uni_hits"
            ),
            # numerator AND denominator restricted to scorable rows:
            # SUM skips NULL ls on its own, but a bare SUM(k) would
            # still count the unscorable positions and bias the mean
            (
                F.sum(F.col("k") * F.col("ls"))
                / F.sum(F.when(F.col("ls").isNotNull(), F.col("k")))
            ).alias("_avg"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_trigrams"), F.lit(0)).alias("n_trigrams"),
            F.coalesce(F.col("n_tri_hits"), F.lit(0)).alias("n_tri_hits"),
            F.coalesce(F.col("n_bi_hits"), F.lit(0)).alias("n_bi_hits"),
            F.coalesce(F.col("n_uni_hits"), F.lit(0)).alias("n_uni_hits"),
            F.round(F.col("_avg"), 6).alias("avg_logscore"),
            F.round(F.exp(-F.col("_avg")), 6).alias("score_ppl"),
        )
    )

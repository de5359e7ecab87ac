"""BM25 ranked retrieval over a document corpus.

The lexical-relevance workhorse of corpus curation: score documents
against a term query (quality-filter a crawl against a topic profile,
retrieve near-topic documents for targeted dataset construction, or
build the sparse side of a hybrid sparse+dense retriever next to the
ANN operators in similarity.py).

Plan shape at 100 TB:
- document lengths and the corpus aggregate (N, avgdl) are one
  map-side-combined aggregation each; the aggregate row is
  broadcast-cross-joined (one row — never a shuffle);
- term frequencies explode only tokens MATCHING the query terms (the
  filter lands inside the explode projection, so the shuffle carries
  |matching tokens| rows, not the corpus token count);
- document frequencies per term are a tiny per-term aggregate,
  broadcast back;
- the final top-k is sort-free: ``orderBy(...).limit(k)`` plans as
  TakeOrderedAndProject — per-partition heaps + one k-row merge on the
  driver, no global sort shuffle.

Reference parity: none (bruin delegates query execution); part of the
training-data surface this engine adds (SURVEY.md §2 extras).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bruin_spark.operators.text import tokens

K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    top_k: int = 20,
) -> DataFrame:
    """Top ``top_k`` documents by BM25 score against ``query_terms``.

    Okapi BM25 with the standard +1 idf smoothing:
    ``idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)``;
    ``score = Σ_t idf · tf(k1+1) / (tf + k1(1 - b + b·dl/avgdl))``.
    Scores round to 6 decimals and ties break on the doc id, so the
    cutoff is deterministic across engines.
    """
    # tokens() lowercases the corpus; match the query to it so an
    # uppercase term can't silently contribute zero matches
    query_terms = [t.lower() for t in query_terms]
    toks = tokens(text_col)
    lens = docs.select(F.col(id_col).alias("id"), F.size(toks).alias("dl"))
    gstats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # dl rides through the explode (constant per doc, min() restores it
    # after the groupBy) instead of joining the corpus-scale lens table
    # back onto tf — one fewer corpus join/scan (guide §2.4); the token
    # array binds once in the projection below, so size() and explode()
    # share the same evaluation
    tf = (
        docs.select(F.col(id_col).alias("id"), toks.alias("_t"))
        .select("id", F.size("_t").alias("dl"), F.explode("_t").alias("tok"))
        .filter(F.col("tok").isin(list(query_terms)))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    joined = tf.join(F.broadcast(df_t), "tok").crossJoin(F.broadcast(gstats))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    term_score = idf * (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    scores = joined.groupBy("id").agg(F.round(F.sum(term_score), 6).alias("bm25"))
    return (
        scores.orderBy(F.col("bm25").desc(), F.col("id").asc())
        .limit(top_k)
        .select(F.col("id").alias(id_col), "bm25")
    )


def bm25_multi_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k1: float = K1,
    b: float = B,
    top_k: int = 20,
) -> DataFrame:
    """Per-query BM25 top-k for a BATCH of term queries — the sparse
    side of a hybrid retriever serving many queries in one corpus
    pass.

    ``queries`` is ``(query_id_col, terms_col array<string>)``.  Same
    Okapi arithmetic as :func:`bm25_topk`; one corpus scan serves every
    query:
    - the UNION of all query terms (bounded by the query batch)
      broadcast-semi-joins the exploded token stream, so the shuffle
      carries only matching tokens;
    - df/lens/global stats are shared across queries (computed once);
    - the (query, term) table broadcasts onto the (doc, term) tf rows;
      per-(query, doc) scores reduce map-side;
    - per-query top-k is a rank window over the scored candidates
      (bounded by |matching docs| per query, not the corpus).

    Returns ``(query_id, doc_id, bm25, rank)``.
    """
    from pyspark.sql import Window

    from bruin_spark.checkpointing import materialize

    # lowercase the terms like bm25_topk does: tokens() lowercases the
    # corpus, so an uppercase query term must not silently match nothing
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(terms_col).alias("_tok0"),
        )
        .select("query_id", F.lower(F.col("_tok0")).alias("tok"))
        .distinct()
    )
    # qterms fans out to TWO consumers (the term-set semi-join build and
    # the per-(query, term) broadcast below); ``queries`` may itself be
    # a derived pipeline (the hybrid entries mine query terms from the
    # corpus with a window), so pin the tiny (query, term) table once
    # instead of evaluating that pipeline once per consumer
    qterms = materialize(qterms, eager=False)
    term_set = qterms.select("tok").distinct()
    toks = tokens(text_col)
    lens = docs.select(F.col(id_col).alias("id"), F.size(toks).alias("dl"))
    gstats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # dl rides through the explode (constant per doc) instead of joining
    # the corpus-scale lens table back onto tf — one fewer corpus
    # join/scan per batch call (guide §2.4)
    tf = (
        docs.select(F.col(id_col).alias("id"), toks.alias("_t"))
        .select("id", F.size("_t").alias("dl"), F.explode("_t").alias("tok"))
        .join(F.broadcast(term_set), "tok", "left_semi")
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    joined = (
        tf.join(F.broadcast(qterms), "tok")
        .join(F.broadcast(df_t), "tok")
        .crossJoin(F.broadcast(gstats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    term_score = idf * (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    scores = joined.groupBy("query_id", "id").agg(
        F.round(F.sum(term_score), 6).alias("bm25")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", F.col("id").alias(id_col), "bm25", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    top_k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09): fuse N
    per-query rankings into one by ``rrf(d) = Σ_r 1/(k + rank_r(d))``
    — the standard glue of hybrid sparse+dense retrieval, needing no
    score calibration between the systems.

    Each input carries ``(query_id_col, id_col, rank_col)``; documents
    missing from a ranking contribute nothing for it.  All arithmetic
    is a sum of exact reciprocals of small integers evaluated in ONE
    aggregate, so both engines produce identical doubles; output
    rounds to 6 and ties break on the doc id.

    Plan: union of the (already small) per-query candidate lists →
    one map-side-combinable groupBy(query, doc) → per-query rank
    window over ≤ N·top_k candidates.  Returns ``(query_id, doc_id,
    rrf, rank)``.
    """
    from functools import reduce

    from pyspark.sql import Window

    parts = [
        r.select(
            F.col(query_id_col).alias("query_id"),
            F.col(id_col).alias("id"),
            F.col(rank_col).alias("_r"),
        )
        for r in rankings
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    fused = unioned.groupBy("query_id", "id").agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("_r"))), 6).alias("rrf")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", F.col("id").alias(id_col), "rrf", "rank")
    )

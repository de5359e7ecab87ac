"""Batched BM25 + reciprocal-rank fusion (operators/ranking.py
bm25_multi_topk, rrf_fuse)."""

import pytest
from pyspark.sql import functions as F

from bruin_spark.operators.ranking import bm25_multi_topk, bm25_topk, rrf_fuse

DOCS = [
    (0, "spark join filter batch spark join"),
    (1, "filter batch filter batch filter"),
    (2, "window sort merge shuffle hash"),
    (3, "join join join join join join join"),
    (4, "batch"),
]


def test_multi_matches_single_query_bm25(spark):
    """A one-query batch reproduces bm25_topk's scores exactly — and
    uppercase terms lowercase like the single-query variant (tokens()
    lowercases the corpus; an uppercase term must not silently score
    zero)."""
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    queries = spark.createDataFrame(
        [(100, ["Join", "BATCH"])], "query_id int, terms array<string>"
    )
    multi = {
        r["doc_id"]: r["bm25"]
        for r in bm25_multi_topk(docs, queries, top_k=10).collect()
    }
    single = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(docs, ["join", "batch"], top_k=10).collect()
    }
    assert multi == single and multi


def test_multi_ranks_are_per_query(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    queries = spark.createDataFrame(
        [(100, ["join"]), (200, ["batch", "filter"])],
        "query_id int, terms array<string>",
    )
    out = bm25_multi_topk(docs, queries, top_k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1)), q
        rows.sort(key=lambda r: r["rank"])
        scores = [r["bm25"] for r in rows]
        assert scores == sorted(scores, reverse=True)
    # doc 3 (join-heavy) tops the 'join' query; doc 1 tops 'batch filter'
    assert by_q[100][0]["doc_id"] == 3
    assert by_q[200][0]["doc_id"] == 1


def test_rrf_hand_values(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id int, doc_id int, rank int"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id int, doc_id int, rank int"
    )
    got = {r["doc_id"]: r for r in rrf_fuse([a, b], k=60, top_k=10).collect()}
    # doc 11 appears in both: 1/62 + 1/61
    assert got[11]["rrf"] == pytest.approx(round(1 / 62 + 1 / 61, 6))
    assert got[10]["rrf"] == pytest.approx(round(1 / 61, 6))
    assert got[13]["rrf"] == pytest.approx(round(1 / 62, 6))
    # fusion order: 11 first (two votes), then 10 vs 13 (1/61 > 1/62)
    order = sorted(got.values(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in order] == [11, 10, 13, 12]


def test_rrf_top_k_cut_and_ties(spark):
    # two docs with identical rrf tie-break on doc id
    a = spark.createDataFrame(
        [(1, 20, 1), (1, 21, 1)], "query_id int, doc_id int, rank int"
    )
    out = rrf_fuse([a], k=60, top_k=1).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 20

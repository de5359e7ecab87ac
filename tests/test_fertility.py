"""Tokenizer fertility report (operators/tokenizer.py
bpe_fertility_by_lang)."""

import pytest
from pyspark.sql import functions as F

from bruin_spark.operators.tokenizer import bpe_encode_counts, bpe_fertility_by_lang

DOCS = [
    (0, "low low low lower lowest", "en"),
    (1, "low lower newest newest", "en"),
    (2, "ab ab ab cd cd", "xx"),
    (3, "low low", "xx"),
]


def test_fertility_invariants(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    rows = {r["lang"]: r.asDict() for r in bpe_fertility_by_lang(df, n_merges=4).collect()}
    assert set(rows) == {"en", "xx"}
    # language word totals add up to the corpus word count
    assert rows["en"]["n_words"] == 9 and rows["xx"]["n_words"] == 7
    for r in rows.values():
        assert r["fertility"] >= 1.0
        assert 0.0 <= r["single_piece_rate"] <= 1.0
        assert r["chars_per_token"] > 0
        # fertility is exactly tokens/words of the SAME aggregation
        assert r["fertility"] == pytest.approx(
            round(r["n_bpe_tokens"] / r["n_words"], 6)
        )


def test_fertility_consistent_with_encode_counts(spark):
    """Language totals equal the sum of the per-document encode counts
    over that language's documents (same trained vocabulary)."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    fert = {r["lang"]: r.asDict() for r in bpe_fertility_by_lang(df, n_merges=4).collect()}
    enc = bpe_encode_counts(df, n_merges=4).join(
        df.select("doc_id", "lang"), "doc_id"
    )
    agg = {
        r["lang"]: r.asDict()
        for r in enc.groupBy("lang")
        .agg(F.sum("n_words").alias("w"), F.sum("n_bpe_tokens").alias("t"))
        .collect()
    }
    for lang in fert:
        assert fert[lang]["n_words"] == agg[lang]["w"]
        assert fert[lang]["n_bpe_tokens"] == agg[lang]["t"]

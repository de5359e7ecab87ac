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


def test_fixed_vocab_mode(spark):
    """apply_bpe_merges: fixed external merges, order-dependent, and the
    fixed path needs no training loop (single map-only vocab projection)."""
    from bruin_spark.operators.tokenizer import apply_bpe_merges, bpe_learn_merges

    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    # 'lo'+'w' depends on 'l'+'o' having been applied first
    fixed = [("l", "o"), ("lo", "w")]
    fert = {
        r["lang"]: r.asDict()
        for r in bpe_fertility_by_lang(df, merges=fixed).collect()
    }
    # "low" -> one piece under the fixed merges
    # en corpus: low x3+x1, lower x2, lowest, newest x2
    assert fert["en"]["fertility"] < 4.0  # better than char-level
    # reversing the order breaks the chain: 'lo w' never forms
    rev = {
        r["lang"]: r.asDict()
        for r in bpe_fertility_by_lang(df, merges=list(reversed(fixed))).collect()
    }
    assert rev["en"]["n_bpe_tokens"] > fert["en"]["n_bpe_tokens"]

    # a trained merge TABLE round-trips as the external input
    merges_df = bpe_learn_merges(df, n_merges=4)
    via_df = {
        r["lang"]: r.asDict()
        for r in bpe_fertility_by_lang(df, merges=merges_df).collect()
    }
    trained = {
        r["lang"]: r.asDict()
        for r in bpe_fertility_by_lang(df, n_merges=4).collect()
    }
    assert via_df == trained

    # the fixed path is one projection over the word count: no Python
    # eval, and the only shuffles are the two word-count aggregates
    words = df.select(F.explode(F.split("text", " ")).alias("w")).distinct()
    plan = (
        apply_bpe_merges(words, fixed)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_trained_beats_fixed_on_training_corpus(spark):
    """Greedy corpus-trained merges compress the training corpus at
    least as well overall as a generic fixed list of equal size."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    fixed = [("t", "h"), ("th", "e"), ("i", "n"), ("a", "n")]
    total = lambda rows: sum(r["n_bpe_tokens"] for r in rows)  # noqa: E731
    trained = total(bpe_fertility_by_lang(df, n_merges=4).collect())
    ext = total(bpe_fertility_by_lang(df, merges=fixed).collect())
    assert trained <= ext

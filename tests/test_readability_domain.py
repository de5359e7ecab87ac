"""Differential tests for readability_features and domain_stats.

Pure-Python references mirror the engines' exact semantics (space-only
trim, `\\s+` word split, vowel-run syllables) — see the r11 CRLF/trim
lessons pinned in tests/test_gopher_dsir.py.
"""

import math
import re

import pytest

from bruin_spark.operators import text as T

DOCS = [
    (0, "The quick brown fox jumps. It runs fast! Really?", "en", "a"),
    (1, "word word word word", "en", "a"),
    (2, "", "en", "b"),
    (3, "   ", "en", "b"),
    (4, "\nTabbed\tand creaky. Second sentence here.", "es", "b"),
    (5, "one-sentence with no terminator", "en", "c"),
    (6, "aaa eee iii ooo uuu yyy", "fr", "c"),
    (7, "The quick brown fox jumps. It runs fast! Really?", "en", "c"),
    (8, "xyz qrt bcd", "en", "c"),  # zero-vowel words -> 1 syllable each
    (9, "Crlf line one.\r\nCrlf line two.", "en", "c"),
]


def _words(text):
    return [t for t in re.split(r"\s+", text.strip(" ").lower()) if t != ""]


def _syllables(word):
    return max(1, len(re.findall(r"[aeiouy]+", word)))


def _ref_readability(text):
    words = _words(text)
    n_words = len(words)
    sentences = [s for s in re.split(r"[.!?]+", text) if s.strip(" ") != ""]
    n_sent = max(1, len(sentences))
    n_syl = sum(_syllables(w) for w in words)
    w = max(1, n_words)
    flesch = 206.835 - 1.015 * (w / n_sent) - 84.6 * (n_syl / w)
    ttr = len(set(words)) / w
    return n_words, n_sent, n_syl, round(flesch, 6), round(ttr, 6)


def test_readability_matches_reference(spark):
    df = spark.createDataFrame(
        DOCS, ["doc_id", "text", "lang", "source"]
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in T.readability_features(df).collect()
    }
    assert len(got) == len(DOCS)
    for doc_id, text, _lang, _src in DOCS:
        n_words, n_sent, n_syl, flesch, ttr = _ref_readability(text)
        row = got[doc_id]
        assert row["n_words"] == n_words, (doc_id, text)
        assert row["n_sentences"] == n_sent, (doc_id, text)
        assert row["n_syllables"] == n_syl, (doc_id, text)
        assert row["flesch"] == pytest.approx(flesch, abs=1e-6), doc_id
        assert row["ttr"] == pytest.approx(ttr, abs=1e-6), doc_id


def test_readability_plan_is_map_only(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang", "source"])
    plan = T.readability_features(df)._jdf.queryExecution().executedPlan().toString()
    for op in ("Exchange", "Sort", "Window", "BatchEvalPython", "ArrowEvalPython"):
        assert op not in plan, f"{op} in map-only readability plan:\n{plan}"


def test_domain_stats_counts(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang", "source"])
    got = {r["domain"]: r.asDict() for r in T.domain_stats(df).collect()}
    assert set(got) == {"a", "b", "c"}
    assert got["a"]["n_docs"] == 2 and got["a"]["n_langs"] == 1
    assert got["b"]["n_docs"] == 3 and got["b"]["n_langs"] == 2
    # docs 0 and 7 are byte-identical but live in different domains:
    # no dup inside either domain
    assert got["a"]["dup_rate"] == 0.0
    assert got["c"]["dup_rate"] == 0.0
    # duplicate WITHIN a domain is counted
    df2 = spark.createDataFrame(
        DOCS + [(10, "word word word word", "en", "a")],
        ["doc_id", "text", "lang", "source"],
    )
    got2 = {r["domain"]: r.asDict() for r in T.domain_stats(df2).collect()}
    assert got2["a"]["n_docs"] == 3
    assert got2["a"]["dup_rate"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    # keep_rate is a fraction in [0, 1]
    for row in got2.values():
        assert 0.0 <= row["keep_rate"] <= 1.0
        assert 0.0 <= row["avg_quality"] <= 1.0


def test_domain_stats_total_tokens_matches_sum(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang", "source"])
    per_doc = {
        r["doc_id"]: r["n_tokens"]
        for r in T.token_count(df).select("doc_id", "n_tokens").collect()
    }
    got = {r["domain"]: r["total_tokens"] for r in T.domain_stats(df).collect()}
    by_src = {}
    for doc_id, _t, _l, src in DOCS:
        by_src[src] = by_src.get(src, 0) + per_doc[doc_id]
    assert got == by_src

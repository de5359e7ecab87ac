"""Tests for the PII-redaction, decontamination, and repetition operators."""

from pyspark.sql import functions as F

from bruin_spark.operators.contamination import ngram_overlap_contamination
from bruin_spark.operators.pii import pii_counts, redact_pii
from bruin_spark.operators.text import repetition_features


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pii_counts_and_redaction(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at jane.doe+x@example.co.uk or call 555-0199"),
            (2, "server 192.168.0.1 and 10.0.0.7 are up"),
            (3, "nothing sensitive here"),
        ],
    )
    out = {r["doc_id"]: r for r in redact_pii(pii_counts(df)).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ip"]) == (1, 1, 0)
    assert out[1]["text_redacted"] == "mail me at [EMAIL] or call [PHONE]"
    assert out[2]["n_ip"] == 2
    assert out[2]["text_redacted"] == "server [IP] and [IP] are up"
    assert out[3]["text_redacted"] == "nothing sensitive here"
    assert (out[3]["n_email"], out[3]["n_ip"], out[3]["n_phone"]) == (0, 0, 0)


def test_redaction_is_map_only(spark):
    df = _docs(spark, [(1, "a@b.co")])
    plan = redact_pii(pii_counts(df))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_contamination_flags_overlap(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words about spark plans"),
            (3, "quick brown fox jumps over fences daily it seems"),
        ],
    )
    test = _docs(spark, [(100, "a quick brown fox jumps over things")])
    out = {
        r["doc_id"]: r
        for r in ngram_overlap_contamination(corpus, test, n=5).collect()
    }
    # doc 1 shares the 5-gram "quick brown fox jumps over"; doc 3 too
    assert out[1]["contaminated"] and out[1]["n_hits"] >= 1
    assert out[3]["contaminated"]
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert len(out) == 3  # one row per corpus doc, clean docs kept


def test_contamination_broadcasts_test_side(spark):
    corpus = _docs(spark, [(1, "one two three four five six")])
    test = _docs(spark, [(2, "one two three four five")])
    plan = (
        ngram_overlap_contamination(corpus, test, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_repetition_features(spark):
    df = _docs(
        spark,
        [
            (1, "spam spam spam spam"),  # top1 = 1.0; 2-gram "spam spam" x3 = 1.0
            (2, "all words here differ"),  # top1 = 1/4
        ],
    )
    out = {r["doc_id"]: r for r in repetition_features(df).collect()}
    assert out[1]["top1_token_frac"] == 1.0
    assert out[1]["top_2gram_frac"] == 1.0
    assert out[2]["top1_token_frac"] == 0.25
    assert abs(out[2]["top_2gram_frac"] - round(1 / 3, 6)) < 1e-9


def test_chunk_documents_shapes_and_overlap(spark):
    from bruin_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(100))
    df = _docs(spark, [(1, words), (2, "short doc"), (3, "")])
    out = chunk_documents(df, chunk_tokens=40, overlap=10)
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["chunk_n_tokens"], r["chunk_text"]) for r in out.collect())
    )
    by_doc = {}
    for d, i, n, t in rows:
        by_doc.setdefault(d, []).append((i, n, t))
    # 100 tokens, stride 30: starts 0,30,60 -> sizes 40,40,40; the
    # start-90 tail (tokens 91-100) is fully inside chunk 2 (61-100)
    # and must NOT be emitted as a duplicate
    assert [(i, n) for i, n, _ in by_doc[1]] == [(0, 40), (1, 40), (2, 40)]
    # every token is still covered exactly by the emitted chunks
    assert by_doc[1][-1][2].split(" ")[-1] == "w99"
    # overlap: chunk 1 starts at token 30
    assert by_doc[1][1][2].split(" ")[0] == "w30"
    assert by_doc[1][0][2].split(" ")[-1] == "w39"
    # short doc: exactly one chunk, all tokens
    assert [(i, n) for i, n, _ in by_doc[2]] == [(0, 2)]
    # empty text still yields one (empty-token) chunk, never zero rows
    assert len(by_doc[3]) == 1

    # map-only: no shuffle in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_documents_rejects_bad_overlap(spark):
    from bruin_spark.operators.text import chunk_documents

    df = _docs(spark, [(1, "a b c")])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_sequence_bins_budget_and_determinism(spark):
    from pyspark.sql import functions as F

    from bruin_spark.operators.text import assign_sequence_bins

    rows = [(i, 100) for i in range(50)]  # uniform 100-token docs
    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens int")
    out = assign_sequence_bins(df, budget=250, n_buckets=4)
    got = out.collect()
    # determinism across reruns
    again = assign_sequence_bins(df, budget=250, n_buckets=4).collect()
    assert {(r["doc_id"], r["seq_bucket"], r["seq_bin"]) for r in got} == {
        (r["doc_id"], r["seq_bucket"], r["seq_bin"]) for r in again
    }
    # every bin holds <= budget + one doc's tokens (running-quotient slack)
    sums = (
        out.groupBy("seq_bucket", "seq_bin").agg(F.sum("n_tokens").alias("t")).collect()
    )
    assert all(r["t"] <= 250 + 100 for r in sums)
    # bins within a bucket are consecutive starting at 0
    per_bucket = {}
    for r in got:
        per_bucket.setdefault(r["seq_bucket"], set()).add(r["seq_bin"])
    for bins in per_bucket.values():
        assert bins == set(range(len(bins)))


def test_curation_decisions_all_reasons(spark):
    """Every drop reason fires on a crafted corpus; reasons are sorted
    and independent; the canonical copy of a duplicate group is kept."""
    from bruin_spark.operators.curation import curation_decisions

    good = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        "to find some good food for the long cold winter days ahead of it "
        "while the sun shines over all of the green hills in the valley"
    )
    corpus = spark.createDataFrame(
        [
            (1, good),                      # keep
            (2, good),                      # exact duplicate of 1 (non-canonical)
            (3, "tiny doc"),               # too_short (+low quality)
            (4, "spam spam " * 30),        # repetitive
            (5, good + " secret eval marker phrase here now"),  # contaminated
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "the secret eval marker phrase here now indeed")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in curation_decisions(corpus, eval_docs, min_tokens=10).collect()
    }
    assert out[1]["keep"] and out[1]["drop_reasons"] == ""
    assert out[2]["drop_reasons"] == "exact_duplicate"
    assert "too_short" in out[3]["drop_reasons"]
    assert "repetitive" in out[4]["drop_reasons"]
    assert "contaminated" in out[5]["drop_reasons"]
    # reasons sorted alphabetically for stable comparison
    for r in out.values():
        parts = r["drop_reasons"].split(",") if r["drop_reasons"] else []
        assert parts == sorted(parts)


def test_curation_decisions_null_text_rows_survive(spark):
    """Regression (ADVICE r8): fingerprint(NULL text) is NULL, and a NULL
    join key never equi-joins — the canonical-id join-back must COALESCE
    the key or NULL-text docs silently vanish from the decision table.
    NULL-text docs must come out flagged too_short, never keep=true."""
    from bruin_spark.operators.curation import curation_decisions

    good = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        "to find some good food for the long cold winter days ahead of it"
    )
    corpus = spark.createDataFrame(
        [(1, good), (2, None), (3, None), (4, "tiny")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation_decisions(corpus).collect()}
    # every input row present — nothing dropped by a NULL join key
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["keep"]
    for i in (2, 3):
        assert not out[i]["keep"]
        assert "too_short" in out[i]["drop_reasons"]
    # the two NULL texts form one fingerprint group: min id canonical
    assert "exact_duplicate" not in out[2]["drop_reasons"]
    assert "exact_duplicate" in out[3]["drop_reasons"]
    assert not out[4]["keep"]


def test_fuzzy_contamination_catches_paraphrase(spark):
    """A doc sharing most (but not all) shingles with an eval doc is
    flagged by the fuzzy path and MISSED by exact overlap at large n —
    the paraphrase gap fuzzy_contamination exists to close."""
    from bruin_spark.operators.contamination import (
        fuzzy_contamination,
        ngram_overlap_contamination,
    )

    eval_docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            # light edit of the eval doc: one word changed
            (1, "the quick brown fox leaps over the lazy dog today"),
            # unrelated
            (2, "completely different words in this other document here"),
            # verbatim copy
            (3, "the quick brown fox jumps over the lazy dog today"),
        ],
        ["doc_id", "text"],
    )
    fuzzy = {
        r["doc_id"]: r
        for r in fuzzy_contamination(corpus, eval_docs, n=3, threshold=0.4).collect()
    }
    assert fuzzy[3]["max_jaccard"] == 1.0 and fuzzy[3]["contaminated_fuzzy"]
    assert fuzzy[1]["contaminated_fuzzy"] and 0.4 <= fuzzy[1]["max_jaccard"] < 1.0
    assert fuzzy[1]["best_eval_id"] == 100
    assert not fuzzy[2]["contaminated_fuzzy"] and fuzzy[2]["max_jaccard"] < 0.1
    # exact n-gram overlap at n=8 misses the paraphrase entirely
    exact = {
        r["doc_id"]: r
        for r in ngram_overlap_contamination(corpus, eval_docs, n=8).collect()
    }
    assert not exact[1]["contaminated"] and exact[3]["contaminated"]


def test_fuzzy_contamination_tie_breaks_on_smaller_eval_id(spark):
    from bruin_spark.operators.contamination import fuzzy_contamination

    eval_docs = spark.createDataFrame(
        [(7, "alpha beta gamma delta"), (3, "alpha beta gamma delta")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame([(1, "alpha beta gamma delta")], ["doc_id", "text"])
    row = fuzzy_contamination(corpus, eval_docs, n=3, threshold=0.5).collect()[0]
    assert row["best_eval_id"] == 3 and row["max_jaccard"] == 1.0

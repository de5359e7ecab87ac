"""Stupid-backoff trigram LM (operators/lm.py stupid_backoff_scores).

Pins the Brants et al. 2007 backoff semantics on a corpus where each
backoff level demonstrably fires, and the 100 TB plan shape
(broadcast-only model joins, no window, no Python).
"""

import math

import pytest
from pyspark.sql import functions as F

from bruin_spark.operators.lm import stupid_backoff_scores

# train slice: two docs; score slice adds docs with unseen trigrams /
# bigrams.  top_v=100 keeps every trained token in-vocabulary so the
# reference arithmetic below is easy to follow; '<unk>' still catches
# score-side tokens the training never saw.
TRAIN = [
    (0, "a b c a b c a b c", "train"),
    (1, "a b d", "train"),
]
SCORE = [
    (2, "a b c", "crawl"),     # seen trigram: S = c3(a,b,c)/c2(a,b)
    (3, "c a b", "crawl"),     # seen trigram (wraps in doc 0)
    (4, "b c z", "crawl"),     # z unseen -> <unk>: trigram+bigram miss
    (5, "d a b", "crawl"),     # (d,a) bigram unseen -> backoff to (a,b)? no:
                               # trigram (d,a,b) unseen, bigram (a,b) seen
    (6, "a b", "crawl"),       # too short: no trigrams
    (7, "a b c z", "crawl"),   # MIXED: (a,b,c) scorable, (b,c,<unk>)
                               # unscorable (unk untrained at top_v=100)
]


def _scores(spark):
    df = spark.createDataFrame(TRAIN + SCORE, ["doc_id", "text", "source"])
    out = stupid_backoff_scores(
        df, train_filter=F.col("source") == "train", top_v=100
    )
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_backoff_levels_and_values(spark):
    got = _scores(spark)
    # training corpus counts: tokens a:4 b:4 c:4 d:1 (N=13... a appears
    # 4x in doc0? 'a b c' x3 -> a:3 b:3 c:3; doc1 a:1 b:1 d:1 => a:4 b:4
    # c:3 d:1, N=12
    # trigram (a,b,c): doc0 windows = (a,b,c),(b,c,a),(c,a,b),(a,b,c),
    # (b,c,a),(c,a,b),(a,b,c) -> c3(a,b,c)=3; doc1 (a,b,d) -> c3(a,b,d)=1
    # bigram (a,b): doc0 3 + doc1 1 = 4; (b,c)=3; (c,a)=2; (b,d)=1
    # doc 2 'a b c': one trigram, seen: S = 3/4
    d2 = got[2]
    assert d2["n_trigrams"] == 1 and d2["n_tri_hits"] == 1
    assert d2["avg_logscore"] == pytest.approx(round(math.log(3 / 4), 6))
    # doc 3 'c a b': trigram (c,a,b) seen twice in training: c3=2, c2(c,a)=2
    d3 = got[3]
    assert d3["n_tri_hits"] == 1
    assert d3["avg_logscore"] == pytest.approx(round(math.log(2 / 2), 6))
    # doc 4 'b c z': z -> <unk>; trigram (b,c,<unk>) unseen; bigram
    # (c,<unk>) unseen; unigram <unk> unseen in TRAINING (no OOV tokens
    # trained) -> c1(<unk>) missing: score must still be defined ONLY
    # when the unk unigram exists; here it does not, so the uni level
    # uses NULL -> document drops to NULL score but keeps hit counts
    d4 = got[4]
    assert d4["n_trigrams"] == 1 and d4["n_uni_hits"] == 1
    # doc 5 'd a b': trigram (d,a,b) unseen; bigram (a,b) seen:
    # S = 0.4 * c2(a,b)/c1(a) = 0.4 * (4/4)
    d5 = got[5]
    assert d5["n_bi_hits"] == 1
    assert d5["avg_logscore"] == pytest.approx(round(math.log(0.4 * (4 / 4)), 6))
    # doc 6: too short
    d6 = got[6]
    assert d6["n_trigrams"] == 0 and d6["avg_logscore"] is None
    # training docs score entirely at the trigram level
    assert got[0]["n_tri_hits"] == got[0]["n_trigrams"] == 7
    assert got[1]["n_tri_hits"] == got[1]["n_trigrams"] == 1
    # doc 7 mixes one scorable and one unscorable position: the mean is
    # over the SCORABLE position only (log(3/4) / 1, not / 2)
    d7 = got[7]
    assert d7["n_trigrams"] == 2 and d7["n_tri_hits"] == 1 and d7["n_uni_hits"] == 1
    assert d7["avg_logscore"] == pytest.approx(round(math.log(3 / 4), 6))


def test_unk_unigram_backstop_with_pruned_vocab(spark):
    # with top_v=2 the training corpus itself has OOV tokens, so
    # c1('<unk>') > 0 and EVERY document gets a defined score
    df = spark.createDataFrame(TRAIN + SCORE, ["doc_id", "text", "source"])
    out = stupid_backoff_scores(
        df, train_filter=F.col("source") == "train", top_v=2
    )
    rows = out.filter(F.col("n_trigrams") > 0).collect()
    assert rows and all(r["avg_logscore"] is not None for r in rows)


@pytest.mark.parametrize("unk_path", ["inset", "join"])
def test_plan_shape(spark, monkeypatch, unk_path):
    # both unk-map paths get their plan linted: the literal IN-set
    # (top_v <= INSET_MAX_VOCAB, the production default) and the
    # broadcast-join fallback (forced by dropping the cutoff), which
    # r14 shipped without any plan coverage
    import bruin_spark.operators.lm as lm

    if unk_path == "join":
        monkeypatch.setattr(lm, "INSET_MAX_VOCAB", -1)
    df = spark.createDataFrame(TRAIN + SCORE, ["doc_id", "text", "source"])
    out = stupid_backoff_scores(
        df, train_filter=F.col("source") == "train", top_v=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for op in ("Window", "BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert op not in plan, f"{op} in stupid-backoff plan:\n{plan}"
    # Structural bounds rather than exact node counts (exact counts are
    # brittle across Spark/AQE versions): the five model joins (tri,
    # c2ab, c2bw, c1b, c1w) broadcast — vocab-bounded tables must never
    # shuffle the corpus-scale score stream.  On the IN-set path the
    # unk map adds NO join at all; the fallback adds broadcast unk-map
    # joins (9 at r14's shape) but still no extra shuffle join.
    bhj = plan.count("BroadcastHashJoin")
    if unk_path == "inset":
        assert 5 <= bhj <= 6, f"IN-set path: {bhj} broadcast joins\n{plan}"
    else:
        assert bhj >= 5, f"join fallback lost the model broadcasts\n{plan}"
    # the ONE sort-merge join is the final doc-keyed left join back
    # onto the corpus — the single intended shuffle join on BOTH paths
    smj = [ln for ln in plan.splitlines() if "SortMergeJoin" in ln]
    assert len(smj) == 1 and "doc_id" in smj[0], smj


def test_inset_and_join_unk_paths_agree(spark, monkeypatch):
    # the literal IN-set unk map (top_v <= INSET_MAX_VOCAB) and the
    # broadcast-join fallback must produce identical scores; force the
    # fallback by dropping the cutoff to 0
    import bruin_spark.operators.lm as lm

    df = spark.createDataFrame(TRAIN + SCORE, ["doc_id", "text", "source"])
    fast = stupid_backoff_scores(
        df, train_filter=F.col("source") == "train", top_v=2
    ).collect()
    monkeypatch.setattr(lm, "INSET_MAX_VOCAB", -1)
    slow = stupid_backoff_scores(
        df, train_filter=F.col("source") == "train", top_v=2
    ).collect()
    assert sorted((r.asDict() for r in fast), key=lambda d: d["doc_id"]) == sorted(
        (r.asDict() for r in slow), key=lambda d: d["doc_id"]
    )

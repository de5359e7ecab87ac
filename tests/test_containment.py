"""n-gram containment pairs (operators/dedup.py
ngram_containment_pairs): the asymmetric quote/subset detector."""

import random
import re

from pyspark.sql import functions as F

from bruin_spark.operators import dedup as D


def _shingles(text, n=3):
    toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _naive(docs, t, c, n=3):
    out = {}
    ids = sorted(d[0] for d in docs)
    sh = {i: _shingles(txt, n) for i, txt in docs}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ov = len(sh[a] & sh[b])
            if ov >= c and ov / min(len(sh[a]), len(sh[b])) >= t:
                out[(a, b)] = ov
    return out


def test_quote_detected_where_jaccard_misses(spark):
    rng = random.Random(7)
    words = [f"w{i}" for i in range(400)]
    quote = " ".join(rng.choice(words) for _ in range(15))
    big = " ".join(rng.choice(words) for _ in range(200)) + " " + quote + " " + " ".join(
        rng.choice(words) for _ in range(200)
    )
    docs = [(1, quote), (2, big), (3, " ".join(rng.choice(words) for _ in range(60)))]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in D.ngram_containment_pairs(df, threshold=0.9, min_overlap=8).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)] == 1.0
    jac = D.ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert not any({r["id_a"], r["id_b"]} == {1, 2} for r in jac)


def test_matches_naive_on_random_corpus(spark):
    """Prefix-filter completeness: candidate pruning never drops a
    qualifying pair (output == brute force) on a corpus with planted
    subsets, near-subsets, and noise."""
    rng = random.Random(21)
    words = [f"t{i}" for i in range(150)]
    docs = []
    for i in range(40):
        body = [rng.choice(words) for _ in range(rng.randint(12, 60))]
        docs.append((i, " ".join(body)))
    # plant subsets: doc 100+i embeds doc i's text inside noise
    for i in range(8):
        noise = [rng.choice(words) for _ in range(30)]
        docs.append((100 + i, " ".join(noise[:15]) + " " + docs[i][1] + " " + " ".join(noise[15:])))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["n_common"]
        for r in D.ngram_containment_pairs(df, threshold=0.6, min_overlap=8).collect()
    }
    want = _naive(docs, 0.6, 8)
    assert got == want
    assert any(a < 100 <= b for a, b in want), "fixture should plant subset pairs"


def test_small_docs_below_min_overlap_excluded(spark):
    docs = [(1, "a b c d"), (2, "a b c d"), (3, "a b c d e f g h i j k l m n o p")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    # identical 2-shingle docs can never reach 8 shared shingles
    assert D.ngram_containment_pairs(df, threshold=0.5, min_overlap=8).count() == 0


def test_posting_rows_pinned_once_per_call(spark):
    """r15: ``inv`` feeds both the document-frequency aggregate and the
    rarity join's probe side, and the two subtrees differ, so without a
    pin the scan→shingle→explode→md5 pipeline executes TWICE per call
    (stage-profiled: two ~equal explode stages).  Gate: each pair
    function pins exactly one posting projection, and it is the narrow
    (id, n_sh, _hs) form — no text column rides the checkpoint (the
    fat-row pin anti-pattern OPTIMIZATION_r15.md ask #3 rejected)."""
    import random

    from bruin_spark.checkpointing import pinned_scope

    rng = random.Random(11)
    words = [f"w{i}" for i in range(120)]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(40))) for i in range(30)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for fn in (
        lambda d: D.ngram_jaccard_pairs(d, threshold=0.5),
        lambda d: D.ngram_containment_pairs(d, threshold=0.6, min_overlap=8),
    ):
        with pinned_scope() as bucket:
            fn(df).collect()
            inv_pins = [
                p for p in bucket if set(p.columns) == {"id", "n_sh", "_hs"}
            ]
            assert len(inv_pins) == 1, (
                f"expected exactly one pinned posting projection, got "
                f"{[p.columns for p in bucket]}"
            )


def test_verification_spread_to_cluster_parallelism(spark):
    """r15: the exact-intersection verification is the pipeline's most
    CPU-dense per-row stage over its narrowest rows, so AQE's byte-based
    coalescing parked it on 1-3 tasks (stage-profiled: >40% of entry CPU
    on 2 tasks while 30 cores idled).  Gate: the verify join's output
    width is at least the cluster's default parallelism — the explicit
    pair-keyed repartition survives AQE (REPARTITION_BY_NUM is never
    coalesced)."""
    import random

    rng = random.Random(13)
    words = [f"w{i}" for i in range(80)]
    docs = []
    for i in range(40):
        docs.append((i, " ".join(rng.choice(words) for _ in range(40))))
    # plant near-dups so candidate pairs exist
    for i in range(8):
        docs.append((100 + i, docs[i][1] + " tail"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for out in (
        D.ngram_jaccard_pairs(df, threshold=0.5),
        D.ngram_containment_pairs(df, threshold=0.6, min_overlap=8),
    ):
        assert out.count() > 0, "fixture must produce verified pairs"
        # the explicit pair-keyed repartition must be in the executed
        # plan (AQE never coalesces REPARTITION_BY_NUM); on a tiny
        # fixture AQE may still broadcast the pairs and stream the
        # shingle side, so the output WIDTH is asserted only at bench
        # scale (stage profile), not here
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "REPARTITION_BY_NUM" in plan

"""Property-style tests for the training-data operators: seeded random
corpora, invariants checked in Python over the full Spark output (one
Spark job per property, not per example)."""

import random
import re

from pyspark.sql import functions as F

SEED = 20260813


def _random_docs(n=60, vocab=("alpha", "beta", "gamma", "delta", "eps")):
    rng = random.Random(SEED)
    rows = []
    for i in range(n):
        n_tokens = rng.randint(0, 120)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n_tokens))))
    return rows


def test_chunking_covers_every_token_with_exact_overlap(spark):
    from bruin_spark.operators.text import chunk_documents

    chunk_tokens, overlap = 32, 8
    stride = chunk_tokens - overlap
    rows = _random_docs()
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = chunk_documents(df, chunk_tokens=chunk_tokens, overlap=overlap).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in rows:
        toks = text.strip().lower().split() if text.strip() else [""]
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        # chunk indices are consecutive from 0
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        # reassembling from stride-offsets reproduces the token stream
        rebuilt = []
        for c in chunks:
            ctoks = c["chunk_text"].split(" ") if c["chunk_text"] != "" else [""]
            assert len(ctoks) == c["chunk_n_tokens"] <= chunk_tokens
            start = c["chunk_idx"] * stride
            assert ctoks == toks[start : start + chunk_tokens]
            rebuilt[start:] = ctoks  # overwrite the overlap region
        assert rebuilt == toks


def test_quantization_bounds_and_monotonicity(spark):
    from bruin_spark.operators.similarity import quantize_embeddings

    rng = random.Random(SEED)
    rows = [
        (i, [rng.uniform(-10, 10) for _ in range(16)]) for i in range(40)
    ] + [(1000, [7.25] * 16)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    for vid, vec in rows:
        r = out[vid]
        assert all(0 <= q <= 255 for q in r["qvec"])
        if r["vmax"] > r["vmin"]:
            width = (r["vmax"] - r["vmin"]) / 255
            for orig, q in zip(vec, r["qvec"]):
                assert abs((r["vmin"] + q * width) - orig) <= width * (1 + 1e-9)
            # monotone: larger values never get smaller codes
            order = sorted(range(len(vec)), key=lambda i: vec[i])
            codes = [r["qvec"][i] for i in order]
            assert codes == sorted(codes)
        else:
            assert set(r["qvec"]) == {0}


def test_pii_redaction_leaves_no_matches(spark):
    from bruin_spark.operators.pii import PII_PATTERNS, pii_counts, redact_pii

    rng = random.Random(SEED)
    rows = []
    for i in range(40):
        parts = ["text", "more"]
        if rng.random() < 0.5:
            parts.append(f"user{i}@mail{i % 7}.com")
        if rng.random() < 0.5:
            parts.append(f"10.{i % 256}.0.{(i * 3) % 256}")
        if rng.random() < 0.5:
            parts.append(f"555-{i:04d}")
        rng.shuffle(parts)
        rows.append((i, " ".join(parts)))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = redact_pii(pii_counts(df)).collect()
    for r in out:
        for kind, (pattern, token) in PII_PATTERNS.items():
            assert not re.search(pattern, r["text_redacted"]), (kind, r["text_redacted"])
            # every counted match produced a token
            assert r["text_redacted"].count(token) == r[f"n_{kind}"]


def test_contamination_flags_are_sound_and_complete(spark):
    from bruin_spark.operators.contamination import ngram_overlap_contamination

    n = 4
    rows = _random_docs(80)
    corpus_rows = [(i, t) for i, t in rows if i % 4 != 0]
    test_rows = [(i, t) for i, t in rows if i % 4 == 0]
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    test = spark.createDataFrame(test_rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in ngram_overlap_contamination(corpus, test, n=n).collect()}

    def grams(text):
        toks = text.strip().lower().split() if text.strip() else [""]
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    test_grams = set().union(*(grams(t) for _, t in test_rows))
    for doc_id, text in corpus_rows:
        expected = len(grams(text) & test_grams)
        assert out[doc_id]["n_hits"] == expected
        assert out[doc_id]["contaminated"] == (expected >= 1)


def test_sequence_bins_respect_budget_slack(spark):
    from bruin_spark.operators.text import assign_sequence_bins

    rng = random.Random(SEED)
    rows = [(i, rng.randint(1, 300)) for i in range(200)]
    budget = 500
    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens int")
    out = assign_sequence_bins(df, budget=budget, n_buckets=8)
    sums = (
        out.groupBy("seq_bucket", "seq_bin")
        .agg(F.sum("n_tokens").alias("t"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    for r in sums:
        assert r["t"] <= budget + r["mx"]


def test_segment_dedup_removes_cross_doc_spans(spark):
    """A span repeated across docs survives only at its first occurrence
    (by doc id, then position); unique spans are untouched."""
    from bruin_spark.operators.dedup import segment_dedup

    boiler = " ".join(f"b{i}" for i in range(4))
    uniq_a = " ".join(f"a{i}" for i in range(4))
    uniq_c = " ".join(f"c{i}" for i in range(4))
    rows = [
        (1, f"{boiler} {uniq_a}"),       # first occurrence of boiler
        (2, f"{boiler} {uniq_c}"),       # boiler repeated -> stripped
        (3, boiler),                     # only boiler -> empty clean_text
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in segment_dedup(df, seg_tokens=4).collect()}
    assert out[1]["clean_text"] == f"{boiler} {uniq_a}"
    assert out[2]["clean_text"] == uniq_c
    assert out[3]["clean_text"] == ""
    assert out[3]["n_segments_total"] == 1 and out[3]["n_segments_kept"] == 0
    assert out[2]["n_tokens_kept"] == 4
    assert out[1]["n_segments_kept"] == 2


def test_incremental_dedup_invariants(spark):
    """Every batch doc appears exactly once in the output; matches point
    into the corpus with jaccard >= threshold; a batch doc identical to
    a corpus doc is always flagged with jaccard 1.0."""
    from pyspark.sql import functions as F

    from bruin_spark.operators.dedup import incremental_dedup, lsh_band_index

    base = "w{0} common phrase tokens flow through here number {0} " * 2
    corpus = spark.createDataFrame(
        [(i, base.format(i)) for i in range(30)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100 + i, base.format(i)) for i in range(5)]  # exact dups of 0..4
        + [(200, "entirely novel content with no overlap whatsoever")],
        "doc_id long, text string",
    )
    idx = lsh_band_index(corpus)
    out = incremental_dedup(batch, idx, corpus).collect()
    assert sorted(r["doc_id"] for r in out) == [100, 101, 102, 103, 104, 200]
    by_id = {r["doc_id"]: r for r in out}
    corpus_ids = set(range(30))
    for i in range(5):
        r = by_id[100 + i]
        assert r["is_dup"] and r["jaccard"] == 1.0 and r["match_id"] == i
        assert r["match_id"] in corpus_ids
    assert not by_id[200]["is_dup"] and by_id[200]["jaccard"] is None


def test_bm25_scoring_properties(spark):
    """Score increases with term frequency (same length), decreases with
    document length (same tf), and docs without any query term never
    appear."""
    from bruin_spark.operators.ranking import bm25_topk

    pad = lambda n: " ".join(f"x{i}" for i in range(n))
    docs = spark.createDataFrame(
        [
            (1, "join join join " + pad(10)),   # tf=3
            (2, "join " + pad(12)),             # tf=1, same length
            (3, "join " + pad(40)),             # tf=1, longer
            (4, pad(13)),                       # no query term
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["bm25"] for r in bm25_topk(docs, ["join"], top_k=10).collect()}
    assert 4 not in out
    assert out[1] > out[2] > out[3] > 0


def test_random_projection_preserves_scaled_norms(spark):
    """JL property sanity: projected norms are positive and within a
    loose factor of the input norms; identical inputs project
    identically."""
    import math
    import random

    from pyspark.sql import functions as F

    from bruin_spark.operators.similarity import random_projection

    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(20)]
    vecs.append(list(vecs[0]))  # duplicate of vec 0
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in random_projection(df).collect()}
    for i, v in enumerate(vecs):
        in_norm = math.sqrt(sum(x * x for x in v))
        assert 0 < rows[i]["proj_norm"] < 4 * in_norm
    assert [rows[0][f"c{j}"] for j in range(16)] == [rows[20][f"c{j}"] for j in range(16)]


def test_bpe_learns_expected_merges(spark):
    """On a corpus where 'ab' dominates, the first merge is a+b; merged
    symbols participate in later merges (a+b then ab+c)."""
    from bruin_spark.operators.tokenizer import bpe_learn_merges

    docs = spark.createDataFrame(
        [(1, "abc abc abc abc ax"), (2, "abc abc bc ax")],
        "doc_id long, text string",
    )
    merges = bpe_learn_merges(docs, n_merges=2).collect()
    # frequency-weighted pairs: b-c = 6 ('abc') + 1 ('bc') = 7 beats
    # a-b = 6; the second merge then uses the MERGED 'bc' symbol
    assert (merges[0]["merge_left"], merges[0]["merge_right"]) == ("b", "c")
    assert merges[0]["pair_count"] == 7
    assert (merges[1]["merge_left"], merges[1]["merge_right"]) == ("a", "bc")
    assert merges[1]["pair_count"] == 6


def test_bpe_merges_repeated_pair_runs_canonically(spark):
    """'ababab' must merge to [ab, ab, ab] (canonical BPE), not leave an
    unmerged middle pair from single-pass string replace."""
    from pyspark.sql import functions as F

    from bruin_spark.operators.tokenizer import bpe_learn_merges, word_frequencies

    docs = spark.createDataFrame([(1, "ababab ababab")], "doc_id long, text string")
    merges = bpe_learn_merges(docs, n_merges=1).collect()
    assert (merges[0]["merge_left"], merges[0]["merge_right"]) == ("a", "b")
    assert merges[0]["pair_count"] == 6  # 3 occurrences x freq 2


def test_minhash_scheme_statistical_quality(spark):
    """The affine-permutation minhash must BEHAVE like random
    permutations, not merely be deterministic: on a seeded corpus of 60
    near-dup pairs with token-level overlap ~90% (shingle Jaccard ~0.8),
    (a) the signature-agreement fraction estimates true Jaccard with
    small mean error, and (b) banded LSH (k=16, b=4) catches most pairs
    (theory at J=0.8: 1-(1-J^4)^4 ~ 0.9).  A degenerate coefficient
    table (constant, correlated, or low-entropy mixes) stays perfectly
    cross-engine-consistent yet fails both gates — this is the quality
    pin the bit-parity tests cannot provide."""
    from bruin_spark.operators.dedup import minhash_dedup_pairs, minhash_signature

    rng = random.Random(SEED)
    rows, truth = [], {}
    vocab = [f"w{i}" for i in range(4000)]
    for p in range(60):
        base = [rng.choice(vocab) for _ in range(50)]
        a = base[:]
        b = base[:45] + [rng.choice(vocab) for _ in range(5)]
        rows.append((2 * p, " ".join(a)))
        rows.append((2 * p + 1, " ".join(b)))

        def sh(toks):
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

        sa, sb = sh(a), sh(b)
        truth[(2 * p, 2 * p + 1)] = len(sa & sb) / len(sa | sb)
    # distractor singletons so the LSH join has non-pair mass too
    for d in range(120, 180):
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(50))))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    sig = {r["id"]: [r[f"mh_{i}"] for i in range(16)] for r in minhash_signature(df).collect()}
    errs = []
    for (ia, ib), j in truth.items():
        agree = sum(x == y for x, y in zip(sig[ia], sig[ib])) / 16
        errs.append(abs(agree - j))
    mean_err = sum(errs) / len(errs)
    assert mean_err < 0.08, f"signature agreement is a poor Jaccard estimator: {mean_err:.3f}"

    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_pairs(df, threshold=0.5).collect()
    }
    catchable = [p for p, j in truth.items() if j >= 0.7]
    assert len(catchable) >= 40  # the corpus construction really is high-overlap
    recall = sum(p in pairs for p in catchable) / len(catchable)
    assert recall >= 0.7, f"banded LSH recall on J>=0.7 pairs: {recall:.2f}"


def test_bpe_encode_counts_match_hand_simulation(spark):
    """Exact checks on the vocab-join encoder: zero merges counts raw
    characters; enough merges collapses every word to one piece; counts
    agree with a hand-simulated merge application."""
    from bruin_spark.checkpointing import pinned_scope
    from bruin_spark.operators.tokenizer import bpe_encode_counts

    docs = spark.createDataFrame(
        [(1, "abc abc ax"), (2, "Abc bc")],  # lowercased by tokens()
        "doc_id long, text string",
    )
    # n_merges=0: every word is char-split, so pieces == chars
    with pinned_scope():
        zero = {r["doc_id"]: r for r in bpe_encode_counts(docs, n_merges=0).collect()}
    assert zero[1]["n_words"] == 3 and zero[1]["n_bpe_tokens"] == 8  # abc abc ax
    assert zero[2]["n_words"] == 2 and zero[2]["n_bpe_tokens"] == 5  # abc bc

    # merges: b-c (freq 3+1=4... hand count: words abc:3, ax:1, bc:1 ->
    # pairs a-b:3, b-c:4, a-x:1) -> merge1 = b+c; then a-bc:3 -> merge2
    # = a+bc; after 2 merges 'abc' is ONE piece, 'bc' is one, 'ax' two
    with pinned_scope():
        two = {r["doc_id"]: r for r in bpe_encode_counts(docs, n_merges=2).collect()}
    assert two[1]["n_bpe_tokens"] == 1 + 1 + 2  # abc, abc, a x
    assert two[2]["n_bpe_tokens"] == 1 + 1  # abc, bc

    # saturation: enough merges collapses every word to a single piece
    with pinned_scope():
        sat = {r["doc_id"]: r for r in bpe_encode_counts(docs, n_merges=8).collect()}
    for doc_id, r in sat.items():
        assert r["n_bpe_tokens"] == r["n_words"], (doc_id, r)


def test_bigram_lm_scores_match_hand_computation(spark):
    """Hand-checked add-alpha bigram LM on a 3-doc corpus, both with and
    without vocabulary pruning; short docs keep a NULL-scored row."""
    import math

    from bruin_spark.checkpointing import pinned_scope
    from bruin_spark.operators.lm import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "z")],  # doc 3: single token, no bigrams
        "doc_id long, text string",
    )
    # unigrams: a:3 b:2 z:1 -> V=3; bigrams: (a,b):2 (b,a):1; alpha=0.5
    lp_ab = math.log((2 + 0.5) / (3 + 0.5 * 3))
    lp_ba = math.log((1 + 0.5) / (2 + 0.5 * 3))
    with pinned_scope():
        out = {r["doc_id"]: r for r in bigram_lm_scores(docs, alpha=0.5).collect()}
    assert out[1]["n_bigrams"] == 2
    assert abs(out[1]["avg_logprob"] - round((lp_ab + lp_ba) / 2, 6)) < 1e-9
    assert abs(out[1]["perplexity"] - round(math.exp(-(lp_ab + lp_ba) / 2), 6)) < 1e-9
    assert out[2]["n_bigrams"] == 1
    assert abs(out[2]["avg_logprob"] - round(lp_ab, 6)) < 1e-9
    assert out[3]["n_bigrams"] == 0
    assert out[3]["avg_logprob"] is None and out[3]["perplexity"] is None

    # top_v=1 keeps only 'a' (count desc); b and z train as <unk>:
    # unigrams a:3 <unk>:3 -> V=2; bigrams (a,<unk>):2 (<unk>,a):1
    lp_au = math.log((2 + 0.5) / (3 + 0.5 * 2))
    lp_ua = math.log((1 + 0.5) / (3 + 0.5 * 2))
    with pinned_scope():
        pruned = {
            r["doc_id"]: r
            for r in bigram_lm_scores(docs, alpha=0.5, top_v=1).collect()
        }
    assert pruned[1]["n_bigrams"] == 2
    assert abs(pruned[1]["avg_logprob"] - round((lp_au + lp_ua) / 2, 6)) < 1e-9
    assert pruned[2]["n_bigrams"] == 1
    assert abs(pruned[2]["avg_logprob"] - round(lp_au, 6)) < 1e-9
    assert pruned[3]["n_bigrams"] == 0


def test_bigram_lm_inset_and_join_unk_paths_agree(spark, monkeypatch):
    """The literal IN-set unk map (top_v <= INSET_MAX_VOCAB) and the
    broadcast-join fallback must produce identical scores; force the
    fallback by dropping the cutoff below top_v."""
    import bruin_spark.operators.lm as lm
    from bruin_spark.checkpointing import pinned_scope
    from bruin_spark.operators.lm import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b"), (3, "z"), (4, "c c a")],
        "doc_id long, text string",
    )
    with pinned_scope():
        fast = sorted(
            (r.asDict() for r in bigram_lm_scores(docs, top_v=2).collect()),
            key=lambda d: d["doc_id"],
        )
    monkeypatch.setattr(lm, "INSET_MAX_VOCAB", -1)
    with pinned_scope():
        slow = sorted(
            (r.asDict() for r in bigram_lm_scores(docs, top_v=2).collect()),
            key=lambda d: d["doc_id"],
        )
    assert fast == slow


def test_tfidf_top_terms_hand_computed(spark):
    """Exact TF-IDF on a 4-doc, 2-group corpus: corpus-universal terms
    score ln(1)=0; group-exclusive terms rank first; ranks are dense
    per group with deterministic (score desc, term asc) ties."""
    import math

    from bruin_spark.checkpointing import pinned_scope
    from bruin_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "en", "cat cat dog"),
            (2, "en", "cat fish"),
            (3, "es", "gato gato dog"),
            (4, "es", "gato fish"),
        ],
        "doc_id long, lang string, text string",
    )
    with pinned_scope():
        rows = tfidf_top_terms(docs, group_col="lang", k=2).collect()
    by_key = {(r["lang"], r["term"]): r for r in rows}
    # en: cat tf=3 df=2 -> 3*ln(4/2); dog/fish tf=1 df=2 -> ln(2) tie,
    # 'dog' wins rank 2 alphabetically
    en = sorted([r for r in rows if r["lang"] == "en"], key=lambda r: r["rank"])
    assert [r["term"] for r in en] == ["cat", "dog"]
    assert by_key[("en", "cat")]["tf"] == 3
    assert by_key[("en", "cat")]["df_docs"] == 2
    assert abs(by_key[("en", "cat")]["tfidf"] - round(3 * math.log(4 / 2), 6)) < 1e-9
    es = sorted([r for r in rows if r["lang"] == "es"], key=lambda r: r["rank"])
    assert [r["term"] for r in es] == ["gato", "dog"]
    assert abs(by_key[("es", "gato")]["tfidf"] - round(3 * math.log(4 / 2), 6)) < 1e-9
    # k bound respected
    assert all(r["rank"] <= 2 for r in rows) and len(rows) == 4


def test_strip_boilerplate_semantics(spark):
    """Frequency-threshold boilerplate removal: a segment in >= min_docs
    distinct docs vanishes from ALL docs (first occurrence included);
    within-doc repeats of a rare segment survive; token accounting is
    exact."""
    from bruin_spark.operators.dedup import strip_boilerplate

    boiler = " ".join(f"b{i}" for i in range(4))  # one 4-token segment
    docs = spark.createDataFrame(
        [
            (1, boiler + " u1 u2 u3 u4"),
            (2, boiler + " v1 v2 v3 v4"),
            (3, boiler + " w1 w2 w3 w4"),
            (4, "x1 x2 x3 x4 x1 x2 x3 x4"),  # same segment twice, ONE doc
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(docs, seg_tokens=4, min_docs=3).collect()
    }
    # the shared first segment is boilerplate in all three docs
    for d, tail in ((1, "u1 u2 u3 u4"), (2, "v1 v2 v3 v4"), (3, "w1 w2 w3 w4")):
        assert out[d]["clean_text"] == tail
        assert out[d]["n_boilerplate"] == 1
        assert out[d]["n_segments_total"] == 2
        assert out[d]["n_tokens_kept"] == 4
    # within-doc repetition of a segment seen in only ONE doc is kept
    assert out[4]["clean_text"] == "x1 x2 x3 x4 x1 x2 x3 x4"
    assert out[4]["n_boilerplate"] == 0

    # min_docs=2 also catches the within-doc... no: distinct-DOC count
    # is 1, still kept; but the three-way segment is caught at 2
    out2 = {
        r["doc_id"]: r
        for r in strip_boilerplate(docs, seg_tokens=4, min_docs=2).collect()
    }
    assert out2[4]["n_boilerplate"] == 0
    assert out2[1]["n_boilerplate"] == 1


def test_language_segments_majority_and_purity(spark):
    """Hand-built bilingual docs: majority language, deterministic ties
    (count DESC, lang ASC), and exact purity fractions."""
    from bruin_spark.operators.text import language_segments

    en = "the and of to in is it that for on"  # 10 en stopwords
    es = "el la de que y en un los se por"  # 10 es stopwords... 'en'/'la'/'de' overlap langs
    docs = spark.createDataFrame(
        [
            (1, f"{en} {en} {es}"),  # 3 segments: en, en, es-ish
            (2, en),  # single segment
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in language_segments(docs, seg_tokens=10).collect()
    }
    assert out[1]["n_segments"] == 3
    assert out[1]["majority_lang"] == "en"
    assert out[1]["n_majority_segments"] == 2
    assert abs(out[1]["lang_purity"] - round(2 / 3, 6)) < 1e-9
    assert out[2]["n_segments"] == 1 and out[2]["lang_purity"] == 1.0


def test_bpe_encode_ids_consistent_with_counts_and_decodable(spark):
    """Id sequences: (1) per-doc length equals bpe_encode_counts'
    n_bpe_tokens, (2) ids decode back to the exact piece strings of the
    trained vocab, in document order."""
    from bruin_spark.checkpointing import pinned_scope
    from bruin_spark.operators.tokenizer import (
        _bpe_train,
        bpe_encode_counts,
        bpe_encode_ids,
    )

    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "low low newer"), (3, "wider low")],
        ["doc_id", "text"],
    )
    with pinned_scope():
        ids_rows = {r["doc_id"]: r for r in bpe_encode_ids(docs, n_merges=3).collect()}
        counts = {r["doc_id"]: r for r in bpe_encode_counts(docs, n_merges=3).collect()}
        _, words, _base = _bpe_train(docs, 3, "text")
        reprs = {r["w"]: r["repr"].strip().split(" ") for r in words.collect()}
    assert set(ids_rows) == {1, 2, 3}
    for d, r in ids_rows.items():
        assert r["n_ids"] == len(r["ids"]) == counts[d]["n_bpe_tokens"]
    # rebuild the id->piece table the operator's lexicographic rank implies
    pieces = sorted({p for ps in reprs.values() for p in ps})
    id2p = {i + 1: p for i, p in enumerate(pieces)}
    for d, text in [(1, "low lower lowest"), (2, "low low newer"), (3, "wider low")]:
        expect = [p for w in text.split(" ") for p in reprs[w]]
        assert [id2p[i] for i in ids_rows[d]["ids"]] == expect

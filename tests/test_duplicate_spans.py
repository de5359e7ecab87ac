"""duplicate_spans: sliding-window exact-substring dedup semantics.

The property that distinguishes it from segment_dedup: a duplicated
passage is caught at ANY alignment, and overlapping flagged windows
merge into one maximal span whose token count equals the passage
length. Reference behavior: Lee et al. 2022 exact-substring dedup
(suffix-array single-node algorithm re-expressed as a linear
shingle-index plan)."""

import pytest

from bruin_spark.operators.dedup import duplicate_spans

W = 8


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture(scope="module")
def result(spark):
    shared = _words("dup", 10)  # 10-token passage, > W
    rep = _words("rep", W)  # exactly-W run repeated within one doc
    docs = spark.createDataFrame(
        [
            # passage at offset 3 in a, offset 7 in b: different alignment
            (1, _words("a", 3) + " " + shared + " " + _words("atail", 5)),
            (2, _words("b", 7) + " " + shared + " " + _words("btail", 2)),
            # within-doc repetition, gap of 9 unique tokens > W
            (3, rep + " " + _words("gap", 9) + " " + rep),
            # all-unique doc: no duplicated window
            (4, _words("uniq", 30)),
            # identical SHORT docs: under W tokens -> no windows, not reported
            (5, "tiny doc same text"),
            (6, "tiny doc same text"),
        ],
        "doc_id int, text string",
    )
    rows = duplicate_spans(docs, win_tokens=W).collect()
    return {r["doc_id"]: r for r in rows}


def test_cross_alignment_passage_found_in_both(result):
    # 3 windows fit inside the 10-token passage; merged = one span of 10
    for doc_id, total in ((1, 18), (2, 19)):
        r = result[doc_id]
        assert r["n_dup_spans"] == 1
        assert r["dup_tokens"] == 10
        assert r["total_tokens"] == total
        assert r["dup_ratio"] == round(10 / total, 6)


def test_within_doc_repetition_two_spans(result):
    r = result[3]
    assert r["n_dup_spans"] == 2
    assert r["dup_tokens"] == 2 * W


def test_unique_and_short_docs_not_reported(result):
    assert 4 not in result
    assert 5 not in result and 6 not in result


def test_contiguous_windows_merge_to_one_maximal_span(spark):
    # one 16-token passage shared by two docs: 9 overlapping windows
    # each, all merging into a single span of exactly 16 tokens
    passage = _words("p", 16)
    docs = spark.createDataFrame(
        [(1, passage + " " + _words("x", 4)), (2, _words("y", 6) + " " + passage)],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in duplicate_spans(docs, win_tokens=W).collect()}
    assert rows[1]["n_dup_spans"] == rows[2]["n_dup_spans"] == 1
    assert rows[1]["dup_tokens"] == rows[2]["dup_tokens"] == 16


def test_null_and_empty_text_ignored(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, _words("z", 12)), (5, _words("z", 12))],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in duplicate_spans(docs, win_tokens=W).collect()}
    assert set(rows) == {4, 5}
    assert rows[4]["dup_tokens"] == 12


def _naive_duplicate_spans(texts: dict[int, str], w: int) -> dict[int, tuple[int, int]]:
    """Independent Python reference: sliding windows by value (no
    hashing), corpus-wide count >= 2, per-doc interval merge.  Returns
    {doc_id: (n_dup_spans, dup_tokens)} for affected docs."""
    # mirror split(lower(trim(text)), '\s+'): '' and whitespace-only -> ['']
    toks = {
        d: (texts[d].strip().lower().split() or [""])
        for d in texts
        if texts[d] is not None
    }
    from collections import Counter

    counts: Counter = Counter()
    wins: dict[int, list[int]] = {}
    for d, t in toks.items():
        wins[d] = []
        for i in range(len(t) - w + 1):
            counts[" ".join(t[i : i + w])] += 1
            wins[d].append(i)
    out: dict[int, tuple[int, int]] = {}
    for d, t in toks.items():
        flagged = [i for i in wins[d] if counts[" ".join(t[i : i + w])] >= 2]
        if not flagged:
            continue
        spans, dup = 0, 0
        prev = None
        for p in flagged:
            if prev is None or p - prev > w:
                spans += 1
                dup += w
            else:
                dup += min(w, p - prev)
            prev = p
        out[d] = (spans, dup)
    return out


def test_randomized_differential_vs_naive(spark):
    """Randomized differential: 60 docs assembled from a small word pool
    with planted repeated fragments, so duplicated windows arise both by
    construction and by chance. The Spark plan must agree exactly with
    an independent per-window-value Python implementation (which never
    hashes, so it also cross-checks the 60-bit hash's collision-freedom
    at this scale)."""
    import random

    rng = random.Random(421)
    pool = [f"w{i}" for i in range(12)]  # small pool -> chance repeats
    frags = [" ".join(rng.choice(pool) for _ in range(rng.randint(8, 14))) for _ in range(4)]
    texts: dict[int, str] = {}
    for d in range(60):
        parts = []
        for _ in range(rng.randint(0, 3)):
            parts.append(rng.choice(frags) if rng.random() < 0.5 else " ".join(rng.choice(pool) for _ in range(rng.randint(1, 12))))
        texts[d] = " ".join(parts)
    df = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"])
        for r in duplicate_spans(df, win_tokens=W).collect()
    }
    want = _naive_duplicate_spans(texts, W)
    assert got == want


# -- incremental (batch vs persisted index) -------------------------------


def test_incremental_parity_with_from_scratch(spark, tmp_path):
    """THE incremental contract: span-checking a batch against the
    PERSISTED span_hash_index of the corpus yields exactly the
    from-scratch duplicate_spans(corpus UNION batch) rows for batch
    docs — including batch-internal duplicates (corpus count 0),
    corpus-boundary duplicates (count 1 each side), and batch docs
    whose text duplicates only WITHIN the corpus (not reported unless
    a batch window matches).  The index round-trips through parquet to
    prove the persisted-store shape works, not just the in-plan one."""
    import random

    from bruin_spark.operators.dedup import (
        incremental_duplicate_spans,
        span_hash_index,
    )

    rng = random.Random(1107)
    pool = [f"w{i}" for i in range(12)]
    frags = [
        " ".join(rng.choice(pool) for _ in range(rng.randint(8, 14)))
        for _ in range(4)
    ]

    def mk(n0, n1):
        out = {}
        for d in range(n0, n1):
            parts = []
            for _ in range(rng.randint(0, 3)):
                parts.append(
                    rng.choice(frags)
                    if rng.random() < 0.5
                    else " ".join(
                        rng.choice(pool) for _ in range(rng.randint(1, 12))
                    )
                )
            out[d] = " ".join(parts)
        return out

    corpus_texts, batch_texts = mk(0, 50), mk(50, 80)
    # edge docs: NULL/empty in both sides; a batch doc equal to ONE
    # corpus doc (corpus count 1 + batch count 1 -> duplicated)
    corpus_texts[90] = None
    corpus_texts[91] = _words("edge", 10)
    batch_texts[92] = ""
    batch_texts[93] = _words("edge", 10)
    corpus = spark.createDataFrame(
        list(corpus_texts.items()), "doc_id int, text string"
    )
    batch = spark.createDataFrame(
        list(batch_texts.items()), "doc_id int, text string"
    )

    idx_path = str(tmp_path / "span_index")
    span_hash_index(corpus, win_tokens=W).write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)

    got = {
        r["doc_id"]: r.asDict()
        for r in incremental_duplicate_spans(batch, idx, win_tokens=W).collect()
    }
    want = {
        r["doc_id"]: r.asDict()
        for r in duplicate_spans(corpus.unionByName(batch), win_tokens=W).collect()
        if r["doc_id"] in batch_texts
    }
    assert got == want
    assert 93 in got  # the corpus-boundary duplicate is caught


def test_incremental_min_count_composes_across_split(spark):
    """min_count=3: one batch occurrence + two corpus occurrences must
    flag (3 total), while one + one must not — membership-only indexes
    cannot express this; the count-carrying index can."""
    from bruin_spark.operators.dedup import (
        incremental_duplicate_spans,
        span_hash_index,
    )

    twice, once = _words("t", W), _words("o", W)
    corpus = spark.createDataFrame(
        [(1, twice), (2, twice), (3, once)], "doc_id int, text string"
    )
    batch = spark.createDataFrame(
        [(10, twice + " " + _words("pad", 3)), (11, once)],
        "doc_id int, text string",
    )
    idx = span_hash_index(corpus, win_tokens=W)
    rows = {
        r["doc_id"]: r
        for r in incremental_duplicate_spans(
            batch, idx, win_tokens=W, min_count=3
        ).collect()
    }
    assert 10 in rows and rows[10]["dup_tokens"] == W
    assert 11 not in rows


def test_incremental_bucketed_index_corpus_side_exchange_free(spark):
    """The 100 TB layout: span_hash_index persisted bucketBy(h) —
    the incremental join's corpus side reads the bucketed scan with NO
    Exchange above it (only the batch sliver shuffles), and the result
    is row-identical to the in-plan index path."""
    import random

    from bruin_spark.operators.dedup import (
        incremental_duplicate_spans,
        span_hash_index,
        write_span_index_bucketed,
    )

    rng = random.Random(7)
    pool = [f"w{i}" for i in range(10)]

    def text():
        return " ".join(rng.choice(pool) for _ in range(rng.randint(6, 20)))

    corpus = spark.createDataFrame(
        [(i, text()) for i in range(40)], "doc_id int, text string"
    )
    batch = spark.createDataFrame(
        [(100 + i, text()) for i in range(15)], "doc_id int, text string"
    )
    idx = span_hash_index(corpus, win_tokens=4)
    table = "span_idx_bucketed_test"
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at toy scale AQE broadcasts the index either way, hiding the
        # exchange this test is about — force the sort-merge shape the
        # corpus-scale join takes
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # buckets == shuffle partitions: the batch aggregate's exchange
        # then satisfies the join distribution on BOTH counts (the
        # docstring's guidance, exercised here)
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
        write_span_index_bucketed(idx, table, buckets=n_buckets)
        bucketed = incremental_duplicate_spans(
            batch, spark.table(table), win_tokens=4
        )
        plain = incremental_duplicate_spans(batch, idx, win_tokens=4)
        pb = bucketed._jdf.queryExecution().executedPlan().toString()
        pp = plain._jdf.queryExecution().executedPlan().toString()
        # bucketed scan feeds the join directly: one Exchange fewer
        # than the in-plan index (whose groupBy must shuffle), and the
        # scan node itself is marked bucketed
        assert "Bucketed: true" in pb
        assert pb.count("Exchange") == pp.count("Exchange") - 1
        got = sorted(map(tuple, bucketed.collect()))
        want = sorted(map(tuple, plain.collect()))
        assert got == want and got  # non-trivial result
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {table}")

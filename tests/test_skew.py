"""Skew operator tests: salted results must equal unsalted results."""

from pyspark.sql import functions as F

from bruin_spark.operators.skew import salted_join, two_phase_agg


def test_salted_join_matches_plain_join(spark):
    # heavily skewed: 90% of rows share key 0
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame([(i, f"dim_{i}") for i in range(7)], "k bigint, label string")
    plain = big.join(small, "k").groupBy("label").count()
    salted = salted_join(big, small, "k", salts=4).groupBy("label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "nomatch")], "k bigint, v string")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, w string")
    out = salted_join(big, small, "k", salts=3, how="left").collect()
    got = {(r["k"], r["w"]) for r in out}
    assert got == {(1, "x"), (2, "y"), (99, None)}


def test_two_phase_agg_matches_direct(spark):
    df = spark.range(5000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") * 2).alias("v")
    )
    direct = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx")
    )
    two = two_phase_agg(
        df,
        ["k"],
        {"n": F.count(F.lit(1)), "s": F.sum("v"), "mx": F.max("v")},
        {"n": F.sum("n"), "s": F.sum("s"), "mx": F.max("mx")},
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, two.collect()))


# -- connected components ------------------------------------------------------


def test_connected_components_basic(spark):
    from bruin_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 4), (7, 8), (8, 9), (9, 7)], "id_a bigint, id_b bigint"
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (4, 4), (5, 4),
        (7, 7), (8, 7), (9, 7),
    }


def test_connected_components_chain_and_empty(spark):
    from bruin_spark.operators.dedup import connected_components

    # a long chain forces multiple star rounds
    chain = [(i, i + 1) for i in range(0, 40)]
    pairs = spark.createDataFrame(chain, "id_a bigint, id_b bigint")
    got = connected_components(pairs).collect()
    assert all(r["component"] == 0 for r in got)
    assert {r["node"] for r in got} == set(range(41))

    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components(empty).count() == 0


def test_connected_components_matches_union_find(spark):
    import random

    from bruin_spark.operators.dedup import connected_components

    rnd = random.Random(7)
    edges = [(rnd.randrange(60), rnd.randrange(60)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(60))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    expected = {n: min(m for m in nodes if find(m) == find(n)) for n in nodes}

    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == expected


def test_connected_components_round_count_gate(spark, sf_dir):
    """Convergence-regression gate: wall-time noise can hide an extra
    star round (r05 saw a +8% wobble under an identical plan hash); the
    round COUNT cannot wobble. Chain graphs converge logarithmically and
    the bench LSH pair graph converges within the bench gate bound."""
    from bruin_spark.operators.dedup import connected_components
    from bruin_spark.workloads.dedup import (
        JACCARD_T,
        LSH_BANDS,
        MINHASH_K,
        NGRAM,
        _docs,
    )
    import bench
    from bruin_spark.operators.dedup import minhash_dedup_pairs

    stats = {}
    chain = [(i, i + 1) for i in range(0, 64)]
    pairs = spark.createDataFrame(chain, "id_a bigint, id_b bigint")
    connected_components(pairs, stats=stats).count()
    assert 1 <= stats["rounds"] <= 8  # O(log n) on a 64-node path

    stats = {}
    lsh_pairs = minhash_dedup_pairs(
        _docs(spark, sf_dir), k=MINHASH_K, bands=LSH_BANDS, n=NGRAM, threshold=JACCARD_T
    )
    connected_components(lsh_pairs, stats=stats).count()
    assert stats["rounds"] <= bench.CC_MAX_ROUNDS


# -- exact-collapse minhash clusters (r8: skew-safe near-dup pipeline) ---------


def _skewy_docs(spark, n=400):
    """Corpus with a hot identical-text cluster (~25%), several medium
    clusters, near-dup (not identical) variants, empty AND
    whitespace-only texts (both shingle to [''], so they cluster
    together at Jaccard 1 — the case that must collapse, not exempt),
    and a unique tail — the Zipf shape that blows up naive LSH
    bucketing."""
    rows = []
    hot = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for i in range(n):
        if i % 4 == 0:
            text = hot                                   # hot exact cluster
        elif i % 4 == 1:
            text = f"med{i % 7} one two three four five six seven eight nine"
        elif i % 4 == 2 and i % 40 == 2:
            text = ""                                    # empty docs cluster at J=1
        elif i % 4 == 2 and i % 40 == 22:
            text = "   "                                 # ...with whitespace variants
        elif i % 4 == 2:
            # near-dup of hot: one word changed (high but non-1 jaccard)
            text = hot.replace("kappa", f"kap{i % 3}")
        else:
            text = f"unique doc {i} with its very own words w{i} x{i} y{i} z{i}"
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_minhash_dedup_clusters_equals_allpairs_pipeline(spark):
    """The exact-collapse pipeline must be output-identical to
    connected_components(minhash_dedup_pairs(df)) — the invariant that
    keeps the oracle valid while the plan becomes skew-safe."""
    from bruin_spark.operators.dedup import (
        connected_components,
        minhash_dedup_clusters,
        minhash_dedup_pairs,
    )

    docs = _skewy_docs(spark)
    ref = connected_components(
        minhash_dedup_pairs(docs, k=8, bands=4, threshold=0.5), "id_a", "id_b"
    )
    got = minhash_dedup_clusters(docs, k=8, bands=4, threshold=0.5)
    ref_rows = sorted(map(tuple, ref.collect()))
    got_rows = sorted(map(tuple, got.collect()))
    assert ref_rows == got_rows
    assert len(got_rows) > 100  # the hot+medium clusters actually exist


def test_exact_text_mapping_groups_including_empty(spark):
    """Byte-identical texts group — INCLUDING empty/whitespace docs
    (shingle sets are never empty: '' shingles to [''], so identical
    empties verify at Jaccard 1 and collapsing them is output-identical;
    leaving them ungrouped would park 100k boilerplate-empty crawl docs
    in one quadratic LSH band bucket).  '' and '   ' are different
    bytes, hence different groups."""
    from bruin_spark.operators.dedup import collapse_exact_texts, exact_text_mapping

    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (5, "other"), (7, ""), (9, ""), (11, "   ")],
        "doc_id bigint, text string",
    )
    m = {r["id"]: (r["rep"], r["group_n"]) for r in exact_text_mapping(docs).collect()}
    assert m[1] == (1, 2) and m[2] == (1, 2) and m[5] == (5, 1)
    # byte-identical empty texts group; whitespace variant stays apart
    assert m[7] == (7, 2) and m[9] == (7, 2) and m[11] == (11, 1)
    reps = sorted(r["doc_id"] for r in collapse_exact_texts(docs).collect())
    assert reps == [1, 5, 7, 11]


def test_null_texts_group_and_survive_cluster_expansion(spark):
    """md5(NULL) is NULL and a NULL key never equi-joins to itself — a
    naive text-only group key silently DROPS NULL-text docs from the
    cluster output (found by review).  The sentinel key groups all NULL
    texts together; shingles(NULL) = [''], so the all-pairs pipeline
    links NULL and '' docs at Jaccard 1 and the collapsed pipeline must
    produce the identical clusters."""
    from bruin_spark.operators.dedup import (
        connected_components,
        exact_text_mapping,
        minhash_dedup_clusters,
        minhash_dedup_pairs,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, ""), (4, None), (5, "real words here")],
        "doc_id bigint, text string",
    )
    m = {r["id"]: (r["rep"], r["group_n"]) for r in exact_text_mapping(docs).collect()}
    assert m[1] == (1, 2) and m[4] == (1, 2)  # NULLs are one group
    assert m[2] == (2, 2) and m[3] == (2, 2)
    ref = sorted(
        map(
            tuple,
            connected_components(
                minhash_dedup_pairs(docs, k=8, bands=4, threshold=0.5), "id_a", "id_b"
            ).collect(),
        )
    )
    got = sorted(
        map(tuple, minhash_dedup_clusters(docs, k=8, bands=4, threshold=0.5).collect())
    )
    assert ref == got
    assert (1, 1) in got and (4, 1) in got  # NULL docs present, linked


def test_segment_dedup_no_window_single_reducer(spark):
    """The first-occurrence plan must be aggregate+join (map-side
    combinable), not a row_number window over the raw segment rows."""
    from bruin_spark.operators.dedup import segment_dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "x y z")],
        "doc_id bigint, text string",
    )
    out = segment_dedup(docs, seg_tokens=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" not in plan.lower()
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_segments_kept"] == 2 and rows[2]["n_segments_kept"] == 0
    assert rows[2]["clean_text"] == ""
    assert rows[3]["n_segments_kept"] == 1


def test_simhash_dedup_clusters_equals_allpairs_pipeline(spark):
    from bruin_spark.operators.dedup import (
        connected_components,
        simhash_dedup_clusters,
        simhash_near_pairs,
    )

    docs = _skewy_docs(spark)
    ref = connected_components(simhash_near_pairs(docs, max_hamming=3), "id_a", "id_b")
    got = simhash_dedup_clusters(docs, max_hamming=3)
    assert sorted(map(tuple, ref.collect())) == sorted(map(tuple, got.collect()))


def test_prefix_filtered_jaccard_equals_bruteforce(spark):
    """ngram_jaccard_pairs (prefix-filtered index) must emit EXACTLY the
    brute-force all-pairs Jaccard >= t set — the prefix theorem's
    completeness, checked on a corpus with boilerplate-heavy docs,
    identical docs, near-dups, tiny docs, and empty text."""
    import itertools

    rows = []
    bp = "common header words shared across many documents here"
    for i in range(60):
        if i % 5 == 0:
            rows.append((i, bp + f" unique tail {i} alpha beta"))
        elif i % 5 == 1:
            rows.append((i, "identical payload text for exact duplicates"))
        elif i % 5 == 2:
            rows.append((i, f"doc {i} with mostly unique words w{i} x{i} y{i} z{i} q{i}"))
        elif i % 5 == 3:
            rows.append((i, f"near dup family text version {i % 2} stable suffix words"))
        else:
            rows.append((i, "tiny"))
    rows.append((60, ""))
    rows.append((61, ""))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    from bruin_spark.operators.dedup import ngram_jaccard_pairs

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }

    def sh(text, n=3):
        toks = text.lower().strip().split()
        if not toks:
            toks = [""]
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    want = {}
    shs = {i: sh(t) for i, t in rows}
    for a, b in itertools.combinations(sorted(shs), 2):
        inter = len(shs[a] & shs[b])
        if inter:
            j = round(inter / (len(shs[a]) + len(shs[b]) - inter), 6)
            if j >= 0.5:
                want[(a, b)] = j
    assert got == want


def test_incremental_dedup_collapsed_index_equals_full_index(spark):
    """Indexing only exact-text reps must return the identical best-match
    table: tie order (jaccard DESC, id ASC) makes a group's min-id rep
    the winner the full index would pick."""
    from bruin_spark.operators.dedup import (
        collapse_exact_texts,
        incremental_dedup,
        lsh_band_index,
    )

    docs = _skewy_docs(spark, n=300)
    batch = docs.filter("doc_id % 10 < 2")
    corpus = docs.filter("doc_id % 10 >= 2")
    full = incremental_dedup(
        batch, lsh_band_index(corpus, k=8, bands=4), corpus, k=8, bands=4, threshold=0.5
    )
    reps = collapse_exact_texts(corpus)
    coll = incremental_dedup(
        batch, lsh_band_index(reps, k=8, bands=4), reps, k=8, bands=4, threshold=0.5
    )
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, coll.collect()))


def test_prefix_filter_keeps_exactly_at_threshold_pairs(spark):
    """Float products round up (0.55*100 = 55.000000000000004): the
    prefix length and size filter must prune CONSERVATIVELY or a pair
    at exactly J = threshold is silently dropped while verification
    (round(J,6) >= t) would accept it.  x = 102 distinct tokens (100
    shingles), y = its 57-token prefix (55 shingles, all shared):
    J = 55/100 = 0.55 exactly."""
    from bruin_spark.operators.dedup import ngram_jaccard_pairs

    toks = [f"w{i}" for i in range(102)]
    docs = spark.createDataFrame(
        [(1, " ".join(toks)), (2, " ".join(toks[:57]))],
        "doc_id bigint, text string",
    )
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.55).collect()}
    assert rows == {(1, 2): 0.55}, rows

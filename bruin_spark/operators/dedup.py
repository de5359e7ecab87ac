"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design notes (the reason each operator is shaped the way it is):

- **exact**: one hash-groupBy over a canonical fingerprint — a single
  shuffle on a short string key; AQE handles skew.
- **n-gram Jaccard**: exact pairwise similarity via a PREFIX-FILTERED
  inverted index (AllPairs/PPJoin) keyed on 60-bit shingle hashes. It
  never materializes the full O(n²) pair space, and hot common shingles
  fall out of every large doc's indexed prefix.
- **MinHash+LSH**: the 100 TB path. ONE md5 per shingle: the digest's
  60-bit hex prefix parses to BIGINT and each of the k "permutations"
  is an affine mix ``(a·h1 + b·h2 + c) mod 2^31−1`` over its 28-bit
  halves — every product stays under 2^60, so 64-bit arithmetic is
  exact and engine-portable and oracles reproduce signatures
  bit-for-bit (pinned in CI). Bands of r rows → bucket join —
  candidate generation cost is O(n·bands), not O(n²).
- **SimHash**: 48-bit signature from md5-derived bit votes (digest
  parsed once per token, shift/mask per bit); near-dups = signatures at
  small Hamming distance. Map-only signature computation.
- **embedding cosine**: see operators/similarity.py; near-dup = cosine
  above threshold between distinct vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from bruin_spark.checkpointing import materialize, release
from bruin_spark.operators.text import fingerprint, shingles


# -- exact ---------------------------------------------------------------


def exact_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_member_ids: int = 100,
) -> DataFrame:
    """Groups of byte-identical (canonicalized) documents.

    Returns one row per duplicate group: fingerprint, size, canonical id
    (min id), and the FIRST ``max_member_ids`` member ids by id order.
    The cap is enforced BEFORE aggregation (row_number window over the
    same shuffle key, so the exchange is reused and the running count
    never buffers the group): one boilerplate document duplicated 100M
    times at 100 TB would otherwise materialize an unbounded array on a
    single hot reducer.  ``group_size`` + ``canonical_id`` stay exact;
    pass ``max_member_ids=None`` only for toy inputs.
    """
    fp = fingerprint(df, text_col)
    if max_member_ids is None:
        member_expr = F.collect_list(id_col)
    else:
        w = Window.partitionBy("doc_fingerprint").orderBy(id_col)
        fp = fp.withColumn("_rn", F.row_number().over(w))
        # collect_list skips NULLs: the agg buffer holds at most
        # max_member_ids entries per group
        member_expr = F.collect_list(
            F.when(F.col("_rn") <= max_member_ids, F.col(id_col))
        )
    return (
        fp.groupBy("doc_fingerprint")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min(id_col).alias("canonical_id"),
            F.sort_array(member_expr).alias("member_ids"),
        )
        .filter(F.col("group_size") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row (min id) per canonical text.

    ``min_by(struct(row), id)`` per fingerprint, NOT a row_number window:
    min_by is an algebraic aggregate, so a boilerplate text repeated 100M
    times collapses to one buffered row per map task instead of
    streaming the whole hot key through a single window reducer.
    """
    fp = fingerprint(df, text_col)
    cols = [c for c in df.columns]
    return (
        fp.groupBy("doc_fingerprint")
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("_row"))
        .select("_row.*")
    )


# -- n-gram Jaccard ---------------------------------------------------------


def _md5_60bit_key(col) -> "F.Column":
    """60-bit integer key from the md5 hex prefix — THE cross-engine
    hash contract: Spark ``conv(substr(md5(x),1,15),16,10)`` equals
    DuckDB ``('0x' || substr(md5(x),1,15))::BIGINT`` (see
    workloads/dedup.py:_DUCK_SHINGLE_HASHES, which must stay the mirror
    of this expression).  Used as the minhash input hash and as the
    prefix-filter posting key."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard similarity over word n-gram shingle sets, via a
    PREFIX-FILTERED inverted index (AllPairs / PPJoin family: Bayardo et
    al., "Scaling Up All Pairs Similarity Search", WWW'07).

    A naive inverted index self-joins EVERY posting list: one boilerplate
    shingle shared by 30% of a corpus alone forms O((0.3n)²) pairs.  The
    prefix filter indexes only each doc's first ``|x| − ⌈t·|x|⌉ + 1``
    shingles in a global rarity order (ascending document frequency):
    for any pair with Jaccard ≥ t, the globally-smallest shared shingle
    provably lies in BOTH prefixes (if it lay beyond x's prefix, the
    whole intersection would fit in x's last ⌈t·|x|⌉ − 1 positions,
    contradicting |x∩y| ≥ t·|x|) — so the candidate set is complete and
    the output is EXACTLY the naive plan's.  Hot common shingles sort
    LAST and fall out of every large doc's prefix; a size filter
    (t·|x| ≤ |y| ≤ |x|/t) prunes further.  Candidates are verified with
    exact set intersection over only the candidate docs' shingle arrays.
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.array_distinct(shingles(text_col, n)).alias("sh")
    )
    # posting keys are 60-bit hashes of the shingle, not the string:
    # every downstream shuffle/sort/join compares 8-byte longs instead
    # of ~20-char strings.  A CROSS-doc hash collision merges two
    # posting lists, which can only ADD candidates (true common shingles
    # always share a hash) — the exact-intersection verification filters
    # them.  WITHIN-doc collisions are neutralized by the dense_rank
    # below; see the residual-probability note there.
    hkey = _md5_60bit_key(F.col("shingle"))
    inv = sh.select(
        "id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    ).select("id", "n_sh", hkey.alias("_hs"))
    # ONE evaluation of the scan→shingle→explode→md5 pipeline: inv
    # feeds BOTH the document-frequency aggregate and the probe side of
    # the rarity join below, and the two subtrees differ (one has the
    # agg), so neither exchange reuse nor AQE can de-duplicate them —
    # r15 stage profiling measured the explode+md5 stage TWICE per
    # call, each ~30% of the entry's executor time.  The pinned rows
    # are three fixed-width columns (~20 B/row, no text) — this is the
    # posting-list artifact an SSJoin system persists anyway, not a
    # fat-row cache (contrast the rejected funnel tokenization pin,
    # OPTIMIZATION_r15.md ask #3 Attempt A).  eager=True: both
    # consumers are subtrees of the same downstream job.
    inv = materialize(inv, eager=True)
    # global document frequency: count+min aggregate map-side, so the
    # hot shingle collapses before it can fan out
    dfreq = inv.groupBy("_hs").agg(F.count(F.lit(1)).alias("_df"))
    # rarity order (asc df, hash tiebreak): any consistent total order
    # on posting keys satisfies the prefix theorem.  dense_rank, NOT
    # row_number: a within-doc 60-bit collision (two distinct shingles,
    # one hash) yields two rows with IDENTICAL (_df, _hs) sort keys —
    # dense_rank collapses them into one slot so later keys are never
    # displaced past the prefix boundary (row_number would burn two
    # slots and could drop a true candidate).  The duplicated posting
    # rows inside the prefix only duplicate candidate pairs, which the
    # .distinct() below removes.  Residual inexactness is now only the
    # CROSS-doc collision lowering hash-set Jaccard below t for an
    # exactly-at-threshold pair — probability ~|A∩B|²/2⁶¹ per pair.
    w = Window.partitionBy("id").orderBy("_df", "_hs")
    ranked = inv.join(dfreq, "_hs").withColumn("_r", F.dense_rank().over(w))
    # Pruning must only ever be CONSERVATIVE: verification accepts
    # round(J, 6) >= threshold, and float products round up (0.55 * 100
    # = 55.000000000000004, whose ceil over-shortens the prefix and
    # whose size filter drops an exactly-at-threshold pair).  Relaxing
    # the pruning threshold by the rounding slack (0.5 ulp of round-6)
    # plus float epsilon can only ADD candidates — the exact-
    # intersection verification keeps the output identical.
    t_prune = threshold - 1e-6
    prefix = ranked.filter(
        F.col("_r")
        <= F.col("n_sh") - F.ceil(F.lit(t_prune) * F.col("n_sh")) + 1
    ).select("id", "n_sh", "_hs")
    cands = (
        prefix.alias("a")
        .hint("merge")
        .join(
            prefix.alias("b").hint("merge"),
            (F.col("a._hs") == F.col("b._hs"))
            & (F.col("a.id") < F.col("b.id"))
            # size filter: J ≥ t forces t·|a| ≤ |b| and t·|b| ≤ |a|
            & (F.col("a.n_sh") * F.lit(t_prune) <= F.col("b.n_sh"))
            & (F.col("b.n_sh") * F.lit(t_prune) <= F.col("a.n_sh")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    cands = materialize(cands, eager=True)
    # spread=True: prefix-filter candidate sets are large by
    # construction (everything sharing a rare-prefix posting verifies),
    # so the exact-intersection projection is the hot stage here
    return _verify_jaccard_pairs(
        cands, df, id_col, text_col, n, threshold, spread=True
    )


def _spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Hash-repartition ``df`` by ``key_cols`` into at least the
    cluster's default parallelism (keeping a larger existing width).

    For CPU-dense verification stages whose input rows are tiny, AQE's
    byte-based partition sizing under-parallelizes: a few MB of
    candidate pairs coalesce to 1-3 partitions even though each row
    costs microseconds of set-intersection CPU.  The target is derived
    from the cluster (``defaultParallelism``) and the data's current
    width — never a hard-coded partition count.  Keys must be uniform
    (candidate pairs are distinct by construction), so the hash spreads
    evenly."""
    n = max(
        df.sparkSession.sparkContext.defaultParallelism,
        df.rdd.getNumPartitions(),
    )
    return df.repartition(n, *[F.col(c) for c in key_cols])


def _verify_jaccard_pairs(
    cands: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
    spread: bool = False,
) -> DataFrame:
    """Exact-Jaccard verification of candidate (id_a, id_b) pairs:
    semi-join the RAW docs down to candidate ids FIRST, then compute
    shingle arrays — shared by the MinHash-LSH and prefix-filter
    pipelines.  Order matters: handing Catalyst `semi_join(project(
    expensive_shingles))` does NOT push the join below the projection,
    so the shingle expression would run over the whole corpus instead of
    the ~|candidates| docs (measured +50% on the minhash stress when the
    r8 refactor briefly got this wrong)."""
    cand_ids = (
        cands.select(F.col("id_a").alias("cid"))
        .union(cands.select(F.col("id_b").alias("cid")))
        .distinct()
    )
    docs_small = docs.join(cand_ids, F.col(id_col) == F.col("cid"), "left_semi")
    sh_small = materialize(
        docs_small.select(
            F.col(id_col).alias("id"),
            F.array_distinct(shingles(text_col, n)).alias("sh"),
        ),
        eager=True,
    )
    # spread (opt-in): the exact-intersection projection is the
    # pipeline's most CPU-dense per-row work (~µs/pair) over its
    # narrowest rows (two ids), so AQE's byte-based coalescing parks it
    # on 1-3 tasks while 30 cores idle (r15 stage profile on the
    # prefix-filter pipelines: the verify stage held >40% of entry CPU
    # on 2 tasks; probe-gated A/B: containment 0.57x WITH the spread).
    # Opt-IN because the lifted width propagates into whatever consumes
    # the verified pairs: for the LSH cluster pipelines — whose
    # candidate sets are band-collision-bounded and exact-collapse
    # shielded, so verification is cheap — the spread measured +620
    # downstream connected-components tasks at sf0.1 for no verify win.
    if spread:
        cands = _spread(cands, "id_a", "id_b")
    return (
        cands.join(sh_small.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh_small.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.size("sh_a") + F.size("sh_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -- MinHash + LSH -----------------------------------------------------------


#: modulus of the affine minhash "permutations" (2^31 - 1, prime)
MINHASH_MOD = 2147483647
#: 28-bit mask: the md5 digest prefix is split into two 28-bit halves so
#: every a*h1 + b*h2 + c stays under 2^60 — exact in BIGINT arithmetic
#: on BOTH engines (no 128-bit ops, no overflow, no engine divergence)
MINHASH_H_MASK = (1 << 28) - 1


def minhash_coeffs(k: int) -> list[tuple[int, int, int]]:
    """Deterministic affine-permutation coefficients (a_i, b_i, c_i).

    Generated by a fixed-seed 64-bit LCG so they are plain integer
    literals reproducible verbatim inside the DuckDB oracle SQL;
    a_i, b_i are odd, nonzero mod MINHASH_MOD, and < 2^31, so products
    with 28-bit hash halves stay inside 63-bit signed range.  The |1
    of a draw of MOD-1 would yield exactly MOD ≡ 0 (degenerating that
    permutation to ignore one hash half); such draws are rejected —
    deterministically, so earlier accepted draws (and therefore every
    committed k≤16 table) are unchanged.
    """
    x = 0x5DEECE66D
    out = []

    def nxt() -> int:
        nonlocal x
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 64)
        return (x >> 33) % MINHASH_MOD

    def nxt_odd_nonzero() -> int:
        while True:
            v = nxt() | 1
            if v < MINHASH_MOD:
                return v

    for _ in range(k):
        out.append((nxt_odd_nonzero(), nxt_odd_nonzero(), nxt()))
    return out


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    n: int = 3,
) -> DataFrame:
    """k-permutation MinHash signature.

    ONE md5 per shingle: the digest's 60-bit hex prefix is parsed to an
    integer and split into two 28-bit halves; permutation i is the
    affine mix ``(a_i*h1 + b_i*h2 + c_i) % (2^31-1)`` (k long
    multiply-adds instead of k md5 calls — measured ~2.5× faster, and
    the mins compare 8-byte longs instead of 33-char hex strings).
    Identical across engines: md5 is md5, and the hex-parse + integer
    mix is exact BIGINT arithmetic on both Spark and DuckDB.

    Plan shape: explode shingles → k flat ``MIN(...)`` aggregates in
    one groupBy. The array form (array_min over transform) is interpreted
    (higher-order functions are CodegenFallback) AND projection collapse
    inlines the shingle computation into every signature column; the
    aggregate is a barrier that guarantees shingles evaluate once, and
    map-side partial MIN means the shuffle carries k longs per doc.
    """
    # no array_distinct: MIN is duplicate-insensitive, and the distinct
    # pass is an interpreted HOF costing ~30% of the explode stage
    h = _md5_60bit_key(F.col("_s"))
    sh_rows = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(text_col, n)).alias("_s"),
    ).select(
        "id",
        h.bitwiseAND(F.lit(MINHASH_H_MASK)).alias("_h1"),
        F.shiftright(h, 28).bitwiseAND(F.lit(MINHASH_H_MASK)).alias("_h2"),
    )
    aggs = [
        F.min(
            (F.lit(a) * F.col("_h1") + F.lit(b) * F.col("_h2") + F.lit(c))
            % F.lit(MINHASH_MOD)
        ).alias(f"mh_{i}")
        for i, (a, b, c) in enumerate(minhash_coeffs(k))
    ]
    return sh_rows.groupBy("id").agg(*aggs)


def lsh_band_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """The persistable LSH index of a corpus: one (id, band, band_key)
    row per document per band.

    This is the signature store of an INCREMENTAL dedup pipeline: write
    it once per corpus (append each ingested batch's rows), then dedup
    a new batch by joining the batch's band rows against it — the
    historical corpus is never re-shingled. At scale, materialize it
    bucketed by ``band_key`` (mat strategies' ``bucket_by``) so each
    incremental join is shuffle-free on the corpus side.

    One pass: signature computed once per row, bands exploded from an
    inline array (a union of per-band selects would re-evaluate the
    whole signature expression once per band).
    """
    assert k % bands == 0
    r = k // bands
    sig = minhash_signature(df, id_col, text_col, k, n)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"mh_{i}").cast("string")
                            for i in range(b * r, (b + 1) * r)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sig.select("id", F.explode(band_structs).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """LSH candidate pairs: split the k-wide signature into ``bands``
    bands of k/bands rows; docs sharing any band key are candidates.

    Returns (id_a, id_b, n_bands_shared). The band key join is the only
    shuffle and is keyed on a short md5 — uniform by construction.
    """
    band_rows = lsh_band_index(df, id_col, text_col, k, bands, n)

    # merge-join hint: a broadcast self-join would evaluate the signature
    # pipeline twice (once to build the hash relation, once to stream);
    # with SMJ both sides shuffle on identical keys and Spark's exchange
    # reuse computes the signature subplan ONCE
    return (
        band_rows.alias("a")
        .hint("merge")
        .join(
            band_rows.alias("b").hint("merge"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands_shared"))
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: LSH candidates verified with
    exact Jaccard (verification join only touches candidate ids).

    Shingle sets for verification are computed only for docs that appear
    in some candidate pair (semi-join first): at low dup rates that is a
    tiny fraction of the corpus, so the expensive shingle expression runs
    on ~|candidates| docs instead of all of them — twice matters at 100 TB.
    """
    # Materialize the candidate pairs once: the subtree is referenced 3×
    # below (pair join + both sides of the id union) and differing column
    # pruning defeats Spark's exchange reuse, so without this the whole
    # scan→minhash→band-join pipeline would execute three times.  The
    # pinned data is one row per candidate PAIR — tiny next to the corpus.
    cands = materialize(
        minhash_lsh_candidates(df, id_col, text_col, k, bands, n), eager=True
    ).select("id_a", "id_b")
    # verification shingles only the candidate docs (semi-join inside
    # the helper) — at low dup rates a tiny fraction of the corpus
    return _verify_jaccard_pairs(cands, df, id_col, text_col, n, threshold)


def incremental_dedup(
    batch: DataFrame,
    corpus_index: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Dedup a NEW batch of documents against an EXISTING corpus without
    re-processing the corpus — the standard shape of continuous corpus
    curation at 100 TB: each ingested batch is matched against the
    persisted ``lsh_band_index`` of everything before it, and only the
    few corpus docs that collide on a band are ever re-read.

    Inputs: ``batch`` (today's docs), ``corpus_index`` (the persisted
    (id, band, band_key) store), ``corpus_docs`` (the corpus text, read
    only for verification of matched ids — a semi-join sliver).

    Plan shape: the batch's band rows BROADCAST against the corpus index
    (the index side never shuffles — with a ``bucket_by(band_key)``
    layout it never even re-sorts); verification shingles only the batch
    plus the matched corpus docs; best-match selection windows over the
    verified candidate set only.

    Returns one row per batch doc: (doc_id, is_dup, match_id, jaccard)
    where match_id is the corpus doc with the highest verified Jaccard
    (ties → smallest id) and NULL when nothing clears ``threshold``.

    Skew note: build the index over ``collapse_exact_texts(corpus)``
    representatives — identical corpus docs share every band key, so a
    hot text makes every matching batch doc a candidate against the
    WHOLE group (quadratic).  The collapsed index returns the identical
    best match: ties break (jaccard DESC, id ASC), and a group's min-id
    rep carries the same jaccard as every member it replaces.
    """
    from pyspark.sql import Window

    bidx = lsh_band_index(batch, id_col, text_col, k, bands, n)
    if broadcast_batch:
        bidx = F.broadcast(bidx)
    cands = (
        bidx.alias("b")
        .join(
            corpus_index.alias("c"),
            (F.col("b.band") == F.col("c.band"))
            & (F.col("b.band_key") == F.col("c.band_key")),
        )
        .select(F.col("b.id").alias("batch_id"), F.col("c.id").alias("corpus_id"))
        .distinct()
    )
    # referenced three times below (two semi-joins + verify)
    cands = materialize(cands, eager=True)
    # shingle ONLY docs that appear in some candidate pair — on both
    # sides (at low dup rates that is a sliver of each input; the
    # semi-join must come FIRST because the projection's shingle
    # expression otherwise evaluates for every row fed into the join)
    bsh = batch.join(
        cands.select("batch_id"), F.col(id_col) == F.col("batch_id"), "left_semi"
    ).select(
        F.col(id_col).alias("batch_id"),
        F.array_distinct(shingles(text_col, n)).alias("sh_b"),
    )
    csh = (
        corpus_docs.join(
            cands.select("corpus_id"),
            F.col(id_col) == F.col("corpus_id"),
            "left_semi",
        )
        .select(
            F.col(id_col).alias("corpus_id"),
            F.array_distinct(shingles(text_col, n)).alias("sh_c"),
        )
    )
    verified = (
        cands.join(bsh, "batch_id")
        .join(csh, "corpus_id")
        .withColumn("n_common", F.size(F.array_intersect("sh_b", "sh_c")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.size("sh_b") + F.size("sh_c") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    w = Window.partitionBy("batch_id").orderBy(
        F.col("jaccard").desc(), F.col("corpus_id").asc()
    )
    best = (
        verified.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("batch_id", "corpus_id", "jaccard")
    )
    return (
        batch.select(F.col(id_col).alias("doc_id"))
        .join(best, F.col("doc_id") == F.col("batch_id"), "left")
        .select(
            "doc_id",
            F.col("batch_id").isNotNull().alias("is_dup"),
            F.col("corpus_id").alias("match_id"),
            "jaccard",
        )
    )


# -- SimHash -------------------------------------------------------------


SIMHASH_BITS = 48  # 12 md5 hex digits × 4 bits; fits bigint with headroom


def simhash_sql_expr(text_col: str = "text", dialect: str = "duckdb") -> str:
    """SimHash signature as a single SQL expression (oracle side).

    Mirrors simhash64's arithmetic exactly: per bit, each token votes ±1
    using bit b of md5 hex digit h; signature bit = vote > 0. The Spark
    operator computes the identical value through an explode/groupBy plan
    (see simhash64); this expression form exists for the DuckDB oracle.
    """
    if dialect == "duckdb":
        toks = f"string_split_regex(lower(trim({text_col})), '\\s+')"
        # one md5 per token parsed to a 48-bit integer; votes are integer
        # shift/mask — same bit semantics as the historical per-hex-digit
        # form (digit h bit b of the hex string == integer bit
        # 4*(11-h)+b), so signature VALUES are unchanged
        hs = f"list_transform({toks}, t -> ('0x' || substr(md5(t), 1, 12))::BIGINT)"

        def vote(pos: int) -> str:
            return (
                f"list_sum([CASE WHEN (h >> {pos}) & 1 = 1 "
                f"THEN 1 ELSE -1 END FOR h IN {hs}])"
            )

    else:
        raise ValueError(dialect)

    terms = []
    for bit in range(SIMHASH_BITS):
        h, b = bit // 4, bit % 4
        pos = 4 * (11 - h) + b
        terms.append(
            f"(CASE WHEN ({vote(pos)}) > 0 THEN CAST({2 ** bit} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
    return " + ".join(terms)


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", out: str = "simhash"
) -> DataFrame:
    """SimHash signature over word tokens (SIMHASH_BITS wide).

    Shape chosen for codegen: explode tokens → md5 ONCE per token,
    parsed once to a 48-bit integer → 48 flat ``SUM(CASE ...)`` bit-vote
    aggregates in one groupBy, each an integer shift/mask (the historical
    per-hex-digit substr/position form did 48 string ops per token; the
    integer form votes on the SAME bits — digit h bit b of the hex
    string is integer bit 4*(11-h)+b — so signature values are
    unchanged). Spark's higher-order array functions (transform/
    aggregate) are interpreted (CodegenFallback), so the seemingly
    shuffle-free fold-over-array form is ~10× slower than this explode +
    hash-aggregate plan; the groupBy does map-side partial aggregation,
    so the shuffle moves only 48 ints per document.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tok = df.select(F.col(id_col), F.explode(toks).alias("_t")).select(
        id_col,
        F.conv(F.substring(F.md5("_t"), 1, 12), 16, 10).cast("long").alias("_h"),
    )
    votes = []
    for bit in range(SIMHASH_BITS):
        h, b = bit // 4, bit % 4
        pos = 4 * (11 - h) + b
        vote = F.when(
            F.shiftright(F.col("_h"), pos).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)
        votes.append(F.sum(vote).alias(f"_v{bit}"))
    sig = tok.groupBy(id_col).agg(*votes)
    acc = F.lit(0).cast("bigint")
    for bit in range(SIMHASH_BITS):
        acc = acc + F.when(F.col(f"_v{bit}") > 0, F.lit(2**bit).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return sig.select(F.col(id_col), acc.alias(out))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    Block on n_chunks bit-chunks (pigeonhole: distance ≤ n_chunks−1 ⇒ ≥1
    identical chunk) then verify with bit_count(xor) — the candidate join
    only touches chunk-equal pairs, never the O(n²) space.
    """
    width = SIMHASH_BITS // n_chunks
    sig = simhash64(df, id_col, text_col)
    # Explode chunk keys from one signature evaluation (the per-chunk
    # union form recomputes the 48-bit signature expression per chunk).
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("blk"),
                F.shiftright("simhash", c * width)
                .bitwiseAND(F.lit(2**width - 1))
                .alias("blk_key"),
            )
            for c in range(n_chunks)
        ]
    )
    blocked = sig.select(
        F.col(id_col).alias("id"), "simhash", F.explode(chunk_structs).alias("bk")
    ).select("id", "simhash", F.col("bk.blk").alias("blk"), F.col("bk.blk_key").alias("blk_key"))
    return (
        blocked.alias("a")
        .hint("merge")
        .join(
            blocked.alias("b").hint("merge"),
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.blk_key") == F.col("b.blk_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def hamming_near_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    bits: int = 64,
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs over ANY precomputed bigint signature column by
    Hamming distance — the banding engine behind image pHash dedup
    (and any other fixed-width perceptual/locality hash).

    Same pigeonhole blocking as simhash_near_pairs: split the ``bits``
    signature into ``n_chunks`` equal chunks; two signatures within
    Hamming distance ``n_chunks - 1`` share at least one identical
    chunk, so the candidate join touches only chunk-equal pairs and
    never the O(n²) space.  ``max_hamming`` must stay below
    ``n_chunks`` for the guarantee to hold (enforced).  Chunk keys are
    extracted with an arithmetic shift + mask, which is sign-fill-proof
    — bit 63 of a two's-complement bigint lands in the top chunk the
    same way on Spark and DuckDB.

    100 TB shape: the input is (id, int64) — 16 bytes per image
    regardless of media size; the banded self-join shuffles on
    (chunk, key), and a hot duplicate cluster concentrates into ONE
    chunk-key group whose output is the cluster's true pair set (the
    quadratic is in the answer, not the algorithm).  Verification is
    one JVM ``bit_count(xor)`` per candidate.
    """
    if max_hamming >= n_chunks:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_chunks > max_hamming "
            f"(pigeonhole guarantee), got n_chunks={n_chunks}"
        )
    if bits % n_chunks:
        raise ValueError(f"bits={bits} not divisible by n_chunks={n_chunks}")
    width = bits // n_chunks
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("blk"),
                F.shiftright(hash_col, c * width)
                .bitwiseAND(F.lit(2**width - 1))
                .alias("blk_key"),
            )
            for c in range(n_chunks)
        ]
    )
    blocked = sig.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("sig"),
        F.explode(chunk_structs).alias("bk"),
    ).select(
        "id", "sig", F.col("bk.blk").alias("blk"), F.col("bk.blk_key").alias("blk_key")
    )
    return (
        blocked.alias("a")
        .hint("merge")
        .join(
            blocked.alias("b").hint("merge"),
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.blk_key") == F.col("b.blk_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# -- duplicate clusters: connected components ---------------------------------


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node points its LARGER neighbors at the
    minimum of its neighborhood (including itself).

    NO trailing distinct: every composition site is
    ``_small_star(_large_star(e))``, and the small-star round's
    ``withself.distinct()`` removes duplicate edges anyway — a distinct
    here would pay one extra full-edge-set exchange per CC round for
    rows the very next operator re-dedups (the duplicate volume the
    small star absorbs is exactly what the dropped distinct processed).
    """
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: every node points its SMALLER-or-equal
    neighborhood (and itself) at the neighborhood minimum."""
    oriented = e.select(
        F.greatest(F.col("u"), F.col("v")).alias("u"),
        F.least(F.col("u"), F.col("v")).alias("v"),
    )
    withself = oriented.union(
        oriented.select(F.col("u").alias("u"), F.col("u").alias("v"))
    ).distinct()
    mins = withself.groupBy("u").agg(F.min("v").alias("m"))
    return (
        withself.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over a pair graph -> (node, component).

    Alternating large-star / small-star rounds (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): converges
    in O(log n) rounds, each round is a groupBy + a key-colocated join —
    no driver-side graph, no vertex broadcast, so the pair graph can be
    billions of edges.  This is the cluster-assignment endgame of the
    MinHash/SimHash pipelines: LSH emits candidate PAIRS; training-data
    dedup needs per-document cluster ids to pick survivors.

    ``component`` is the minimum node id of the component.  Lineage is
    truncated per round via checkpointing.materialize — localCheckpoint
    by default, durable checkpoint(dir) when the deployment selects
    checkpoint mode 'reliable' (executor churn on a real cluster loses
    localCheckpointed partitions).  Raises after ``max_iter``
    non-converged rounds.

    ``stats``: optional dict; on return, ``stats["rounds"]`` holds the
    number of star rounds executed — the bench's convergence-regression
    gate (wall-time alone cannot tell a slow round from an extra round).

    Reference has no analog (its dedup ends at the warehouse); SURVEY
    §2 training-data design slot.
    """
    e = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    def _fingerprint(df: DataFrame):
        # bit_xor: order-independent and overflow-free under ANSI mode
        # (a SUM of xxhash64 values overflows long)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    # lazy localCheckpoint: the fingerprint action both materializes the
    # checkpoint AND reads the convergence state — ONE pass over the
    # edges per round instead of a dedicated checkpoint job followed by
    # a fingerprint job (at scale that is a whole extra edge scan per
    # star round).  The checkpoint still severs lineage before the next
    # round's plan executes.
    e = materialize(e, eager=False, required=True)
    prev = _fingerprint(e)
    if prev[0] == 0:
        if stats is not None:
            stats["rounds"] = 0
        schema = "node bigint, component bigint"
        return e.sparkSession.createDataFrame([], schema)
    rounds = 0
    for _ in range(max_iter):
        prev_e = e
        e = materialize(_small_star(_large_star(e)), eager=False, required=True)
        rounds += 1
        cur = _fingerprint(e)
        # the fingerprint action materialized the new round's edges, so
        # the prior round's blocks / checkpoint files are now dead —
        # without this a run holds O(rounds) edge-set copies (and, in
        # 'reliable' mode, strands their files on the DFS)
        release(prev_e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    if stats is not None:
        stats["rounds"] = rounds

    # converged star edges: (node, root); roots map to themselves.
    # Plain union, no distinct: e is distinct (small-star output), roots
    # is distinct, and the two sets are disjoint (every e row has
    # u != v — the small star filters v != m — while every roots row
    # has u == v), so a distinct here would be one full exchange over
    # rows that are already unique.
    roots = e.select(F.col("v").alias("u"), F.col("v").alias("v")).distinct()
    return e.union(roots).select(
        F.col("u").alias("node"), F.col("v").alias("component")
    )


def _text_group_key(id_col: str, text_col: str):
    """Grouping key for byte-identical texts: md5 over the raw bytes.

    Empty/whitespace docs group too: ``shingles`` never yields an empty
    set (the short-doc branch emits one whole-text shingle, so '' and
    '   ' both shingle to ['']), every byte-identical pair verifies at
    Jaccard 1 / Hamming 0, and the collapse equivalence proof applies
    to them unchanged.  Exempting them (as an earlier revision did on
    the false premise that empty shingle sets never link) would leave
    100k whitespace-only crawl docs as 100k identical-signature reps —
    exactly the quadratic LSH hot bucket the collapse exists to
    prevent.

    NULL texts get a literal sentinel key, NOT md5(NULL)=NULL: a NULL
    key never matches itself in the downstream equi-joins, which would
    silently DROP every NULL-text doc from the cluster output.  All
    NULL texts form ONE group — they are byte-identical to each other,
    and ``shingles(NULL)`` evaluates to [''] (concat_ws over a NULL
    token array), so the all-pairs pipeline links them at Jaccard 1 and
    merging them preserves the equivalence."""
    del id_col  # kept for signature stability; the key is text-only
    return F.coalesce(F.md5(F.col(text_col)), F.lit("__null__"))


def exact_text_mapping(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Map every doc to the representative (min id) of its byte-identical
    text group: (id, rep, group_n).

    The skew shield of the near-dup pipeline: a boilerplate text repeated
    100M times is ONE group here — min/count aggregate map-side, so the
    hot key collapses before any shuffle fans it out.
    """
    key = _text_group_key(id_col, text_col)
    mapping = df.select(F.col(id_col).alias("id"), key.alias("_tkey"))
    return mapping.join(_group_agg(mapping), "_tkey").select("id", "rep", "group_n")


def _exact_group_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per byte-identical text group: (_tkey, rep, group_n).

    Group-level, id-only rows: small enough to localCheckpoint cheaply
    (measured ~0.6 s/run faster at sf0.1 than carrying the group text
    through the aggregate).  Map-side combine keeps one buffered row
    per group per map task, so a text owning 20% of the corpus shuffles
    as one row per task, not 0.2·n rows.
    """
    key = _text_group_key(id_col, text_col)
    return _group_agg(df.select(F.col(id_col).alias("id"), key.alias("_tkey")))


def _group_agg(keyed: DataFrame) -> DataFrame:
    """(rep, group_n) per ``_tkey`` from a (id, _tkey) projection — THE
    exact-group aggregate, shared by _exact_group_rows and
    _keyed_and_groups so the grouping semantics (NULL-sentinel key,
    min-id representative) cannot diverge between the collapse and
    cluster paths."""
    return keyed.groupBy("_tkey").agg(
        F.min("id").alias("rep"), F.count(F.lit(1)).alias("group_n")
    )


def _rep_rows(df: DataFrame, groups: DataFrame, id_col: str) -> DataFrame:
    """Full rows of each exact group's representative: left-semi join
    ``df`` against the group minima (the rep-id side is one row per
    distinct text, so AQE broadcasts it)."""
    return df.join(
        groups.select(F.col("rep").alias("_rep_id")),
        F.col(id_col) == F.col("_rep_id"),
        "left_semi",
    )


def collapse_exact_texts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One representative row (min id) per byte-identical text.

    The rep-id set needs only the group minimum — one map-side-
    combinable aggregate (Catalyst prunes the unused group_n), no
    per-id mapping join — then a left-semi join keeps the winners'
    full rows.
    """
    return _rep_rows(df, _exact_group_rows(df, id_col, text_col), id_col)


def minhash_dedup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup clusters -> (node, component), with an
    exact-duplicate pre-collapse that makes the pipeline skew-safe.

    Output is IDENTICAL to ``connected_components(minhash_dedup_pairs(
    df))``: byte-identical texts share every band key (same signature)
    and verify at Jaccard 1 (shingle sets are never empty — short and
    even whitespace-only docs emit one whole-text shingle), so each
    exact group is fully connected through its representative, and any
    cross-group candidate/verification decision depends only on the two
    texts — rep-level pairs exist iff the member-level pairs do.
    Component ids match too:
    the representative IS its group's min id, so the min over
    representatives equals the min over all expanded members.

    Why collapse first: LSH candidate generation is all-pairs WITHIN a
    band bucket.  On Zipf-skewed corpora (one text owning ~20% of rows —
    the shape of crawl boilerplate) the hot bucket alone is O((0.2·n)²)
    pairs; collapsing identical texts first turns that bucket into ONE
    row, and the collapse itself is a map-side-combinable count/min
    aggregate that no key distribution can blow up.

    The md5(text) corpus scan runs ONCE: the (id, _tkey) projection is
    materialized and feeds both the group aggregate and the final
    member expansion (the previous shape re-scanned and re-hashed the
    whole corpus to expand — at 100 TB that is a second full pass over
    the text payload for data the first pass already computed).

    Resource note: that projection (~40 B/row) and the per-group
    aggregate stay PINNED (block-manager / checkpoint storage) as long
    as the returned plan may execute — a lazy API cannot know when the
    caller is done.  Long-lived sessions running many dedup calls
    should consume each result inside ``checkpointing.pinned_scope()``
    (as bench.py and scripts/check_oracle.py do), which frees
    everything the call pinned on scope exit.
    """
    keyed, groups = _keyed_and_groups(df, id_col, text_col)
    reps = _rep_rows(df, groups, id_col)
    pairs = minhash_dedup_pairs(reps, id_col, text_col, k, bands, n, threshold)
    cc = connected_components(pairs, "id_a", "id_b", max_iter, stats)
    return _expand_exact_clusters(keyed, groups, cc)


def _keyed_and_groups(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """One corpus scan: materialize the (id, _tkey) projection (~40 B/row
    — two orders of magnitude narrower than the text it hashes), then
    derive the per-group (rep, group_n) aggregate from the checkpointed
    rows.  Both are multi-referenced downstream; groups is additionally
    materialized because it is joined twice (rep semi-join + expansion)
    and re-aggregating per consumer would double the shuffle."""
    # keyed is LAZY (eager=False): the very next statement's eager
    # materialization of the group aggregate is the first action that
    # touches it, so the corpus scan, the checkpoint write and the
    # aggregation all happen in ONE job instead of a dedicated
    # checkpoint job followed by a checkpoint re-read (the r10 verdict's
    # "remaining constant" on dedup_clusters).  Lazy is safe here
    # because that first job references keyed through a single subtree;
    # every later consumer (the expansion join) sees it already
    # materialized.
    keyed = materialize(
        df.select(
            F.col(id_col).alias("id"),
            _text_group_key(id_col, text_col).alias("_tkey"),
        ),
        eager=False,
    )
    groups = materialize(_group_agg(keyed), eager=True)
    return keyed, groups


def _expand_exact_clusters(
    keyed: DataFrame,
    groups: DataFrame,
    cc: DataFrame,
) -> DataFrame:
    """Expand rep-level components through the exact groups: members
    inherit their rep's component; a >=2 group whose rep joined no
    near-dup pair is a component of its own.  ``keyed`` is the
    already-materialized (id, _tkey) projection — no corpus re-scan —
    and the cc side is small (one row per paired rep), so that join
    broadcasts; the hot group's rows never reshuffle on a skewed key."""
    mapping = keyed.join(groups.select("_tkey", "rep", "group_n"), "_tkey")
    joined = mapping.join(cc.withColumnRenamed("node", "rep"), "rep", "left")
    return joined.filter(
        (F.col("group_n") >= 2) | F.col("component").isNotNull()
    ).select(
        F.col("id").alias("node"),
        F.coalesce(F.col("component"), F.col("rep")).alias("component"),
    )


def simhash_dedup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_chunks: int = 4,
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """SimHash near-dup clusters -> (node, component), exact-collapse
    form — the SimHash sibling of :func:`minhash_dedup_clusters`.

    Identical texts have identical signatures (Hamming 0 <= any
    max_hamming), so each exact group is fully connected through its
    representative and cross-group pairing depends only on the two
    signatures: the output is IDENTICAL to ``connected_components(
    simhash_near_pairs(df))`` while the hot pigeonhole block (one text
    owning 20% of a corpus shares every chunk key) collapses to one row.
    Shares minhash_dedup_clusters' one-scan keyed/groups structure.
    """
    keyed, groups = _keyed_and_groups(df, id_col, text_col)
    reps = _rep_rows(df, groups, id_col)
    pairs = simhash_near_pairs(reps, id_col, text_col, max_hamming, n_chunks)
    cc = connected_components(pairs, "id_a", "id_b", max_iter, stats)
    return _expand_exact_clusters(keyed, groups, cc)


def phash_dedup_clusters(
    sig: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    bits: int = 64,
    max_hamming: int = 3,
    n_chunks: int = 4,
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Image near-dup clusters -> (node, component) from a perceptual
    hash column — the multimodal sibling of
    :func:`simhash_dedup_clusters`, exact-collapse form.

    The signature IS the exact-group key (identical images decode to
    identical pHashes, and Hamming 0 <= any ``max_hamming``), so each
    hash-equal group is fully connected through its min-id
    representative and cross-group pairing depends only on the two
    signature values: the output is identical to
    ``connected_components(hamming_near_pairs(sig))`` while a hot
    duplicate image (100M thumbnails of one logo) collapses to ONE rep
    row before the banded join.  The (id, hash) projection is pinned so
    the upstream decode pass (Arrow mapInPandas over the heavy binary
    column) runs once, not once per consumer.
    """
    keyed = materialize(
        sig.select(F.col(id_col).alias("id"), F.col(hash_col).alias("_tkey")),
        eager=True,
    )
    groups = keyed.groupBy("_tkey").agg(
        F.min("id").alias("rep"), F.count(F.lit(1)).alias("group_n")
    )
    reps = groups.select(
        F.col("rep").alias(id_col), F.col("_tkey").alias(hash_col)
    )
    pairs = hamming_near_pairs(
        reps, id_col, hash_col, bits, max_hamming, n_chunks
    )
    cc = connected_components(pairs, "id_a", "id_b", max_iter, stats)
    return _expand_exact_clusters(keyed, groups, cc)


# -- segment-level (cross-corpus span) dedup ----------------------------------


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 16,
) -> DataFrame:
    """Remove duplicated token-window segments ACROSS the corpus,
    keeping each segment's first occurrence (by doc id, then position) —
    the C4/RefinedWeb-style line/paragraph-level dedup step that strips
    boilerplate repeated over many documents, generalized to fixed
    ``seg_tokens`` windows so it applies to corpora without newline
    structure.

    Returns one row per input doc: (id, clean_text, n_segments_total,
    n_segments_kept, n_tokens_kept).  Docs whose every segment already
    appeared elsewhere come back with empty clean_text (curation then
    drops them).

    Plan (100 TB shape): chunking is a map-only explode; first-occurrence
    selection is a map-side-combinable ``min(struct(id, idx, payload))``
    per segment hash — NOT a row_number window, which would stream every
    row of a hot key through ONE reducer task (a boilerplate segment
    repeated 100M times = one task owning 100M rows), and NOT a
    winners-join-back, which would reshuffle every segment row on the
    skewed hash a second time.  Carrying the winning row's payload
    inside the min-struct (decided by the unique (id, idx) prefix) means
    the kept segments come straight out of the aggregate; reassembly is
    a groupBy over winners only (≤ one row per DISTINCT segment) plus a
    map-side-combinable per-doc total count, joined one-row-per-doc to
    one-row-per-doc.  The hot segment's copies collapse on the map side
    and never travel again.  No Python.
    """
    from bruin_spark.operators.text import chunk_documents

    segs = chunk_documents(
        df.select(F.col(id_col), F.col(text_col)),
        id_col=id_col,
        text_col=text_col,
        chunk_tokens=seg_tokens,
        overlap=0,
    ).select(
        F.col(id_col).alias("id"),
        F.col("chunk_idx").alias("idx"),
        F.col("chunk_text").alias("seg"),
        F.col("chunk_n_tokens").alias("seg_tokens"),
        F.md5(F.col("chunk_text")).alias("_k"),
    )
    # the (id, idx) prefix is unique per segment row, so it alone decides
    # the struct min; seg/seg_tokens ride along as the winner's payload
    kept = (
        segs.groupBy("_k")
        .agg(
            F.min(
                F.struct(
                    F.col("id"), F.col("idx"), F.col("seg"), F.col("seg_tokens")
                )
            ).alias("_f")
        )
        .select("_f.id", "_f.idx", "_f.seg", "_f.seg_tokens")
    )
    kept_per_doc = kept.groupBy("id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("idx"), F.col("seg")))),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_segments_kept"),
        F.sum("seg_tokens").alias("n_tokens_kept"),
    )
    totals = segs.groupBy("id").agg(F.count(F.lit(1)).alias("n_segments_total"))
    return totals.join(kept_per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.col("n_segments_total"),
        F.coalesce(F.col("n_segments_kept"), F.lit(0)).alias("n_segments_kept"),
        F.coalesce(F.col("n_tokens_kept"), F.lit(0)).alias("n_tokens_kept"),
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 16,
    min_docs: int = 3,
) -> DataFrame:
    """Remove corpus-FREQUENT segments from every document — the
    CCNet/RefinedWeb repeated-line rule: a segment appearing in
    ``min_docs``+ distinct documents is boilerplate (nav bars, cookie
    banners, license headers) and is stripped from ALL of them,
    including its first occurrence.  Complements :func:`segment_dedup`,
    which keeps first occurrences (dedup); this one keeps none
    (cleaning).

    Returns one row per input doc: (id, clean_text, n_segments_total,
    n_boilerplate, n_tokens_kept).

    Plan (100 TB shape): chunking is a map-only explode, done twice
    rather than pinning a corpus-sized segment table.  The distinct-doc
    count per segment is Spark's two-phase distinct aggregate keyed
    (hash, doc) — a segment repeated 100M times spreads over its doc
    ids, never one reducer.  The boilerplate KEY set (segments above
    the threshold) is small by construction — repeated-in-many-docs
    vocabulary, not corpus text — so it broadcasts and the corpus-side
    flag join is map-side; drop the hint if a pathological corpus
    inflates it past the broadcast threshold.  Reassembly is one
    groupBy(doc).  No Python in the hot path.
    """
    from bruin_spark.operators.text import chunk_documents

    def _segs() -> DataFrame:
        return chunk_documents(
            df.select(F.col(id_col), F.col(text_col)),
            id_col=id_col,
            text_col=text_col,
            chunk_tokens=seg_tokens,
            overlap=0,
        ).select(
            F.col(id_col).alias("id"),
            F.col("chunk_idx").alias("idx"),
            F.col("chunk_text").alias("seg"),
            F.col("chunk_n_tokens").alias("seg_tokens"),
            F.md5(F.col("chunk_text")).alias("_k"),
        )

    boiler = (
        _segs()
        .select("_k", "id")
        .distinct()
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("_k", F.lit(True).alias("_b"))
    )
    flagged = _segs().join(F.broadcast(boiler), "_k", "left")
    keep = F.col("_b").isNull()
    return flagged.groupBy("id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(keep, F.struct(F.col("idx"), F.col("seg")))
                    )
                ),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_segments_total"),
        F.sum(F.when(keep, 0).otherwise(1)).alias("n_boilerplate"),
        F.coalesce(F.sum(F.when(keep, F.col("seg_tokens"))), F.lit(0)).alias(
            "n_tokens_kept"
        ),
    ).select(
        F.col("id").alias(id_col),
        "clean_text",
        "n_segments_total",
        "n_boilerplate",
        "n_tokens_kept",
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    win_tokens: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicate-SPAN detection: find every maximal token span
    that appears ``min_count``+ times anywhere in the corpus (across or
    within documents), sliding-window style — the distributed analogue
    of suffix-array exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better";
    reference-adjacent behavior: the reference's quality checks flag
    repeated content but have no span finder, so this extends the
    family that segment_dedup started).

    Unlike :func:`segment_dedup` (fixed NON-overlapping windows, so a
    duplicated passage that straddles a chunk boundary at a different
    alignment is missed), this hashes EVERY sliding ``win_tokens``
    window, so any repeated run of >= win_tokens tokens is caught
    regardless of alignment, then merges overlapping/adjacent flagged
    windows into maximal spans per document.

    Returns one row per document that contains at least one duplicated
    span: (doc_id, total_tokens, n_dup_spans, dup_tokens, dup_ratio).
    Removal composes downstream (filter on dup_ratio, or re-slice via
    segment_dedup); keeping this operator annotation-shaped makes it a
    pure two-shuffle plan.

    Plan (100 TB shape): window hashing is map-only — ONE tokenization
    per row bound via an outer transform (see shingles()), windows
    hashed to 60-bit longs INSIDE the transform so the exploded rows
    carry (pos int, hash long), never window strings.  Row count is
    ~one per corpus token: linear, the unavoidable cost of exact
    substring matching without a global suffix array (which doesn't
    distribute).  Duplicated-hash selection is a map-side-combinable
    groupBy(h).count — a boilerplate window repeated 100M times
    collapses to partial counts before the shuffle.  Flagging is a
    left-semi join on h (build side one row per duplicated hash; AQE
    skew-split applies).  The window-hash pass deliberately runs TWICE
    (the count side is column-pruned to h only; the flagged side
    carries (doc_id, pos)): at corpus scale, recomputing a linear
    map-only md5 pass is cheaper than persisting ~one 16-byte row per
    corpus token to make one pass reusable.  Span merging is per-document: sort_array over
    that doc's flagged positions + one JVM aggregate() pass — bounded
    by document length, no cross-doc window function anywhere.

    Cross-engine hash contract: md5-prefix 60-bit longs, identical in
    DuckDB (workloads/dedup.py DUP_SPANS_ORACLE mirrors this
    expression).  A 60-bit collision flags the same window in both
    engines, so parity is collision-proof.
    """
    w = int(win_tokens)
    wins = _span_windows(df, id_col, text_col, w)
    dup = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= int(min_count))
        .select("h")
    )
    flagged = wins.join(dup, "h", "left_semi")
    return _merge_flagged_spans(flagged, w)


def _span_windows(df: DataFrame, id_col: str, text_col: str, w: int) -> DataFrame:
    """Every sliding ``w``-token window of every document, hashed:
    (doc_id, total_tokens, pos, h) with h a 60-bit md5-prefix long.
    Map-only; shared by :func:`duplicate_spans`, :func:`span_hash_index`
    and :func:`incremental_duplicate_spans` so the batch/index split is
    parity-equal with the from-scratch operator by construction."""
    # one tokenization per row; windows hashed to longs inside the HOF
    st = F.expr(
        f"""
        transform(array(split(lower(trim({text_col})), '\\\\s+')), toks ->
          struct(
            size(toks) AS total_tokens,
            CASE WHEN size(toks) >= {w}
            THEN transform(
              sequence(1, size(toks) - {w - 1}),
              i -> cast(conv(substring(md5(concat_ws(' ', slice(toks, i, {w}))), 1, 15), 16, 10) AS long)
            )
            ELSE cast(array() AS array<long>)
            END AS wh
          )
        )[0]
        """
    )
    base = df.select(F.col(id_col).alias("doc_id"), st.alias("_st")).select(
        "doc_id", F.col("_st.total_tokens").alias("total_tokens"), F.col("_st.wh").alias("wh")
    )
    # no size(wh) > 0 pre-filter: posexplode already emits nothing for
    # empty/null arrays, and an explicit filter pushes through the
    # project and re-evaluates the whole window-hash transform inside
    # the Filter condition (verified in the physical plan)
    return base.select("doc_id", "total_tokens", F.posexplode("wh").alias("pos", "h"))


def _merge_flagged_spans(flagged: DataFrame, w: int) -> DataFrame:
    """Per-document maximal-span merge over flagged window positions:
    (doc_id, total_tokens, pos) -> (doc_id, total_tokens, n_dup_spans,
    dup_tokens, dup_ratio).  Per-key work bounded by document length."""
    per_doc = flagged.groupBy("doc_id").agg(
        F.max("total_tokens").alias("total_tokens"),
        F.sort_array(F.collect_list("pos")).alias("ps"),
    )
    # merged maximal spans: two same-length windows [p, p+w-1] overlap or
    # abut iff next_pos - prev_pos <= w; CASE branches keep element_at
    # 1-based and lazily evaluated (i = 0 has no predecessor)
    n_spans = F.expr(
        f"""
        size(filter(transform(ps, (p, i) ->
          CASE WHEN i = 0 THEN 1
               WHEN p - element_at(ps, i) > {w} THEN 1
               ELSE 0 END), x -> x = 1))
        """
    ).cast("long")
    dup_tokens = F.expr(
        f"""
        aggregate(transform(ps, (p, i) ->
          CASE WHEN i = 0 THEN cast({w} AS long)
               ELSE least(cast({w} AS long), cast(p - element_at(ps, i) AS long)) END),
          0L, (acc, x) -> acc + x)
        """
    )
    return per_doc.select(
        "doc_id",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        n_spans.alias("n_dup_spans"),
        dup_tokens.alias("dup_tokens"),
    ).withColumn(
        "dup_ratio", F.round(F.col("dup_tokens") / F.col("total_tokens"), 6)
    )


def span_hash_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    win_tokens: int = 8,
) -> DataFrame:
    """The persistable window-hash count store of a corpus: one
    (h, cnt) row per DISTINCT sliding ``win_tokens``-window hash.

    This is :func:`duplicate_spans`'s analogue of
    :func:`lsh_band_index`: write it once per corpus (daily batches
    append via a merge that SUMs counts on h), then span-check a new
    batch with :func:`incremental_duplicate_spans` — the historical
    corpus is never re-tokenized.  The count (not just membership) is
    stored so the ``min_count`` threshold composes exactly across the
    corpus/batch split: a window seen once in the corpus and once in
    the batch is duplicated at min_count=2, which membership alone
    could not decide.

    Plan (100 TB shape): the map-only window-hash pass (see
    :func:`_span_windows`) followed by a map-side-combinable
    groupBy(h).count — a boilerplate window repeated 100M times
    collapses to partial counts before the shuffle.  Keys are 60-bit
    md5 prefixes: uniform by construction, so the index partitions
    evenly.  At scale, materialize it ``bucket_by(h)`` (mat
    strategies) so each incremental join is shuffle-free on the
    corpus side.
    """
    wins = _span_windows(df, id_col, text_col, int(win_tokens))
    return wins.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))


def write_span_index_bucketed(
    index: DataFrame, table: str, buckets: int = 32
) -> str:
    """Persist a :func:`span_hash_index` result bucketed (and sorted)
    by ``h`` — the production layout for the incremental span check.

    A bucketed scan satisfies the join's required distribution
    directly, so :func:`incremental_duplicate_spans` against
    ``spark.table(table)`` plans NO Exchange above the corpus-side
    scan (plan-asserted in tests/test_duplicate_spans.py): only the
    new batch — a sliver of the corpus — ever shuffles.  Pick
    ``buckets`` to match ``spark.sql.shuffle.partitions`` where
    possible so the batch side's aggregate exchange is reused as the
    join distribution too.  Daily appends merge via a count-SUM on h
    (mat strategy ``merge``), preserving the bucket layout.

    The write replaces both the CATALOG entry and any LEFTOVER
    warehouse directory under the table's default location: a managed
    table written by a previous session survives on disk but not in a
    fresh in-memory catalog, and ``saveAsTable`` then fails with
    LOCATION_ALREADY_EXISTS — so the stable production table name
    stays reusable across sessions instead of leaking one index copy
    per session.
    """
    spark = index.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        jvm = spark.sparkContext._jvm
        wh = spark.conf.get("spark.sql.warehouse.dir")
        # resolve the default location the way the session catalog does:
        # a qualified name db.tbl lives at wh/<db>.db/<tbl>, not
        # wh/db.tbl (the literal-lowercase form silently missed it and
        # LOCATION_ALREADY_EXISTS resurfaced for qualified tables)
        parts = [p.strip("`").lower() for p in table.split(".")]
        rel = parts[-1] if len(parts) == 1 else f"{parts[-2]}.db/{parts[-1]}"
        path = jvm.org.apache.hadoop.fs.Path(wh, rel)
        fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        fs.delete(path, True)
    except Exception as e:  # noqa: BLE001
        # non-default location/catalog: saveAsTable will report — but a
        # SWALLOWED failure must stay visible, or a failed cleanup shows
        # up later as an opaque LOCATION_ALREADY_EXISTS
        import warnings

        warnings.warn(
            f"span-index leftover cleanup for {table!r} skipped: {e}",
            stacklevel=2,
        )
    (
        index.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "h")
        .sortBy("h")
        .saveAsTable(table)
    )
    return table


def incremental_duplicate_spans(
    batch: DataFrame,
    span_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    win_tokens: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Duplicate-SPAN detection for a NEW batch against the persisted
    :func:`span_hash_index` of an existing corpus — the daily-crawl
    shape of exact substring dedup (Lee et al. 2022) at 100 TB: only
    the batch is tokenized; the corpus contributes pre-aggregated
    window counts.

    A batch window is duplicated when its batch-count plus its corpus
    index count reaches ``min_count`` — exactly the condition
    :func:`duplicate_spans` applies to the union corpus, so
    ``incremental_duplicate_spans(batch, span_hash_index(corpus))``
    equals ``duplicate_spans(corpus UNION batch)`` restricted to batch
    docs, row for row (parity-tested in tests/test_duplicate_spans.py).
    Output schema matches :func:`duplicate_spans`.

    Plan (100 TB shape): batch window hashing is map-only and runs
    twice (count side pruned to h; flagged side carries (doc_id, pos) —
    same recompute-over-persist tradeoff as duplicate_spans).  The
    batch's DISTINCT hash counts join the index on h — with the index
    bucketed by h only the batch side (a sliver of the corpus) ever
    shuffles; keys are uniform 60-bit longs so there is no skew to
    mitigate.  Flagging is a left-semi join on h; span merging is
    per-document (see :func:`_merge_flagged_spans`), no cross-doc
    window function anywhere.
    """
    w = int(win_tokens)
    wins = _span_windows(batch, id_col, text_col, w)
    bc = wins.groupBy("h").agg(F.count(F.lit(1)).alias("bcnt"))
    dup = (
        bc.join(span_index, "h", "left")
        .filter(F.col("bcnt") + F.coalesce(F.col("cnt"), F.lit(0)) >= int(min_count))
        .select("h")
    )
    flagged = wins.join(dup, "h", "left_semi")
    return _merge_flagged_spans(flagged, w)


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
    min_overlap: int = 8,
) -> DataFrame:
    """Asymmetric near-dup / quote detection: pairs where the SMALLER
    document's shingle set is ≥ ``threshold`` contained in the other's
    (``|A∩B| / min(|A|,|B|)``) AND the sets share ≥ ``min_overlap``
    shingles.  Jaccard misses these pairs by construction — a 40-line
    article fully quoted inside a 4000-line page has Jaccard ~0.01 but
    containment 1.0 — and they matter for curation (quotes, mirrors
    with chrome, partial scrapes) and decontamination (an eval item
    embedded in a crawl page).

    Candidate generation uses the absolute-OVERLAP prefix filter
    (Chaudhuri et al., SSJoin ICDE'06): containment has no two-sided
    size bound, so the Jaccard prefix theorem doesn't apply — but
    ``|A∩B| ≥ c`` does: order shingles by global rarity and the
    rarest common shingle of any qualifying pair lies within BOTH
    docs' first ``|x| − c + 1`` positions.  Indexing that prefix sheds
    each document's ``c − 1`` most common shingles — exactly the hot
    boilerplate posting lists that blow up a naive inverted index.
    Verification computes the exact intersection over candidate docs
    only and gates on the RAW ratio.

    Returns ``(id_a, id_b, n_common, containment)``.
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.array_distinct(shingles(text_col, n)).alias("sh")
    )
    hkey = _md5_60bit_key(F.col("shingle"))
    inv = (
        sh.filter(F.size("sh") >= min_overlap)
        .select("id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))
        .select("id", "n_sh", hkey.alias("_hs"))
    )
    # pin the posting rows: inv feeds both dfreq and the rarity join's
    # probe side (same double-explode measurement and same ~20 B/row
    # posting-artifact rationale as ngram_jaccard_pairs above)
    inv = materialize(inv, eager=True)
    dfreq = inv.groupBy("_hs").agg(F.count(F.lit(1)).alias("_df"))
    # same dense_rank rarity order as ngram_jaccard_pairs (within-doc
    # hash collisions must not displace keys past the prefix boundary)
    w = Window.partitionBy("id").orderBy("_df", "_hs")
    ranked = inv.join(dfreq, "_hs").withColumn("_r", F.dense_rank().over(w))
    # SIZE-ORDERED prefix join: for a qualifying pair the required
    # overlap is r = max(min_overlap, ceil(t·min(|A|,|B|))) — much
    # larger than the bare min_overlap when t·|small| > c — and the
    # rarest common shingle lies within the first |x| − r + 1 positions
    # of BOTH docs.  min(|A|,|B|) is the SMALLER side's own size, so the
    # smaller doc's indexable prefix tightens from |x| − c + 1 to
    # |x| − max(c, ceil(t·|x|)) + 1 (for t=0.6 that sheds ~60% of each
    # doc's posting rows from the probe side), while the larger side
    # keeps the c-prefix plus a pair-specific rank bound evaluated in
    # the join.  t_prune relaxes t by the float slack so the pruning
    # stays strictly conservative (same discipline as
    # ngram_jaccard_pairs); verification is unchanged, so the output is
    # EXACTLY the two-sided c-prefix plan's.
    t_prune = threshold - 1e-6
    c = F.lit(int(min_overlap))
    # ONE evaluation of the explode/dfreq/window pipeline: the tight
    # small-side prefix is a subset of the c-prefix, so materialize the
    # c-prefix rows once and join it WITH ITSELF — byte-identical join
    # inputs mean AQE reuses one Exchange+Sort for both sides at
    # runtime (r14-measured on the simhash/phash self-joins), where the
    # r14 shape (a pre-filtered 'a' side vs the bare pin) planned and
    # executed two.  Both prefix bounds now live in the join condition:
    # the pair bound r = max(c, ceil(t·min(|A|,|B|))) is written over
    # least(a.n_sh, b.n_sh) — equal to a.n_sh under the size-order
    # predicate in the same conjunction, so the candidate set is
    # EXACTLY the r14 shape's — and deliberately references BOTH sides
    # so Catalyst cannot push it down and de-duplicate the sides again.
    prefix_large = materialize(
        ranked.filter(F.col("_r") <= F.col("n_sh") - c + 1).select(
            "id", "n_sh", "_r", "_hs"
        ),
        eager=True,
    )
    r_pair = F.greatest(
        c, F.ceil(F.lit(t_prune) * F.least(F.col("a.n_sh"), F.col("b.n_sh")))
    )
    cands = (
        prefix_large.alias("a")
        .hint("merge")
        .join(
            prefix_large.alias("b").hint("merge"),
            (F.col("a._hs") == F.col("b._hs"))
            # size order (n_sh, id): 'a' is the pair's smaller doc
            & (
                (F.col("a.n_sh") < F.col("b.n_sh"))
                | ((F.col("a.n_sh") == F.col("b.n_sh")) & (F.col("a.id") < F.col("b.id")))
            )
            # the smaller doc's tight prefix bound (was a pre-join
            # filter; r_pair = r_small given the size order above)
            & (F.col("a._r") <= F.col("a.n_sh") - r_pair + 1)
            # the larger doc's pair-specific prefix bound
            & (F.col("b._r") <= F.col("b.n_sh") - r_pair + 1),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .distinct()
    )
    cands = materialize(cands, eager=True)

    cand_ids = (
        cands.select(F.col("id_a").alias("cid"))
        .union(cands.select(F.col("id_b").alias("cid")))
        .distinct()
    )
    docs_small = df.join(cand_ids, F.col(id_col) == F.col("cid"), "left_semi")
    sh_small = materialize(
        docs_small.select(
            F.col(id_col).alias("id"),
            F.array_distinct(shingles(text_col, n)).alias("sh"),
        ),
        eager=True,
    )
    raw_cont = F.col("n_common") / F.least(F.size("sh_a"), F.size("sh_b"))
    # same CPU-dense verify spread as _verify_jaccard_pairs (see _spread)
    cands = _spread(cands, "id_a", "id_b")
    return (
        cands.join(sh_small.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh_small.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .filter(
            (F.col("n_common") >= min_overlap) & (raw_cont >= F.lit(threshold))
        )
        .select(
            "id_a",
            "id_b",
            "n_common",
            F.round(raw_cont, 6).alias("containment"),
        )
    )

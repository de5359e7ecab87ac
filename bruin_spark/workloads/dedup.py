"""Deduplication workloads over `documents`, with DuckDB oracles.

Oracle strategy: every hash the Spark side computes is md5-based, so the
DuckDB oracle reproduces signatures (and therefore candidate sets and
final pairs) bit-for-bit. Shingles, MinHash permutations, LSH bands and
SimHash bit votes are all re-expressed in DuckDB list comprehensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bruin_spark.operators import dedup as D
from bruin_spark.session import read_parquet

NGRAM = 3
MINHASH_K = 16
LSH_BANDS = 4
JACCARD_T = 0.5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    return read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))


# shared DuckDB fragments ------------------------------------------------------

_DUCK_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"
_DUCK_SHINGLES = f"""
list_distinct(
  CASE WHEN len({_DUCK_TOKS}) >= {NGRAM}
  THEN [array_to_string(list_slice({_DUCK_TOKS}, i, i + {NGRAM - 1}), ' ')
        FOR i IN generate_series(1, len({_DUCK_TOKS}) - {NGRAM - 1})]
  ELSE [array_to_string({_DUCK_TOKS}, ' ')]
  END
)
"""

# one-md5 minhash, bit-for-bit with operators/dedup.py:minhash_signature —
# 60-bit hex prefix parsed to BIGINT, split into 28-bit halves, mixed by
# the SAME fixed affine coefficients (all arithmetic stays under 2^60, so
# BIGINT ops are exact on both engines)
_DUCK_SHINGLE_HASHES = (
    "list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)"
)


def _duck_sig_exprs() -> str:
    m, mask = D.MINHASH_MOD, D.MINHASH_H_MASK
    return ", ".join(
        f"list_min([({a} * (h & {mask}) + {b} * ((h >> 28) & {mask}) + {c}) % {m}"
        f" FOR h IN hv]) AS mh_{i}"
        for i, (a, b, c) in enumerate(D.minhash_coeffs(MINHASH_K))
    )


def _duck_bands_of(src: str) -> str:
    r = MINHASH_K // LSH_BANDS
    return " UNION ALL ".join(
        "SELECT id, {b} AS band, md5(concat_ws('|', {cols})) AS band_key FROM {src}".format(
            b=b,
            cols=", ".join(f"mh_{i}::VARCHAR" for i in range(b * r, (b + 1) * r)),
            src=src,
        )
        for b in range(LSH_BANDS)
    )


# -- exact dedup -----------------------------------------------------------------


def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the ORACLE projection space-joins member_ids: the driver's pandas
    # canonicalization cannot hash a raw ARRAY column (CORRECTNESS_r12
    # text_bpe_ids precedent); exact_duplicates keeps the array for users
    from pyspark.sql import functions as F

    return D.exact_duplicates(_docs(spark, sf_dir)).select(
        "doc_fingerprint",
        "group_size",
        "canonical_id",
        F.array_join(
            F.transform("member_ids", lambda x: x.cast("string")), " "
        ).alias("member_ids_str"),
    )


EXACT_ORACLE = """
SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS doc_fingerprint,
       COUNT(*) AS group_size,
       MIN(doc_id) AS canonical_id,
       COALESCE(array_to_string(
         list_transform(list_slice(list_sort(list(doc_id)), 1, 100), x -> x::VARCHAR),
         ' '), '')
         AS member_ids_str
FROM documents
GROUP BY 1
HAVING COUNT(*) > 1
"""


def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = D.exact_dedup(_docs(spark, sf_dir))
    return out.select("doc_id", "lang", "source", "n_chars")


EXACT_SURVIVORS_ORACLE = """
SELECT doc_id, lang, source, n_chars
FROM (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
           ORDER BY doc_id
         ) AS rn
  FROM documents
)
WHERE rn = 1
"""


# -- n-gram Jaccard ---------------------------------------------------------------


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir), n=NGRAM, threshold=JACCARD_T)


NGRAM_ORACLE = f"""
WITH sh AS (
  SELECT doc_id AS id, {_DUCK_SHINGLES} AS sh FROM documents
),
inv AS (SELECT id, UNNEST(sh) AS shingle FROM sh),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM pairs
JOIN (SELECT id, len(sh) AS n_sh FROM sh) sa ON sa.id = id_a
JOIN (SELECT id, len(sh) AS n_sh FROM sh) sb ON sb.id = id_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {JACCARD_T}
"""


# -- MinHash signatures + LSH pipeline ---------------------------------------------


def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_signature(_docs(spark, sf_dir), k=MINHASH_K, n=NGRAM)


def _minhash_oracle() -> str:
    return f"""
WITH sh AS (SELECT doc_id AS id, {_DUCK_SHINGLES} AS sh FROM documents),
hs AS (SELECT id, {_DUCK_SHINGLE_HASHES} AS hv FROM sh)
SELECT id, {_duck_sig_exprs()} FROM hs
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_dedup_pairs(
        _docs(spark, sf_dir), k=MINHASH_K, bands=LSH_BANDS, n=NGRAM, threshold=JACCARD_T
    )


def _minhash_lsh_oracle() -> str:
    return f"""
WITH sh AS (SELECT doc_id AS id, {_DUCK_SHINGLES} AS sh FROM documents),
hs AS (SELECT id, {_DUCK_SHINGLE_HASHES} AS hv FROM sh),
sig AS (SELECT id, {_duck_sig_exprs()} FROM hs),
bands AS ({_duck_bands_of('sig')}),
cands AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(len(list_intersect(sa.sh, sb.sh)) / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
FROM cands
JOIN sh sa ON sa.id = id_a
JOIN sh sb ON sb.id = id_b
WHERE len(list_intersect(sa.sh, sb.sh)) / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= {JACCARD_T}
"""


# -- SimHash ----------------------------------------------------------------------


def dedup_simhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash64(_docs(spark, sf_dir))


def _simhash_oracle() -> str:
    return f"SELECT doc_id, {D.simhash_sql_expr('text', 'duckdb')} AS simhash FROM documents"


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3)


def _simhash_pairs_oracle() -> str:
    width = D.SIMHASH_BITS // 4
    blocks = " UNION ALL ".join(
        f"SELECT doc_id AS id, simhash, {c} AS blk, (simhash >> {c * width}) & {2**width - 1} AS blk_key FROM sig"
        for c in range(4)
    )
    return f"""
WITH sig AS (SELECT doc_id, {D.simhash_sql_expr('text', 'duckdb')} AS simhash FROM documents),
blocked AS ({blocks})
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM blocked a
JOIN blocked b ON a.blk = b.blk AND a.blk_key = b.blk_key AND a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# -- duplicate clusters (connected components over the LSH pair graph) --------


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH pairs -> large-star/small-star connected components ->
    (doc_id, cluster_id): the cluster-assignment endgame of near-dup
    dedup, oracle-checked against a recursive-CTE reachability closure
    over the SAME deterministic pair graph.  Runs through the
    exact-collapse form (skew-safe on boilerplate-heavy corpora); the
    output is provably identical to the all-pairs pipeline the oracle
    replays."""
    from pyspark.sql import functions as F

    cc = D.minhash_dedup_clusters(
        _docs(spark, sf_dir), k=MINHASH_K, bands=LSH_BANDS, n=NGRAM, threshold=JACCARD_T
    )
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def _clusters_oracle() -> str:
    # min-reachable-id per node == the min-id component representative the
    # star algorithm converges to
    return f"""
WITH RECURSIVE pairs AS ({_minhash_lsh_oracle()}),
e AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(u, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e) AS n(u)
  UNION
  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.u
)
SELECT u AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY u
"""


def dedup_simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup clusters through the exact-collapse pipeline
    (skew-safe sibling of dedup_clusters); oracle is a recursive-CTE
    reachability closure over the SAME deterministic simhash pair graph."""
    from pyspark.sql import functions as F

    cc = D.simhash_dedup_clusters(_docs(spark, sf_dir), max_hamming=3)
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def _simhash_clusters_oracle() -> str:
    return f"""
WITH RECURSIVE pairs AS ({_simhash_pairs_oracle()}),
e AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(u, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e) AS n(u)
  UNION
  SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.u
)
SELECT u AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY u
"""


# -- incremental dedup (new batch vs persisted corpus index) -------------------

BATCH_FRACTION = 0.2  # deterministic id-hash split: 20% "new batch", 80% corpus


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-curation shape: dedup a new batch against the LSH band
    index of the existing corpus (corpus never re-shingled; only matched
    corpus docs re-read for Jaccard verification)."""
    from bruin_spark.operators.sampling import N_BUCKETS, hash_bucket

    docs = _docs(spark, sf_dir)
    cut = int(BATCH_FRACTION * N_BUCKETS)
    bucket = hash_bucket("doc_id", "incr")
    batch = docs.filter(bucket < cut)
    corpus = docs.filter(bucket >= cut)
    # index only exact-text representatives: identical corpus docs share
    # every band key, so a boilerplate text owning 20% of the corpus
    # would match every hot batch doc 0.2n times (quadratic candidates).
    # Output is IDENTICAL: best-match order is (jaccard DESC, id ASC),
    # and a group's min-id rep has the same jaccard as every member, so
    # the rep is always the winner the full index would have picked.
    # materialized: corpus_reps feeds BOTH the band index and the
    # verification text reads, and without the cut the whole collapse
    # (corpus scan + md5 + agg + semi-join) executes once per consumer.
    # In production this is exactly the PERSISTED state of the pipeline
    # (the index + rep store are written once per corpus); 'none'
    # checkpoint mode keeps the full plan visible to the lint sweep.
    from bruin_spark.checkpointing import materialize

    # lazy: the first action to touch corpus_reps is incremental_dedup's
    # eager candidate materialization, which references it through one
    # subtree (the band index) — scan + checkpoint + index build run in
    # ONE job; the verification reads see it already materialized
    corpus_reps = materialize(D.collapse_exact_texts(corpus), eager=False)
    idx = D.lsh_band_index(corpus_reps, k=MINHASH_K, bands=LSH_BANDS, n=NGRAM)
    return D.incremental_dedup(
        batch, idx, corpus_reps, k=MINHASH_K, bands=LSH_BANDS, n=NGRAM, threshold=JACCARD_T
    )


def _incremental_oracle() -> str:
    from bruin_spark.operators.sampling import N_BUCKETS, bucket_sql

    cut = int(BATCH_FRACTION * N_BUCKETS)
    return f"""
WITH b AS (SELECT * FROM documents WHERE {bucket_sql('doc_id', 'incr')} < {cut}),
c AS (SELECT * FROM documents WHERE {bucket_sql('doc_id', 'incr')} >= {cut}),
shb AS (SELECT doc_id AS id, {_DUCK_SHINGLES} AS sh FROM b),
shc AS (SELECT doc_id AS id, {_DUCK_SHINGLES} AS sh FROM c),
hsb AS (SELECT id, {_DUCK_SHINGLE_HASHES} AS hv FROM shb),
hsc AS (SELECT id, {_DUCK_SHINGLE_HASHES} AS hv FROM shc),
sigb AS (SELECT id, {_duck_sig_exprs()} FROM hsb),
sigc AS (SELECT id, {_duck_sig_exprs()} FROM hsc),
bandsb AS ({_duck_bands_of('sigb')}),
bandsc AS ({_duck_bands_of('sigc')}),
cands AS (
  SELECT DISTINCT x.id AS batch_id, y.id AS corpus_id
  FROM bandsb x JOIN bandsc y ON x.band = y.band AND x.band_key = y.band_key
),
ver AS (
  SELECT batch_id, corpus_id,
         ROUND(len(list_intersect(sa.sh, sb.sh))
               / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
  FROM cands
  JOIN shb sa ON sa.id = batch_id
  JOIN shc sb ON sb.id = corpus_id
),
best AS (
  SELECT batch_id, corpus_id, jaccard,
         ROW_NUMBER() OVER (PARTITION BY batch_id ORDER BY jaccard DESC, corpus_id) AS rn
  FROM ver WHERE jaccard >= {JACCARD_T}
)
SELECT b.doc_id,
       best.batch_id IS NOT NULL AS is_dup,
       best.corpus_id AS match_id,
       best.jaccard
FROM b LEFT JOIN best ON best.batch_id = b.doc_id AND best.rn = 1
"""


SEG_TOKENS = 16


def dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus segment (token-window) dedup: strip spans repeated
    across documents, keep first occurrence — C4-style boilerplate
    removal generalized to fixed token windows."""
    return D.segment_dedup(_docs(spark, sf_dir), seg_tokens=SEG_TOKENS)


def _segments_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
), segs AS (
  SELECT doc_id,
         (s // {SEG_TOKENS}) AS idx,
         array_to_string(list_slice(t, s + 1, least(s + {SEG_TOKENS}, len(t))), ' ') AS seg,
         least({SEG_TOKENS}, len(t) - s) AS seg_tokens
  FROM toks, LATERAL (
    SELECT UNNEST(generate_series(0, greatest(len(t) - 1, 0), {SEG_TOKENS})) AS s
  )
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(seg) ORDER BY doc_id, idx) AS occ
  FROM segs
)
SELECT doc_id,
       COALESCE(string_agg(seg, ' ' ORDER BY idx) FILTER (occ = 1), '') AS clean_text,
       COUNT(*) AS n_segments_total,
       COUNT(*) FILTER (occ = 1) AS n_segments_kept,
       COALESCE(SUM(seg_tokens) FILTER (occ = 1), 0)::BIGINT AS n_tokens_kept
FROM ranked
GROUP BY doc_id
"""


SPAN_TOKENS = 8


def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window exact duplicate-span detection (Lee et al. 2022
    style): per-doc maximal merged spans of >= SPAN_TOKENS tokens that
    appear 2+ times anywhere in the corpus, at any alignment."""
    return D.duplicate_spans(_docs(spark, sf_dir), win_tokens=SPAN_TOKENS)


def _dup_spans_oracle() -> str:
    w = SPAN_TOKENS
    dup_tok = f"CASE WHEN prev IS NULL THEN {w} ELSE least({w}, pos - prev) END"
    return f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
), wins AS (
  SELECT doc_id, len(t) AS total_tokens, i - 1 AS pos,
         ('0x' || substr(md5(array_to_string(list_slice(t, i, i + {w - 1}), ' ')), 1, 15))::BIGINT AS h
  FROM toks, LATERAL (
    SELECT UNNEST(generate_series(1, len(t) - {w - 1})) AS i
  )
  WHERE len(t) >= {w}
), dup AS (
  SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2
), flagged AS (
  SELECT w.doc_id, w.total_tokens, w.pos FROM wins w JOIN dup USING (h)
), d AS (
  SELECT doc_id, total_tokens, pos,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM flagged
)
SELECT doc_id,
       max(total_tokens)::BIGINT AS total_tokens,
       (COUNT(*) FILTER (prev IS NULL OR pos - prev > {w}))::BIGINT AS n_dup_spans,
       SUM({dup_tok})::BIGINT AS dup_tokens,
       ROUND(SUM({dup_tok})::DOUBLE / max(total_tokens), 6) AS dup_ratio
FROM d
GROUP BY doc_id
"""


def dedup_spans_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-crawl shape of duplicate-span detection: the new batch is
    span-checked against the PERSISTED window-hash count index of the
    existing corpus — the corpus is never re-tokenized (only its
    pre-aggregated (h, cnt) rows are read)."""
    from bruin_spark.operators.sampling import N_BUCKETS, hash_bucket

    docs = _docs(spark, sf_dir)
    cut = int(BATCH_FRACTION * N_BUCKETS)
    bucket = hash_bucket("doc_id", "incr")
    batch = docs.filter(bucket < cut)
    corpus = docs.filter(bucket >= cut)
    # in production span_hash_index(corpus) is a persisted bucketed-by-h
    # table (batches append via a count-SUM merge); built in-line here —
    # the subtree has one consumer, so no materialize cut is needed and
    # the full plan stays visible to the lint sweep
    idx = D.span_hash_index(corpus, win_tokens=SPAN_TOKENS)
    return D.incremental_duplicate_spans(batch, idx, win_tokens=SPAN_TOKENS)


#: span-index tables already materialized this session, keyed by sf_dir
#: (the bucketed layout is the persisted production artifact — building
#: it is a one-time index cost, not part of the daily-batch query)
_SPAN_IDX_TABLES: dict[str, str] = {}


def dedup_spans_incr_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production layout of :func:`dedup_spans_incremental`: the corpus
    span-hash index is PERSISTED bucketed-and-sorted by ``h``
    (operators/dedup.py write_span_index_bucketed), so the daily batch
    join plans NO Exchange above the corpus-side scan — only the new
    batch (a sliver of the corpus) ever shuffles.  The index table is
    built once per session per sf_dir (an indexing cost paid at corpus
    build time, amortized over every daily batch); the query measures
    what production pays per batch.  Output — and oracle — identical
    to dedup_spans_incremental: the bucketed layout is a physical
    property, not a semantic one."""
    import hashlib

    from bruin_spark.operators.sampling import N_BUCKETS, hash_bucket

    docs = _docs(spark, sf_dir)
    cut = int(BATCH_FRACTION * N_BUCKETS)
    bucket = hash_bucket("doc_id", "incr")
    batch = docs.filter(bucket < cut)
    table = _SPAN_IDX_TABLES.get(sf_dir)
    if table is None or not spark.catalog.tableExists(table):
        corpus = docs.filter(bucket >= cut)
        # STABLE per-sf_dir name: write_span_index_bucketed clears any
        # leftover catalog entry / warehouse directory from a previous
        # session, so sessions REUSE the location instead of leaking
        # one index copy per session
        table = f"span_idx_{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}"
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
        D.write_span_index_bucketed(
            D.span_hash_index(corpus, win_tokens=SPAN_TOKENS),
            table,
            buckets=n_buckets,
        )
        _SPAN_IDX_TABLES[sf_dir] = table
    return D.incremental_duplicate_spans(
        batch, spark.table(table), win_tokens=SPAN_TOKENS
    )


def _spans_incremental_oracle() -> str:
    """Incremental == from-scratch over the union restricted to batch
    docs (batch and corpus partition `documents`, and a window's flag
    depends only on its GLOBAL count), so the oracle is the full-corpus
    duplicate-span query with the final rows filtered to the batch."""
    from bruin_spark.operators.sampling import N_BUCKETS, bucket_sql

    w = SPAN_TOKENS
    cut = int(BATCH_FRACTION * N_BUCKETS)
    dup_tok = f"CASE WHEN prev IS NULL THEN {w} ELSE least({w}, pos - prev) END"
    return f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
), wins AS (
  SELECT doc_id, len(t) AS total_tokens, i - 1 AS pos,
         ('0x' || substr(md5(array_to_string(list_slice(t, i, i + {w - 1}), ' ')), 1, 15))::BIGINT AS h
  FROM toks, LATERAL (
    SELECT UNNEST(generate_series(1, len(t) - {w - 1})) AS i
  )
  WHERE len(t) >= {w}
), dup AS (
  SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2
), flagged AS (
  SELECT w.doc_id, w.total_tokens, w.pos FROM wins w JOIN dup USING (h)
  WHERE {bucket_sql('w.doc_id', 'incr')} < {cut}
), d AS (
  SELECT doc_id, total_tokens, pos,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM flagged
)
SELECT doc_id,
       max(total_tokens)::BIGINT AS total_tokens,
       (COUNT(*) FILTER (prev IS NULL OR pos - prev > {w}))::BIGINT AS n_dup_spans,
       SUM({dup_tok})::BIGINT AS dup_tokens,
       ROUND(SUM({dup_tok})::DOUBLE / max(total_tokens), 6) AS dup_ratio
FROM d
GROUP BY doc_id
"""


QUERIES = {
    "dedup_spans_incremental": (dedup_spans_incremental, _spans_incremental_oracle()),
    "dedup_spans_incr_bucketed": (dedup_spans_incr_bucketed, _spans_incremental_oracle()),
    "dedup_duplicate_spans": (dedup_duplicate_spans, _dup_spans_oracle()),
    "dedup_incremental": (dedup_incremental, _incremental_oracle()),
    "dedup_segments": (dedup_segments, _segments_oracle()),
    "dedup_exact_groups": (dedup_exact_groups, EXACT_ORACLE),
    "dedup_clusters": (dedup_clusters, _clusters_oracle()),
    "dedup_simhash_clusters": (dedup_simhash_clusters, _simhash_clusters_oracle()),
    "dedup_simhash_signature": (dedup_simhash_signature, _simhash_oracle()),
    "dedup_simhash_pairs": (dedup_simhash_pairs, _simhash_pairs_oracle()),
    "dedup_exact_survivors": (dedup_exact_survivors, EXACT_SURVIVORS_ORACLE),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, NGRAM_ORACLE),
    "dedup_minhash_signature": (dedup_minhash_signature, _minhash_oracle()),
    "dedup_minhash_lsh": (dedup_minhash_lsh, _minhash_lsh_oracle()),
}


# -- boilerplate stripping (frequency-threshold segment removal) -----------------

BOILER_MIN_DOCS = 3


def dedup_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style repeated-line rule: segments present in >= 3 distinct
    documents are boilerplate and removed from ALL documents (including
    first occurrences; see operators/dedup.py: strip_boilerplate)."""
    return D.strip_boilerplate(
        _docs(spark, sf_dir), seg_tokens=SEG_TOKENS, min_docs=BOILER_MIN_DOCS
    )


def _strip_boiler_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
), segs AS (
  SELECT doc_id,
         (s // {SEG_TOKENS}) AS idx,
         array_to_string(list_slice(t, s + 1, least(s + {SEG_TOKENS}, len(t))), ' ') AS seg,
         least({SEG_TOKENS}, len(t) - s) AS seg_tokens
  FROM toks, LATERAL (
    SELECT UNNEST(generate_series(0, greatest(len(t) - 1, 0), {SEG_TOKENS})) AS s
  )
), boiler AS (
  SELECT k FROM (SELECT DISTINCT md5(seg) AS k, doc_id FROM segs)
  GROUP BY k HAVING COUNT(*) >= {BOILER_MIN_DOCS}
), flagged AS (
  SELECT s.*, (b.k IS NOT NULL) AS is_b
  FROM segs s LEFT JOIN boiler b ON md5(s.seg) = b.k
)
SELECT doc_id,
       COALESCE(string_agg(seg, ' ' ORDER BY idx) FILTER (NOT is_b), '') AS clean_text,
       COUNT(*) AS n_segments_total,
       COUNT(*) FILTER (is_b)::BIGINT AS n_boilerplate,
       COALESCE(SUM(seg_tokens) FILTER (NOT is_b), 0)::BIGINT AS n_tokens_kept
FROM flagged
GROUP BY doc_id
"""


QUERIES["dedup_strip_boilerplate"] = (dedup_strip_boilerplate, _strip_boiler_oracle())


# -- n-gram containment (asymmetric near-dup / quote detection) ------------------

CONTAIN_T = 0.6
CONTAIN_MIN_OV = 8


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs where the smaller shingle set is >= 60% contained in the
    other and they share >= 8 shingles — the asymmetric overlap
    Jaccard misses (operators/dedup.py ngram_containment_pairs)."""
    return D.ngram_containment_pairs(
        _docs(spark, sf_dir), n=NGRAM, threshold=CONTAIN_T, min_overlap=CONTAIN_MIN_OV
    )


CONTAINMENT_ORACLE = f"""
WITH sh AS (
  SELECT doc_id AS id, {_DUCK_SHINGLES} AS sh FROM documents
),
inv AS (SELECT id, UNNEST(sh) AS shingle FROM sh),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_common::INT AS n_common,
       ROUND(n_common / LEAST(sa.n_sh, sb.n_sh), 6) AS containment
FROM pairs
JOIN (SELECT id, len(sh) AS n_sh FROM sh) sa ON sa.id = id_a
JOIN (SELECT id, len(sh) AS n_sh FROM sh) sb ON sb.id = id_b
WHERE n_common >= {CONTAIN_MIN_OV}
  AND n_common / LEAST(sa.n_sh, sb.n_sh) >= {CONTAIN_T}
"""

QUERIES["dedup_containment"] = (dedup_containment, CONTAINMENT_ORACLE)

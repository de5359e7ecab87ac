"""Multimodal workloads: synthetic BRUI media derived deterministically
from doc_id, decoded via real mapInPandas plumbing.

Because the fake media is a pure function of doc_id (width = id%32+1,
height = id%24+1, n_frames = id%12+1, payload = arithmetic bytes), the
DuckDB oracle reproduces the decoder's outputs with integer arithmetic —
the Spark side still builds real binary blobs and parses them back in an
Arrow-batched UDF, exercising the full binary-column pipeline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from bruin_spark.operators import multimodal as M
from bruin_spark.session import read_parquet


def _with_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    # modest partition count: every mapInPandas partition spawns a Python
    # worker, and at this row count worker spawn dominates compute
    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet")).repartition(8)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf[["doc_id"]].copy()
            pdf["media"] = pdf["doc_id"].map(
                lambda i: M.synth_media(
                    int(i) % 32 + 1, int(i) % 24 + 1, int(i) % 12 + 1, payload_seed=int(i)
                )
            )
            yield pdf

    return docs.select("doc_id").mapInPandas(gen, "doc_id bigint, media binary")


def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.decode_media(_with_media(spark, sf_dir))


# payload_len = (w*h) % 4096 + 16; payload[i] = (seed + 31*i) % 256.
# sum of payload reproduced arithmetically below via list aggregation.
DECODE_ORACLE = """
WITH base AS (
  SELECT doc_id,
         doc_id % 32 + 1 AS width,
         doc_id % 24 + 1 AS height,
         doc_id % 12 + 1 AS n_frames,
         ((doc_id % 32 + 1) * (doc_id % 24 + 1)) % 4096 + 16 AS payload_len
  FROM documents
)
SELECT doc_id, width::INT AS width, height::INT AS height, n_frames::INT AS n_frames,
       (payload_len + 12)::BIGINT AS n_bytes,
       CAST(list_sum([ (doc_id + 31 * i) % 256 FOR i IN generate_series(0, payload_len - 1) ]) AS BIGINT) AS payload_sum
FROM base
"""


def mm_meta_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only pass: header fields via built-in byte expressions."""
    m = M.with_media_meta(_with_media(spark, sf_dir))
    return m.select(
        "doc_id",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.n_frames").alias("n_frames"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )


META_ORACLE = """
SELECT doc_id,
       (doc_id % 32 + 1)::INT AS width,
       (doc_id % 24 + 1)::INT AS height,
       (doc_id % 12 + 1)::INT AS n_frames,
       (((doc_id % 32 + 1) * (doc_id % 24 + 1)) % 4096 + 16 + 12)::BIGINT AS n_bytes
FROM documents
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.frame_sample(_with_media(spark, sf_dir), every_n=4)


FRAME_ORACLE = """
WITH base AS (
  SELECT doc_id,
         doc_id % 12 + 1 AS n_frames,
         ((doc_id % 32 + 1) * (doc_id % 24 + 1)) % 4096 + 16 AS payload_len
  FROM documents
)
SELECT doc_id, frame_idx::INT AS frame_idx,
       ((doc_id + 31 * (frame_idx % payload_len)) % 256)::INT AS frame_byte
FROM base, UNNEST([i FOR i IN generate_series(0, n_frames - 1) IF i % 4 = 0]) AS t(frame_idx)
"""


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize to 8x8 (BRUI subsample path), then decode the result —
    verifies the resized blobs round-trip through the decoder."""
    resized = M.resize_media(_with_media(spark, sf_dir), size=(8, 8))
    return M.decode_media(resized, bin_col="media_resized")


# after resize to (8,8): new_payload_len = 64 % 4096 + 16 = 80;
# new_payload[i] = old_payload[(i * old_len) // 80] with
# old_payload[j] = (doc_id + 31*j) % 256
RESIZE_ORACLE = """
WITH base AS (
  SELECT doc_id,
         doc_id % 12 + 1 AS n_frames,
         ((doc_id % 32 + 1) * (doc_id % 24 + 1)) % 4096 + 16 AS old_len
  FROM documents
)
SELECT doc_id, 8::INT AS width, 8::INT AS height, n_frames::INT AS n_frames,
       (80 + 12)::BIGINT AS n_bytes,
       CAST(list_sum([ (doc_id + 31 * ((i * old_len) // 80)) % 256
                       FOR i IN generate_series(0, 79) ]) AS BIGINT) AS payload_sum
FROM base
"""


def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.byte_histogram_features(_with_media(spark, sf_dir), n_bins=16)


FEATURES_ORACLE = """
WITH base AS (
  SELECT doc_id,
         ((doc_id % 32 + 1) * (doc_id % 24 + 1)) % 4096 + 16 AS payload_len
  FROM documents
)
SELECT doc_id, b::INT AS bin,
       len(list_filter(generate_series(0, payload_len - 1),
                       j -> ((doc_id + 31 * j) % 256) // 16 = b))::INT AS cnt
FROM base, UNNEST(generate_series(0, 15)) AS t(b)
"""


def _with_media_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media corpus with built-in near-duplicate clusters: docs sharing
    ``doc_id % 29`` get identical dimensions and payload except for ONE
    perturbed byte per variant — the image analog of a boilerplate-heavy
    web crawl (hot clusters of ~n/29 near-identical images)."""
    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet")).repartition(8)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out_rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                seed, v = i % 29, i // 29
                blob = bytearray(
                    M.synth_media(
                        seed % 32 + 1, seed % 24 + 1, seed % 12 + 1, payload_seed=seed * 7
                    )
                )
                payload_len = len(blob) - M.HEADER_SIZE
                if v > 0:
                    pos = (v * 13) % payload_len
                    blob[M.HEADER_SIZE + pos] = (blob[M.HEADER_SIZE + pos] + v * 17) % 256
                out_rows.append((i, bytes(blob)))
            yield pd.DataFrame(out_rows, columns=["doc_id", "media"])

    return docs.select("doc_id").mapInPandas(gen, "doc_id bigint, media binary")


def mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate candidate pairs: 64-bit perceptual hash in
    the Arrow decode pass (operators/multimodal.py phash64) → Hamming
    banding over 4×16-bit chunks (operators/dedup.py
    hamming_near_pairs, pigeonhole-complete for distance ≤ 3) → JVM
    bit_count(xor) verify.  The media column never leaves the decode
    stage; the banded join runs on (id, int64)."""
    from bruin_spark.operators.dedup import hamming_near_pairs

    sig = M.phash64(_with_media_dups(spark, sf_dir))
    pairs = hamming_near_pairs(
        sig, id_col="doc_id", hash_col="phash", bits=64, max_hamming=3, n_chunks=4
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


def _phash_pairs_oracle() -> str:
    """Reproduces phash64's BRUI arithmetic exactly (subsample → mean
    threshold → two's-complement pack), then brute-forces all pairs —
    the toy-scale oracle for the banded join's answer set."""
    byte = (
        "(seed * 7 + 31 * ((i * L) // 64)"
        " + CASE WHEN v > 0 AND (i * L) // 64 = (v * 13) % L"
        " THEN v * 17 ELSE 0 END) % 256"
    )
    pack = " + ".join(
        f"(CASE WHEN s[{i + 1}] * 64 > t THEN {2 ** i}::HUGEINT ELSE 0::HUGEINT END)"
        for i in range(64)
    )
    return f"""
WITH base AS (
  SELECT doc_id,
         doc_id % 29 AS seed,
         doc_id // 29 AS v,
         ((doc_id % 29) % 32 + 1) * ((doc_id % 29) % 24 + 1) + 16 AS L
  FROM documents
), sub AS (
  SELECT doc_id,
         [ {byte} FOR i IN generate_series(0, 63) ] AS s
  FROM base
), tot AS (
  SELECT doc_id, s, list_sum(s) AS t FROM sub
), ph AS (
  SELECT doc_id,
         CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                   THEN u - 18446744073709551616::HUGEINT
                   ELSE u END AS BIGINT) AS phash
  FROM (SELECT doc_id, ({pack}) AS u FROM tot)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.phash, b.phash))::INT AS hamming
FROM ph a JOIN ph b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3
"""


def mm_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image duplicate CLUSTERS: pHash signatures → exact-collapse on
    the hash value → Hamming banding over min-id reps → alternating-star
    connected components → members inherit their rep's component
    (operators/dedup.py phash_dedup_clusters)."""
    from bruin_spark.operators.dedup import phash_dedup_clusters

    sig = M.phash64(_with_media_dups(spark, sf_dir))
    cc = phash_dedup_clusters(sig)
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def _phash_clusters_oracle() -> str:
    """Reachability closure over the SAME deterministic pHash pair
    graph (identical hashes pair at Hamming 0, so exact groups are
    inside the closure): min reachable id == the star algorithm's
    component representative."""
    return f"""
WITH RECURSIVE pairs AS ({_phash_pairs_oracle()}),
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


QUERIES = {
    "mm_decode": (mm_decode, DECODE_ORACLE),
    "mm_meta_scan": (mm_meta_scan, META_ORACLE),
    "mm_frame_sample": (mm_frame_sample, FRAME_ORACLE),
    "mm_resize": (mm_resize, RESIZE_ORACLE),
    "mm_features": (mm_features, FEATURES_ORACLE),
    "mm_phash_pairs": (mm_phash_pairs, _phash_pairs_oracle()),
    "mm_phash_clusters": (mm_phash_clusters, _phash_clusters_oracle()),
}


def mm_video_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video copy detection: per-frame pHash in the Arrow decode pass
    (operators/multimodal.py frame_phash64) → inverted-index join on
    exact frame fingerprints with a df-cap → per-pair overlap count
    (video_frame_overlap_pairs).  Pairs sharing >= 50% of the smaller
    video's distinct frames."""
    sig = M.frame_phash64(_with_media_dups(spark, sf_dir))
    return M.video_frame_overlap_pairs(
        sig, min_overlap=0.5, max_df=40
    ).orderBy("id_a", "id_b")


def _video_dedup_oracle() -> str:
    """Reproduces frame_phash64's BRUI arithmetic (frame-rotated
    subsample -> mean threshold -> two's-complement pack) per (video,
    frame), then the same df-capped overlap join."""
    byte = (
        "(seed * 7 + 31 * ((f + (i * L) // 64) % L)"
        " + CASE WHEN v > 0 AND (f + (i * L) // 64) % L = (v * 13) % L"
        " THEN v * 17 ELSE 0 END) % 256"
    )
    pack = " + ".join(
        f"(CASE WHEN s[{i + 1}] * 64 > t THEN {2 ** i}::HUGEINT ELSE 0::HUGEINT END)"
        for i in range(64)
    )
    return f"""
WITH base AS (
  SELECT doc_id,
         doc_id % 29 AS seed,
         doc_id // 29 AS v,
         ((doc_id % 29) % 32 + 1) * ((doc_id % 29) % 24 + 1) + 16 AS L,
         (doc_id % 29) % 12 + 1 AS n_frames
  FROM documents
), frames AS (
  SELECT doc_id, seed, v, L, f
  FROM base, UNNEST(generate_series(0, n_frames - 1)) AS g(f)
), sub AS (
  SELECT doc_id,
         [ {byte} FOR i IN generate_series(0, 63) ] AS s
  FROM frames
), tot AS (
  SELECT doc_id, s, list_sum(s) AS t FROM sub
), fh AS (
  SELECT DISTINCT doc_id AS id,
         CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                   THEN u - 18446744073709551616::HUGEINT
                   ELSE u END AS BIGINT) AS h
  FROM (SELECT doc_id, ({pack}) AS u FROM tot)
), sizes AS (
  SELECT id, COUNT(*) AS n FROM fh GROUP BY id
), postings AS (
  SELECT * FROM fh WHERE h IN (
    SELECT h FROM fh GROUP BY h HAVING COUNT(*) <= 40
  )
), shared AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS shared_frames
  FROM postings a JOIN postings b ON a.h = b.h AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b, shared_frames::BIGINT AS shared_frames,
       ROUND(shared_frames / LEAST(na.n, nb.n), 6) AS overlap
FROM shared
JOIN sizes na ON na.id = id_a
JOIN sizes nb ON nb.id = id_b
WHERE shared_frames / LEAST(na.n, nb.n) >= 0.5
ORDER BY id_a, id_b
"""


QUERIES["mm_video_frame_dedup"] = (mm_video_frame_dedup, _video_dedup_oracle())

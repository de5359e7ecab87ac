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


QUERIES = {
    "mm_decode": (mm_decode, DECODE_ORACLE),
    "mm_meta_scan": (mm_meta_scan, META_ORACLE),
    "mm_frame_sample": (mm_frame_sample, FRAME_ORACLE),
    "mm_resize": (mm_resize, RESIZE_ORACLE),
    "mm_features": (mm_features, FEATURES_ORACLE),
}

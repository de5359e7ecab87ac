"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns plus a typed metadata struct —
the Spark-side schema, Arrow batching, partition packing, and UDF
signatures are real and tested; the actual codec calls are STUBBED
because no image/audio libraries exist in this container:

- real decode path: gated behind an import-try of PIL/soundfile — raises
  ``NotImplementedError`` with instructions when absent;
- deterministic fake format ``BRUI``: a 16-byte header (magic, width,
  height, n_frames) + payload. Tests and oracles use it so the entire
  distributed pipeline (scan → mapInPandas decode → feature columns)
  runs for real, with only the codec swapped.

Batch shape matters: mapInPandas receives Arrow record batches; media
bytes dominate memory, so ``pack_partitions_by_bytes`` packs rows into
partitions by cumulative payload size (not row count) before the decode
stage — the difference between a 2 GB and a 40 GB executor working set
when row sizes are skewed.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

from bruin_spark.checkpointing import materialize

MAGIC = b"BRUI"
HEADER_FMT = ">4sHHI"  # magic, width, height, n_frames
HEADER_SIZE = struct.calcsize(HEADER_FMT)

IMAGE_META_SCHEMA = "mime string, width int, height int, n_frames int, n_bytes bigint"


def synth_media(width: int, height: int, n_frames: int = 1, payload_seed: int = 0) -> bytes:
    """Deterministic fake media blob in the BRUI container format."""
    payload_len = (width * height) % 4096 + 16
    payload = bytes((payload_seed + i * 31) % 256 for i in range(payload_len))
    return struct.pack(HEADER_FMT, MAGIC, width, height, n_frames) + payload


def parse_header(blob: bytes) -> tuple[int, int, int]:
    """-> (width, height, n_frames); raises on foreign formats."""
    if blob is None or len(blob) < HEADER_SIZE or blob[:4] != MAGIC:
        raise ValueError("not a BRUI blob — real codecs are stubbed in this build")
    _magic, w, h, n = struct.unpack(HEADER_FMT, blob[:HEADER_SIZE])
    return w, h, n


def decode_media(
    df: DataFrame, bin_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """Decode headers + byte stats via mapInPandas (Arrow-batched).

    Output: (id, width, height, n_frames, n_bytes, payload_sum) — the
    schema a real decoder would extend with pixel tensors.
    """
    out_schema = (
        f"{id_col} bigint, width int, height int, n_frames int, "
        "n_bytes bigint, payload_sum bigint"
    )

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            # zip over columns — iterrows() is ~20x slower per row
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                w, h, n = parse_header(blob)
                payload = blob[HEADER_SIZE:]
                rows.append((int(rid), w, h, n, len(blob), int(sum(payload))))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "n_frames", "n_bytes", "payload_sum"],
            )

    return df.select(id_col, bin_col).mapInPandas(decode, out_schema)


def resize_media(
    df: DataFrame,
    size: tuple[int, int] = (8, 8),
    bin_col: str = "media",
    id_col: str = "doc_id",
    out: str = "media_resized",
) -> DataFrame:
    """Resize media blobs, binary in -> binary out, via mapInPandas.

    The Spark plumbing — Arrow batch transfer, binary column in/out,
    per-partition batching — is real and tested.  The per-blob function
    dispatches: real image formats need Pillow (absent in this
    container; gated behind an import-try and raising with instructions),
    while BRUI synthetic blobs get a deterministic nearest-neighbor
    payload subsample (new_payload[i] = old[(i * old_len) // new_len]),
    so the whole pipeline runs end-to-end and is oracle-reproducible.
    """
    tw, th = size
    out_schema = f"{id_col} bigint, {out} binary"

    def work(batches: Iterator) -> Iterator:
        import pandas as pd

        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False

        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob)
                if b[:4] == MAGIC:
                    _w, _h, n_frames = parse_header(b)
                    payload = b[HEADER_SIZE:]
                    old_len = len(payload)
                    new_len = (tw * th) % 4096 + 16
                    sub = bytes(
                        payload[(i * old_len) // new_len] for i in range(new_len)
                    )
                    rows.append(
                        (int(rid), struct.pack(HEADER_FMT, MAGIC, tw, th, n_frames) + sub)
                    )
                elif have_pil:
                    # real path: Image.open(BytesIO(b)).resize(size) ->
                    # re-encode; exercised only where Pillow is installed
                    from io import BytesIO

                    from PIL import Image

                    img = Image.open(BytesIO(b)).resize((tw, th))
                    buf = BytesIO()
                    img.save(buf, format=img.format or "PNG")
                    rows.append((int(rid), buf.getvalue()))
                else:
                    raise NotImplementedError(
                        "non-BRUI media needs Pillow, which is not in this container"
                    )
            yield pd.DataFrame(rows, columns=[id_col, out])

    return df.select(id_col, bin_col).mapInPandas(work, out_schema)


def byte_histogram_features(
    df: DataFrame,
    n_bins: int = 16,
    bin_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-blob payload byte histogram -> long form (id, bin, cnt).

    The feature-extraction shape of a real multimodal pipeline (pixel /
    spectral statistics per asset): Arrow-batched mapInPandas, numpy
    bincount per blob (vectorized, no per-byte Python), one output row
    per (blob, bin).  Deterministic on BRUI blobs, so oracle-checkable.
    """
    out_schema = f"{id_col} bigint, bin int, cnt int"
    width = 256 // n_bins
    if width == 0:
        raise ValueError(f"n_bins must be <= 256, got {n_bins}")

    def work(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob)
                payload = np.frombuffer(b[HEADER_SIZE:], dtype=np.uint8)
                # When 256 % n_bins != 0 the last bin absorbs the tail
                # (byte 255 maps past n_bins-1 otherwise, dropping counts).
                idx = np.minimum(payload // width, n_bins - 1)
                hist = np.bincount(idx, minlength=n_bins)
                rows.extend(
                    (int(rid), i, int(c)) for i, c in enumerate(hist[:n_bins])
                )
            yield pd.DataFrame(rows, columns=[id_col, "bin", "cnt"])

    return df.select(id_col, bin_col).mapInPandas(work, out_schema)


def phash64(
    df: DataFrame,
    bin_col: str = "media",
    id_col: str = "doc_id",
    out: str = "phash",
    n_samples: int = 64,
) -> DataFrame:
    """64-bit perceptual hash per media blob, Arrow-batched.

    Real image formats (PIL present) get the classic pHash: grayscale →
    32×32 resize → 2-D DCT → top-left 8×8 low-frequency block →
    median threshold.  BRUI blobs get the deterministic analog on the
    payload byte stream: nearest-neighbor subsample to ``n_samples``
    bytes (``sub[i] = payload[(i·L)//n]``, the resize_media rule), then
    mean threshold — bit i set iff ``sub[i]·n > sum(sub)`` (integer
    compare, no float, so the oracle reproduces it exactly).  Either
    way two blobs that differ by a few bytes/pixels differ in a few
    bits, which is what the Hamming-band candidate join needs.

    The 64 bits pack into a SIGNED bigint two's-complement (numpy
    uint64 → int64 view), the same convention DuckDB's BIGINT uses, so
    ``bit_count(xor(a, b))`` is the Hamming distance on both engines.

    Pipeline shape: this runs inside the same mapInPandas decode pass
    as decode_media — one Arrow transfer of the heavy binary column
    yields the 8-byte signature, and everything downstream (banding,
    candidate join, verify) is JVM-side on a table of (id, int64).
    """
    if n_samples > 64:
        raise ValueError(
            f"n_samples={n_samples}: the pack is a signed 64-bit hash; "
            "more than 64 sample bits would overflow the bigint schema"
        )
    out_schema = f"{id_col} bigint, {out} bigint"

    def work(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        try:
            from PIL import Image

            have_pil = True
        except ImportError:
            have_pil = False

        def brui_hash(b: bytes) -> int:
            payload = np.frombuffer(b[HEADER_SIZE:], dtype=np.uint8)
            L = len(payload)
            idx = (np.arange(n_samples, dtype=np.int64) * L) // n_samples
            sub = payload[idx].astype(np.int64)
            total = int(sub.sum())
            packed = 0
            for i, v in enumerate(sub):
                if int(v) * n_samples > total:
                    packed |= 1 << i
            # two's-complement into the signed-bigint domain
            return packed - (1 << 64) if packed >= (1 << 63) else packed

        def pil_hash(b: bytes) -> int:
            # classic DCT pHash (public algorithm; same shape as the
            # imagehash library's phash): 32x32 grayscale, 2-D DCT-II,
            # 8x8 low-frequency block, median threshold
            from io import BytesIO

            img = Image.open(BytesIO(b)).convert("L").resize((32, 32))
            px = np.asarray(img, dtype=np.float64)
            n = 32
            k = np.arange(n)
            basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
            dct = basis @ px @ basis.T
            block = dct[:8, :8].flatten()
            med = np.median(block[1:])  # skip the DC term
            packed = 0
            for i, v in enumerate(block):
                if v > med:
                    packed |= 1 << i
            return packed - (1 << 64) if packed >= (1 << 63) else packed

        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob)
                if b[:4] == MAGIC:
                    h = brui_hash(b)
                elif have_pil:
                    h = pil_hash(b)
                else:
                    raise NotImplementedError(
                        "non-BRUI media needs Pillow, which is not in this container"
                    )
                rows.append((int(rid), h))
            yield pd.DataFrame(rows, columns=[id_col, out])

    return df.select(id_col, bin_col).mapInPandas(work, out_schema)


def frame_sample(
    df: DataFrame, every_n: int = 10, bin_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """Sample every Nth frame of fake multi-frame media (video analog).

    One output row per sampled frame: (id, frame_idx, frame_byte) —
    demonstrates the 1-to-many mapInPandas explode shape a real video
    frame sampler uses.
    """
    out_schema = f"{id_col} bigint, frame_idx int, frame_byte int"

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                _w, _h, n_frames = parse_header(blob)
                payload = blob[HEADER_SIZE:]
                for f_idx in range(0, n_frames, every_n):
                    rows.append((int(rid), f_idx, payload[f_idx % len(payload)]))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_byte"])

    return df.select(id_col, bin_col).mapInPandas(sample, out_schema)


def pack_partitions_by_bytes(
    df: DataFrame,
    size_col: str,
    target_bytes: int = 128 * 1024 * 1024,
    id_col: str | None = None,
) -> DataFrame:
    """Repartition so each partition holds ~target_bytes of payload.

    Scale-safe packing (no global sort, no single-partition exchange):

    1. a column-pruned stats pass sums ``size_col`` per INPUT partition —
       the collect is one row per partition, not per row;
    2. the driver turns those sums into prefix byte-offsets (tiny) and
       broadcast-joins them back on ``spark_partition_id()``;
    3. the running total within each partition is a window partitioned
       by the input partition id — every task sees only its own
       partition's rows, so no stage funnels the dataset through one
       reducer;
    4. ``offset + local running total`` bucketed by ``target_bytes``
       becomes the shuffle key.

    Protects decode stages from skew when blob sizes vary by 1000x.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    # persist so the stats pass and the pack pass observe the SAME
    # physical partitioning: spark_partition_id() is not stable across
    # plan re-executions (AQE re-planning, non-deterministic sources),
    # and a pid present in one job but not the other would mis-bucket.
    # Callers may unpersist the result's lineage once the packed output
    # is materialized.
    tagged = df.withColumn("__pid", F.spark_partition_id()).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # stats pass: O(num input partitions) rows collected (this also
    # materializes the cache, pinning the pid assignment)
    totals = tagged.groupBy("__pid").agg(F.sum(size_col).alias("__b")).collect()
    offsets, acc = [], 0
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], acc))
        acc += int(row["__b"] or 0)
    n_buckets = int(acc // target_bytes) + 1
    if not offsets:
        tagged.unpersist()
        return df
    offs = df.sparkSession.createDataFrame(offsets, "__pid int, __off bigint")

    order = [id_col] if id_col else [size_col]
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # left join + coalesce: even if a pid were somehow absent from the
    # stats pass, its rows survive (packed from offset 0) instead of
    # being silently dropped by an inner join.
    bucketed = (
        tagged.join(F.broadcast(offs), "__pid", "left")
        .withColumn(
            "__bucket",
            (
                (F.coalesce(F.col("__off"), F.lit(0)) + F.sum(size_col).over(w))
                / F.lit(target_bytes)
            ).cast("bigint"),
        )
    )
    return bucketed.repartition(n_buckets, "__bucket").drop("__pid", "__off", "__bucket")


def with_media_meta(df: DataFrame, bin_col: str = "media") -> DataFrame:
    """Attach the typed metadata struct using ONLY cheap header parsing
    expressed with built-in byte functions (no Python): substr on binary
    + conv — the metadata-only scan never deserializes payloads."""
    blob = F.col(bin_col)
    w = F.conv(F.hex(F.substring(blob, 5, 2)), 16, 10).cast("int")
    h = F.conv(F.hex(F.substring(blob, 7, 2)), 16, 10).cast("int")
    n = F.conv(F.hex(F.substring(blob, 9, 4)), 16, 10).cast("int")
    meta = F.struct(
        F.lit("application/x-brui").alias("mime"),
        w.alias("width"),
        h.alias("height"),
        n.alias("n_frames"),
        F.length(blob).cast("bigint").alias("n_bytes"),
    )
    return df.withColumn("media_meta", meta)


def frame_phash64(
    df: DataFrame,
    bin_col: str = "media",
    id_col: str = "doc_id",
    n_samples: int = 64,
) -> DataFrame:
    """Per-FRAME 64-bit perceptual hash: one output row per frame,
    ``(id, frame_idx, fhash)`` — the video analog of :func:`phash64`
    (a real build hashes each decoded frame; the BRUI stand-in hashes
    the frame-rotated payload sample ``sub[i] = payload[(f + (i·L)//n)
    % L]`` with the same integer mean-threshold pack, so the oracle
    reproduces it exactly).

    Runs in the SAME Arrow decode pass shape as phash64: the binary
    column is read once, and everything downstream operates on
    (id, int, int64) rows.
    """
    if n_samples > 64:
        raise ValueError(
            f"n_samples={n_samples}: the pack is a signed 64-bit hash; "
            "more than 64 sample bits would overflow the bigint schema"
        )
    out_schema = f"{id_col} bigint, frame_idx int, fhash bigint"

    def work(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob)
                _w, _h, n_frames = parse_header(b)
                payload = np.frombuffer(b[HEADER_SIZE:], dtype=np.uint8)
                L = len(payload)
                base_idx = (np.arange(n_samples, dtype=np.int64) * L) // n_samples
                for f in range(n_frames):
                    sub = payload[(f + base_idx) % L].astype(np.int64)
                    total = int(sub.sum())
                    packed = 0
                    for i, v in enumerate(sub):
                        if int(v) * n_samples > total:
                            packed |= 1 << i
                    if packed >= (1 << 63):
                        packed -= 1 << 64
                    rows.append((int(rid), f, packed))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "fhash"])

    return df.select(id_col, bin_col).mapInPandas(work, out_schema)


def video_frame_overlap_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "fhash",
    min_overlap: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Video copy detection by frame-fingerprint overlap: pairs of
    videos sharing ≥ ``min_overlap`` of the smaller video's DISTINCT
    frame hashes — the standard content-based copy-detection join
    (match frame fingerprints exactly, count matches per video pair).

    Plan (100 TB shape): distinct (video, hash) collapses repeated
    frames map-side; candidate pairs come from the inverted index
    (hash → videos) — quadratic only in per-hash posting size, which
    ``max_df`` caps by dropping ubiquitous frames (intro cards / logo
    frames — the boilerplate of video, exactly the hot posting list
    the n-gram prefix filter sheds for text); the per-pair count is a
    map-side-combinable groupBy.  No all-pairs join anywhere.

    Returns ``(id_a, id_b, shared_frames, overlap)``.
    """
    distinct_fh = sig.select(F.col(id_col).alias("id"), F.col(hash_col).alias("h")).distinct()
    # distinct_fh fans out to FOUR consumers (sizes, the df-cap
    # aggregate, the semi-join probe, and both self-join sides); sig is
    # typically the per-frame Arrow decode pass over the raw media
    # blobs, which Catalyst would otherwise re-run once PER consumer
    # (no exchange reuse across the differently-keyed aggregates —
    # observed as 12 MapInPandas nodes in the mm_video_frame_dedup
    # plan).  Pin the small (video, hash) projection once; everything
    # downstream is decide-with-small-rows (guide §8).  EAGER: the
    # consumers are subtrees of one final job, so a lazy pin lets
    # concurrent stages re-run part of the decode before the cache
    # fills (measured: eager drops 8 tasks / 1 stage at sf0.1).
    distinct_fh = materialize(distinct_fh, eager=True)
    sizes = distinct_fh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    postings = distinct_fh
    if max_df is not None:
        dfc = distinct_fh.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
        postings = distinct_fh.join(
            dfc.filter(F.col("_df") <= max_df).select("h"), "h", "left_semi"
        )
    a = postings.select(F.col("h"), F.col("id").alias("id_a"))
    b = postings.select(F.col("h"), F.col("id").alias("id_b"))
    shared = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_frames"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("_na"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("_nb"))
    # gate on the RAW ratio (rounding first would move boundary pairs
    # across the threshold differently per engine), round for output
    raw = F.col("shared_frames") / F.least("_na", "_nb")
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .filter(raw >= F.lit(min_overlap))
        .select(
            "id_a",
            "id_b",
            "shared_frames",
            F.round(raw, 6).alias("overlap"),
        )
    )

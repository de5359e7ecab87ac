"""Multimodal plumbing tests: BRUI fake codec, mapInPandas shapes,
byte-budget partition packing, stubbed real-codec gates."""

import pytest

from bruin_spark.operators import multimodal as M


def _media_df(spark, n=20):
    rows = [(i, M.synth_media(i % 8 + 1, i % 6 + 1, i % 5 + 1, payload_seed=i)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id bigint, media binary")


def test_synth_roundtrip():
    blob = M.synth_media(10, 7, 3, payload_seed=42)
    assert M.parse_header(blob) == (10, 7, 3)
    with pytest.raises(ValueError):
        M.parse_header(b"JPEG....")


def test_decode_media(spark):
    df = _media_df(spark)
    out = M.decode_media(df).orderBy("doc_id").collect()
    assert len(out) == 20
    r = out[7]
    assert (r["width"], r["height"], r["n_frames"]) == (7 % 8 + 1, 7 % 6 + 1, 7 % 5 + 1)
    blob = M.synth_media(7 % 8 + 1, 7 % 6 + 1, 7 % 5 + 1, payload_seed=7)
    assert r["n_bytes"] == len(blob)
    assert r["payload_sum"] == sum(blob[M.HEADER_SIZE:])


def test_with_media_meta_matches_decode(spark):
    df = _media_df(spark)
    meta = {r["doc_id"]: r for r in M.with_media_meta(df).select("doc_id", "media_meta.*").collect()}
    dec = {r["doc_id"]: r for r in M.decode_media(df).collect()}
    for i in dec:
        assert meta[i]["width"] == dec[i]["width"]
        assert meta[i]["n_bytes"] == dec[i]["n_bytes"]


def test_frame_sample_shape(spark):
    df = _media_df(spark)
    out = M.frame_sample(df, every_n=2)
    assert out.columns == ["doc_id", "frame_idx", "frame_byte"]
    rows = out.filter("doc_id = 9").collect()  # 9%5+1 = 5 frames -> idx 0,2,4
    assert sorted(r["frame_idx"] for r in rows) == [0, 2, 4]


def test_pack_partitions_by_bytes(spark):
    from pyspark.sql import functions as F

    df = _media_df(spark, n=50).withColumn("sz", F.length("media").cast("bigint"))
    total = df.agg(F.sum("sz")).collect()[0][0]
    target = max(total // 4, 1)
    packed = M.pack_partitions_by_bytes(df, "sz", target_bytes=int(target), id_col="doc_id")
    assert packed.count() == 50
    assert packed.rdd.getNumPartitions() >= 4


def test_resize_brui_subsample_roundtrip(spark):
    df = _media_df(spark, n=10)
    out = M.decode_media(M.resize_media(df, size=(8, 8)), bin_col="media_resized")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 10
    for i, r in rows.items():
        assert (r["width"], r["height"]) == (8, 8)
        assert r["n_frames"] == i % 5 + 1  # frame count preserved
        assert r["n_bytes"] == 80 + M.HEADER_SIZE  # (8*8)%4096+16 payload
    # subsample is deterministic: first new byte == first old byte
    blob = M.synth_media(5, 4, 2, payload_seed=3)
    old_payload = blob[M.HEADER_SIZE:]
    resized = (
        M.resize_media(spark.createDataFrame([(0, blob)], "doc_id bigint, media binary"))
        .collect()[0]["media_resized"]
    )
    assert bytes(resized)[M.HEADER_SIZE] == old_payload[0]


def test_resize_non_brui_gated_without_pil(spark):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub gate not applicable")
    except ImportError:
        pass
    df = spark.createDataFrame([(0, b"JPEG....")], "doc_id bigint, media binary")
    from py4j.protocol import Py4JJavaError

    with pytest.raises((NotImplementedError, Py4JJavaError, Exception)):
        M.resize_media(df).collect()


def test_byte_histogram_features(spark):
    df = _media_df(spark, n=5)
    out = M.byte_histogram_features(df, n_bins=16)
    rows = out.collect()
    assert len(rows) == 5 * 16
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], 0)
        per_doc[r["doc_id"]] += r["cnt"]
    # histogram counts sum to the payload length
    for i in range(5):
        payload_len = ((i % 8 + 1) * (i % 6 + 1)) % 4096 + 16
        assert per_doc[i] == payload_len

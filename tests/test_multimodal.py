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


def test_resize_stub_gated(spark):
    df = _media_df(spark, n=1)
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub gate not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        M.resize_stub(df)

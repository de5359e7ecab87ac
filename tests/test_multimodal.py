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


# -- perceptual hash + Hamming-band near-dup pairs ------------------------------


def _phash_ref(blob: bytes, n: int = 64) -> int:
    """Pure-Python reference for the BRUI phash64 arithmetic."""
    payload = blob[M.HEADER_SIZE:]
    L = len(payload)
    sub = [payload[(i * L) // n] for i in range(n)]
    total = sum(sub)
    packed = 0
    for i, v in enumerate(sub):
        if v * n > total:
            packed |= 1 << i
    return packed - (1 << 64) if packed >= (1 << 63) else packed


def test_phash64_matches_reference_and_dedups(spark):
    # three exact copies + one single-byte perturbation + one unrelated
    base = bytearray(M.synth_media(16, 12, 1, payload_seed=5))
    near = bytearray(base)
    near[M.HEADER_SIZE + 3] = (near[M.HEADER_SIZE + 3] + 90) % 256
    other = M.synth_media(16, 12, 1, payload_seed=200)
    rows = [(0, bytes(base)), (1, bytes(base)), (2, bytes(base)),
            (3, bytes(near)), (4, bytes(other))]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    got = {r["doc_id"]: r["phash"] for r in M.phash64(df).collect()}
    for i, blob in rows:
        assert got[i] == _phash_ref(bytes(blob)), i
    assert got[0] == got[1] == got[2]
    ham_near = bin((got[0] ^ got[3]) & ((1 << 64) - 1)).count("1")
    assert 0 < ham_near <= 6  # one byte -> a couple of sample bits
    ham_far = bin((got[0] ^ got[4]) & ((1 << 64) - 1)).count("1")
    assert ham_far > 6


def test_hamming_near_pairs_complete_vs_brute_force(spark):
    """Banding must return EXACTLY the brute-force answer for
    max_hamming <= n_chunks - 1, including signatures with bit 63 set
    (negative bigints — arithmetic-shift sign-fill is masked off)."""
    import random

    from bruin_spark.operators.dedup import hamming_near_pairs

    rng = random.Random(3)
    sigs = []
    for i in range(60):
        if i < 12:
            base = (1 << 63) | 0x1234_5678_9ABC_DEF0  # negative family
        else:
            base = rng.getrandbits(64)
        flips = rng.sample(range(64), rng.randint(0, 3))
        v = base
        for b in flips:
            v ^= 1 << b
        sigs.append((i, v - (1 << 64) if v >= (1 << 63) else v))
    df = spark.createDataFrame(sigs, "doc_id bigint, phash bigint")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_pairs(df, max_hamming=3, n_chunks=4).collect()
    }
    want = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            h = bin((sigs[i][1] ^ sigs[j][1]) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                want.add((sigs[i][0], sigs[j][0], h))
    assert got == want and want  # non-trivial answer set


def test_hamming_near_pairs_guards(spark):
    from bruin_spark.operators.dedup import hamming_near_pairs

    df = spark.createDataFrame([(1, 2)], "doc_id bigint, phash bigint")
    with pytest.raises(ValueError):
        hamming_near_pairs(df, max_hamming=4, n_chunks=4)
    with pytest.raises(ValueError):
        hamming_near_pairs(df, bits=50, n_chunks=4)


def test_phash_dedup_clusters_equivalent_to_flat_cc(spark):
    """Exact-collapse clusters == connected_components over the flat
    pair graph, including hash-identical groups with no cross pair
    (a component of their own) and singletons (excluded)."""
    import random

    from bruin_spark.operators.dedup import (
        connected_components,
        hamming_near_pairs,
        phash_dedup_clusters,
    )

    rng = random.Random(11)
    sigs = []
    base_a = rng.getrandbits(62)
    # family A: 6 near sigs around base_a (pairwise <= 3 via chains)
    for i in range(6):
        v = base_a ^ (1 << rng.randrange(64)) if i else base_a
        sigs.append((i, v - (1 << 64) if v >= (1 << 63) else v))
    # family B: an exact group of 4 (identical sigs), far from A
    base_b = rng.getrandbits(62) | (1 << 63)
    vb = base_b - (1 << 64)
    sigs += [(10 + i, vb) for i in range(4)]
    # singletons
    sigs += [(20 + i, rng.getrandbits(60)) for i in range(5)]
    df = spark.createDataFrame(sigs, "doc_id bigint, phash bigint")
    got = {
        (r["node"], r["component"])
        for r in phash_dedup_clusters(df).collect()
    }
    flat = connected_components(
        hamming_near_pairs(df, max_hamming=3, n_chunks=4), "id_a", "id_b"
    )
    want = {(r["node"], r["component"]) for r in flat.collect()}
    assert got == want
    # the exact group IS a cluster (members 10..13, component 10)
    assert {(10 + i, 10) for i in range(4)} <= got
    # singletons excluded
    assert not any(n >= 20 for n, _ in got)

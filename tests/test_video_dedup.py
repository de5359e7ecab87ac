"""Video frame-fingerprint dedup (operators/multimodal.py
frame_phash64 + video_frame_overlap_pairs)."""

from pyspark.sql import functions as F

from bruin_spark.operators import multimodal as M


def _media_df(spark, rows):
    """rows: list of (doc_id, bytes)."""
    return spark.createDataFrame(rows, "doc_id bigint, media binary")


def test_frame_phash_one_row_per_frame(spark):
    rows = [(i, M.synth_media(8, 6, i % 5 + 1, payload_seed=i)) for i in range(12)]
    sig = M.frame_phash64(_media_df(spark, rows))
    got = sig.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert {r["doc_id"]: r["n"] for r in got} == {i: i % 5 + 1 for i in range(12)}
    # frame hashes are deterministic: same blob -> same hashes
    again = M.frame_phash64(_media_df(spark, rows))
    assert sorted(map(tuple, sig.collect())) == sorted(map(tuple, again.collect()))


def test_identical_videos_full_overlap(spark):
    blob = M.synth_media(10, 10, 6, payload_seed=3)
    other = M.synth_media(12, 9, 6, payload_seed=40)
    rows = [(1, blob), (2, blob), (3, other)]
    sig = M.frame_phash64(_media_df(spark, rows))
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in M.video_frame_overlap_pairs(sig, min_overlap=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)]["overlap"] == 1.0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_max_df_drops_ubiquitous_frames(spark):
    # every video shares one blob -> with max_df below the corpus size
    # the shared "logo frame" contributes nothing
    blob = M.synth_media(10, 10, 1, payload_seed=7)
    rows = [(i, blob) for i in range(10)]
    sig = M.frame_phash64(_media_df(spark, rows))
    capped = M.video_frame_overlap_pairs(sig, min_overlap=0.1, max_df=5)
    assert capped.count() == 0
    uncapped = M.video_frame_overlap_pairs(sig, min_overlap=0.1, max_df=None)
    assert uncapped.count() == 45  # 10 choose 2

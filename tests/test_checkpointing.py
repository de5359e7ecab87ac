"""The lineage-materialization strategy switch (bruin_spark.checkpointing):
mode selection/validation, plan effects of each mode, the durable
checkpoint(dir) path writing real files, and an end-to-end iterative
pipeline (connected components) producing identical output in 'local'
and 'reliable' modes — the r8 verdict's cluster-reality ask (a
localCheckpoint dies with its executor; production needs checkpoint(dir)).
"""

import os

import pytest

from bruin_spark import checkpointing as ck


@pytest.fixture(autouse=True)
def _reset_mode():
    yield
    ck._mode = None
    ck._dir = None


def test_mode_validation():
    with pytest.raises(ValueError, match="must be one of"):
        ck.set_mode("fast")
    # reliable without any dir configured anywhere -> error
    assert "BRUIN_SPARK_CHECKPOINT_DIR" not in os.environ
    with pytest.raises(ValueError, match="needs a checkpoint_dir"):
        ck.set_mode("reliable")
    ck.set_mode("reliable", checkpoint_dir="/tmp/ck")
    assert ck.get_mode() == "reliable"
    assert ck.get_checkpoint_dir() == "/tmp/ck"


def test_env_var_fallback(monkeypatch):
    assert ck.get_mode() == "local"
    monkeypatch.setenv("BRUIN_SPARK_CHECKPOINT_MODE", "none")
    assert ck.get_mode() == "none"
    monkeypatch.setenv("BRUIN_SPARK_CHECKPOINT_MODE", "bogus")
    assert ck.get_mode() == "local"
    # explicit set_mode wins over the env var
    monkeypatch.setenv("BRUIN_SPARK_CHECKPOINT_MODE", "none")
    ck.set_mode("local")
    assert ck.get_mode() == "local"


def test_checkpoint_scope_restores_on_error():
    with pytest.raises(RuntimeError):
        with ck.checkpoint_scope("none"):
            assert ck.get_mode() == "none"
            raise RuntimeError("boom")
    assert ck.get_mode() == "local"


def test_none_mode_returns_plan_unchanged(spark):
    df = spark.range(10).selectExpr("id", "id * 2 as y")
    with ck.checkpoint_scope("none"):
        out = ck.materialize(df, eager=True)
    assert out is df


def test_none_mode_required_still_truncates(spark):
    df = spark.range(10)
    with ck.checkpoint_scope("none"):
        out = ck.materialize(df, eager=True, required=True)
    assert out is not df
    assert "LogicalRDD" in out._jdf.queryExecution().logical().toString()
    assert out.count() == 10


def test_local_mode_truncates_lineage(spark):
    df = spark.range(10).selectExpr("id", "id * 2 as y")
    out = ck.materialize(df, eager=True)
    assert "LogicalRDD" in out._jdf.queryExecution().logical().toString()
    assert out.count() == 10


def test_reliable_mode_writes_checkpoint_files(spark, tmp_path):
    ckdir = str(tmp_path / "ckpt")
    with ck.checkpoint_scope("reliable", checkpoint_dir=ckdir):
        df = spark.range(100).selectExpr("id", "id % 7 as m")
        out = ck.materialize(df, eager=True)
        assert out.count() == 100
    # checkpoint(dir) persists partitions under <dir>/<uuid>/rdd-N
    found = [
        os.path.join(r, f)
        for r, _, fs in os.walk(ckdir)
        for f in fs
        if f.startswith("part-")
    ]
    assert found, f"no checkpoint part files under {ckdir}"


def test_connected_components_identical_in_both_modes(spark, tmp_path):
    from bruin_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (3, 4)],
        "id_a long, id_b long",
    )
    local = {
        (r["node"], r["component"])
        for r in connected_components(edges, "id_a", "id_b").collect()
    }
    with ck.checkpoint_scope("reliable", checkpoint_dir=str(tmp_path / "cc")):
        reliable = {
            (r["node"], r["component"])
            for r in connected_components(edges, "id_a", "id_b").collect()
        }
    assert local == reliable
    assert {c for _, c in local} == {1, 10, 20}


def test_minhash_clusters_identical_in_reliable_mode(spark, tmp_path):
    """The flagship dedup pipeline end-to-end under checkpoint(dir)."""
    from bruin_spark.operators.dedup import minhash_dedup_clusters

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy cat today"),
            (3, "the quick brown fox jumps over the lazy dog today"),
            (4, "completely unrelated text about distributed query engines"),
            (5, "another unique document mentioning columnar parquet scans"),
        ],
        "doc_id long, text string",
    )
    base = {
        (r["node"], r["component"])
        for r in minhash_dedup_clusters(docs).collect()
    }
    with ck.checkpoint_scope("reliable", checkpoint_dir=str(tmp_path / "mh")):
        rel = {
            (r["node"], r["component"])
            for r in minhash_dedup_clusters(docs).collect()
        }
    assert base == rel
    assert base  # docs 1/2/3 cluster together

def test_reliable_mode_reuses_one_checkpoint_dir(spark, tmp_path):
    """Repeated materialize() calls must NOT re-run setCheckpointDir:
    Spark qualifies the configured path (``/tmp/ck`` ->
    ``file:/tmp/ck/<uuid>``), so a naive string comparison against
    ``sc.getCheckpointDir`` never matches schemeless paths and every
    call would orphan a fresh UUID subdirectory (r9 ADVICE)."""
    ckdir = tmp_path / "ckpt"
    with ck.checkpoint_scope("reliable", checkpoint_dir=str(ckdir)):
        for i in range(3):
            out = ck.materialize(spark.range(10 + i), eager=True)
            assert out.count() == 10 + i
    uuid_dirs = [p for p in ckdir.iterdir() if p.is_dir()]
    assert len(uuid_dirs) == 1, f"expected one UUID subdir, got {uuid_dirs}"


def test_reliable_mode_without_dir_raises_even_with_stale_context_dir(
    spark, tmp_path, monkeypatch
):
    """checkpoint_scope restores the Python globals but not the
    SparkContext's dir — a later 'reliable' selection with no dir
    configured must refuse rather than silently write into the stale
    (possibly deleted) dir (r9 ADVICE)."""
    with ck.checkpoint_scope("reliable", checkpoint_dir=str(tmp_path / "old")):
        ck.materialize(spark.range(5), eager=True).count()
    # context now carries old/<uuid>; select reliable purely via env var
    monkeypatch.setenv("BRUIN_SPARK_CHECKPOINT_MODE", "reliable")
    monkeypatch.delenv("BRUIN_SPARK_CHECKPOINT_DIR", raising=False)
    with pytest.raises(RuntimeError, match="no checkpoint_dir is configured"):
        ck.materialize(spark.range(5), eager=True)


def test_release_deletes_reliable_checkpoint_files(spark, tmp_path):
    """ContextCleaner only deletes checkpoint files when
    cleanCheckpoints=true (default false) — release() must do it
    explicitly or iterative loops strand O(rounds) rdd-* file sets."""
    ckdir = tmp_path / "ckpt"
    with ck.checkpoint_scope("reliable", checkpoint_dir=str(ckdir)):
        out = ck.materialize(spark.range(50), eager=True)
        assert out.count() == 50

        def rdd_dirs():
            return [
                os.path.join(r, d)
                for r, ds, _ in os.walk(ckdir)
                for d in ds
                if d.startswith("rdd-")
            ]

        assert rdd_dirs(), "checkpoint files were never written"
        ck.release(out)
        assert not rdd_dirs(), "release() left checkpoint files behind"


def test_release_frees_local_checkpoint_blocks(spark):
    """Dataset.unpersist only clears CacheManager entries; the pinned
    blocks of a localCheckpoint live on the underlying RDD."""
    out = ck.materialize(spark.range(1000).repartition(4), eager=True)
    assert out.count() == 1000
    jrdd = out._jdf.queryExecution().analyzed().rdd()
    assert jrdd.getStorageLevel().useMemory() or jrdd.getStorageLevel().useDisk()
    ck.release(out)
    lvl = jrdd.getStorageLevel()
    assert not (lvl.useMemory() or lvl.useDisk()), "blocks still pinned"


def test_environment_spec_carries_checkpoint_keys():
    from bruin_spark.devenv import _env_from_spec

    env = _env_from_spec(
        "prod",
        {"checkpoint_mode": "reliable", "checkpoint_dir": "/mnt/ckpt"},
    )
    assert env.checkpoint_mode == "reliable"
    assert env.checkpoint_dir == "/mnt/ckpt"


def test_reliable_mode_honors_externally_set_context_dir(spark, tmp_path, monkeypatch):
    """A checkpoint dir configured OUTSIDE bruin (spark.checkpoint.dir
    in spark-defaults, or embedding code calling sc.setCheckpointDir)
    is a legitimate deployment configuration: 'reliable' with no
    bruin-side dir must use it, not raise (r10 review).  Only a
    LEFTOVER dir from a previous bruin checkpoint_scope is refused."""
    ext = tmp_path / "external"
    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    prev_dir = jsc.getCheckpointDir()  # scala Option — restored below
    sc.setCheckpointDir(str(ext))
    # simulate a fresh process where bruin never touched the context
    monkeypatch.setattr(ck, "_dir_set_on_context", None)
    monkeypatch.setenv("BRUIN_SPARK_CHECKPOINT_MODE", "reliable")
    monkeypatch.delenv("BRUIN_SPARK_CHECKPOINT_DIR", raising=False)
    try:
        out = ck.materialize(spark.range(7), eager=True)
        assert out.count() == 7
        assert any(ext.iterdir())  # checkpoint files landed in the external dir
    finally:
        # the SparkContext is session-scoped: leaving it pointing at this
        # test's tmp dir would make LATER reliable-mode-without-config
        # code silently honor a dead directory (order-dependent flake) —
        # put the previous Option[String] back on the scala var
        getattr(jsc, "checkpointDir_$eq")(prev_dir)


def test_pinned_scope_releases_cluster_pipeline_blocks(spark):
    """minhash_dedup_clusters pins an (id, _tkey) corpus projection the
    returned plan references; without a scope each call leaks one block
    set per call in a long-lived session (r10 review). pinned_scope
    must return the persistent-RDD census to its baseline."""
    from bruin_spark.operators.dedup import minhash_dedup_clusters

    docs = spark.createDataFrame(
        [(i, f"doc text number {i % 3} shared body words") for i in range(30)],
        "doc_id long, text string",
    )

    def persistent_ids() -> set:
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().keys().iterator()
        out = set()
        while it.hasNext():
            out.add(int(str(it.next())))
        return out

    # compare SETS, not counts: unpersist from earlier tests completes
    # asynchronously (ContextCleaner), so a pre-existing RDD can vanish
    # mid-test and a count comparison flakes low; the contract here is
    # only that nothing THIS pipeline pinned survives the scope
    base = persistent_ids()
    with ck.pinned_scope() as bucket:
        assert minhash_dedup_clusters(docs).count() > 0
        assert bucket  # the pipeline did register pinned results
        assert persistent_ids() - base
    assert not (persistent_ids() - base)


def test_pinned_scope_reliable_mode_deletes_checkpoint_files(spark, tmp_path):
    ckdir = tmp_path / "ck"
    with ck.checkpoint_scope("reliable", checkpoint_dir=str(ckdir)):
        with ck.pinned_scope():
            out = ck.materialize(spark.range(50), eager=True)
            assert out.count() == 50
            assert any(ckdir.rglob("rdd-*"))
    assert not any(ckdir.rglob("rdd-*"))


def test_pinned_scope_is_thread_local(spark):
    """Scopes must not see (or release) other threads' materializations:
    the scheduler runs operators on worker threads, and a global stack
    would let thread A's scope exit free blocks thread B still needs
    (r10 review)."""
    import threading

    results = {}
    barrier = threading.Barrier(2, timeout=30)

    def work(name: str, n: int):
        with ck.pinned_scope() as bucket:
            out = ck.materialize(spark.range(n), eager=True)
            barrier.wait()  # both scopes open + registered concurrently
            results[name] = (len(bucket), out.count())
            barrier.wait()  # neither exits before both have consumed

    t1 = threading.Thread(target=work, args=("a", 11))
    t2 = threading.Thread(target=work, args=("b", 13))
    t1.start(), t2.start()
    t1.join(30), t2.join(30)
    # each scope saw exactly ITS OWN materialization and its data intact
    assert results == {"a": (1, 11), "b": (1, 13)}


def test_pinned_scope_nesting_releases_the_right_bucket(spark):
    """Nested scopes with an EMPTY outer bucket: list.remove(bucket)
    compares by equality and all empty lists are equal, so the inner
    exit used to drop the OUTER bucket (r10 review) — LIFO pop must
    remove its own."""
    with ck.pinned_scope() as outer:
        with ck.pinned_scope() as inner:
            ck.materialize(spark.range(5), eager=True).count()
            assert len(inner) == 1 and len(outer) == 0
        # outer scope still live and registering
        out = ck.materialize(spark.range(6), eager=True)
        assert out.count() == 6
        assert len(outer) == 1  # registered into OUR bucket, not a dead one

    def n_persistent() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    # everything from both scopes is gone
    base = n_persistent()
    with ck.pinned_scope():
        with ck.pinned_scope():
            ck.materialize(spark.range(4), eager=True).count()
        ck.materialize(spark.range(4), eager=True).count()
    assert n_persistent() == base


def test_release_of_plain_dataframe_does_not_taint_materialize(spark):
    """release() on a never-materialized LogicalRDD (a createDataFrame
    result) is the documented no-op — a later materialize of the same
    DataFrame must not raise 'already released'."""
    from bruin_spark import checkpointing as cp

    df = spark.createDataFrame([(1,), (2,)], "v int")
    cp.release(df)
    out = cp.materialize(df, eager=True)
    assert out.count() == 2
    cp.release(out)


def test_materialize_of_released_checkpoint_raises_descriptive(spark):
    from bruin_spark import checkpointing as cp

    df = cp.materialize(spark.range(5).toDF("v"), eager=True)
    assert df.count() == 5
    cp.release(df)
    import pytest

    with pytest.raises(RuntimeError, match="release"):
        cp.materialize(df)

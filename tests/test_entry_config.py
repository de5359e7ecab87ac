"""__spark_entry__._configure must size shuffle partitions ONLY for the
exact known testdata roots — a production path that merely CONTAINS an
sf-substring keeps the session owner's cluster-sized value."""

import sys

sys.path.insert(0, "/root/repo")

from __spark_entry__ import _configure  # noqa: E402


def _shuffle_parts(spark):
    return spark.conf.get("spark.sql.shuffle.partitions")


def test_known_sf_dirs_are_sized(spark):
    _configure(spark, "/root/testdata/sf0.01")
    assert _shuffle_parts(spark) == "8"
    _configure(spark, "/root/testdata/sf0.1/")
    assert _shuffle_parts(spark) == "32"
    _configure(spark, "sf0.001")
    assert _shuffle_parts(spark) == "8"


def test_lookalike_paths_keep_owner_setting(spark):
    spark.conf.set("spark.sql.shuffle.partitions", "1234")
    try:
        for path in (
            "/data/warehouse-sf0.1-archive",  # substring, not the leaf
            "/data/sf0.1x",  # leaf differs
            "/prod/lake/sf0.01_backup",
            "",
        ):
            _configure(spark, path)
            assert _shuffle_parts(spark) == "1234", path
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")

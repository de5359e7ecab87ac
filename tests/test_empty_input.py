"""Empty-input robustness: every registry entry must run (not crash) on
a schema-preserving ZERO-ROW dataset.

At 100 TB an empty partition, an empty incremental delta, or a
just-created table is a normal condition — an operator that throws on
zero rows (divide-by-zero quality score, .first() on an empty corpus,
schema inference over an empty extract) takes the whole pipeline down.
This sweep originally caught two real bugs: the file-stream staging hid
part files of directory-shaped sources, and the sqlite/duckdb ingest
path could not build an empty DataFrame.
"""

from __future__ import annotations

import glob
import os

import pytest

from bruin_spark.workloads import collect_queries


@pytest.fixture(scope="module")
def empty_sf(spark, sf_dir, tmp_path_factory):
    """Zero-row replicas of every testdata table, schemas preserved."""
    from bruin_spark.session import read_parquet

    dst = str(tmp_path_factory.mktemp("empty_sf"))
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        out = os.path.join(dst, os.path.basename(p))
        read_parquet(spark, p).limit(0).coalesce(1).write.mode("overwrite").parquet(out)
    return dst


def _entries():
    names = sorted(collect_queries())
    # streaming entries each pay multi-second sink setup; two of them
    # (one windowed, one stream-stream join) cover the empty-stream path
    streams = [n for n in names if n.startswith("stream_")]
    keep_streams = {s for s in streams if s in ("stream_hourly_counts", "stream_purchase_view_join")}
    return [n for n in names if not n.startswith("stream_") or n in keep_streams]


@pytest.mark.parametrize("name", _entries())
def test_runs_on_empty_input(name, spark, empty_sf):
    fn, _oracle = collect_queries()[name]
    # must not raise; zero rows is the expected outcome for most
    assert fn(spark, empty_sf).count() >= 0

"""Driver-parity pytest for the registry entries the per-round driver
window has never sampled (r6 ask #5): run them through the EXACT replica
of the driver's DuckDB-oracle comparison (scripts/check_oracle.py:
pandas on both sides, column-name sort, typed cell normalization) at
sf0.01, permanently, so a window rotation cannot surprise.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from check_oracle import TABLES, pdf_to_rows  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

#: entries never green in a driver round as of r7 (VERDICT r7: verified
#: locally, but only ad-hoc) — pinned here so the protection is permanent
NEVER_WINDOWED = [
    "ingest_saas_fixture",
    "ingest_saas_fixture_csv",
    "lineage_using_ordinals",
    "sample_domain_mixture",
]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def registry():
    import __spark_entry__ as entry

    return entry.queries(), entry.oracle_sql()


#: the hash-scheme entries: the MinHash affine-permutation and SimHash
#: bit-vote arithmetic must stay bit-identical across engines — any
#: drift in the integer mixing (overflow, hex-parse width, coefficient
#: table) breaks EVERY downstream LSH/cluster/incremental oracle, so the
#: raw signatures are pinned here directly
HASH_SCHEME = [
    "dedup_minhash_signature",
    "dedup_simhash_signature",
]


def _assert_entry_matches_oracle(spark, duck, registry, name):
    queries, oracles = registry
    assert name in queries, f"{name} dropped from the registry"
    assert name in oracles, f"{name} lost its oracle"
    s_pdf = queries[name](spark, SF_DIR).toPandas()
    d_pdf = duck.execute(oracles[name]).df()
    sc, sr = pdf_to_rows(s_pdf)
    dc, dr = pdf_to_rows(d_pdf)
    assert sc == dc, f"columns differ: spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"row count: spark={len(sr)} duckdb={len(dr)}"
    assert sr == dr, f"values differ, first diffs: {[(a, b) for a, b in zip(sr, dr) if a != b][:3]}"


@pytest.mark.parametrize("name", NEVER_WINDOWED)
def test_never_windowed_entry_matches_oracle(spark, duck, registry, name):
    _assert_entry_matches_oracle(spark, duck, registry, name)


@pytest.mark.parametrize("name", HASH_SCHEME)
def test_hash_scheme_signatures_bit_identical(spark, duck, registry, name):
    _assert_entry_matches_oracle(spark, duck, registry, name)

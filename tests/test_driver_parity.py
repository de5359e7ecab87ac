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


def test_exact_groups_cap_parity_on_large_group(spark, tmp_path):
    """dedup_exact_groups vs its oracle on a corpus with a >100-member
    duplicate group: the operator caps member_ids at 100 (pre-agg
    window), and EXACT_ORACLE must replay the cap (list_slice ... 100)
    — the sf0.01 fixture has ZERO duplicate groups, so only this test
    exercises the entry's values at all."""
    import duckdb

    import __spark_entry__ as entry

    d = tmp_path / "capdir"
    d.mkdir()
    rows = [(i, "same text!", "en", "src0", 10) for i in range(120)] + [
        (200 + i, f"unique text {i}", "en", "src0", 12) for i in range(5)
    ] + [(400, "same text", "en", "src0", 9), (401, "same, text?", "en", "src0", 11)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))

    con = duckdb.connect()
    # Spark writes the table as a DIRECTORY of part files
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    queries, oracles = entry.queries(), entry.oracle_sql()
    s_pdf = queries["dedup_exact_groups"](spark, str(d)).toPandas()
    d_pdf = con.execute(oracles["dedup_exact_groups"]).df()
    sc, sr = pdf_to_rows(s_pdf)
    dc, dr = pdf_to_rows(d_pdf)
    assert sc == dc and sr == dr
    # the canonicalized 'same text' group: 122 members, 100 listed
    big = s_pdf[s_pdf.group_size == 122]
    assert len(big) == 1
    ids = big.iloc[0]["member_ids_str"].split(" ")
    assert len(ids) == 100 and ids[0] == "0"
    con.close()

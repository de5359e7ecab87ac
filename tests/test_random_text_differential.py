"""Randomized differential test for the r11c text operators: a seeded
adversarial ASCII corpus (newlines, bullets, hashes, ellipses, digits,
uppercase runs, empty/whitespace docs) through the Spark entry AND its
DuckDB oracle, compared with the driver's own comparison.  Complements
the fixed-fixture unicode sweep with rule-boundary-dense random input."""

from __future__ import annotations

import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from check_oracle import pdf_to_rows  # noqa: E402

ENTRIES = ["text_gopher_rules", "text_line_filters", "text_dsir_weights"]

_WORDS = [
    "the", "be", "to", "of", "and", "that", "have", "with", "data",
    "spark", "model", "x", "#", "...", "1234", "99%", "A", "SHOUTING",
    "UPPER", "mixed.Case", "0.5,", "end.", "go!", 'quote"', "why?",
    "-", "*", "•", "javascript", "lorem", "ipsum", "{", "}",
]


def _doc(rng: random.Random) -> str:
    kind = rng.random()
    if kind < 0.05:
        return ""
    if kind < 0.08:
        return "   "
    n_lines = rng.randint(1, 8)
    lines = []
    for _ in range(n_lines):
        n_words = rng.randint(0, 14)
        words = [rng.choice(_WORDS) for _ in range(n_words)]
        sep = rng.choice([" ", "  ", " \t "])
        lines.append(sep.join(words) + rng.choice(["", " ", "."]))
    # mix LF and CRLF endings (the r11c Java-$ divergence regression)
    return rng.choice(["\n", "\r\n"]).join(lines)


@pytest.fixture(scope="module")
def random_dir(tmp_path_factory):
    rng = random.Random(20260816)
    d = tmp_path_factory.mktemp("random_docs")
    texts = [_doc(rng) for _ in range(80)]
    langs = [rng.choice(["en", "de", "fr"]) for _ in texts]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array([f"s{i % 4}" for i in range(len(texts))]),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def random_duck(random_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{random_dir}/documents.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", ENTRIES)
def test_random_corpus_matches_oracle(spark, random_dir, random_duck, name):
    import __spark_entry__ as entry

    queries, oracles = entry.queries(), entry.oracle_sql()
    s_pdf = queries[name](spark, random_dir).toPandas()
    d_pdf = random_duck.execute(oracles[name]).df()
    sc, sr = pdf_to_rows(s_pdf)
    dc, dr = pdf_to_rows(d_pdf)
    assert sc == dc, f"columns differ: spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"row count: spark={len(sr)} duckdb={len(dr)}"
    diffs = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not diffs, f"values differ, first diffs: {diffs[:3]}"

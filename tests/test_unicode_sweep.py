"""Unicode robustness sweep (r6 ask #6): a mixed multibyte corpus — CJK,
astral-plane emoji (UTF-16 surrogate pairs on the JVM), RTL scripts,
NFC-vs-NFD decomposed accents, combining marks, zero-width joiners —
through every documents-reading text/dedup registry entry, compared
against its DuckDB oracle with the driver's own comparison (pandas both
sides, typed cell normalization).

What can silently diverge: Python ``len()`` counts codepoints, UTF-8
storage counts bytes, the JVM's String.length counts UTF-16 units (an
emoji is 1/4/2 respectively); regex character classes and ``lower()``
differ per engine.  The oracle match is the proof the pipeline lands on
ONE consistent semantics end to end.
"""

import os
import sys
import unicodedata

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from check_oracle import pdf_to_rows  # noqa: E402

#: every registry entry that reads ONLY documents.parquet and has an oracle
SWEEP_ENTRIES = [
    "text_token_count",
    "text_chunks",
    "text_sequence_packing",
    "text_language_id",
    "text_quality",
    "text_fingerprint",
    "text_repetition",
    "text_pii_redact",
    "text_curation_funnel",
    "text_bm25_topk",
    "text_bpe_merges",
    "dedup_exact_groups",
    "dedup_exact_survivors",
    "dedup_minhash_signature",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_segments",
    "dedup_simhash_signature",
    "dedup_simhash_pairs",
    "dedup_simhash_clusters",
    "dedup_ngram_jaccard",
    "dedup_duplicate_spans",
    "dedup_spans_incremental",
    "text_top_ngrams",
    # r11 additions (documents-only, oracle-paired)
    "text_bpe_encode",
    "text_lm_perplexity",
    "text_ccnet_buckets",
    "text_tfidf_terms",
    "text_lang_segments",
    "dedup_strip_boilerplate",
    "text_gopher_rules",
    "text_dsir_weights",
    "text_line_filters",
    "text_ccnet_buckets_approx",
    "text_refinedweb_funnel",
    "text_quality_classifier",
    "text_bpe_ids",
    "text_decontaminate_fuzzy",
    "text_gopher_repetition",
    # r12b additions
    "text_readability",
    "text_domain_stats",
    "text_lm_stupid_backoff",
    "sample_unimax",
    "text_tokenizer_fertility",
    "dedup_containment",
    "stat_doc_length_profile",
    "text_bm25_multi",
    "sample_unimax_draw",
    "text_padding_waste",
    # r13 additions
    "text_html_extract",
    "dedup_spans_incr_bucketed",
    "text_fertility_fixed_vocab",
    "text_url_dedup",
]

_E = "é"                      # é precomposed (NFC)
_E_NFD = unicodedata.normalize("NFD", _E)  # e + combining acute
_ZWJ = "‍"
_FAMILY = "👨" + _ZWJ + "👩" + _ZWJ + "👧"  # multi-codepoint grapheme


def _corpus() -> list[str]:
    cjk = "深度 学习 模型 训练 数据 清洗 去重 质量 评估 工具"
    cjk_nospace = "深度学习模型训练数据清洗去重质量评估"
    emoji = "launch 🚀 done ✅ fire 🔥 brain 🧠 rocket 🚀 again 🚀"
    astral = "math 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 gothic 𐌰𐌱𐌲 cuneiform 𒀀𒀁 done"
    rtl = "مرحبا بالعالم هذا نص عربي للاختبار مع كلمات مكررة مكررة"
    hebrew = "שלום עולם זהו טקסט עברי לבדיקה עם מילים חוזרות חוזרות"
    nfc = f"caf{_E} r{_E}sum{_E} na{_E}ve d{_E}j{_E} vu encore"
    nfd = unicodedata.normalize("NFD", nfc)
    combining = "áb̂c̃ ẍẙž plain words here"
    zwj = f"{_FAMILY} family emoji {_FAMILY} repeated {_FAMILY} thrice"
    mixed = f"english 中文 العربية עברית 🚀 caf{_E} {cjk_nospace[:6]} end"
    long_cjk = " ".join(["训练数据"] * 30)
    return [
        cjk, cjk_nospace, emoji, astral, rtl, hebrew, nfc, nfd,
        combining, zwj, mixed, long_cjk,
        # exact-dup pairs across encodings: NFC vs NFD are DIFFERENT bytes
        # (must NOT collapse), identical NFC strings must collapse
        nfc, cjk, emoji,
        # ascii control group
        "plain ascii words repeated words repeated words",
        "the quick brown fox jumps over the lazy dog",
    ]


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("unicode_docs")
    texts = _corpus()
    langs = ["zh", "zh", "en", "en", "ar", "he", "fr", "fr", "en", "en",
             "en", "zh", "fr", "zh", "en", "en", "en"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs[: len(texts)]),
            "source": pa.array([f"src{i % 3}" for i in range(len(texts))]),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def unicode_duck(unicode_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{unicode_dir}/documents.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", SWEEP_ENTRIES)
def test_unicode_corpus_matches_oracle(spark, unicode_dir, unicode_duck, name):
    import __spark_entry__ as entry

    queries, oracles = entry.queries(), entry.oracle_sql()
    assert name in queries and name in oracles
    s_pdf = queries[name](spark, unicode_dir).toPandas()
    d_pdf = unicode_duck.execute(oracles[name]).df()
    sc, sr = pdf_to_rows(s_pdf)
    dc, dr = pdf_to_rows(d_pdf)
    assert sc == dc, f"columns differ: spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"row count: spark={len(sr)} duckdb={len(dr)}"
    assert sr == dr, f"values differ, first diffs: {[(a, b) for a, b in zip(sr, dr) if a != b][:3]}"


def test_nfc_nfd_do_not_collapse_but_identical_do(spark, unicode_dir):
    """NFC and NFD spellings are different byte strings: exact dedup must
    keep them apart (content-addressed dedup is byte-level; semantic
    normalization is a curation choice made explicitly, not silently)."""
    from bruin_spark.operators.dedup import exact_text_mapping
    from bruin_spark.session import read_parquet

    docs = read_parquet(spark, os.path.join(unicode_dir, "documents.parquet"))
    m = {r["id"]: r for r in exact_text_mapping(docs).collect()}
    # docs 6 (NFC) and 7 (NFD) — same rendered glyphs, different bytes
    assert m[6]["rep"] != m[7]["rep"]
    # doc 12 is a byte-identical copy of doc 6
    assert m[12]["rep"] == m[6]["rep"] and m[6]["group_n"] == 2

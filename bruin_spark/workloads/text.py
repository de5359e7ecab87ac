"""Text-analysis workloads over the `documents` table, with DuckDB oracles.

The Spark side uses bruin_spark.operators.text (built-in expressions);
the oracle re-expresses the identical arithmetic in DuckDB SQL. md5 and
integer/double arithmetic are engine-portable, so results match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from bruin_spark.operators import text as T
from bruin_spark.session import read_parquet


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    return read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))


def _duck_tokens(col: str = "text") -> str:
    return f"string_split_regex(lower(trim({col})), '\\s+')"


# -- token counting -----------------------------------------------------------


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = T.token_count(_docs(spark, sf_dir))
    df = T.bpe_ish_token_count(df)
    return df.select("doc_id", "n_tokens", "n_subtokens")


TOKEN_ORACLE = f"""
SELECT doc_id,
       len({_duck_tokens()}) AS n_tokens,
       len(list_filter(string_split_regex(regexp_replace(lower(text), '([0-9])', ' \\1 ', 'g'), '[^a-z0-9]+'), t -> t <> '')) AS n_subtokens
FROM documents
"""


# -- language id ---------------------------------------------------------------


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.language_id(_docs(spark, sf_dir)).select("doc_id", "lang", "lang_pred")


def _lang_oracle() -> str:
    score_cols = []
    for lang in T.LANGS:
        words = ", ".join(f"'{w}'" for w in T.STOPWORDS[lang])
        score_cols.append(
            f"len(list_filter({_duck_tokens()}, t -> t IN ({words}))) AS s_{lang}"
        )
    greatest = "GREATEST(" + ", ".join(f"s_{lang}" for lang in T.LANGS) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{lang} >= {greatest} THEN '{lang}'" for lang in T.LANGS
    ) + " END"
    return f"""
SELECT doc_id, lang, {case} AS lang_pred
FROM (SELECT doc_id, lang, {', '.join(score_cols)} FROM documents)
"""


# -- quality features ------------------------------------------------------------


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_features(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens_q", "punct_ratio", "stopword_ratio", "avg_token_len", "quality_score"
    )


def _quality_oracle(src: str = "documents") -> str:
    en = ", ".join(f"'{w}'" for w in T.STOPWORDS["en"])
    toks = _duck_tokens()
    return f"""
SELECT doc_id,
       n_tokens_q,
       ROUND(punct / GREATEST(n_chars_q, 1), 6) AS punct_ratio,
       ROUND(stop_en / GREATEST(n_tokens_q, 1), 6) AS stopword_ratio,
       ROUND((n_chars_q - (n_tokens_q - 1)) / GREATEST(n_tokens_q, 1), 6) AS avg_token_len,
       ROUND(
         LEAST(n_tokens_q / 64.0, 1.0) * 0.5
         + (1.0 - LEAST(punct / GREATEST(n_chars_q, 1) * 4.0, 1.0)) * 0.3
         + LEAST(stop_en / GREATEST(n_tokens_q, 1) * 5.0, 1.0) * 0.2,
       6) AS quality_score
FROM (
  SELECT doc_id,
         length(text) AS n_chars_q,
         len({toks}) AS n_tokens_q,
         length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS punct,
         len(list_filter({toks}, t -> t IN ({en}))) AS stop_en
  FROM {src}
)
"""


# -- fingerprint -----------------------------------------------------------------


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprint(_docs(spark, sf_dir)).select("doc_id", "doc_fingerprint")


FINGERPRINT_ORACLE = """
SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS doc_fingerprint
FROM documents
"""


# -- repetition quality (Gopher-style) -------------------------------------------


def _duck_shingles_all(n: int, col: str = "text") -> str:
    """DuckDB word n-gram list WITH repetition (no list_distinct)."""
    toks = _duck_tokens(col)
    return f"""
  CASE WHEN len({toks}) >= {n}
  THEN [array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')
        FOR i IN generate_series(1, len({toks}) - {n - 1})]
  ELSE [array_to_string({toks}, ' ')]
  END
"""


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = T.repetition_features(_docs(spark, sf_dir))
    return out.select("doc_id", "top1_token_frac", "top_2gram_frac")


def _repetition_oracle(src: str = "documents") -> str:
    return f"""
WITH t1 AS (
  SELECT doc_id, ROUND(1.0 * MAX(c) / SUM(c), 6) AS top1_token_frac FROM (
    SELECT doc_id, tok, COUNT(*) AS c
    FROM (SELECT doc_id, UNNEST({_duck_tokens()}) AS tok FROM {src})
    GROUP BY 1, 2
  ) GROUP BY 1
),
t2 AS (
  SELECT doc_id, ROUND(1.0 * MAX(c) / SUM(c), 6) AS top_2gram_frac FROM (
    SELECT doc_id, g, COUNT(*) AS c
    FROM (SELECT doc_id, UNNEST({_duck_shingles_all(2)}) AS g FROM {src})
    GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT d.doc_id, t1.top1_token_frac, t2.top_2gram_frac
FROM {src} d LEFT JOIN t1 USING (doc_id) LEFT JOIN t2 USING (doc_id)
"""


REPETITION_ORACLE = _repetition_oracle()


# -- PII redaction ----------------------------------------------------------------
# The driver's synthetic documents contain no real PII, so the workload
# deterministically plants emails / IPs / phone numbers derived from
# doc_id on BOTH engines, then runs the redaction operator over it.


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bruin_spark.operators import pii as P

    docs = _docs(spark, sf_dir)
    d = F.col("doc_id")
    email = F.when(
        d % 3 == 0,
        F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 5 == 0,
        F.concat(F.lit(" host 10.0."), (d % 256).cast("string"), F.lit(".7")),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 7 == 0,
        F.concat(F.lit(" tel 555-"), F.lpad((d % 10000).cast("string"), 4, "0")),
    ).otherwise(F.lit(""))
    planted = docs.withColumn("text", F.concat(F.col("text"), email, ip, phone))
    out = P.redact_pii(P.pii_counts(planted))
    return out.select(
        "doc_id",
        "n_email",
        "n_ip",
        "n_phone",
        F.length("text_redacted").alias("redacted_len"),
    )


def _pii_oracle() -> str:
    from bruin_spark.operators.pii import EMAIL_RE, IPV4_RE, PHONE_RE

    planted = """
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS text
  FROM documents
"""
    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}'))::INT AS n_email,
       len(regexp_extract_all(text, '{IPV4_RE}'))::INT AS n_ip,
       len(regexp_extract_all(text, '{PHONE_RE}'))::INT AS n_phone,
       length(
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
             '{IPV4_RE}', '[IP]', 'g'),
           '{PHONE_RE}', '[PHONE]', 'g')
       ) AS redacted_len
FROM ({planted})
"""


# -- test-set decontamination -----------------------------------------------------
# Held-out "eval set" = the deterministic md5-bucket 1/16th of documents;
# the rest is the training corpus screened against it.

_DECON_N = 5
_TEST_PRED = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'"


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bruin_spark.operators.contamination import ngram_overlap_contamination

    docs = _docs(spark, sf_dir)
    is_test = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    out = ngram_overlap_contamination(
        docs.filter(~is_test), docs.filter(is_test), n=_DECON_N
    )
    return out.select("doc_id", "n_hits", "contaminated")


def _decon_oracle() -> str:
    sh = f"list_distinct({_duck_shingles_all(_DECON_N)})"
    return f"""
WITH test AS (SELECT * FROM documents WHERE {_TEST_PRED}),
corpus AS (SELECT * FROM documents WHERE NOT ({_TEST_PRED})),
tsh AS (SELECT DISTINCT UNNEST({sh}) AS shingle FROM test),
csh AS (SELECT doc_id, UNNEST({sh}) AS shingle FROM corpus),
hits AS (
  SELECT csh.doc_id, COUNT(*) AS n_hits
  FROM csh JOIN tsh USING (shingle)
  GROUP BY 1
)
SELECT corpus.doc_id,
       COALESCE(hits.n_hits, 0)::INT AS n_hits,
       COALESCE(hits.n_hits, 0) >= 1 AS contaminated
FROM corpus LEFT JOIN hits USING (doc_id)
"""


# -- context-window chunking ------------------------------------------------------

_CHUNK, _OVERLAP = 64, 8
_STRIDE = _CHUNK - _OVERLAP


def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = T.chunk_documents(
        _docs(spark, sf_dir), chunk_tokens=_CHUNK, overlap=_OVERLAP
    )
    return out.select("doc_id", "chunk_idx", "chunk_text", "chunk_n_tokens")


CHUNKS_ORACLE = f"""
SELECT doc_id,
       (s // {_STRIDE})::INT AS chunk_idx,
       array_to_string(list_slice(toks, s + 1, s + {_CHUNK}), ' ') AS chunk_text,
       LEAST({_CHUNK}, len(toks) - s)::INT AS chunk_n_tokens
FROM (SELECT doc_id, {_duck_tokens()} AS toks FROM documents),
     UNNEST(generate_series(0, GREATEST(len(toks) - {_OVERLAP} - 1, 0), {_STRIDE})) AS t(s)
"""


# -- sequence packing -------------------------------------------------------------

_SEQ_BUDGET, _SEQ_BUCKETS = 512, 16


def text_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack docs into ~512-token sequence bins; per-bin occupancy stats."""
    docs = T.token_count(_docs(spark, sf_dir))
    packed = T.assign_sequence_bins(
        docs, budget=_SEQ_BUDGET, n_buckets=_SEQ_BUCKETS
    )
    return packed.groupBy("seq_bucket", "seq_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


SEQPACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, len({_duck_tokens()}) AS n_tokens,
         (('0x' || SUBSTR(MD5('seqpack' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          % {_SEQ_BUCKETS})::INT AS seq_bucket
  FROM documents
),
binned AS (
  SELECT seq_bucket,
         (COALESCE(SUM(n_tokens) OVER (
            PARTITION BY seq_bucket ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          // {_SEQ_BUDGET})::INT AS seq_bin,
         n_tokens
  FROM toks
)
SELECT seq_bucket, seq_bin, COUNT(*) AS n_docs, SUM(n_tokens)::BIGINT AS bin_tokens
FROM binned GROUP BY 1, 2
"""


# -- BM25 ranked retrieval --------------------------------------------------------

_BM25_TERMS = ("join", "filter", "batch")
_BM25_K = 20


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 docs by Okapi BM25 against a fixed term query — sparse
    lexical retrieval next to the dense ANN operators."""
    from bruin_spark.operators.ranking import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), list(_BM25_TERMS), top_k=_BM25_K)


def _bm25_oracle() -> str:
    from bruin_spark.operators.ranking import B, K1

    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
WITH toks AS (SELECT doc_id, {_duck_tokens()} AS t FROM documents),
lens AS (SELECT doc_id, len(t) AS dl FROM toks),
g AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(t) AS tok FROM toks)
  WHERE tok IN ({terms})
  GROUP BY 1, 2
),
dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1)
SELECT doc_id,
       ROUND(SUM(
         ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
         * tf * {K1 + 1.0} / (tf + {K1} * ({1.0 - B} + {B} * dl / avgdl))
       ), 6) AS bm25
FROM tf
JOIN dft USING (tok)
JOIN lens USING (doc_id)
CROSS JOIN g
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT {_BM25_K}
"""


# -- curation funnel (all pre-filters fused into one decision table) -------------

_CUR_MIN_TOKENS, _CUR_MIN_QUALITY, _CUR_MAX_T2 = 20, 0.5, 0.1


def text_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop decision per corpus doc with sorted drop reasons:
    too_short / low_quality / repetitive / exact_duplicate /
    contaminated (vs the deterministic eval split)."""
    from bruin_spark.operators.curation import curation_decisions

    docs = _docs(spark, sf_dir)
    is_test = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    return curation_decisions(
        docs.filter(~is_test),
        docs.filter(is_test),
        min_tokens=_CUR_MIN_TOKENS,
        min_quality=_CUR_MIN_QUALITY,
        max_top2gram=_CUR_MAX_T2,
        decon_n=_DECON_N,
    )


def _curation_oracle() -> str:
    sh = f"list_distinct({_duck_shingles_all(_DECON_N)})"
    return f"""
WITH corpus AS (SELECT * FROM documents WHERE NOT ({_TEST_PRED})),
test AS (SELECT * FROM documents WHERE {_TEST_PRED}),
q AS (SELECT doc_id, n_tokens_q, quality_score FROM ({_quality_oracle('corpus')})),
rep AS (SELECT doc_id, top_2gram_frac FROM ({_repetition_oracle('corpus')})),
fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
  FROM corpus
),
canon AS (
  SELECT doc_id, doc_id <> MIN(doc_id) OVER (PARTITION BY f) AS is_dup FROM fp
),
tsh AS (SELECT DISTINCT UNNEST({sh}) AS shingle FROM test),
csh AS (SELECT doc_id, UNNEST({sh}) AS shingle FROM corpus),
hits AS (
  SELECT csh.doc_id, COUNT(*) AS n_hits FROM csh JOIN tsh USING (shingle) GROUP BY 1
),
signals AS (
  SELECT q.doc_id, q.n_tokens_q, q.quality_score, rep.top_2gram_frac,
         canon.is_dup, COALESCE(hits.n_hits, 0) >= 1 AS contaminated
  FROM q
  JOIN rep USING (doc_id)
  JOIN canon USING (doc_id)
  LEFT JOIN hits USING (doc_id)
)
SELECT doc_id,
       n_tokens_q AS n_tokens,
       quality_score,
       top_2gram_frac,
       COALESCE(array_to_string(list_sort(list_filter([
         CASE WHEN n_tokens_q < {_CUR_MIN_TOKENS} THEN 'too_short' END,
         CASE WHEN quality_score < {_CUR_MIN_QUALITY} THEN 'low_quality' END,
         CASE WHEN top_2gram_frac > {_CUR_MAX_T2} THEN 'repetitive' END,
         CASE WHEN is_dup THEN 'exact_duplicate' END,
         CASE WHEN contaminated THEN 'contaminated' END
       ], x -> x IS NOT NULL)), ','), '') AS drop_reasons,
       (n_tokens_q >= {_CUR_MIN_TOKENS}
        AND quality_score >= {_CUR_MIN_QUALITY}
        AND top_2gram_frac <= {_CUR_MAX_T2}
        AND NOT is_dup AND NOT contaminated) AS keep
FROM signals
"""


QUERIES = {
    "text_curation_funnel": (text_curation_funnel, _curation_oracle()),
    "text_bm25_topk": (text_bm25_topk, _bm25_oracle()),
    "text_token_count": (text_token_count, TOKEN_ORACLE),
    "text_chunks": (text_chunks, CHUNKS_ORACLE),
    "text_sequence_packing": (text_sequence_packing, SEQPACK_ORACLE),
    "text_language_id": (text_language_id, _lang_oracle()),
    "text_quality": (text_quality, _quality_oracle()),
    "text_fingerprint": (text_fingerprint, FINGERPRINT_ORACLE),
    "text_repetition": (text_repetition, REPETITION_ORACLE),
    "text_pii_redact": (text_pii_redact, _pii_oracle()),
    "text_decontaminate": (text_decontaminate, _decon_oracle()),
}


# -- BPE merge learning -----------------------------------------------------------

_BPE_MERGES = 8


def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training: 8 learned merges from the
    corpus (one corpus-scale wordcount; iterations on the vocab)."""
    from bruin_spark.operators.tokenizer import bpe_learn_merges

    return bpe_learn_merges(_docs(spark, sf_dir), n_merges=_BPE_MERGES)


def _bpe_stages() -> tuple[list[str], list[str]]:
    """CTE stages unrolling the BPE training loop: stage k counts
    adjacent symbol pairs of w{k-1}, b{k} picks (count DESC, pair ASC),
    w{k} rewrites the vocab with REPLACE_PASSES nested literal replaces
    (canonical symbol-wise merging; see operators/tokenizer.py).
    Shared by the merge-table oracle and the encode oracle."""
    from bruin_spark.operators.tokenizer import REPLACE_PASSES

    stages = []
    finals = []
    for k in range(1, _BPE_MERGES + 1):
        prev = f"w{k - 1}"
        repl = "repr"
        for _ in range(REPLACE_PASSES):
            repl = f"replace({repl}, ' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' ')"
        stages.append(f"""
p{k} AS (
  SELECT pair, SUM(freq) AS cnt FROM (
    SELECT freq, s[i] || ' ' || s[i + 1] AS pair
    FROM (SELECT freq, string_split(trim(repr), ' ') AS s FROM {prev}),
         UNNEST(generate_series(1, len(s) - 1)) AS t(i)
    WHERE len(s) >= 2
  ) GROUP BY 1
),
b{k} AS (SELECT pair, cnt FROM p{k} ORDER BY cnt DESC, pair LIMIT 1),
w{k} AS (
  SELECT w, freq, {repl} AS repr
  FROM {prev} CROSS JOIN b{k}
)""")
        finals.append(
            f"SELECT {k} AS step, split_part(pair, ' ', 1) AS merge_left, "
            f"split_part(pair, ' ', 2) AS merge_right, cnt::BIGINT AS pair_count FROM b{k}"
        )
    return stages, finals


def _bpe_vocab_ctes(stages: list[str]) -> str:
    """The shared WITH prefix: corpus wordcount → char-split w0 → the
    unrolled merge stages (the final vocab is ``w{_BPE_MERGES}``)."""
    return f"""
WITH words AS (
  SELECT tok AS w, COUNT(*) AS freq
  FROM (SELECT UNNEST({_duck_tokens()}) AS tok FROM documents)
  GROUP BY 1
),
w0 AS (
  SELECT w, freq, ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS repr
  FROM words
),{','.join(stages)}"""


def _bpe_oracle() -> str:
    stages, finals = _bpe_stages()
    return f"""
{_bpe_vocab_ctes(stages)}
{' UNION ALL '.join(finals)}
"""


QUERIES["text_bpe_merges"] = (text_bpe_merges, _bpe_oracle())


# -- BPE encoding (apply trained merges to the corpus) -------------------------


def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE piece counts under the trained vocabulary —
    encoding via the vocab join, never per-token application (see
    operators/tokenizer.py: bpe_encode_counts)."""
    from bruin_spark.operators.tokenizer import bpe_encode_counts

    return bpe_encode_counts(_docs(spark, sf_dir), n_merges=_BPE_MERGES)


def _bpe_encode_oracle() -> str:
    stages, _ = _bpe_stages()
    return f"""
{_bpe_vocab_ctes(stages)},
pieces AS (
  SELECT w, len(string_split(trim(repr), ' ')) AS n_pieces FROM w{_BPE_MERGES}
),
doc_words AS (
  SELECT doc_id, tok AS w, COUNT(*) AS cnt
  FROM (SELECT doc_id, UNNEST({_duck_tokens()}) AS tok FROM documents)
  GROUP BY 1, 2
)
SELECT doc_id,
       SUM(cnt)::BIGINT AS n_words,
       SUM(cnt * n_pieces)::BIGINT AS n_bpe_tokens
FROM doc_words JOIN pieces USING (w)
GROUP BY 1
"""


QUERIES["text_bpe_encode"] = (text_bpe_encode, _bpe_encode_oracle())


# -- bigram-LM perplexity scoring (CCNet-style quality signal) ------------------

_LM_TOP_V = 16
_LM_ALPHA = 0.5


def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-alpha bigram-LM document scoring with a pruned (top-16)
    vocabulary — tail tokens train and score as '<unk>' (the CCNet
    quality-filter shape; see operators/lm.py)."""
    from bruin_spark.operators.lm import bigram_lm_scores

    return bigram_lm_scores(
        _docs(spark, sf_dir), alpha=_LM_ALPHA, top_v=_LM_TOP_V
    )


def _lm_ctes() -> str:
    """The bigram-LM scoring CTE chain (vocab prune -> model counts ->
    per-doc scores), shared by the perplexity entry and the CCNet
    bucket entry."""
    toks = _duck_tokens()
    return f"""base AS (
  SELECT doc_id, {toks} AS t FROM documents
), rawtoks AS (
  SELECT UNNEST(t) AS w FROM base
), vocab AS (
  SELECT w FROM (SELECT w, COUNT(*) AS c FROM rawtoks GROUP BY 1)
  ORDER BY c DESC, w ASC LIMIT {_LM_TOP_V}
), mtoks AS (
  SELECT COALESCE(v.w, '<unk>') AS w
  FROM rawtoks t LEFT JOIN vocab v ON t.w = v.w
), unigrams AS (
  SELECT w, COUNT(*) AS c_a FROM mtoks GROUP BY 1
), vsize AS (
  SELECT COUNT(*) AS v FROM unigrams
), rawpairs AS (
  SELECT doc_id, t[i] AS a0, t[i + 1] AS b0
  FROM base, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
), mpairs AS (
  SELECT doc_id, COALESCE(va.w, '<unk>') AS a, COALESCE(vb.w, '<unk>') AS b
  FROM rawpairs p
  LEFT JOIN vocab va ON p.a0 = va.w
  LEFT JOIN vocab vb ON p.b0 = vb.w
), doc_pairs AS (
  SELECT doc_id, a, b, COUNT(*) AS k FROM mpairs GROUP BY 1, 2, 3
), bigrams AS (
  SELECT a, b, SUM(k) AS c_ab FROM doc_pairs GROUP BY 1, 2
), scored AS (
  SELECT doc_id,
         SUM(k) AS n_bigrams,
         SUM(k * ln((c_ab + {_LM_ALPHA}) / (c_a + {_LM_ALPHA} * v))) / SUM(k) AS avg0
  FROM doc_pairs
  JOIN bigrams USING (a, b)
  JOIN unigrams u ON doc_pairs.a = u.w
  CROSS JOIN vsize
  GROUP BY 1
)"""


def _lm_oracle() -> str:
    return f"""
WITH {_lm_ctes()}
SELECT d.doc_id,
       COALESCE(s.n_bigrams, 0)::BIGINT AS n_bigrams,
       ROUND(s.avg0, 6) AS avg_logprob,
       ROUND(exp(-s.avg0), 6) AS perplexity
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


QUERIES["text_lm_perplexity"] = (text_lm_perplexity, _lm_oracle())


# -- CCNet perplexity buckets ---------------------------------------------------


def text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bruin_spark.operators.lm import perplexity_buckets

    return perplexity_buckets(
        _docs(spark, sf_dir), n_buckets=3, alpha=_LM_ALPHA, top_v=_LM_TOP_V
    )


def _ccnet_oracle() -> str:
    return f"""
WITH {_lm_ctes()},
ranked AS (
  SELECT d.doc_id, d.lang, ROUND(exp(-s.avg0), 6) AS perplexity
  FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
),
buckets AS (
  SELECT doc_id,
         NTILE(3) OVER (PARTITION BY lang ORDER BY perplexity, doc_id)::INT AS ppl_bucket
  FROM ranked WHERE perplexity IS NOT NULL
)
SELECT r.doc_id, r.lang, r.perplexity, b.ppl_bucket,
       CASE WHEN b.ppl_bucket IS NULL THEN NULL
            WHEN b.ppl_bucket = 1 THEN 'head'
            WHEN b.ppl_bucket = 3 THEN 'tail'
            ELSE 'middle' END AS ppl_band
FROM ranked r LEFT JOIN buckets b USING (doc_id)
"""


QUERIES["text_ccnet_buckets"] = (text_ccnet_buckets, _ccnet_oracle())


def text_ccnet_buckets_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB bucketing path: per-language percentile_approx
    thresholds (one GK-sketch row per language, broadcast back) +
    map-only bucket assignment — NO window sort anywhere in the plan
    (tests/test_lm.py asserts it).  Oracle-able because Spark's
    percentile_approx at accuracy >> n returns exactly DuckDB's
    quantile_disc element for each requested fraction."""
    from bruin_spark.operators.lm import perplexity_buckets

    return perplexity_buckets(
        _docs(spark, sf_dir),
        n_buckets=3,
        alpha=_LM_ALPHA,
        top_v=_LM_TOP_V,
        approx=True,
    )


def _ccnet_approx_oracle() -> str:
    return f"""
WITH {_lm_ctes()},
ranked AS (
  SELECT d.doc_id, d.lang, ROUND(exp(-s.avg0), 6) AS perplexity
  FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
),
thresholds AS (
  SELECT lang, quantile_disc(perplexity, [1.0/3, 2.0/3]) AS thr
  FROM ranked WHERE perplexity IS NOT NULL GROUP BY lang
)
SELECT r.doc_id, r.lang, r.perplexity,
       CASE WHEN r.perplexity IS NULL THEN NULL
            ELSE (1 + CASE WHEN r.perplexity > thr[1] THEN 1 ELSE 0 END
                    + CASE WHEN r.perplexity > thr[2] THEN 1 ELSE 0 END)::INT
       END AS ppl_bucket,
       CASE WHEN r.perplexity IS NULL THEN NULL
            WHEN r.perplexity <= thr[1] THEN 'head'
            WHEN r.perplexity > thr[2] THEN 'tail'
            ELSE 'middle' END AS ppl_band
FROM ranked r LEFT JOIN thresholds t ON r.lang IS NOT DISTINCT FROM t.lang
"""


QUERIES["text_ccnet_buckets_approx"] = (
    text_ccnet_buckets_approx,
    _ccnet_approx_oracle(),
)

# -- corpus top n-grams ------------------------------------------------------------

TOPNGRAM_N = 3
TOPNGRAM_K = 20


def text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus trigrams with occurrence and distinct-doc counts
    (boilerplate discovery / vocab probe)."""
    return T.top_ngrams(_docs(spark, sf_dir), n=TOPNGRAM_N, k=TOPNGRAM_K)


def _top_ngrams_oracle() -> str:
    n, k = TOPNGRAM_N, TOPNGRAM_K
    toks = "string_split_regex(lower(trim(text)), '\\s+')"
    return f"""
WITH toks AS (
  SELECT doc_id, {toks} AS t FROM documents WHERE text IS NOT NULL
), grams AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {n}
         THEN [array_to_string(list_slice(t, i, i + {n - 1}), ' ')
               FOR i IN generate_series(1, len(t) - {n - 1})]
         ELSE [array_to_string(t, ' ')]
         END AS gs
  FROM toks
), g AS (
  SELECT doc_id, UNNEST(gs) AS ngram FROM grams
)
SELECT ngram, COUNT(*)::BIGINT AS occurrences,
       COUNT(DISTINCT doc_id)::BIGINT AS n_docs
FROM g
GROUP BY ngram
ORDER BY occurrences DESC, ngram ASC
LIMIT {k}
"""


QUERIES["text_top_ngrams"] = (text_top_ngrams, _top_ngrams_oracle())


# -- per-language TF-IDF characteristic terms -----------------------------------

_TFIDF_K = 10


def text_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 TF-IDF terms per language — group-characteristic
    vocabulary (see operators/text.py: tfidf_top_terms)."""
    return T.tfidf_top_terms(_docs(spark, sf_dir), group_col="lang", k=_TFIDF_K)


def _tfidf_oracle() -> str:
    return f"""
WITH base AS (
  SELECT lang AS grp, doc_id AS id, tok AS term, COUNT(*) AS cnt
  FROM (
    SELECT lang, doc_id, UNNEST({_duck_tokens()}) AS tok
    FROM documents WHERE text IS NOT NULL
  )
  GROUP BY 1, 2, 3
), tf AS (
  SELECT grp, term, SUM(cnt)::BIGINT AS tf FROM base GROUP BY 1, 2
), dfreq AS (
  SELECT term, COUNT(*)::BIGINT AS df_docs FROM base GROUP BY 1
), n AS (
  SELECT COUNT(*)::DOUBLE AS n_docs FROM documents
), scored AS (
  SELECT grp, term, tf, df_docs, tf * ln(n_docs / df_docs) AS s
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
), ranked AS (
  SELECT grp, term, tf, df_docs, s,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY s DESC, term ASC) AS rank
  FROM scored
)
SELECT grp AS lang, term, tf, df_docs, ROUND(s, 6) AS tfidf, rank::INT AS rank
FROM ranked WHERE rank <= {_TFIDF_K}
"""


QUERIES["text_tfidf_terms"] = (text_tfidf_terms, _tfidf_oracle())


# -- mixed-language segment analysis ---------------------------------------------

_LANGSEG_TOKENS = 16


def text_lang_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document majority language + language purity over token-window
    segments — the code-switching signal (see operators/text.py:
    language_segments)."""
    return T.language_segments(_docs(spark, sf_dir), seg_tokens=_LANGSEG_TOKENS)


def _lang_segments_oracle() -> str:
    n = _LANGSEG_TOKENS
    score_cols = []
    for lang in T.LANGS:
        words = ", ".join(f"'{w}'" for w in T.STOPWORDS[lang])
        score_cols.append(
            f"len(list_filter(string_split_regex(lower(trim(seg)), '\\s+'), t -> t IN ({words}))) AS s_{lang}"
        )
    greatest = "GREATEST(" + ", ".join(f"s_{lang}" for lang in T.LANGS) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{lang} >= {greatest} THEN '{lang}'" for lang in T.LANGS
    ) + " END"
    return f"""
WITH toks AS (
  SELECT doc_id, {_duck_tokens()} AS t FROM documents
), segs AS (
  SELECT doc_id,
         array_to_string(list_slice(t, s + 1, least(s + {n}, len(t))), ' ') AS seg
  FROM toks, LATERAL (
    SELECT UNNEST(generate_series(0, greatest(len(t) - 1, 0), {n})) AS s
  )
), scored AS (
  SELECT doc_id, {case} AS seg_lang
  FROM (SELECT doc_id, {', '.join(score_cols)} FROM segs)
), counts AS (
  SELECT doc_id, seg_lang, COUNT(*) AS cnt FROM scored GROUP BY 1, 2
), ranked AS (
  SELECT doc_id, seg_lang, cnt,
         SUM(cnt) OVER (PARTITION BY doc_id) AS n_segments,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, seg_lang ASC) AS rn
  FROM counts
)
SELECT doc_id,
       n_segments::BIGINT AS n_segments,
       seg_lang AS majority_lang,
       cnt::BIGINT AS n_majority_segments,
       ROUND(cnt / n_segments, 6) AS lang_purity
FROM ranked WHERE rn = 1
"""


QUERIES["text_lang_segments"] = (text_lang_segments, _lang_segments_oracle())


# -- Gopher quality rules ------------------------------------------------------


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.gopher_rules(_docs(spark, sf_dir), min_words=5)


def _gopher_oracle() -> str:
    toks = _duck_tokens()
    stop = " + ".join(
        f"list_contains(toks, '{w}')::INT" for w in T.GOPHER_STOPWORDS
    )
    return f"""
WITH base AS (
  SELECT doc_id, text,
         {toks} AS toks,
         string_split_regex(text, '\r?\n') AS lines
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         GREATEST(len(toks), 1)::DOUBLE AS words_d,
         GREATEST(len(lines), 1)::DOUBLE AS lines_d,
         length(regexp_replace(lower(trim(text)), '\\s+', '', 'g')) AS nonspace,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         (length(text) - length(replace(text, '...', ''))) / 3 AS n_ellipsis,
         len(list_filter(lines, l -> regexp_matches(ltrim(l), '^[-*•]'))) AS n_bullet,
         len(list_filter(lines, l -> regexp_matches(rtrim(l), '\\.\\.\\.\\z'))) AS n_ell_lines,
         len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS n_alpha,
         {stop} AS stop_hits
  FROM base
)
SELECT doc_id, n_words,
       round(nonspace / words_d, 6) AS mean_word_len,
       round(GREATEST(n_hash, n_ellipsis) / words_d, 6) AS symbol_ratio,
       round(n_bullet / lines_d, 6) AS bullet_line_frac,
       round(n_ell_lines / lines_d, 6) AS ellipsis_line_frac,
       round(n_alpha / words_d, 6) AS alpha_word_frac,
       stop_hits,
       n_words BETWEEN 5 AND 100000 AS rule_word_count,
       nonspace / words_d BETWEEN 3.0 AND 10.0 AS rule_word_length,
       GREATEST(n_hash, n_ellipsis) / words_d <= 0.1 AS rule_symbol_ratio,
       n_bullet / lines_d <= 0.9 AS rule_bullets,
       n_ell_lines / lines_d <= 0.3 AS rule_ellipsis,
       n_alpha / words_d >= 0.8 AS rule_alpha_words,
       stop_hits >= 2 AS rule_stopwords,
       (n_words BETWEEN 5 AND 100000)
         AND (nonspace / words_d BETWEEN 3.0 AND 10.0)
         AND (GREATEST(n_hash, n_ellipsis) / words_d <= 0.1)
         AND (n_bullet / lines_d <= 0.9)
         AND (n_ell_lines / lines_d <= 0.3)
         AND (n_alpha / words_d >= 0.8)
         AND (stop_hits >= 2) AS gopher_pass
FROM m
"""


QUERIES["text_gopher_rules"] = (text_gopher_rules, _gopher_oracle())


# -- DSIR importance weights ---------------------------------------------------


def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bruin_spark.operators.dsir import dsir_weights

    return dsir_weights(_docs(spark, sf_dir), target=F.col("lang") == "en", n_buckets=64)


def _dsir_oracle(n_buckets: int = 64) -> str:
    toks = _duck_tokens()
    h = "('0x' || substr(md5(f), 1, 15))::BIGINT % {b}".format(b=n_buckets)
    return f"""
WITH base AS (
  SELECT doc_id, lang = 'en' AS is_target, {toks} AS t FROM documents
), uni AS (
  SELECT doc_id, is_target, tok AS f FROM base, LATERAL (SELECT UNNEST(t) AS tok)
), bi AS (
  SELECT doc_id, is_target, t[i] || ' ' || t[i + 1] AS f
  FROM base, LATERAL (SELECT UNNEST(generate_series(1, len(t) - 1)) AS i)
  WHERE len(t) >= 2
), feats AS (
  SELECT doc_id, is_target, {h} AS bucket FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
), doc_feats AS (
  SELECT doc_id, is_target, bucket, COUNT(*) AS k
  FROM feats GROUP BY doc_id, is_target, bucket
), buckets AS (
  SELECT bucket,
         SUM(CASE WHEN NOT is_target THEN k ELSE 0 END) AS c_raw,
         SUM(CASE WHEN is_target THEN k ELSE 0 END) AS c_tgt
  FROM doc_feats GROUP BY bucket
), totals AS (
  SELECT SUM(c_raw) AS t_raw, SUM(c_tgt) AS t_tgt FROM buckets
), weights AS (
  SELECT bucket,
         ln(((c_tgt + 1) / (t_tgt + {n_buckets})) / ((c_raw + 1) / (t_raw + {n_buckets}))) AS w
  FROM buckets, totals
), scored AS (
  SELECT doc_id, SUM(k) AS n_feats, SUM(k * w) AS lw
  FROM doc_feats JOIN weights USING (bucket)
  GROUP BY doc_id
)
SELECT d.doc_id, d.lang = 'en' AS is_target,
       COALESCE(s.n_feats, 0)::BIGINT AS n_feats,
       round(s.lw, 6) AS log_weight
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


QUERIES["text_dsir_weights"] = (text_dsir_weights, _dsir_oracle())


# -- C4 / RefinedWeb line filters -----------------------------------------------


def text_line_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.line_filters(_docs(spark, sf_dir), min_line_words=3, min_kept_lines=1)


def _line_kept_expr(min_line_words: int, max_upper_frac: float) -> str:
    """DuckDB list expression for C4-kept lines (mirrors
    operators/text.py line_filters' per-line predicate)."""
    return (
        "list_filter(string_split_regex(text, '\\r?\\n'), l -> "
        f"len(string_split_regex(trim(l), '\\s+')) >= {min_line_words} "
        "AND regexp_matches(rtrim(l), '[.!?\"]\\z') "
        "AND NOT contains(lower(l), 'javascript') "
        "AND length(regexp_replace(l, '[^A-Z]', '', 'g')) <= "
        f"{max_upper_frac} * length(l) "
        "AND NOT (trim(l) <> '' AND regexp_matches(trim(l), '^[0-9 .,%:-]+\\z')))"
    )


def _line_filters_oracle(
    min_line_words: int = 3,
    min_kept_lines: int = 1,
    max_upper_frac: float = 0.5,
) -> str:
    kept = _line_kept_expr(min_line_words, max_upper_frac)
    return f"""
WITH m AS (
  SELECT doc_id, text,
         len(string_split_regex(text, '\r?\n')) AS n_lines,
         {kept} AS kept
  FROM documents
)
SELECT doc_id, n_lines,
       len(kept) AS n_kept,
       round(len(kept) / GREATEST(n_lines, 1)::DOUBLE, 6) AS kept_frac,
       contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
       contains(text, '{{') AS has_brace,
       (NOT contains(lower(text), 'lorem ipsum')
         AND NOT contains(text, '{{')
         AND len(kept) >= {min_kept_lines}) AS keep_doc,
       COALESCE(array_to_string(kept, chr(10)), '') AS clean_text
FROM m
"""


QUERIES["text_line_filters"] = (text_line_filters, _line_filters_oracle())


# -- RefinedWeb end-to-end curation funnel --------------------------------------


def text_refinedweb_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The five published curation stages (Gopher rules, C4 line
    filters, CCNet LM perplexity band, repeated-segment boilerplate,
    duplicate-span mass) fused into one per-document decision table —
    operators/refinedweb.py; map-only stages share one corpus scan."""
    from bruin_spark.operators.refinedweb import refinedweb_funnel

    return refinedweb_funnel(_docs(spark, sf_dir), lm_top_v=_LM_TOP_V)


def text_refinedweb_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage attrition report of the RefinedWeb funnel: one row per
    stage with (n_in, n_dropped, n_out) under first-failure semantics."""
    from bruin_spark.operators.refinedweb import funnel_attrition, refinedweb_funnel

    return funnel_attrition(refinedweb_funnel(_docs(spark, sf_dir), lm_top_v=_LM_TOP_V))


def _refinedweb_flags_ctes() -> str:
    """CTE chain computing the five per-doc stage flags (shared by the
    funnel and attrition oracles).  Reuses the LM chain's tokenization
    (`base`), mirroring each Spark stage's published thresholds:
    gopher min_words=5, lines (3 words, 1 kept), lm tail band dropped
    (3 approx buckets), boilerplate (16-token segments, 3 docs, frac
    <= 0.5), spans (8-token windows, dup_ratio <= 0.5)."""
    from bruin_spark.workloads.dedup import BOILER_MIN_DOCS, SEG_TOKENS, SPAN_TOKENS

    stop = " + ".join(
        f"list_contains(toks, '{w}')::INT" for w in T.GOPHER_STOPWORDS
    )
    kept = _line_kept_expr(3, 0.5)
    w = SPAN_TOKENS
    dup_tok = f"CASE WHEN prev IS NULL THEN {w} ELSE least({w}, pos - prev) END"
    return f"""{_lm_ctes()},
ranked AS (
  SELECT d.doc_id, d.lang, ROUND(exp(-s.avg0), 6) AS perplexity
  FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
),
thresholds AS (
  SELECT lang, quantile_disc(perplexity, [1.0/3, 2.0/3]) AS thr
  FROM ranked WHERE perplexity IS NOT NULL GROUP BY lang
),
lmflag AS (
  SELECT r.doc_id, COALESCE(r.perplexity <= thr[2], FALSE) AS lm_pass
  FROM ranked r LEFT JOIN thresholds t ON r.lang IS NOT DISTINCT FROM t.lang
),
gbase AS (
  SELECT d.doc_id, d.text, b.t AS toks,
         string_split_regex(d.text, '\r?\n') AS lines
  FROM documents d JOIN base b ON d.doc_id = b.doc_id
),
gflag AS (
  SELECT doc_id,
         (len(toks) BETWEEN 5 AND 100000)
           AND (length(regexp_replace(lower(trim(text)), '\\s+', '', 'g'))
                / GREATEST(len(toks), 1)::DOUBLE BETWEEN 3.0 AND 10.0)
           AND (GREATEST(length(text) - length(replace(text, '#', '')),
                         (length(text) - length(replace(text, '...', ''))) / 3)
                / GREATEST(len(toks), 1)::DOUBLE <= 0.1)
           AND (len(list_filter(lines, l -> regexp_matches(ltrim(l), '^[-*•]')))
                / GREATEST(len(lines), 1)::DOUBLE <= 0.9)
           AND (len(list_filter(lines, l -> regexp_matches(rtrim(l), '\\.\\.\\.\\z')))
                / GREATEST(len(lines), 1)::DOUBLE <= 0.3)
           AND (len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                / GREATEST(len(toks), 1)::DOUBLE >= 0.8)
           AND ({stop} >= 2) AS gopher_pass
  FROM gbase
),
lnflag AS (
  SELECT doc_id,
         (NOT contains(lower(text), 'lorem ipsum')
           AND NOT contains(text, '{{')
           AND len({kept}) >= 1) AS line_pass
  FROM documents
),
rw_segs AS (
  SELECT doc_id,
         array_to_string(list_slice(t, s + 1, least(s + {SEG_TOKENS}, len(t))), ' ') AS seg
  FROM base, LATERAL (
    SELECT UNNEST(generate_series(0, greatest(len(t) - 1, 0), {SEG_TOKENS})) AS s
  )
),
rw_boiler AS (
  SELECT k FROM (SELECT DISTINCT md5(seg) AS k, doc_id FROM rw_segs)
  GROUP BY k HAVING COUNT(*) >= {BOILER_MIN_DOCS}
),
bflag AS (
  SELECT doc_id,
         (COUNT(*) FILTER (b.k IS NOT NULL)::DOUBLE
          / GREATEST(COUNT(*), 1) <= 0.5) AS boiler_pass
  FROM rw_segs s LEFT JOIN rw_boiler b ON md5(s.seg) = b.k
  GROUP BY doc_id
),
rw_wins AS (
  SELECT doc_id, len(t) AS total_tokens, i - 1 AS pos,
         ('0x' || substr(md5(array_to_string(list_slice(t, i, i + {w - 1}), ' ')), 1, 15))::BIGINT AS h
  FROM base, LATERAL (
    SELECT UNNEST(generate_series(1, len(t) - {w - 1})) AS i
  )
  WHERE len(t) >= {w}
),
rw_dup AS (
  SELECT h FROM rw_wins GROUP BY h HAVING COUNT(*) >= 2
),
rw_d AS (
  SELECT doc_id, total_tokens, pos,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM (SELECT w.* FROM rw_wins w JOIN rw_dup USING (h))
),
sflag AS (
  SELECT doc_id,
         (SUM({dup_tok})::DOUBLE / max(total_tokens) <= 0.5) AS span_pass
  FROM rw_d GROUP BY doc_id
),
rw_flags AS (
  SELECT d.doc_id, d.lang,
         g.gopher_pass, ln.line_pass, lm.lm_pass,
         COALESCE(b.boiler_pass, TRUE) AS boiler_pass,
         COALESCE(s.span_pass, TRUE) AS span_pass
  FROM documents d
  JOIN gflag g ON d.doc_id = g.doc_id
  JOIN lnflag ln ON d.doc_id = ln.doc_id
  JOIN lmflag lm ON d.doc_id = lm.doc_id
  LEFT JOIN bflag b ON d.doc_id = b.doc_id
  LEFT JOIN sflag s ON d.doc_id = s.doc_id
)"""


def _refinedweb_funnel_oracle() -> str:
    return f"""
WITH {_refinedweb_flags_ctes()}
SELECT doc_id, lang, gopher_pass, line_pass, lm_pass, boiler_pass, span_pass,
       (gopher_pass AND line_pass AND lm_pass AND boiler_pass AND span_pass) AS keep,
       CASE WHEN NOT gopher_pass THEN 'gopher'
            WHEN NOT line_pass THEN 'lines'
            WHEN NOT lm_pass THEN 'lm'
            WHEN NOT boiler_pass THEN 'boilerplate'
            WHEN NOT span_pass THEN 'spans'
            ELSE NULL END AS stage_failed
FROM rw_flags
"""


def _refinedweb_attrition_oracle() -> str:
    return f"""
WITH {_refinedweb_flags_ctes()},
agg AS (
  SELECT COUNT(*)::BIGINT AS n0,
         SUM(gopher_pass::INT)::BIGINT AS s1,
         SUM((gopher_pass AND line_pass)::INT)::BIGINT AS s2,
         SUM((gopher_pass AND line_pass AND lm_pass)::INT)::BIGINT AS s3,
         SUM((gopher_pass AND line_pass AND lm_pass AND boiler_pass)::INT)::BIGINT AS s4,
         SUM((gopher_pass AND line_pass AND lm_pass AND boiler_pass AND span_pass)::INT)::BIGINT AS s5
  FROM rw_flags
)
SELECT 1::INT AS stage_no, 'gopher' AS stage, n0 AS n_in, n0 - s1 AS n_dropped, s1 AS n_out FROM agg
UNION ALL SELECT 2, 'lines', s1, s1 - s2, s2 FROM agg
UNION ALL SELECT 3, 'lm', s2, s2 - s3, s3 FROM agg
UNION ALL SELECT 4, 'boilerplate', s3, s3 - s4, s4 FROM agg
UNION ALL SELECT 5, 'spans', s4, s4 - s5, s5 FROM agg
"""


QUERIES["text_refinedweb_funnel"] = (text_refinedweb_funnel, _refinedweb_funnel_oracle())
QUERIES["text_refinedweb_attrition"] = (
    text_refinedweb_attrition,
    _refinedweb_attrition_oracle(),
)


# -- URL filtering (RefinedWeb stage 1) -----------------------------------------
# The driver's documents table has no url column, so the workload plants
# deterministic urls derived from doc_id on BOTH engines (same pattern
# as text_pii_redact), then runs the operator over them.

_URL_BLOCKED = ("bad-site.com", "spam.example")
_URL_LONG_HOST = "a" * 70 + ".com"
_URL_DOMAINS = (
    "example.com",                 # clean
    "news.example.org",            # clean
    "forum.bad-site.com",          # blocklisted via parent suffix
    "xxx-casino.win",              # soft words: xxx + casino = 1.8
    "123456789012345.net",         # digit-heavy host
    "sub.portal.example.net",      # clean
    _URL_LONG_HOST,                # over-long host
)


def text_url_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    cases = F.when(d % 8 == 7, F.lit(None).cast("string"))
    for i, dom in enumerate(_URL_DOMAINS):
        cases = cases.when(
            d % 8 == i,
            F.concat(F.lit("https://"), F.lit(dom), F.lit("/page/"), d.cast("string")),
        )
    docs = _docs(spark, sf_dir).select("doc_id", cases.alias("url"))
    return T.url_filters(docs, blocked_domains=_URL_BLOCKED)


def _url_filters_oracle() -> str:
    dom_case = "CASE doc_id % 8 WHEN 7 THEN NULL " + " ".join(
        f"WHEN {i} THEN '{d}'" for i, d in enumerate(_URL_DOMAINS)
    ) + " END"
    soft = " + ".join(
        f"(CASE WHEN contains(lower(url), '{w}') THEN {wt} ELSE 0.0 END)"
        for w, wt in T.URL_SOFT_WORDS
    )
    blocked_list = ", ".join(f"'{b}'" for b in _URL_BLOCKED)
    # host dot-suffix set vs the blocklist (mirrors the Spark
    # array_intersect over array_join(slice(parts, i, n)))
    suffix_hit = (
        "len(list_intersect("
        "[array_to_string(list_slice(string_split(host, '.'), i, len(string_split(host, '.'))), '.') "
        "FOR i IN generate_series(1, len(string_split(host, '.')))], "
        f"[{blocked_list}])) > 0"
    )
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN ({dom_case}) IS NULL THEN NULL
              ELSE 'https://' || ({dom_case}) || '/page/' || CAST(doc_id AS VARCHAR)
         END AS url
  FROM documents
), h AS (
  SELECT doc_id, url,
         NULLIF(lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)), '') AS host
  FROM planted
), m AS (
  SELECT doc_id, url, host,
         CASE WHEN host IS NULL THEN TRUE ELSE ({suffix_hit}) END AS blocklisted,
         {soft} AS soft_score,
         COALESCE(length(regexp_replace(host, '[^0-9]', '', 'g'))
                  / GREATEST(length(host), 1)::DOUBLE, 1.0) AS digit_frac,
         length(regexp_replace(host, '[^0-9]', '', 'g'))
           / GREATEST(length(host), 1)::DOUBLE AS raw_digit_frac,
         length(host) AS host_len
  FROM h
)
SELECT doc_id, url, host, blocklisted,
       ROUND(soft_score, 6) AS soft_score,
       ROUND(digit_frac, 6) AS digit_frac,
       (NOT blocklisted AND soft_score <= 0.9
         AND COALESCE(raw_digit_frac <= 0.5 AND host_len <= 64, FALSE)) AS url_pass
FROM m
"""


QUERIES["text_url_filters"] = (text_url_filters, _url_filters_oracle())


# -- hashed linear quality classifier -------------------------------------------


def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped quality gate: closed-form bucket log-odds trained
    against the lang='en' subset, applied as a mean-pooled sigmoid
    score with a 0.5 keep threshold.  Fused train+score path
    (operators/classifier.py train_and_score): the featurization pass
    runs once and serves both halves — output identical to
    classifier_scores(docs, train_bucket_logodds(docs, ...))."""
    from bruin_spark.operators.classifier import train_and_score

    return train_and_score(
        _docs(spark, sf_dir), target=F.col("lang") == "en", n_buckets=64
    )


def _classifier_oracle(n_buckets: int = 64) -> str:
    toks = _duck_tokens()
    h = "('0x' || substr(md5(f), 1, 15))::BIGINT % {b}".format(b=n_buckets)
    return f"""
WITH base AS (
  SELECT doc_id, lang = 'en' AS is_target, {toks} AS t FROM documents
), uni AS (
  SELECT doc_id, is_target, tok AS f FROM base, LATERAL (SELECT UNNEST(t) AS tok)
), bi AS (
  SELECT doc_id, is_target, t[i] || ' ' || t[i + 1] AS f
  FROM base, LATERAL (SELECT UNNEST(generate_series(1, len(t) - 1)) AS i)
  WHERE len(t) >= 2
), feats AS (
  SELECT doc_id, is_target, {h} AS bucket FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
), buckets AS (
  SELECT bucket,
         SUM(CASE WHEN NOT is_target THEN 1 ELSE 0 END) AS c_raw,
         SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_tgt
  FROM feats GROUP BY bucket
), totals AS (
  SELECT SUM(c_raw) AS t_raw, SUM(c_tgt) AS t_tgt FROM buckets
), weights AS (
  SELECT bucket,
         ln(((c_tgt + 1) / (t_tgt + {n_buckets})) / ((c_raw + 1) / (t_raw + {n_buckets}))) AS w
  FROM buckets, totals
), doc_feats AS (
  SELECT doc_id, bucket, COUNT(*) AS k FROM feats GROUP BY doc_id, bucket
), scored AS (
  SELECT doc_id, SUM(k) AS n_feats, SUM(k * COALESCE(w, 0.0)) AS sw
  FROM doc_feats LEFT JOIN weights USING (bucket)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_feats, 0)::BIGINT AS n_feats,
       round(s.sw / s.n_feats, 6) AS logit,
       round(1.0 / (1.0 + exp(-(s.sw / s.n_feats))), 6) AS prob,
       (1.0 / (1.0 + exp(-(s.sw / s.n_feats))) >= 0.5) AS keep
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


QUERIES["text_quality_classifier"] = (text_quality_classifier, _classifier_oracle())


# -- BPE tokenization to id sequences -------------------------------------------


def text_bpe_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full tokenization: per-document BPE id sequences under the
    trained vocabulary (lexicographic piece ids) — the data-loader
    artifact (operators/tokenizer.py: bpe_encode_ids).

    The ORACLE projection flattens the id array to a space-joined
    string: the driver's canonicalization (pandas sort/hash) cannot
    factorize Python lists, so a raw ARRAY column errors in its
    harness (CORRECTNESS_r12 `TypeError: unhashable type: 'list'`).
    Users get the array from bpe_encode_ids directly; this entry
    carries the same information losslessly as `ids_str`."""
    from bruin_spark.operators.tokenizer import bpe_encode_ids

    return bpe_encode_ids(_docs(spark, sf_dir), n_merges=_BPE_MERGES).select(
        "doc_id",
        "n_ids",
        F.array_join(F.col("ids"), " ").alias("ids_str"),
    )


def _bpe_ids_oracle() -> str:
    stages, _ = _bpe_stages()
    return f"""
{_bpe_vocab_ctes(stages)},
word_pieces AS (
  SELECT w, string_split(trim(repr), ' ') AS ps FROM w{_BPE_MERGES}
),
vocab AS (
  SELECT piece, ROW_NUMBER() OVER (ORDER BY piece)::INT AS piece_id
  FROM (SELECT DISTINCT UNNEST(ps) AS piece FROM word_pieces)
),
word_ids AS (
  SELECT w, list(piece_id ORDER BY i) AS wids
  FROM (
    SELECT w, i, ps[i] AS piece
    FROM word_pieces, UNNEST(generate_series(1, len(ps))) AS t(i)
  ) JOIN vocab USING (piece)
  GROUP BY w
),
doc_words AS (
  SELECT doc_id, i AS pos, t[i] AS w
  FROM (SELECT doc_id, {_duck_tokens()} AS t FROM documents),
       UNNEST(generate_series(1, len(t))) AS g(i)
)
SELECT doc_id,
       len(flatten(list(wids ORDER BY pos)))::INT AS n_ids,
       COALESCE(array_to_string(flatten(list(wids ORDER BY pos)), ' '), '') AS ids_str
FROM doc_words JOIN word_ids USING (w)
GROUP BY doc_id
"""


QUERIES["text_bpe_ids"] = (text_bpe_ids, _bpe_ids_oracle())


# -- fuzzy (Jaccard) decontamination --------------------------------------------

_FUZZY_DECON_N = 3
_FUZZY_DECON_T = 0.2


def text_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paraphrase-robust decontamination: exact distinct-shingle Jaccard
    of every corpus doc against its best eval-set match (the eval side
    broadcasts; see operators/contamination.py fuzzy_contamination)."""
    from bruin_spark.operators.contamination import fuzzy_contamination

    docs = _docs(spark, sf_dir)
    is_test = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    return fuzzy_contamination(
        docs.filter(~is_test),
        docs.filter(is_test),
        n=_FUZZY_DECON_N,
        threshold=_FUZZY_DECON_T,
    )


def _fuzzy_decon_oracle() -> str:
    sh = f"list_distinct({_duck_shingles_all(_FUZZY_DECON_N)})"
    return f"""
WITH test AS (SELECT * FROM documents WHERE {_TEST_PRED}),
corpus AS (SELECT * FROM documents WHERE NOT ({_TEST_PRED})),
tsh AS (
  SELECT doc_id AS tid, len(s) AS tsize, UNNEST(s) AS shingle
  FROM (SELECT doc_id, {sh} AS s FROM test)
),
csh AS (
  SELECT doc_id AS cid, len(s) AS csize, UNNEST(s) AS shingle
  FROM (SELECT doc_id, {sh} AS s FROM corpus)
),
pair_stats AS (
  SELECT cid, tid,
         COUNT(*) AS common,
         ANY_VALUE(csize) AS csize,
         ANY_VALUE(tsize) AS tsize
  FROM csh JOIN tsh USING (shingle)
  GROUP BY cid, tid
),
ranked AS (
  SELECT cid, tid,
         common / (csize + tsize - common)::DOUBLE AS j,
         ROW_NUMBER() OVER (PARTITION BY cid
                            ORDER BY common / (csize + tsize - common)::DOUBLE DESC,
                                     tid ASC) AS rn
  FROM pair_stats
)
SELECT c.doc_id,
       r.tid AS best_eval_id,
       COALESCE(ROUND(r.j, 6), 0.0) AS max_jaccard,
       COALESCE(r.j, 0.0) >= {_FUZZY_DECON_T} AS contaminated_fuzzy
FROM corpus c LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r ON c.doc_id = r.cid
"""


QUERIES["text_decontaminate_fuzzy"] = (text_decontaminate_fuzzy, _fuzzy_decon_oracle())


# -- Gopher repetition rules (appendix A1.2) ------------------------------------


def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher repetition-removal table: duplicate-line fractions,
    top-{2,3,4}-gram char fractions, duplicate-{5..10}-gram char
    fractions (occurrence-weighted), paper thresholds, one unified
    explode + one wordcount-shaped shuffle (operators/text.py
    gopher_repetition_rules)."""
    return T.gopher_repetition_rules(_docs(spark, sf_dir))


def _gopher_rep_oracle() -> str:
    lines = "string_split_regex(text, '\\r?\\n')"
    streams = [
        f"SELECT doc_id, length(text) AS chars, 'line' AS kind, UNNEST({lines}) AS gram FROM documents"
    ] + [
        f"SELECT doc_id, length(text) AS chars, '{n}gram' AS kind, "
        f"UNNEST({_duck_shingles_all(n)}) AS gram FROM documents"
        for n in range(2, 11)
    ]
    union = "\nUNION ALL\n".join(streams)
    from bruin_spark.operators.text import GOPHER_REP_THRESHOLDS

    kv = lambda kind, col: f"MAX(CASE WHEN kind = '{kind}' THEN {col} END)"
    chars_d = "GREATEST(MAX(chars), 1)::DOUBLE"
    measures = {
        "dup_line_frac": f"({kv('line', 'n_occ')} - {kv('line', 'n_groups')})"
        f" / GREATEST({kv('line', 'n_occ')}, 1)::DOUBLE",
        "dup_line_char_frac": f"{kv('line', 'dup_char')} / {chars_d}",
    }
    for n in (2, 3, 4):
        measures[f"top_{n}gram_char_frac"] = f"{kv(f'{n}gram', 'top_char')} / {chars_d}"
    for n in range(5, 11):
        measures[f"dup_{n}gram_char_frac"] = f"{kv(f'{n}gram', 'dup_char')} / {chars_d}"
    meas_sql = ",\n       ".join(
        f"ROUND({expr}, 6) AS {name}" for name, expr in measures.items()
    )
    rules_sql = ",\n       ".join(
        f"({measures[name]}) <= {thr} AS rule_{name}"
        for name, thr in GOPHER_REP_THRESHOLDS
    )
    combined = " AND ".join(
        f"(({measures[name]}) <= {thr})" for name, thr in GOPHER_REP_THRESHOLDS
    )
    return f"""
WITH stream AS (
{union}
), grp AS (
  SELECT doc_id, kind, gram, COUNT(*) AS c, ANY_VALUE(chars) AS chars
  FROM stream GROUP BY doc_id, kind, gram
), per_kind AS (
  SELECT doc_id, kind,
         SUM(c) AS n_occ,
         COUNT(*) AS n_groups,
         MAX(c * length(gram)) AS top_char,
         SUM(CASE WHEN c >= 2 THEN c * length(gram) ELSE 0 END) AS dup_char,
         ANY_VALUE(chars) AS chars
  FROM grp GROUP BY doc_id, kind
)
SELECT doc_id,
       {meas_sql},
       {rules_sql},
       ({combined}) AS rep_pass
FROM per_kind
GROUP BY doc_id
"""


QUERIES["text_gopher_repetition"] = (text_gopher_repetition, _gopher_rep_oracle())


# -- readability + lexical diversity (Flesch, TTR) -------------------------------


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease (vowel-run syllable heuristic) +
    type-token ratio — one map-only JVM projection (operators/text.py
    readability_features)."""
    return T.readability_features(_docs(spark, sf_dir))


def _readability_oracle() -> str:
    toks = f"list_filter({_duck_tokens()}, t -> t <> '')"
    return f"""
SELECT doc_id,
       n_words::INT AS n_words,
       n_sentences::INT AS n_sentences,
       n_syllables::BIGINT AS n_syllables,
       ROUND(206.835 - 1.015 * (GREATEST(n_words, 1) / n_sentences)
             - 84.6 * (n_syllables / GREATEST(n_words, 1)), 6) AS flesch,
       ROUND(n_distinct / GREATEST(n_words, 1), 6) AS ttr
FROM (
  SELECT doc_id,
         len({toks}) AS n_words,
         GREATEST(len(list_filter(string_split_regex(text, '[.!?]+'),
                                   s -> trim(s) <> '')), 1) AS n_sentences,
         list_sum(list_prepend(0, list_transform({toks},
             w -> GREATEST(1, len(regexp_extract_all(w, '[aeiouy]+')))))) AS n_syllables,
         len(list_distinct({toks})) AS n_distinct
  FROM documents
)
"""


QUERIES["text_readability"] = (text_readability, _readability_oracle())


# -- per-domain curation stats ----------------------------------------------------


def text_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain KEEP/DOWN-WEIGHT report: counts, token volume, mean
    quality, exact-dup rate (operators/text.py domain_stats)."""
    return T.domain_stats(_docs(spark, sf_dir)).orderBy("domain")


def _domain_stats_oracle() -> str:
    en = ", ".join(f"'{w}'" for w in T.STOPWORDS["en"])
    toks = _duck_tokens()
    return f"""
WITH feat AS (
  SELECT source AS domain, lang,
         md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
         len({toks}) AS n_tokens_q,
         ROUND(
           LEAST(len({toks}) / 64.0, 1.0) * 0.5
           + (1.0 - LEAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                          / GREATEST(length(text), 1) * 4.0, 1.0)) * 0.3
           + LEAST(len(list_filter({toks}, t -> t IN ({en})))
                   / GREATEST(len({toks}), 1) * 5.0, 1.0) * 0.2,
         6) AS quality_score
  FROM documents
)
SELECT domain,
       COUNT(*)::BIGINT AS n_docs,
       COUNT(DISTINCT lang)::BIGINT AS n_langs,
       SUM(n_tokens_q)::BIGINT AS total_tokens,
       ROUND(AVG(quality_score), 6) AS avg_quality,
       ROUND(1.0 - COUNT(DISTINCT fp)::DOUBLE / COUNT(*), 6) AS dup_rate,
       ROUND(AVG(CASE WHEN quality_score >= 0.5 THEN 1.0 ELSE 0.0 END), 6) AS keep_rate
FROM feat
GROUP BY domain
ORDER BY domain
"""


QUERIES["text_domain_stats"] = (text_domain_stats, _domain_stats_oracle())


# -- stupid-backoff trigram LM scoring (Brants et al. 2007) ----------------------

_SB_TOP_V = 16
_SB_TRAIN = ("src0", "src1")


def text_lm_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram stupid-backoff scoring: model trained on the trusted
    slice (sources src0/src1 stand in for Wikipedia), applied to the
    whole corpus — unseen trigrams genuinely back off
    (operators/lm.py stupid_backoff_scores)."""
    from bruin_spark.operators.lm import stupid_backoff_scores

    return stupid_backoff_scores(
        _docs(spark, sf_dir),
        train_filter=F.col("source").isin(*_SB_TRAIN),
        top_v=_SB_TOP_V,
    )


def _sb_oracle() -> str:
    toks = _duck_tokens()
    srcs = ", ".join(f"'{s}'" for s in _SB_TRAIN)
    return f"""
WITH train AS (
  SELECT {toks} AS t FROM documents WHERE source IN ({srcs})
), train_toks AS (
  SELECT UNNEST(t) AS w FROM train
), vocab AS (
  SELECT w FROM (SELECT w, COUNT(*) AS c FROM train_toks GROUP BY 1)
  ORDER BY c DESC, w ASC LIMIT {_SB_TOP_V}
), uni AS (
  SELECT COALESCE(v.w, '<unk>') AS w, COUNT(*)::BIGINT AS c1
  FROM train_toks t LEFT JOIN vocab v ON t.w = v.w GROUP BY 1
), ntot AS (
  SELECT SUM(c1)::BIGINT AS n FROM uni
), tr_pairs AS (
  SELECT COALESCE(va.w, '<unk>') AS a, COALESCE(vb.w, '<unk>') AS b
  FROM (SELECT t[i] AS a0, t[i + 1] AS b0
        FROM train, UNNEST(generate_series(1, len(t) - 1)) AS g(i)) p
  LEFT JOIN vocab va ON p.a0 = va.w
  LEFT JOIN vocab vb ON p.b0 = vb.w
), bi AS (
  SELECT a, b, COUNT(*)::BIGINT AS c2 FROM tr_pairs GROUP BY 1, 2
), tr_tris AS (
  SELECT COALESCE(va.w, '<unk>') AS a, COALESCE(vb.w, '<unk>') AS b,
         COALESCE(vw.w, '<unk>') AS w
  FROM (SELECT t[i] AS a0, t[i + 1] AS b0, t[i + 2] AS w0
        FROM train, UNNEST(generate_series(1, len(t) - 2)) AS g(i)) p
  LEFT JOIN vocab va ON p.a0 = va.w
  LEFT JOIN vocab vb ON p.b0 = vb.w
  LEFT JOIN vocab vw ON p.w0 = vw.w
), tri AS (
  SELECT a, b, w, COUNT(*)::BIGINT AS c3 FROM tr_tris GROUP BY 1, 2, 3
), base AS (
  SELECT doc_id, {toks} AS t FROM documents
), doc_tris AS (
  SELECT doc_id, COALESCE(va.w, '<unk>') AS a, COALESCE(vb.w, '<unk>') AS b,
         COALESCE(vw.w, '<unk>') AS w, COUNT(*)::BIGINT AS k
  FROM (SELECT doc_id, t[i] AS a0, t[i + 1] AS b0, t[i + 2] AS w0
        FROM base, UNNEST(generate_series(1, len(t) - 2)) AS g(i)) p
  LEFT JOIN vocab va ON p.a0 = va.w
  LEFT JOIN vocab vb ON p.b0 = vb.w
  LEFT JOIN vocab vw ON p.w0 = vw.w
  GROUP BY 1, 2, 3, 4
), scored AS (
  SELECT doc_id,
         SUM(k) AS n_trigrams,
         SUM(CASE WHEN tri.c3 IS NOT NULL THEN k ELSE 0 END) AS n_tri_hits,
         SUM(CASE WHEN tri.c3 IS NULL AND bw.c2 IS NOT NULL THEN k ELSE 0 END) AS n_bi_hits,
         SUM(CASE WHEN tri.c3 IS NULL AND bw.c2 IS NULL THEN k ELSE 0 END) AS n_uni_hits,
         SUM(k * ln(CASE
             WHEN tri.c3 IS NOT NULL THEN tri.c3 / ab.c2
             WHEN bw.c2 IS NOT NULL THEN 0.4 * (bw.c2 / ub.c1)
             ELSE 0.4 * (0.4 * (uw.c1 / ntot.n)) END))
           / SUM(CASE WHEN (tri.c3 IS NOT NULL OR bw.c2 IS NOT NULL
                            OR uw.c1 IS NOT NULL) THEN k END) AS avg0
  FROM doc_tris d
  LEFT JOIN tri ON d.a = tri.a AND d.b = tri.b AND d.w = tri.w
  LEFT JOIN bi ab ON d.a = ab.a AND d.b = ab.b
  LEFT JOIN bi bw ON d.b = bw.a AND d.w = bw.b
  LEFT JOIN uni ub ON d.b = ub.w
  LEFT JOIN uni uw ON d.w = uw.w
  CROSS JOIN ntot
  GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(s.n_trigrams, 0)::BIGINT AS n_trigrams,
       COALESCE(s.n_tri_hits, 0)::BIGINT AS n_tri_hits,
       COALESCE(s.n_bi_hits, 0)::BIGINT AS n_bi_hits,
       COALESCE(s.n_uni_hits, 0)::BIGINT AS n_uni_hits,
       ROUND(s.avg0, 6) AS avg_logscore,
       ROUND(exp(-s.avg0), 6) AS score_ppl
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""


QUERIES["text_lm_stupid_backoff"] = (text_lm_stupid_backoff, _sb_oracle())


# -- tokenizer fertility by language ---------------------------------------------


def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language BPE fertility (tokens/word), chars/token, and
    single-piece word rate under the corpus-trained vocabulary
    (operators/tokenizer.py bpe_fertility_by_lang)."""
    from bruin_spark.operators.tokenizer import bpe_fertility_by_lang

    return bpe_fertility_by_lang(
        _docs(spark, sf_dir), n_merges=_BPE_MERGES
    ).orderBy("lang")


def _fertility_oracle() -> str:
    stages, _ = _bpe_stages()
    return f"""
{_bpe_vocab_ctes(stages)},
pieces AS (
  SELECT w, len(string_split(trim(repr), ' ')) AS n_pieces FROM w{_BPE_MERGES}
),
lang_words AS (
  SELECT lang, tok AS w, COUNT(*) AS cnt
  FROM (SELECT lang, UNNEST({_duck_tokens()}) AS tok FROM documents)
  GROUP BY 1, 2
)
SELECT lang,
       SUM(cnt)::BIGINT AS n_words,
       SUM(cnt * n_pieces)::BIGINT AS n_bpe_tokens,
       ROUND(SUM(cnt * n_pieces)::DOUBLE / SUM(cnt), 6) AS fertility,
       ROUND(SUM(cnt * length(w))::DOUBLE / SUM(cnt * n_pieces), 6) AS chars_per_token,
       ROUND(SUM(CASE WHEN n_pieces = 1 THEN cnt ELSE 0 END)::DOUBLE / SUM(cnt), 6)
         AS single_piece_rate
FROM lang_words JOIN pieces USING (w)
GROUP BY lang
ORDER BY lang
"""


QUERIES["text_tokenizer_fertility"] = (text_tokenizer_fertility, _fertility_oracle())


#: the FIXED external vocabulary under comparison: an English-bigram
#: merge list (the shape a candidate off-the-shelf tokenizer's first
#: merges take); 'th'+'e' depends on 't'+'h' — ordering is exercised
_FIXED_MERGES = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
    ("s", "t"),
]


def text_fertility_fixed_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language fertility under a FIXED externally supplied merge
    list (operators/tokenizer.py apply_bpe_merges) — the tokenizer-
    SELECTION workflow: score each candidate tokenizer's per-language
    equity on the corpus without training anything.  Same output schema
    as text_tokenizer_fertility, so the two reports diff column-wise."""
    from bruin_spark.operators.tokenizer import bpe_fertility_by_lang

    return bpe_fertility_by_lang(
        _docs(spark, sf_dir), merges=_FIXED_MERGES
    ).orderBy("lang")


def _fertility_fixed_oracle() -> str:
    from bruin_spark.operators.tokenizer import REPLACE_PASSES

    repl = "repr"
    for left, right in _FIXED_MERGES:
        for _ in range(REPLACE_PASSES):
            repl = f"replace({repl}, ' {left} {right} ', ' {left}{right} ')"
    return f"""
WITH words AS (
  SELECT tok AS w, COUNT(*) AS freq
  FROM (SELECT UNNEST({_duck_tokens()}) AS tok FROM documents)
  GROUP BY 1
),
applied AS (
  SELECT w, {repl} AS repr
  FROM (
    SELECT w, ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS repr
    FROM words
  )
),
pieces AS (
  SELECT w, len(string_split(trim(repr), ' ')) AS n_pieces FROM applied
),
lang_words AS (
  SELECT lang, tok AS w, COUNT(*) AS cnt
  FROM (SELECT lang, UNNEST({_duck_tokens()}) AS tok FROM documents)
  GROUP BY 1, 2
)
SELECT lang,
       SUM(cnt)::BIGINT AS n_words,
       SUM(cnt * n_pieces)::BIGINT AS n_bpe_tokens,
       ROUND(SUM(cnt * n_pieces)::DOUBLE / SUM(cnt), 6) AS fertility,
       ROUND(SUM(cnt * length(w))::DOUBLE / SUM(cnt * n_pieces), 6) AS chars_per_token,
       ROUND(SUM(CASE WHEN n_pieces = 1 THEN cnt ELSE 0 END)::DOUBLE / SUM(cnt), 6)
         AS single_piece_rate
FROM lang_words JOIN pieces USING (w)
GROUP BY lang
ORDER BY lang
"""


QUERIES["text_fertility_fixed_vocab"] = (
    text_fertility_fixed_vocab,
    _fertility_fixed_oracle(),
)


# -- hybrid retrieval: per-query BM25 + dense ANN fused by RRF -------------------

_HYB_K = 10       # fused depth, and each retriever's candidate depth
_HYB_QMOD = 100   # doc_id % 100 == 0 -> query set (aligned with vec_id)
_HYB_NTERMS = 3   # sparse query: the doc's top-3 tokens


def _hybrid_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse term queries derived from the query documents: each query
    doc's top-3 tokens by (count desc, token asc) — deterministic on
    both engines."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).filter(f"doc_id % {_HYB_QMOD} = 0")
    counts = (
        docs.select("doc_id", F.explode(T.tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("tok"))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _HYB_NTERMS)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("tok")).alias("terms"))
        .select(F.col("doc_id").alias("query_id"), "terms")
    )


def text_bm25_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched per-query BM25: every query doc's top-3 tokens scored
    against the corpus in ONE pass (operators/ranking.py
    bm25_multi_topk)."""
    from bruin_spark.operators.ranking import bm25_multi_topk

    return bm25_multi_topk(
        _docs(spark, sf_dir), _hybrid_queries(spark, sf_dir), top_k=_HYB_K
    )


def _bm25_multi_ctes() -> str:
    from bruin_spark.operators.ranking import B, K1

    toks = _duck_tokens()
    return f"""qcounts AS (
  SELECT doc_id, tok, COUNT(*) AS cnt
  FROM (SELECT doc_id, UNNEST({toks}) AS tok FROM documents
        WHERE doc_id % {_HYB_QMOD} = 0)
  GROUP BY 1, 2
), qterms AS (
  SELECT doc_id AS query_id, tok FROM (
    SELECT doc_id, tok,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tok) AS rn
    FROM qcounts
  ) WHERE rn <= {_HYB_NTERMS}
), alltoks AS (
  SELECT doc_id AS id, UNNEST({toks}) AS tok FROM documents
), lens AS (
  SELECT doc_id AS id, len({toks}) AS dl FROM documents
), g AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens
), tf AS (
  SELECT id, tok, COUNT(*) AS tf FROM alltoks
  WHERE tok IN (SELECT DISTINCT tok FROM qterms)
  GROUP BY 1, 2
), dft AS (
  SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
), sparse_scores AS (
  SELECT q.query_id, tf.id,
         ROUND(SUM(
           ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * tf * {K1 + 1.0}
           / (tf + {K1} * ({1.0 - B} + {B} * dl / avgdl))
         ), 6) AS bm25
  FROM tf
  JOIN qterms q ON tf.tok = q.tok
  JOIN dft ON tf.tok = dft.tok
  JOIN lens ON tf.id = lens.id
  CROSS JOIN g
  GROUP BY 1, 2
), sparse AS (
  SELECT query_id, id, bm25,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY bm25 DESC, id) AS rank
  FROM sparse_scores
)"""


def _bm25_multi_oracle() -> str:
    return f"""
WITH {_bm25_multi_ctes()}
SELECT query_id, id AS doc_id, bm25, rank::INT AS rank
FROM sparse WHERE rank <= {_HYB_K}
"""


QUERIES["text_bm25_multi"] = (text_bm25_multi, _bm25_multi_oracle())


def text_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: the sparse BM25 ranking and the dense cosine
    ranking (query doc's embedding, aligned ids) fused by
    reciprocal-rank fusion (operators/ranking.py rrf_fuse) — the
    standard RAG retrieval stack as one declarative plan."""
    import os

    from bruin_spark.operators.ranking import bm25_multi_topk, rrf_fuse
    from bruin_spark.operators.similarity import cosine_topk
    from bruin_spark.session import read_parquet

    docs = _docs(spark, sf_dir)
    sparse = bm25_multi_topk(docs, _hybrid_queries(spark, sf_dir), top_k=_HYB_K)
    emb = read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))
    qemb = emb.filter(f"vec_id % {_HYB_QMOD} = 0").withColumnRenamed(
        "vec_id", "query_id"
    )
    dense = cosine_topk(emb, qemb, k=_HYB_K).select(
        "query_id", F.col("nn_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([sparse, dense], top_k=_HYB_K)


def _hybrid_oracle() -> str:
    from bruin_spark.workloads.similarity import _DUCK_UNIT, _duck_dot

    return f"""
WITH {_bm25_multi_ctes()},
u AS (SELECT vec_id, {_DUCK_UNIT} AS uv FROM embeddings),
dense_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS id,
         ROUND({_duck_dot('q.uv', 'c.uv')}, 6) AS cosine
  FROM u q CROSS JOIN u c
  WHERE q.vec_id % {_HYB_QMOD} = 0
),
dense AS (
  SELECT query_id, id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank
  FROM dense_scored
),
unioned AS (
  SELECT query_id, id, rank FROM sparse WHERE rank <= {_HYB_K}
  UNION ALL
  SELECT query_id, id, rank FROM dense WHERE rank <= {_HYB_K}
),
fused AS (
  SELECT query_id, id, ROUND(SUM(1.0 / (60.0 + rank)), 6) AS rrf
  FROM unioned GROUP BY 1, 2
)
SELECT query_id, id AS doc_id, rrf, rank::INT AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, id) AS rank
  FROM fused
) WHERE rank <= {_HYB_K}
"""


QUERIES["text_hybrid_rrf"] = (text_hybrid_rrf, _hybrid_oracle())


# -- length-bucketed batching: padding waste --------------------------------------

_PAD_BOUNDS = (16, 32, 64, 128)


def text_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pad-token cost per length bucket under bucketed batching
    (operators/text.py padding_waste)."""
    return T.padding_waste(_docs(spark, sf_dir), boundaries=_PAD_BOUNDS).orderBy(
        "bucket_len"
    )


def _padding_oracle() -> str:
    bs = sorted(_PAD_BOUNDS)
    case = "CASE " + " ".join(
        f"WHEN n_toks <= {b} THEN {b}" for b in bs
    ) + f" ELSE {bs[-1]} END"
    return f"""
WITH base AS (
  SELECT {case} AS bucket_len,
         CASE WHEN n_toks > {bs[-1]} THEN 1 ELSE 0 END AS tr,
         LEAST(n_toks, {bs[-1]}) AS kept
  FROM (SELECT len({_duck_tokens()}) AS n_toks FROM documents)
)
SELECT bucket_len::INT AS bucket_len,
       COUNT(*)::BIGINT AS n_docs,
       SUM(tr)::BIGINT AS n_truncated,
       SUM(kept)::BIGINT AS total_tokens,
       SUM(bucket_len - kept)::BIGINT AS pad_tokens,
       ROUND(SUM(bucket_len - kept)::DOUBLE / (COUNT(*) * ANY_VALUE(bucket_len)), 6)
         AS pad_frac
FROM base
GROUP BY bucket_len
ORDER BY bucket_len
"""


QUERIES["text_padding_waste"] = (text_padding_waste, _padding_oracle())


# -- HTML main-content extraction (stage 0 of web curation) ----------------------

_HTML_MIN_CHARS = 25
_HTML_MAX_LD = 0.33


def _spark_doc_html(docs: DataFrame) -> DataFrame:
    """Wrap each document's text into a deterministic HTML page:
    entity-escaped paragraphs between a nav bar, a tracking script and
    a link-dense footer — the synthetic crawl fixture (testdata has no
    raw HTML; the templating is replayed verbatim by the oracle)."""
    esc = "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    paras = (
        f"array_join(transform(split({esc}, chr(10)), "
        "l -> concat('<p>', l, '</p>')), '')"
    )
    return docs.select(
        "doc_id",
        F.expr(
            "concat("
            "'<html><head><title>doc</title><style>p{margin:0}</style></head><body>',"
            "'<nav><a href=\"/\">Home</a> <a href=\"/about\">About us</a> "
            "<a href=\"/contact\">Contact</a></nav>',"
            f"{paras},"
            "'<script type=\"text/javascript\">var t = \"', cast(doc_id as string), '\";</script>',"
            "'<footer>(c) 2026 Example Corp <a href=\"/privacy\">Privacy</a> "
            "<a href=\"/terms\">Terms of service</a></footer>',"
            "'</body></html>')"
        ).alias("html"),
    )


def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction over synthetic crawl HTML built from the
    documents table (operators/html.py extract_main_content): nav bar,
    script and footer are boilerplate to drop; the entity-escaped
    paragraphs are the content to recover.  Map-only JVM projection —
    no shuffle, no UDF."""
    from bruin_spark.operators.html import extract_main_content

    pages = _spark_doc_html(_docs(spark, sf_dir))
    out = extract_main_content(
        pages,
        min_chars=_HTML_MIN_CHARS,
        max_link_density=_HTML_MAX_LD,
    )
    return out.select(
        "doc_id",
        "n_blocks",
        "n_kept",
        F.length("text").alias("extracted_chars"),
        "text",
    )


def _html_extract_oracle() -> str:
    from bruin_spark.operators.html import (
        BLOCK_TAG_RE,
        STRIP_REGIONS,
        _anchor_net_sql,
        _link_chars_sql,
        _plain_sql,
    )

    esc = "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    paras = (
        f"array_to_string([('<p>' || l || '</p>') FOR l IN string_split({esc}, chr(10))], '')"
    )
    html = (
        "'<html><head><title>doc</title><style>p{margin:0}</style></head><body>'"
        " || '<nav><a href=\"/\">Home</a> <a href=\"/about\">About us</a>"
        " <a href=\"/contact\">Contact</a></nav>'"
        f" || {paras}"
        " || '<script type=\"text/javascript\">var t = \"' || doc_id::VARCHAR || '\";</script>'"
        " || '<footer>(c) 2026 Example Corp <a href=\"/privacy\">Privacy</a>"
        " <a href=\"/terms\">Terms of service</a></footer>'"
        " || '</body></html>'"
    )
    cleaned = "html"
    for pat in STRIP_REGIONS:
        pat_sql = pat.replace("'", "''")
        cleaned = f"regexp_replace({cleaned}, '{pat_sql}', ' ', 'g')"
    block_re = BLOCK_TAG_RE.replace("'", "''")
    blocks = f"string_split(regexp_replace({cleaned}, '{block_re}', chr(30), 'g'), chr(30))"
    # the extractor's per-block scoring, replayed in DuckDB's dialect
    # (duck=True: 'g' flags, single-backslash \\s, array_to_string);
    # regexes are RE2-safe by construction (operators/html.py)
    plain = _plain_sql("b", duck=True)
    lc = _link_chars_sql("b", duck=True)
    net = _anchor_net_sql("b", duck=True)
    # anchor depth at block start: clamped prefix sum of per-block net
    # open/close anchor-tag counts (DuckDB's index lambda is 1-based);
    # lc = -1 is the in-anchor sentinel, resolved to tc in s2 —
    # mirroring operators/html.py exactly
    depth = "greatest(0, COALESCE(list_sum(list_slice(nets, 1, i - 1)), 0))"
    return f"""
WITH pages AS (
  SELECT doc_id, {html} AS html FROM documents
), bn AS (
  SELECT doc_id, blocks, list_transform(blocks, b -> {net}) AS nets
  FROM (SELECT doc_id, {blocks} AS blocks FROM pages)
), s1 AS (
  SELECT doc_id,
         list_transform(blocks, (b, i) -> {{'plain': {plain},
           'lc': CASE WHEN {depth} > 0 THEN -1 ELSE {lc} END}}) AS s1
  FROM bn
), s2 AS (
  SELECT doc_id,
         list_transform(s1, s -> {{'plain': s.plain,
                                   'tc': length(replace(s.plain, ' ', '')),
                                   'lc': CASE WHEN s.lc < 0
                                             THEN length(replace(s.plain, ' ', ''))
                                             ELSE s.lc END}}) AS s2
  FROM s1
), kept AS (
  SELECT doc_id, s2,
         list_filter(s2, s -> s.tc >= {_HTML_MIN_CHARS}
                          AND s.lc <= {_HTML_MAX_LD!r} * s.tc) AS k
  FROM s2
)
SELECT doc_id,
       len(list_filter(s2, s -> s.tc > 0))::BIGINT AS n_blocks,
       len(k)::BIGINT AS n_kept,
       length(COALESCE(array_to_string(list_transform(k, s -> s.plain), chr(10)), ''))::INT
         AS extracted_chars,
       COALESCE(array_to_string(list_transform(k, s -> s.plain), chr(10)), '') AS text
FROM kept
"""


QUERIES["text_html_extract"] = (text_html_extract, _html_extract_oracle())


# -- URL canonicalization + crawl-level URL dedup ---------------------------------


def _url_variants_expr() -> "F.Column":
    """Five deterministic raw spellings per target page (doc_id % 50):
    plain, uppercase-www-trailing-slash, default-port + tracking
    params, reordered real params, http + fragment — the first three
    collapse to one canonical URL; the last two form their own groups
    (different query / different scheme)."""
    d = F.col("doc_id")
    g = (d % 50).cast("string")
    # variant index must be INDEPENDENT of the page index: d % 5 would
    # equal (d % 50) % 5, giving every page a single spelling
    v = F.floor(d / 50) % 5
    base = F.concat(F.lit("https://example.org/article/"), g)
    return (
        F.when(v == 0, base)
        .when(
            v == 1,
            F.concat(F.lit("HTTPS://WWW.Example.ORG/article/"), g, F.lit("/")),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://example.org:443/article/"),
                g,
                F.lit("?utm_source=feed&utm_medium=rss&fbclid=xyz"),
            ),
        )
        .when(v == 3, F.concat(base, F.lit("?b=2&a=1")))
        .otherwise(
            F.concat(F.lit("http://example.org/article/"), g, F.lit("#section-2"))
        )
    )


def text_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-level URL dedup (operators/text.py url_dedup): canonical
    form collapses scheme/host case, www., default ports, trailing
    slashes, fragments, tracking params, and param order — the free
    first dedup stage every CommonCrawl-derived pipeline runs before
    any content hashing."""
    docs = _docs(spark, sf_dir).select("doc_id", _url_variants_expr().alias("url"))
    return T.url_dedup(docs)


def _url_dedup_oracle() -> str:
    variant = (
        "CASE (doc_id // 50) % 5 "
        "WHEN 0 THEN 'https://example.org/article/' || g "
        "WHEN 1 THEN 'HTTPS://WWW.Example.ORG/article/' || g || '/' "
        "WHEN 2 THEN 'https://example.org:443/article/' || g "
        "|| '?utm_source=feed&utm_medium=rss&fbclid=xyz' "
        "WHEN 3 THEN 'https://example.org/article/' || g || '?b=2&a=1' "
        "ELSE 'http://example.org/article/' || g || '#section-2' END"
    )
    from bruin_spark.operators.text import URL_TRACKING_PARAMS

    tracked = ", ".join(f"'{p}'" for p in URL_TRACKING_PARAMS)
    return f"""
WITH raw AS (
  SELECT doc_id, {variant} AS url
  FROM (SELECT doc_id, (doc_id % 50)::VARCHAR AS g FROM documents)
), p1 AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS after
  FROM raw
), p2 AS (
  SELECT *,
         regexp_replace(lower(regexp_extract(after, '^([^/?#]*)', 1)), '^www\\.', '') AS host0,
         regexp_extract(regexp_replace(after, '^[^/?#]*', ''), '^([^#]*)', 1) AS rest
  FROM p1
), p3 AS (
  SELECT *,
         CASE WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', '')
              WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
              ELSE host0 END AS host,
         regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', '') AS path0,
         regexp_extract(rest, '\\?(.*)', 1) AS query
  FROM p2
), p4 AS (
  SELECT *,
         CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
         COALESCE(array_to_string(list_sort(list_filter(
           string_split(query, '&'),
           p -> p <> '' AND NOT list_contains([{tracked}], lower(split_part(p, '=', 1)))
                AND NOT starts_with(lower(p), 'utm_')
         )), '&'), '') AS canon_q
  FROM p3
), canon AS (
  SELECT doc_id, url,
         CASE WHEN scheme = '' THEN NULL
              ELSE scheme || '://' || host || path ||
                   CASE WHEN canon_q = '' THEN '' ELSE '?' || canon_q END
         END AS canon_url
  FROM p4
)
SELECT canon_url,
       COUNT(*)::BIGINT AS group_size,
       COUNT(DISTINCT url)::BIGINT AS n_variants,
       MIN(doc_id) AS canonical_id
FROM canon
WHERE canon_url IS NOT NULL
GROUP BY canon_url
"""


QUERIES["text_url_dedup"] = (text_url_dedup, _url_dedup_oracle())

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


def _quality_oracle() -> str:
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
  FROM documents
)
"""


# -- fingerprint -----------------------------------------------------------------


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprint(_docs(spark, sf_dir)).select("doc_id", "doc_fingerprint")


FINGERPRINT_ORACLE = """
SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS doc_fingerprint
FROM documents
"""


QUERIES = {
    "text_token_count": (text_token_count, TOKEN_ORACLE),
    "text_language_id": (text_language_id, _lang_oracle()),
    "text_quality": (text_quality, _quality_oracle()),
    "text_fingerprint": (text_fingerprint, FINGERPRINT_ORACLE),
}

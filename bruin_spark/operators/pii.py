"""PII detection / redaction operators for training-data pipelines.

Map-only, built-in-expression operators (regexp_count / regexp_replace
run JVM-side inside whole-stage codegen): a 100 TB corpus scrub is one
scan with zero shuffles and zero Python.  The regex dialect is kept to
the portable common subset of Java regex and RE2 (no lookaround, no
backreferences) so the same patterns run on Spark, DuckDB, and most
warehouse engines — the workload oracles rely on this.

The reference has no PII machinery (closest is credential masking of
*log output*, pkg/mask/mask.go:16-45); this operator family is part of
the training-data-pipeline surface this engine adds on top of reference
parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Portable across Java regex + RE2 (DuckDB): character classes, bounded
# repetition, alternation only.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PHONE_RE = r"555-[0-9]{4}"  # NANP fictional-range shape used in tests/docs

PII_PATTERNS: dict[str, tuple[str, str]] = {
    # kind -> (pattern, replacement token); applied in this order, so
    # earlier redactions cannot create later matches (email first: its
    # dotted domain could otherwise be nibbled by the IP pattern).
    "email": (EMAIL_RE, "[EMAIL]"),
    "ip": (IPV4_RE, "[IP]"),
    "phone": (PHONE_RE, "[PHONE]"),
}


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document match counts for every PII kind (columns n_<kind>).

    Counts are taken against the ORIGINAL text, before any redaction, so
    they are independent of replacement order.
    """
    for kind, (pattern, _) in PII_PATTERNS.items():
        df = df.withColumn(f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pattern)))
    return df


def redact_pii(
    df: DataFrame, text_col: str = "text", out: str = "text_redacted"
) -> DataFrame:
    """Replace every PII match with its kind token ([EMAIL], [IP], ...).

    One chained regexp_replace projection — a single map-only pass.
    """
    col = F.col(text_col)
    for pattern, repl in PII_PATTERNS.values():
        col = F.regexp_replace(col, pattern, repl)
    return df.withColumn(out, col)

"""Column masking for ingestion: PII never lands in the warehouse.

Reference parity: ingestr assets collect masking rules from the asset's
``mask`` parameter and per-column ``mask:`` fields and pass them to
ingestr as repeated ``--mask column:method`` flags
(pkg/python/helper.go:138-176 appendIngestrMaskFlags; rule syntax
docs/assets/columns.md — an unqualified method is qualified with the
column name). Here the engine IS the loader, so the rules apply as
column expressions between the source read and the strategy write —
masking happens before any byte of the raw value is persisted.

Methods (all JVM-side built-ins, map-only):

- ``hash``   — sha256 hex (default PII method: stable join keys without
  the raw value)
- ``md5``    — md5 hex
- ``redact`` — the literal ``****``
- ``null``   — NULL out the column
- ``last4``  — ``****`` + final 4 characters (card/phone tails)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MASK_METHODS = ("hash", "md5", "redact", "null", "last4")


def collect_mask_rules(asset) -> list[tuple[str, str]]:
    """(column, method) rules from the asset's ``mask`` parameter and
    per-column ``mask:`` fields, deduplicated in declaration order; an
    unqualified per-column rule is qualified with the column's name
    (helper.go:144-160)."""
    rules: list[tuple[str, str]] = []
    seen: set[tuple[str, str]] = set()

    def add(rule: str, default_col: str = "") -> None:
        rule = rule.strip()
        if not rule:
            return
        if ":" in rule:
            col, _, method = rule.partition(":")
        else:
            col, method = default_col, rule
        col, method = col.strip(), method.strip().lower()
        if not col:
            # an unqualified asset-level rule has no column to attach to;
            # silently dropping it would leave PII unmasked
            raise ValueError(
                f"asset-level mask rule {rule!r} must be 'column:method'"
            )
        if method not in MASK_METHODS:
            raise ValueError(
                f"unknown mask method {method!r} for column {col!r}; "
                f"one of {', '.join(MASK_METHODS)}"
            )
        key = (col, method)
        if key not in seen:
            seen.add(key)
            rules.append(key)

    params = getattr(asset, "parameters", None) or {}
    raw = params.get("mask") or ""
    for rule in raw if isinstance(raw, list) else [raw]:
        add(str(rule))
    for c in getattr(asset, "columns", None) or []:
        mask = str(getattr(c, "mask", "") or "")
        if mask:
            add(mask, default_col=c.name)
    return rules


def apply_masks(df: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
    """Apply ``(column, method)`` rules; unknown columns error loudly
    (a silently-unmasked PII column is worse than a failed load)."""
    for col, method in rules:
        if col not in df.columns:
            raise ValueError(f"mask rule targets unknown column {col!r}")
        c = F.col(col).cast("string")
        if method == "hash":
            expr = F.sha2(c, 256)
        elif method == "md5":
            expr = F.md5(c)
        elif method == "redact":
            expr = F.when(c.isNotNull(), F.lit("****"))
        elif method == "null":
            expr = F.lit(None).cast(df.schema[col].dataType)
        elif method == "last4":
            expr = F.when(
                c.isNotNull(),
                F.concat(F.lit("****"), F.substring(c, -4, 4)),
            )
        else:  # pragma: no cover - collect_mask_rules validates
            raise ValueError(f"unknown mask method {method!r}")
        df = df.withColumn(col, expr)
    return df

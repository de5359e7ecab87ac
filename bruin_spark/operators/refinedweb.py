"""The full RefinedWeb-style curation pipeline as ONE fused funnel.

Composes the published web-curation stages end-to-end (Penedo et al.
2023 §3, with CCNet's LM quality band from Wenzek et al. 2020):

1. **gopher** — Rae et al. 2021 document-quality rules;
2. **lines**  — C4/RefinedWeb line-wise corrections (document drop
   rule);
3. **lm**     — corpus bigram-LM perplexity band: the 'tail' (least
   fluent third per language) is dropped;
4. **boilerplate** — CCNet repeated-segment rule: documents that are
   mostly corpus-frequent boilerplate are dropped;
5. **spans**  — exact duplicate-span mass (Lee et al. 2022): documents
   whose token mass is mostly duplicated elsewhere are dropped.

Every stage flag is evaluated INDEPENDENTLY per document (so one
threshold can be re-cut without recomputing the rest — same audit
discipline as operators/curation.py), while ``stage_failed``/``keep``
apply the funnel order above.

Plan shape (the part that matters at 100 TB):
- Stages 1+2 are map-only JVM expressions and are FUSED into one
  scan+projection: ``line_filters(..., keep_cols=(text,))`` carries the
  raw text through, and ``gopher_rules`` over that output collapses
  with it under Catalyst's project-collapsing — the corpus is read once
  for both stages (plan-asserted in tests/test_funnel_topngrams.py).
- Stage 3 uses ``perplexity_buckets(approx=True)``: per-language
  percentile thresholds, NO window sort (operators/lm.py).
- Stages 4/5 are the skew-safe aggregation shapes of
  ``strip_boilerplate`` / ``duplicate_spans`` (operators/dedup.py).
- Assembly is left joins on the document id — one shared key, so AQE
  plans/coalesces them together; no stage ever joins on text.

Reference parity: bruin stops at column-level quality checks
(pkg/ansisql/checks.go); this is the training-data curation surface
the engine adds on top (SURVEY.md §2 training-data extras).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bruin_spark.operators.dedup import duplicate_spans, strip_boilerplate
from bruin_spark.operators.lm import perplexity_buckets
from bruin_spark.operators.text import gopher_rules, line_filters

#: funnel order — ``stage_failed`` reports the FIRST failing stage
STAGES = ("gopher", "lines", "lm", "boilerplate", "spans")


def refinedweb_funnel(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    html_col: str | None = None,
    html_min_chars: int = 25,
    html_max_link_density: float = 0.33,
    gopher_min_words: int = 5,
    line_min_words: int = 3,
    line_min_kept: int = 1,
    n_ppl_buckets: int = 3,
    lm_alpha: float = 0.5,
    lm_top_v: int | None = None,
    seg_tokens: int = 16,
    boiler_min_docs: int = 3,
    max_boiler_frac: float = 0.5,
    span_tokens: int = 8,
    max_dup_ratio: float = 0.5,
) -> DataFrame:
    """Per-document curation decisions for the five-stage funnel.

    Returns ``(id_col, lang, gopher_pass, line_pass, lm_pass,
    boiler_pass, span_pass, keep, stage_failed)`` — one row per input
    document; ``stage_failed`` is the first failing stage name (NULL
    when ``keep``).  Unscorable documents (<2 tokens) fail ``lm``;
    documents absent from a side table (no segments / no dup spans)
    pass that stage by definition.

    With ``html_col`` set the input is raw crawl HTML: main-content
    extraction (operators/html.py) runs as stage 0 — ``text_col`` is
    DERIVED from the kept blocks, an ``extract_pass`` flag (at least
    one content block survived) leads the funnel order, and the output
    gains that column.  Extraction is map-only, so it fuses into the
    same single scan as stages 1+2.
    """
    extract_flag = None
    if html_col is not None:
        from bruin_spark.operators.html import extract_main_content

        extracted = extract_main_content(
            docs,
            html_col=html_col,
            id_col=id_col,
            min_chars=html_min_chars,
            max_link_density=html_max_link_density,
            keep_cols=(lang_col,),
        )
        extract_flag = F.col("_extract_pass")
        docs = extracted.select(
            F.col(id_col),
            F.col(lang_col),
            F.col("text").alias(text_col),
            (F.col("n_kept") > 0).alias("_extract_pass"),
        )
    # stages 1+2 (and stage 0 extraction, all map-only): one scan, one
    # fused projection
    carry = ("_extract_pass",) if extract_flag is not None else ()
    lf = line_filters(
        docs.select(
            F.col(id_col), F.col(text_col), F.col(lang_col), *[F.col(c) for c in carry]
        ),
        id_col=id_col,
        text_col=text_col,
        min_line_words=line_min_words,
        min_kept_lines=line_min_kept,
        keep_cols=(text_col, lang_col) + carry,
    )
    fused = gopher_rules(
        lf,
        id_col=id_col,
        text_col=text_col,
        min_words=gopher_min_words,
        keep_cols=("keep_doc", lang_col) + carry,
    ).select(
        F.col(id_col),
        F.col(lang_col).alias("lang"),
        F.col("gopher_pass"),
        F.col("keep_doc").alias("line_pass"),
        *[F.col(c) for c in carry],
    )

    lm = perplexity_buckets(
        docs,
        n_buckets=n_ppl_buckets,
        id_col=id_col,
        text_col=text_col,
        lang_col=lang_col,
        alpha=lm_alpha,
        top_v=lm_top_v,
        approx=True,
    ).select(id_col, "ppl_band")

    boiler = strip_boilerplate(
        docs, id_col=id_col, text_col=text_col,
        seg_tokens=seg_tokens, min_docs=boiler_min_docs,
    ).select(
        id_col,
        (
            F.col("n_boilerplate")
            / F.greatest(F.col("n_segments_total"), F.lit(1)).cast("double")
        ).alias("_boiler_frac"),
    )

    spans = duplicate_spans(
        docs, id_col=id_col, text_col=text_col, win_tokens=span_tokens
    ).select(id_col, F.col("dup_ratio").alias("_dup_ratio"))

    out = (
        fused.join(lm, id_col, "left")
        .join(boiler, id_col, "left")
        .join(spans, id_col, "left")
    )
    lm_pass = F.coalesce(F.col("ppl_band") != "tail", F.lit(False))
    boiler_pass = F.coalesce(F.col("_boiler_frac"), F.lit(0.0)) <= max_boiler_frac
    span_pass = F.coalesce(F.col("_dup_ratio"), F.lit(0.0)) <= max_dup_ratio
    flags = {
        "gopher": F.col("gopher_pass"),
        "lines": F.col("line_pass"),
        "lm": lm_pass,
        "boilerplate": boiler_pass,
        "spans": span_pass,
    }
    stages = STAGES
    flag_cols = []
    if extract_flag is not None:
        flags["extract"] = extract_flag
        stages = ("extract",) + STAGES
        flag_cols.append(flags["extract"].alias("extract_pass"))
    failed = F.lit(None).cast("string")
    for name in reversed(stages):
        failed = F.when(~flags[name], F.lit(name)).otherwise(failed)
    keep = None
    for name in stages:
        keep = flags[name] if keep is None else (keep & flags[name])
    return out.select(
        F.col(id_col),
        F.col("lang"),
        *flag_cols,
        flags["gopher"].alias("gopher_pass"),
        flags["lines"].alias("line_pass"),
        flags["lm"].alias("lm_pass"),
        flags["boilerplate"].alias("boiler_pass"),
        flags["spans"].alias("span_pass"),
        keep.alias("keep"),
        failed.alias("stage_failed"),
    )


def funnel_attrition(decisions: DataFrame) -> DataFrame:
    """Per-stage attrition report from :func:`refinedweb_funnel`'s
    output: one row per stage, funnel order, with the count entering
    the stage, dropped AT it (first-failure semantics), and surviving
    it.  One global aggregate over constant-width counters — the
    single-row reduce is O(stages), not O(corpus).
    """
    flag_col = {
        "extract": "extract_pass",
        "gopher": "gopher_pass",
        "lines": "line_pass",
        "lm": "lm_pass",
        "boilerplate": "boiler_pass",
        "spans": "span_pass",
    }
    stages = (
        ("extract",) + STAGES if "extract_pass" in decisions.columns else STAGES
    )
    aggs = [F.count(F.lit(1)).alias("_n0")]
    run = None
    for name in stages:
        c = F.col(flag_col[name])
        run = c if run is None else (run & c)
        aggs.append(F.sum(run.cast("long")).alias(f"_s_{name}"))
    totals = decisions.agg(*aggs)
    rows = []
    prev = F.col("_n0")
    for i, name in enumerate(stages):
        surv = F.col(f"_s_{name}")
        rows.append(
            F.struct(
                F.lit(i + 1).alias("stage_no"),
                F.lit(name).alias("stage"),
                prev.cast("long").alias("n_in"),
                (prev - surv).cast("long").alias("n_dropped"),
                surv.cast("long").alias("n_out"),
            )
        )
        prev = surv
    return totals.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.stage_no", "r.stage", "r.n_in", "r.n_dropped", "r.n_out"
    )

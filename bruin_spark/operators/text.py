"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting.

All expressions are Spark built-ins (split / filter / transform /
regexp_replace / md5) so they run JVM-side inside whole-stage codegen —
no Python in the hot path. Every operator has an exact cross-engine SQL
rendering (used by the DuckDB oracles in workloads/text.py), so results
are engine-independent and deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# deliberately small, fixed stopword sets — the *operator contract* is
# deterministic scoring, not linguistic accuracy; swap lists freely.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "que"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "it": ["il", "la", "di", "che", "e", "un", "per", "con", "del", "si"],
}
LANGS = list(STOPWORDS)


def tokens(text_col: str) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(tokens(text_col)))


def bpe_ish_token_count(df: DataFrame, text_col: str = "text", out: str = "n_subtokens") -> DataFrame:
    """Sub-word-ish token estimate: word-boundary pieces + digits split,
    a cheap stand-in for a BPE tokenizer's token count."""
    pieces = F.split(
        F.regexp_replace(F.lower(F.col(text_col)), r"([0-9])", r" $1 "), r"[^a-z0-9]+"
    )
    return df.withColumn(out, F.size(F.filter(pieces, lambda t: t != "")))


def stopword_hits(text_col: str, lang: str) -> Column:
    """How many tokens are stopwords of `lang` (duplicates counted)."""
    words = STOPWORDS[lang]
    lit_list = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"size(filter(split(lower(trim({text_col})), '\\\\s+'), t -> t IN ({lit_list})))"
    )


def language_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """n-gram/stopword-overlap language ID heuristic.

    Deterministic: ties resolve in fixed LANGS order. One projection, no
    shuffle; at 100 TB this is a map-only pass.
    """
    for lang in LANGS:
        df = df.withColumn(f"_s_{lang}", stopword_hits(text_col, lang))
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in LANGS])
    pick = None
    for lang in LANGS:
        cond = F.col(f"_s_{lang}") >= best
        pick = F.when(cond, F.lit(lang)) if pick is None else pick.when(cond, F.lit(lang))
    df = df.withColumn(out, pick)
    return df.drop(*[f"_s_{lang}" for lang in LANGS])


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + score.

    score ∈ [0,1]: rewards mid-length documents with low punctuation noise
    and a plausible stopword ratio (classic heuristic pre-filter shape).
    """
    n_chars = F.length(F.col(text_col))
    n_toks = F.size(tokens(text_col))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9\s]", ""))
    stop_en = stopword_hits(text_col, "en")
    df = (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_tokens_q", n_toks)
        .withColumn("punct_ratio", F.round(punct / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("stopword_ratio", F.round(stop_en / F.greatest(n_toks, F.lit(1)), 6))
        .withColumn(
            "avg_token_len",
            F.round(
                (n_chars - (n_toks - F.lit(1))) / F.greatest(n_toks, F.lit(1)), 6
            ),
        )
    )
    # score uses the RAW ratios (not the rounded output columns): rounding
    # first creates exact decimal midpoints whose final round() is
    # engine-dependent at the last digit
    raw_punct = punct / F.greatest(n_chars, F.lit(1))
    raw_stop = stop_en / F.greatest(n_toks, F.lit(1))
    length_term = F.least(F.col("n_tokens_q") / F.lit(64.0), F.lit(1.0))
    score = (
        length_term * F.lit(0.5)
        + (F.lit(1.0) - F.least(raw_punct * F.lit(4.0), F.lit(1.0))) * F.lit(0.3)
        + F.least(raw_stop * F.lit(5.0), F.lit(1.0)) * F.lit(0.2)
    )
    return df.withColumn("quality_score", F.round(score, 6))


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "doc_fingerprint") -> DataFrame:
    """Deterministic document fingerprint: md5 over the normalized text
    (lowercase, non-alphanumerics removed) — canonical-form hashing."""
    normalized = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]", "")
    return df.withColumn(out, F.md5(normalized))


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``top1_token_frac``: fraction of tokens that are the single most
      frequent token (boilerplate/spam indicator),
    - ``top_2gram_frac``: fraction of word 2-grams that are the most
      frequent 2-gram (repeated-phrase indicator).

    Plan shape: two wordcount-style aggregations (explode -> partial
    map-side count -> shuffle on (doc, gram) -> per-doc max/sum) joined
    back on the doc id.  The shuffled rows are (doc, gram, count) —
    proportional to distinct grams, with map-side combine absorbing the
    repetition itself, so heavy repetition makes this CHEAPER, not
    hotter.  All built-in expressions, no Python.
    """

    def _top_frac(gram_col: Column, out: str) -> DataFrame:
        return (
            df.select(F.col(id_col), F.explode(gram_col).alias("_g"))
            .groupBy(id_col, "_g")
            .agg(F.count(F.lit(1)).alias("_c"))
            .groupBy(id_col)
            .agg(
                F.round(F.max("_c") / F.sum("_c"), 6).alias(out)
            )
        )

    t1 = _top_frac(tokens(text_col), "top1_token_frac")
    t2 = _top_frac(shingles(text_col, 2), "top_2gram_frac")
    return df.join(t1, id_col, "left").join(t2, id_col, "left")


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into token-bounded chunks with overlap — the LLM
    context-window preprocessing step (chunk i starts at token
    ``i * (chunk_tokens - overlap)``).

    One output row per chunk: (..input cols.., chunk_idx, chunk_text,
    chunk_n_tokens).  Map-only: tokenization, the chunk-start sequence,
    and the slice+reassemble all run as built-in array expressions inside
    codegen — a 100 TB corpus chunks in a single scan with no shuffle
    and no Python.  Documents shorter than ``chunk_tokens`` yield exactly
    one chunk.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    # Bind the token array ONCE per row (single-element outer transform):
    # referencing tokens() inside the chunk lambda would re-tokenize the
    # document for every chunk (no CSE inside HOF lambdas — same
    # pathology fixed in shingles()).  Chunk starts: 0, stride,
    # 2*stride, ... while start < n_tokens; last chunk may be short but
    # is never empty.
    chunks = F.expr(
        f"""
        transform(array(split(lower(trim({text_col})), '\\\\s+')), toks ->
          transform(
            sequence(0, greatest(size(toks) - {overlap} - 1, 0), {stride}),
            s -> struct(
              s AS start,
              concat_ws(' ', slice(toks, s + 1, {chunk_tokens})) AS chunk_text,
              least({chunk_tokens}, size(toks) - s) AS chunk_n_tokens
            )
          )
        )[0]
        """
    )
    out = df.withColumn("_chunk", F.explode(chunks))
    return (
        out.withColumn("chunk_idx", (F.col("_chunk.start") / stride).cast("int"))
        .withColumn("chunk_text", F.col("_chunk.chunk_text"))
        .withColumn("chunk_n_tokens", F.col("_chunk.chunk_n_tokens"))
        .drop("_chunk")
    )


def assign_sequence_bins(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    n_buckets: int = 64,
    salt: str = "seqpack",
) -> DataFrame:
    """Assign documents to training-sequence bins of ~``budget`` tokens
    (the sequence-packing step before example serialization).

    Deterministic and engine-portable, unlike first-fit heuristics that
    depend on arrival order: documents are md5-hash-bucketed, ordered by
    id within their bucket, and ``bin = floor(running_tokens_before /
    budget)`` — the same doc always lands in the same (bucket, bin).
    A bin can overshoot the budget by at most one document, the same
    slack greedy packing accepts.  Plan: one shuffle on the bucket key;
    each bucket's running sum is an independent window, so parallelism
    is ``n_buckets`` regardless of corpus size — size n_buckets to the
    cluster (e.g. 10k+ at 100 TB), not to 64.
    """
    from pyspark.sql import Window

    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long") % n_buckets
    out = df.withColumn("seq_bucket", bucket.cast("int"))
    w = (
        Window.partitionBy("seq_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    running = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return out.withColumn("seq_bin", F.floor(running / budget).cast("int"))


def shingles(text_col: str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (distinct preserved later).

    Built from transform over a token-index sequence — all JVM-side.
    The regex tokenization is bound ONCE per row via a single-element
    outer transform (`toks` lambda variable): naively inlining
    ``split(...)`` at each use site re-tokenizes the document for every
    shingle index (higher-order-function lambdas get no common-
    subexpression elimination), which is O(words²) regex work per doc —
    measured 8-10× slower on real corpora.
    """
    return F.expr(
        f"""
        transform(array(split(lower(trim({text_col})), '\\\\s+')), toks ->
          CASE WHEN size(toks) >= {n}
          THEN transform(
            sequence(1, size(toks) - {n - 1}),
            i -> concat_ws(' ', slice(toks, i, {n}))
          )
          ELSE array(concat_ws(' ', toks))
          END
        )[0]
        """
    )


def top_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 20,
) -> DataFrame:
    """Top-k most frequent word n-grams corpus-wide, with total
    occurrences and distinct-document counts — the vocabulary /
    boilerplate-discovery probe that usually precedes dedup threshold
    tuning (a trigram in 40% of documents IS the boilerplate the
    segment/span dedup should strip).

    Plan (100 TB shape): shingling is map-only (one tokenization per
    row, see shingles()); the occurrence count is a map-side-combinable
    groupBy — a hot boilerplate n-gram collapses to partial counts
    before the shuffle; the distinct-doc count plans as Spark's
    standard two-phase distinct aggregate keyed (ngram, doc), so even
    the hot n-gram's rows spread over its doc ids rather than one
    reducer.  Top-k is orderBy+limit = TakeOrdered (per-partition heap,
    driver merges k rows), never a full sort.  Tiebreak (count desc,
    ngram asc) makes the k-set total-ordered and deterministic.
    """
    # NULL texts are excluded EXPLICITLY on both engines: Spark's
    # shingles(NULL) evaluates to [''] (one empty gram) while the
    # DuckDB oracle's list pipeline emits nothing for NULL — without
    # this filter a NULL-heavy corpus pushes a phantom '' gram into the
    # Spark top-k only (latent cross-engine divergence; empty-STRING
    # docs still count their '' gram identically on both sides)
    grams = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("id").alias("n_docs"),
        )
        .orderBy(F.desc("occurrences"), F.asc("ngram"))
        .limit(k)
    )


def tfidf_top_terms(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Top-k characteristic terms per group by TF-IDF — "what words
    define each language / domain / cluster" (corpus curation's
    mixture-inspection probe; pairs with top_ngrams, which finds
    corpus-GLOBAL boilerplate, where this finds group-SPECIFIC signal).

    score(t, g) = tf(t, g) * ln(N_docs / df_docs(t)): group term
    frequency damped by how corpus-universal the term is. Ties rank
    (score DESC, term ASC) so the k-set is deterministic cross-engine.

    Plan (100 TB shape): ONE corpus-scale shuffle — the exploded token
    stream pre-aggregates to (group, doc, term) rows map-side (a doc
    belongs to one group, so these rows are unique per (doc, term)
    and vocabulary-bounded per doc). Both statistics then derive from
    that table without touching the corpus again: tf sums counts per
    (group, term); df counts ROWS per term (= distinct docs, by
    uniqueness — no second distinct shuffle). N_docs is a single-row
    driver probe. The final rank windows over (group), a
    vocabulary-sized relation, never the corpus.

    Ref parity anchor: the reference has no corpus-statistics text
    analysis (SURVEY §2 training-data extension family).
    """
    from pyspark.sql import Window

    n_docs = df.count()  # scalar probe, stays JVM-side
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(group_col).alias("grp"),
            F.col(id_col).alias("id"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .groupBy("grp", "id", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from bruin_spark.checkpointing import materialize

    # base feeds both statistics INSIDE the single consuming job (tf and
    # dfreq join downstream), so the pin must be EAGER — a lazy
    # checkpoint is not yet materialized when both branches execute and
    # the corpus-scale aggregation would run twice in that job
    base = materialize(base, eager=True)
    tf = base.groupBy("grp", "term").agg(F.sum("cnt").alias("tf"))
    dfreq = base.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    idf = F.log(F.lit(float(n_docs)) / F.col("df_docs"))
    scored = tf.join(dfreq, "term").select(
        "grp", "term", "tf", "df_docs", (F.col("tf") * idf).alias("_score")
    )
    w = Window.partitionBy("grp").orderBy(F.desc("_score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("grp").alias(group_col),
            "term",
            "tf",
            "df_docs",
            F.round("_score", 6).alias("tfidf"),
            "rank",
        )
    )


def language_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 16,
) -> DataFrame:
    """Mixed-language detection: language-ID every token-window segment,
    then report each document's majority language and language PURITY
    (majority-segment fraction) — the code-switching / boilerplate-
    contamination signal curation pipelines use to route documents to
    per-language processing or drop noisy mixtures.

    Returns ``(id_col, n_segments, majority_lang, n_majority_segments,
    lang_purity)``; ties break (count DESC, lang ASC), segments that hit
    no stopword list at all still pick the fixed-order argmax (same
    contract as :func:`language_id`).

    Plan (100 TB shape): chunking and per-segment scoring are one
    map-only projection (the stopword scorers are JVM expressions over
    each segment string); per-doc language counts are a map-side-
    combinable groupBy; the majority pick is an algebraic
    ``min(struct(-cnt, lang))`` — no window, so a million-segment doc
    never streams through a rank operator.
    """
    segs = chunk_documents(
        df.select(F.col(id_col), F.col(text_col)),
        id_col=id_col,
        text_col=text_col,
        chunk_tokens=seg_tokens,
        overlap=0,
    ).select(F.col(id_col).alias("id"), F.col("chunk_text").alias("seg"))
    for lang in LANGS:
        segs = segs.withColumn(f"_s_{lang}", stopword_hits("seg", lang))
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in LANGS])
    pick = None
    for lang in LANGS:
        cond = F.col(f"_s_{lang}") >= best
        pick = F.when(cond, F.lit(lang)) if pick is None else pick.when(cond, F.lit(lang))
    seg_langs = segs.select("id", pick.alias("seg_lang"))
    counts = seg_langs.groupBy("id", "seg_lang").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.groupBy("id")
        .agg(
            F.sum("cnt").alias("n_segments"),
            F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("seg_lang").alias("lang"))).alias("_m"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_segments",
            F.col("_m.lang").alias("majority_lang"),
            (-F.col("_m.neg")).alias("n_majority_segments"),
            F.round(-F.col("_m.neg") / F.col("n_segments"), 6).alias("lang_purity"),
        )
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    keep_cols: tuple = (),
) -> DataFrame:
    """The published Gopher document-quality rules (Rae et al. 2021,
    appendix A1.1) as one map-only projection: word-count bounds, mean
    word length bounds, symbol-to-word ratio ('#' and '...'), bullet /
    ellipsis line fractions, alphabetic-word fraction, and the
    two-of-eight English stop-word requirement.

    Returns per-document measurements plus per-rule booleans and the
    combined ``gopher_pass``.  Everything is a JVM expression over one
    row — no shuffle, no UDF — so the filter runs at scan speed and
    composes with the curation funnel.  Thresholds are the paper's
    defaults, parameterized.  The alphabetic-character test is [a-z]
    over lowercased tokens (the published rule set is English-centric;
    route non-Latin corpora through language_id first).
    """
    toks = tokens(text_col)
    # split on \r?\n: web corpora are CRLF-ridden, and Java-regex `$`
    # matches BEFORE a trailing \r (line-terminator semantics) while
    # RE2/DuckDB `$` does not — splitting the \r away and anchoring
    # line rules with \z keeps both engines on one semantics
    lines = F.split(F.col(text_col), "\r?\n")
    raw = F.col(text_col)
    # keep_cols pass through (see line_filters); default () = plan unchanged
    base = df.select(
        F.col(id_col),
        raw.alias("_txt"),
        toks.alias("_toks"),
        lines.alias("_lines"),
        *[F.col(c) for c in keep_cols],
    )
    n_words = F.size(F.col("_toks"))
    n_lines = F.size(F.col("_lines"))
    words_d = F.greatest(n_words, F.lit(1)).cast("double")
    lines_d = F.greatest(n_lines, F.lit(1)).cast("double")
    # counts, all exact integers
    nonspace = F.length(F.regexp_replace(F.lower(F.trim(F.col("_txt"))), r"\s+", ""))
    n_hash = F.length(F.col("_txt")) - F.length(F.replace(F.col("_txt"), F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(F.col("_txt")) - F.length(F.replace(F.col("_txt"), F.lit("..."), F.lit("")))
    ) / F.lit(3)
    n_bullet_lines = F.size(
        F.filter(F.col("_lines"), lambda line: F.ltrim(line).rlike("^[-*•]"))
    )
    n_ellipsis_lines = F.size(
        F.filter(F.col("_lines"), lambda line: F.rtrim(line).rlike("\\.\\.\\.\\z"))
    )
    n_alpha_words = F.size(F.filter(F.col("_toks"), lambda t: t.rlike("[a-z]")))
    stop_hits = None
    for w in GOPHER_STOPWORDS:
        hit = F.array_contains(F.col("_toks"), w).cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    # raw (unrounded) ratios drive the rule booleans; the emitted ratio
    # columns are rounded for stable cross-engine comparison
    mean_wl = nonspace / words_d
    sym_ratio = F.greatest(n_hash, n_ellipsis) / words_d
    bullet_frac = n_bullet_lines / lines_d
    ellipsis_frac = n_ellipsis_lines / lines_d
    alpha_frac = n_alpha_words / words_d
    rule_words = (n_words >= min_words) & (n_words <= max_words)
    rule_wl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    rule_sym = sym_ratio <= max_symbol_ratio
    rule_bullet = bullet_frac <= max_bullet_frac
    rule_ellipsis = ellipsis_frac <= max_ellipsis_frac
    rule_alpha = alpha_frac >= min_alpha_frac
    rule_stop = stop_hits >= min_stop_hits
    return base.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        rule_words.alias("rule_word_count"),
        rule_wl.alias("rule_word_length"),
        rule_sym.alias("rule_symbol_ratio"),
        rule_bullet.alias("rule_bullets"),
        rule_ellipsis.alias("rule_ellipsis"),
        rule_alpha.alias("rule_alpha_words"),
        rule_stop.alias("rule_stopwords"),
        (
            rule_words & rule_wl & rule_sym & rule_bullet
            & rule_ellipsis & rule_alpha & rule_stop
        ).alias("gopher_pass"),
        *[F.col(c) for c in keep_cols],
    )


def line_filters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 5,
    max_upper_frac: float = 0.5,
    min_kept_lines: int = 3,
    keep_cols: tuple = (),
) -> DataFrame:
    """C4 / RefinedWeb-style line-level cleaning (Raffel et al. 2020
    §2.2; Penedo et al. 2023 line-wise corrections), as one map-only
    projection.

    A line is KEPT when it: has >= ``min_line_words`` whitespace words,
    ends in terminal punctuation (``. ! ? "``), does not mention
    ``javascript``, is not mostly-uppercase (> ``max_upper_frac`` of
    its letters... measured against total length), and is not
    numeric/counter-only.  Document-level C4 drops: any ``lorem
    ipsum``, any ``{``, or fewer than ``min_kept_lines`` surviving
    lines.

    Returns ``(id_col, n_lines, n_kept, kept_frac, has_lorem_ipsum,
    has_brace, keep_doc, clean_text)`` — ``clean_text`` is the kept
    lines re-joined with newlines, order preserved.  Every predicate
    is a JVM higher-order-function over the split lines: no shuffle,
    no UDF, scan-speed at any corpus size.
    """
    # \r?\n split + \z anchors: see gopher_rules (CRLF divergence)
    lines = F.split(F.col(text_col), "\r?\n")

    def _kept(line: Column) -> Column:
        words_ok = F.size(F.split(F.trim(line), r"\s+")) >= min_line_words
        punct_ok = F.rtrim(line).rlike('[.!?"]\\z')
        js_ok = ~F.lower(line).contains("javascript")
        upper_chars = F.length(F.regexp_replace(line, "[^A-Z]", ""))
        upper_ok = upper_chars <= F.lit(max_upper_frac) * F.length(line)
        numeric_only = (F.trim(line) != "") & F.trim(line).rlike("^[0-9 .,%:-]+\\z")
        return words_ok & punct_ok & js_ok & upper_ok & ~numeric_only

    # keep_cols ride through both projections (the fused-funnel path:
    # a downstream map-only stage over THIS output collapses with it
    # into one scan); empty by default, leaving the plan unchanged
    extra = [F.col(c) for c in keep_cols]
    base = df.select(
        F.col(id_col), F.col(text_col).alias("_txt"), lines.alias("_lines"), *extra
    )
    kept = F.filter(F.col("_lines"), _kept)
    n_lines = F.size(F.col("_lines"))
    n_kept = F.size(kept)
    has_lorem = F.lower(F.col("_txt")).contains("lorem ipsum")
    has_brace = F.col("_txt").contains("{")
    return base.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept"),
        F.round(n_kept / F.greatest(n_lines, F.lit(1)).cast("double"), 6).alias("kept_frac"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        (~has_lorem & ~has_brace & (n_kept >= min_kept_lines)).alias("keep_doc"),
        F.array_join(kept, "\n").alias("clean_text"),
        *[F.col(c) for c in keep_cols],
    )


# -- URL filtering (RefinedWeb stage 1) ----------------------------------------

#: default adult/spam fragments with RefinedWeb-style soft weights
#: (Penedo et al. 2023 §3.1 scores words in the URL rather than hard
#: matching; the published UT1 blocklist is the hard layer on top)
URL_SOFT_WORDS: tuple[tuple[str, float], ...] = (
    ("porn", 1.0),
    ("xxx", 1.0),
    ("sex", 0.8),
    ("casino", 0.8),
    ("poker", 0.7),
    ("viagra", 1.0),
    ("escort", 0.8),
    ("webcam", 0.5),
    ("dating", 0.4),
    ("torrent", 0.4),
    ("warez", 0.8),
    ("crack", 0.3),
)


def url_filters(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    blocked_domains: tuple[str, ...] = (),
    soft_words: tuple[tuple[str, float], ...] = URL_SOFT_WORDS,
    max_soft_score: float = 0.9,
    max_digit_frac: float = 0.5,
    max_host_len: int = 64,
) -> DataFrame:
    """URL-level curation (RefinedWeb §3.1): the stage a web pipeline
    runs BEFORE fetching or scoring any text.

    Three rules, every one a map-only JVM expression:

    - **blocklist** — the host or any registrable parent domain is in
      ``blocked_domains`` (the UT1-blocklist shape).  The list is a
      compile-time literal array per level, so matching is an integer
      ``array_contains`` over the host's dot-suffixes — no join at all;
      for a multi-million-entry production list swap in a broadcast
      left-semi join on the same suffix explosion.
    - **soft words** — flagged fragments in the WHOLE url accumulate
      their weights; total > ``max_soft_score`` fails (matching is on
      the lowercased url, so ``PORN`` and path fragments count).
    - **host shape** — mostly-digit hosts (link farms) and
      over-long hosts fail.

    Returns ``(id_col, url_col, host, blocklisted, soft_score,
    digit_frac, url_pass)``; NULL/unparseable urls fail with host NULL.
    Host extraction is a cross-engine regexp (``scheme://host``) rather
    than ``parse_url`` so the DuckDB oracle reproduces it verbatim.
    """
    url = F.col(url_col)
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))
    host = F.when(host == "", F.lit(None)).otherwise(host)
    base = df.select(F.col(id_col), url, host.alias("_host"))

    # dot-suffix explosion-free blocklist: host a.b.c.d matches blocked
    # entry X iff X ∈ {a.b.c.d, b.c.d, c.d, d}; build the suffix set
    # with JVM array ops over the split host
    parts = F.split(F.col("_host"), r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, i, F.size(parts)), "."),
    )
    blocked_arr = F.array(*[F.lit(d) for d in blocked_domains]) if blocked_domains else None
    blocklisted = (
        F.size(F.array_intersect(suffixes, blocked_arr)) > 0
        if blocked_arr is not None
        else F.lit(False)
    )
    blocklisted = F.when(F.col("_host").isNull(), F.lit(True)).otherwise(blocklisted)

    low_url = F.lower(url)
    score = F.lit(0.0)
    for word, weight in soft_words:
        score = score + F.when(low_url.contains(word), F.lit(weight)).otherwise(F.lit(0.0))

    digits = F.length(F.regexp_replace(F.col("_host"), "[^0-9]", ""))
    digit_frac = digits / F.greatest(F.length("_host"), F.lit(1)).cast("double")

    return base.select(
        F.col(id_col),
        url.alias(url_col),
        F.col("_host").alias("host"),
        blocklisted.alias("blocklisted"),
        F.round(score, 6).alias("soft_score"),
        F.round(F.coalesce(digit_frac, F.lit(1.0)), 6).alias("digit_frac"),
        (
            ~blocklisted
            & (score <= max_soft_score)
            & F.coalesce(
                (digit_frac <= max_digit_frac)
                & (F.length("_host") <= max_host_len),
                F.lit(False),
            )
        ).alias("url_pass"),
    )


# -- URL canonicalization + URL-level dedup --------------------------------------

#: query parameters that never change page content — dropped during
#: canonicalization (any ``utm_``-prefixed name is dropped too).
#: ONLY unambiguous tracker names: generic names like ``ref`` are
#: content-bearing on many real sites (git hosting ``?ref=branch``,
#: docs build pages) and stripping them silently collapses genuinely
#: distinct pages into one canonical group — document loss before
#: content dedup ever runs.  Pipelines that know their crawl can pass
#: a wider set via ``canonical_url(..., tracking_params=...)``.
URL_TRACKING_PARAMS: tuple[str, ...] = (
    "fbclid",
    "gclid",
    "msclkid",
)


def canonical_url(
    url_col: str | Column = "url",
    tracking_params: tuple[str, ...] = URL_TRACKING_PARAMS,
) -> Column:
    """Canonical form of a URL: the key for crawl-level URL dedup
    (every large pipeline dedups snapshots BY URL before touching
    text — CommonCrawl-derived corpora like C4/RefinedWeb do this
    first because it is free compared to content dedup).

    Normalizations (all pure string expressions — map-only, fuses with
    the scan): lowercase scheme and host, strip a leading ``www.``,
    strip the scheme's default port (:80/:443), drop the fragment,
    strip trailing slashes from the path ('' -> '/'), drop tracking
    parameters (``tracking_params`` + any ``utm_*``), and sort
    the surviving query parameters.  NULL/schemeless input yields NULL
    (callers decide whether that fails open or closed).
    """
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    after = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?#]*)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    rest = F.regexp_replace(after, r"^[^/?#]*", "")  # path + query + fragment
    # drop the fragment FIRST: a '?' inside the fragment ('#!/x?y=1')
    # must not fabricate a query string
    rest = F.regexp_extract(rest, r"^([^#]*)", 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)", 1)
    tracked = F.array(*[F.lit(p) for p in tracking_params])
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.array_contains(tracked, F.lower(F.split_part(p, F.lit("="), F.lit(1))))
        & ~F.lower(p).startswith("utm_"),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    return F.when(
        scheme == "",
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(canon_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), canon_q)),
        )
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    tracking_params: tuple[str, ...] = URL_TRACKING_PARAMS,
) -> DataFrame:
    """URL-level dedup table: one row per canonical URL with
    ``(canon_url, group_size, n_variants, canonical_id)`` — the kept
    representative is the min id, ``n_variants`` counts distinct RAW
    spellings that collapsed.  NULL-canonical rows (no scheme) are
    excluded: they cannot be keyed, and the content-dedup stages
    downstream still see them.

    Plan: canonicalization is map-only; the dedup is the standard
    two-phase distinct aggregate (partial on (canon_url, raw), final on
    canon_url) — both phases map-side combinable.  At 100 TB the key
    space is ~pages (uniform hash distribution); a hot key would mean
    the same canonical URL recrawled millions of times, which the
    partial aggregates absorb map-side.
    """
    canon = df.select(
        F.col(id_col),
        F.col(url_col).alias("_raw"),
        canonical_url(url_col, tracking_params).alias("canon_url"),
    ).filter(F.col("canon_url").isNotNull())
    return canon.groupBy("canon_url").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.count_distinct(F.col("_raw")).alias("n_variants"),
        F.min(id_col).alias("canonical_id"),
    )


# -- Gopher repetition rules (appendix A1.2) ------------------------------------

#: (measurement key, max fraction) — the paper's published thresholds
GOPHER_REP_THRESHOLDS: tuple[tuple[str, float], ...] = (
    ("dup_line_frac", 0.30),
    ("dup_line_char_frac", 0.20),
    ("top_2gram_char_frac", 0.20),
    ("top_3gram_char_frac", 0.18),
    ("top_4gram_char_frac", 0.16),
    ("dup_5gram_char_frac", 0.15),
    ("dup_6gram_char_frac", 0.14),
    ("dup_7gram_char_frac", 0.13),
    ("dup_8gram_char_frac", 0.12),
    ("dup_9gram_char_frac", 0.11),
    ("dup_10gram_char_frac", 0.10),
)


def gopher_repetition_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The Gopher repetition-removal table (Rae et al. 2021, appendix
    A1.2): duplicate-line fraction and char fraction, most-frequent
    {2,3,4}-gram char fractions, and duplicate-{5..10}-gram char
    fractions, each gated at the paper's threshold, plus the combined
    ``rep_pass``.  Char fractions are occurrence-weighted
    (``count·len(gram) / len(text)``; the paper's
    no-double-counting refinement needs positional interval merging —
    the occurrence-weighted form is the standard reimplementation and
    is what the thresholds gate here, stated explicitly for parity).

    Plan (100 TB shape, r15): MAP-ONLY.  Every statistic here is a
    WITHIN-document function — count each distinct line/n-gram's
    occurrences inside its own document — so no shuffle is fundamental.
    The former shape (one unified explode → groupBy(doc, kind, gram))
    paid the suite's single widest exchange (67.5 MB at sf0.1, ~75×
    the input bytes: grams are mostly unique within a doc, so map-side
    partial aggregation collapsed almost nothing).  Now each kind's
    gram array is sorted per row and folded ONCE by a run-length
    ``aggregate`` walk (prev, run, groups, top, dup): identical grams
    are adjacent after the sort, so run lengths ARE the per-gram
    counts the groupBy produced, and every per-kind scalar (n_occ,
    n_groups, top count·len, duplicated count·len mass) falls out of
    one O(n) pass.  2 Exchanges → 0; all built-in expressions, no
    window, no Python.  Row-set parity with the explode shape: a NULL
    text made the unified explode emit no rows (concat of a NULL lines
    array is NULL), dropping the doc — the filter reproduces that.
    """
    # the walk closes a run when the element changes (or at the end):
    # fold the completed run's count·len into top/dup, exactly the
    # per-(doc, kind, gram) c·length(gram) the groupBy computed.
    # Types mirror the aggregate shape (BIGINT counts/products) so the
    # double divisions below are bit-identical to the old plan's.
    walk = """
    aggregate(
      {arr},
      named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'groups', 0L,
                   'top', CAST(NULL AS BIGINT), 'dup', 0L),
      (a, x) -> CASE WHEN a.prev IS NOT NULL AND x = a.prev THEN
          named_struct('prev', x, 'run', a.run + 1L, 'groups', a.groups,
                       'top', a.top, 'dup', a.dup)
        ELSE
          named_struct('prev', x, 'run', 1L, 'groups', a.groups + 1L,
            'top', CASE WHEN a.prev IS NULL THEN a.top
                        ELSE greatest(a.top, a.run * length(a.prev)) END,
            'dup', CASE WHEN a.prev IS NOT NULL AND a.run >= 2L
                        THEN a.dup + a.run * length(a.prev) ELSE a.dup END)
        END,
      a -> named_struct(
        'n_occ', CAST(size({arr}) AS BIGINT),
        'groups', a.groups,
        'top', CASE WHEN a.prev IS NULL THEN a.top
                    ELSE greatest(a.top, a.run * length(a.prev)) END,
        'dup', CASE WHEN a.prev IS NOT NULL AND a.run >= 2L
                    THEN a.dup + a.run * length(a.prev) ELSE a.dup END)
    )
    """
    kinds: dict[int, Column] = {0: F.split(F.col(text_col), "\r?\n")}
    for n in range(2, 11):
        kinds[n] = shingles(text_col, n)
    # bind each kind's SORTED array to a column first: the aggregate
    # lambda must reference a bound column, not inline the shingle
    # expression (the HOF-lambda CSE trap — see shingles())
    bound = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("_chars"),
        *[F.array_sort(expr).alias(f"_s{k}") for k in sorted(kinds) for expr in [kinds[k]]],
    )
    stats = bound.select(
        id_col,
        "_chars",
        *[F.expr(walk.format(arr=f"_s{k}")).alias(f"_st{k}") for k in sorted(kinds)],
    )

    def st(kind: int, field: str):
        return F.col(f"_st{kind}")[field]

    chars_d = F.greatest(F.col("_chars"), F.lit(1)).cast("double")
    measures = {
        "dup_line_frac": (st(0, "n_occ") - st(0, "groups"))
        / F.greatest(st(0, "n_occ"), F.lit(1)).cast("double"),
        "dup_line_char_frac": st(0, "dup") / chars_d,
    }
    for n in (2, 3, 4):
        measures[f"top_{n}gram_char_frac"] = st(n, "top") / chars_d
    for n in range(5, 11):
        measures[f"dup_{n}gram_char_frac"] = st(n, "dup") / chars_d
    agg = stats.select(
        F.col(id_col),
        *[
            F.round(expr, 6).alias(name)
            for name, expr in measures.items()
        ],
        *[
            (expr <= F.lit(thr)).alias(f"rule_{name}")
            for name, thr in GOPHER_REP_THRESHOLDS
            for expr in [measures[name]]
        ],
    )
    rep_pass = None
    for name, _thr in GOPHER_REP_THRESHOLDS:
        c = F.col(f"rule_{name}")
        rep_pass = c if rep_pass is None else (rep_pass & c)
    return agg.withColumn("rep_pass", rep_pass)


def readability_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Readability + lexical-diversity features (Flesch reading ease
    with the standard vowel-run syllable heuristic, type-token ratio).

    The classic document-level quality signals used alongside the
    Gopher/C4 rules when curating training text: Flesch reading ease
    (Flesch 1948; `206.835 - 1.015*(words/sentences) -
    84.6*(syllables/word)`) flags both telegraphic fragments (too
    high) and run-on boilerplate (negative), and type-token ratio
    flags low-diversity spam.  Syllables use the portable vowel-run
    heuristic `max(1, count of [aeiouy]+ runs per word)`.

    Plan (100 TB shape): one map-only JVM projection — the token array
    binds once per row, sentence/syllable/distinct counts are
    higher-order-function folds over it, nothing shuffles.  No Python
    in the plan.

    Ref parity anchor: extends the heuristic quality family
    (operators/text.py quality_features); the reference's quality
    checks stop at column-level rules (pkg/ansisql/checks.go).
    """
    toks = F.filter(tokens(text_col), lambda t: t != "")
    sentences = F.greatest(
        F.expr(
            f"size(filter(split({text_col}, '[.!?]+'), s -> trim(s) <> ''))"
        ),
        F.lit(1),
    )
    words = F.greatest(F.size(toks), F.lit(1))
    syllables = F.expr(
        "aggregate(transform(filter(split(lower(trim("
        + text_col
        + ")), '\\\\s+'), t -> t <> ''),"
        " w -> greatest(1, regexp_count(w, '[aeiouy]+'))),"
        " 0L, (acc, x) -> acc + x)"
    )
    distinct_words = F.size(F.array_distinct(toks))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences)
        - F.lit(84.6) * (syllables.cast("double") / words)
    )
    return df.select(
        id_col,
        F.size(toks).alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
        F.round(flesch, 6).alias("flesch"),
        F.round(distinct_words.cast("double") / words, 6).alias("ttr"),
    )


def domain_stats(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain curation report: document/language counts, token
    volume, mean heuristic quality, and the exact-duplicate rate.

    Web-scale curation decides KEEP/DOWN-WEIGHT/DROP at the domain
    level (RefinedWeb and C4 both maintain per-host statistics); this
    is the aggregation that feeds that decision.

    Plan (100 TB shape): quality features are a map-only projection;
    the report is ONE groupBy(domain) where every measure except the
    distinct counts combines map-side, and the distincts
    (count(distinct md5), count(distinct lang)) are two-phase
    partial aggregations — no per-domain sort, no window.  Output is
    one row per domain (bounded by the host universe, millions at
    web scale — a normal shuffle, never a hot key, because the
    duplicate mass collapses map-side at the (domain, md5) level).
    """
    normalized = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]", "")
    feat = quality_features(df, text_col).withColumn("_fp", F.md5(normalized))
    n_docs = F.count(F.lit(1))
    return (
        feat.groupBy(F.col(domain_col).alias("domain"))
        .agg(
            n_docs.alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_tokens_q").alias("total_tokens"),
            F.round(F.avg("quality_score"), 6).alias("avg_quality"),
            F.round(
                F.lit(1.0) - F.countDistinct("_fp") / n_docs, 6
            ).alias("dup_rate"),
            F.round(
                F.avg((F.col("quality_score") >= 0.5).cast("double")), 6
            ).alias("keep_rate"),
        )
    )


def padding_waste(
    df: DataFrame,
    boundaries: tuple[int, ...] = (16, 32, 64, 128),
    text_col: str = "text",
    count_col: str | None = None,
) -> DataFrame:
    """Length-bucketed batching report: if the data loader pads each
    document to its length bucket's upper boundary (the standard
    bucketed-batching scheme), how many pad tokens does each bucket
    burn?

    Documents land in the smallest boundary ≥ their token count;
    documents longer than the largest boundary truncate to it (zero
    padding, counted as ``truncated``).  Output per bucket:
    ``(bucket_len, n_docs, n_truncated, total_tokens, pad_tokens,
    pad_frac)`` where ``pad_frac = pad / (n_docs · bucket_len)`` — the
    fraction of compute the batch spends on padding.  Comparing
    ``pad_frac`` across boundary choices is how the bucket layout is
    tuned before a run burns real accelerator hours.

    With ``count_col`` set the per-document token count is read from
    that column instead of whitespace-tokenizing ``text_col`` — the
    training-handoff shape, where the count is the TOKENIZER's (e.g.
    ``n_ids`` from bpe_encode_ids) and the report prices the actual
    batch the data loader will build.

    Plan: one map-only projection (token count + boundary CASE) and
    one map-side-combinable groupBy over ≤ |boundaries| keys.
    """
    bs = sorted(boundaries)
    n_toks = F.col(count_col) if count_col else F.size(tokens(text_col))
    bucket = None
    for b in bs:
        cond = n_toks <= b
        bucket = F.when(cond, b) if bucket is None else bucket.when(cond, b)
    bucket = bucket.otherwise(bs[-1])
    truncated = (n_toks > bs[-1]).cast("int")
    kept = F.least(n_toks, F.lit(bs[-1]))
    base = df.select(
        bucket.alias("bucket_len"),
        truncated.alias("_tr"),
        kept.alias("_kept"),
    )
    n_docs = F.count(F.lit(1))
    pad = F.sum(F.col("bucket_len") - F.col("_kept"))
    return base.groupBy("bucket_len").agg(
        n_docs.alias("n_docs"),
        F.sum("_tr").alias("n_truncated"),
        F.sum("_kept").alias("total_tokens"),
        pad.alias("pad_tokens"),
        F.round(pad / (n_docs * F.first("bucket_len")), 6).alias("pad_frac"),
    )

"""Distributed BPE merge learning: train a byte-pair-encoding tokenizer
vocabulary from a corpus.

The 100 TB shape: the ONLY corpus-scale pass is the word count (one
explode + map-side-combined aggregation). Everything after runs on the
compressed vocabulary table (|V| rows — millions at web scale, versus
trillions of tokens), exactly how production BPE trainers work: pair
statistics are weighted by word frequency, so the corpus never needs a
second read. Each merge iteration is one small aggregation over the
vocab plus a literal string replace; the learned merge table (the
tokenizer artifact) is tiny.

Determinism: the best pair is (count DESC, pair ASC) — reproducible
across engines and runs. Symbol replacement applies literal
non-overlapping ``replace`` REPEATEDLY (``REPLACE_PASSES`` nested
applications): a single string-level pass under-merges runs like
``a b a b a b`` because the trailing space of one match is the leading
space of the next, while iterating to fixpoint is exactly canonical
(Sennrich) symbol-wise merging — a merge never creates a new
occurrence of its own pair (``left+right`` can equal neither ``left``
nor ``right``), so repetition can only complete the canonical set,
never over-merge. Each pass halves the longest unresolved run, so
``REPLACE_PASSES`` covers runs up to ``2^REPLACE_PASSES`` pairs. Spark
and DuckDB implement ``replace`` identically, so the DuckDB oracle
unrolls the same stages and matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bruin_spark.checkpointing import materialize, release
from bruin_spark.operators.text import tokens

#: nested replace applications per merge: covers same-pair runs up to
#: 2^7 = 128 consecutive pairs (= 256-char single-character runs)
REPLACE_PASSES = 7


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq) over the corpus — the single corpus-scale pass."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str,
) -> tuple[list[tuple[int, str, str, int]], DataFrame, DataFrame]:
    """The shared training loop: returns ``(merges, words, base)``
    where ``words`` is the post-merge vocabulary ``(w, freq, repr)`` —
    ``repr`` is the space-delimited merged-symbol form of ``w`` — as a
    PROJECTION over ``base``, the PINNED word-frequency checkpoint.
    The caller owns the pin: ``release(base)`` once nothing derived
    from ``words`` will run again (or consume inside
    ``checkpointing.pinned_scope()``).
    """
    base = word_frequencies(docs, text_col).withColumn(
        "repr",
        F.concat(F.lit(" "), F.concat_ws(" ", F.split(F.col("w"), "")), F.lit(" ")),
    )
    # ONE pin for the whole training loop: the corpus-scale word count
    # is checkpointed once, and each merge step's replace chain is
    # re-applied as a plain projection over it.  Replaces compose into
    # a single codegen stage (exactly how apply_bpe_merges applies an
    # external merge list), so step k's pair-count job does k×
    # REPLACE_PASSES literal replaces over |V| rows — trivially cheap
    # next to the corpus pass — instead of paying a localCheckpoint
    # write + read of the whole vocab table per merge (the previous
    # shape: n_merges extra jobs and 2× vocab-size block churn per
    # step).  Values are identical: the projection computes the same
    # repr strings the per-step checkpoint held.
    base = materialize(base, eager=True, required=True)

    merges: list[tuple[int, str, str, int]] = []
    repr_col = F.col("repr")
    for step in range(1, n_merges + 1):
        pc = (
            base.withColumn("s", F.split(F.trim(repr_col), " "))
            .filter(F.size("s") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1),"
                        " i -> concat(element_at(s, i), ' ', element_at(s, i + 1)))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pc.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(1).collect()
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        left, right = pair.split(" ")
        merges.append((step, left, right, cnt))
        for _ in range(REPLACE_PASSES):
            repr_col = F.replace(
                repr_col, F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
            )

    return merges, base.withColumn("repr", repr_col), base


def bpe_learn_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (step, merge_left, merge_right, pair_count).

    Word representations start as space-delimited characters wrapped in
    sentinel spaces (`` a b c ``); each iteration counts adjacent symbol
    pairs weighted by word frequency, picks the (count DESC, pair ASC)
    best, and rewrites `` left right `` -> `` leftright `` across the
    vocab. The word-frequency base is checkpointed ONCE; each step's
    plan is the accumulated replace chain over it (bounded by
    n_merges × REPLACE_PASSES literal replaces — one codegen stage).
    """
    spark = docs.sparkSession
    merges, _words, base = _bpe_train(docs, n_merges, text_col)
    # the merge table is driver-side; the pinned word-frequency base
    # isn't part of the result — release it (the checkpoint files in
    # 'reliable' mode included)
    release(base)
    return spark.createDataFrame(
        merges, "step int, merge_left string, merge_right string, pair_count bigint"
    )


def bpe_encode_counts(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a freshly-trained BPE vocabulary and
    count pieces per document: ``(id_col, n_words, n_bpe_tokens)``.

    The 100 TB shape: BPE application never touches corpus text
    token-by-token. The trained vocabulary table already carries each
    DISTINCT word's merged representation (``repr``), so encoding is a
    piece-count column on the vocab (|V| rows) plus one broadcast join
    from the per-document word counts — the classic "tokenize distinct
    words once" optimization. The only corpus-scale work is the word
    count (map-side combinable; duplicate words collapse before the
    join). Counts are integers, so results are exact cross-engine.

    The returned plan reads the pinned vocabulary — consume it inside
    ``checkpointing.pinned_scope()`` (the registry harness does), which
    frees the pin on exit.

    Ref parity anchor: the reference treats tokenization as an ingestr
    / python-asset concern (no native tokenizer); this extends the
    training-data family alongside bpe_learn_merges.
    """
    _, words, _base = _bpe_train(docs, n_merges, text_col)
    # repr is ' p1 p2 ... pk ' → k pieces for the word
    pieces = words.select(
        "w", F.size(F.split(F.trim(F.col("repr")), " ")).alias("n_pieces")
    )
    doc_words = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # vocab ≪ corpus (Heaps' law): broadcast the piece table so the
    # corpus-side word counts never shuffle for this join
    joined = doc_words.join(F.broadcast(pieces), "w")
    return joined.groupBy(id_col).agg(
        F.sum("cnt").alias("n_words"),
        F.sum(F.col("cnt") * F.col("n_pieces")).alias("n_bpe_tokens"),
    )


def bpe_encode_ids(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full BPE tokenization to ID SEQUENCES: ``(id_col, n_ids, ids)``
    — the array of vocabulary ids a trainer's data loader consumes, in
    document order.

    Same "tokenize distinct words once" discipline as
    :func:`bpe_encode_counts`: piece ids are assigned on the |pieces|
    table (lexicographic rank — deterministic, tokenizer-file-like),
    each DISTINCT word maps to its id array once, and the corpus-side
    work is one posexplode + a broadcast join + one per-document
    reassembly groupBy.  The sequence is rebuilt with
    ``array_sort(collect_list(struct(pos, ids)))`` → ``flatten`` — the
    same skew-safe reassembly shape as segment_dedup (no window over
    the corpus).  The piece-id rank runs on the vocabulary relation
    (bounded by construction: pieces ≤ distinct chars + n_merges).
    """
    from pyspark.sql import Window

    _, words, _base = _bpe_train(docs, n_merges, text_col)
    # TWO consumers fan out from the piece arrays (the piece-id vocab
    # and the per-word id map): materialize once at the fan-out point
    # so the trained repr's replace chain is not re-evaluated per
    # consumer — ONE checkpoint for the whole encode instead of the
    # per-merge checkpoints _bpe_train used to pay
    word_pieces = materialize(
        words.select("w", F.split(F.trim(F.col("repr")), " ").alias("_ps")),
        eager=True,
    )
    vocab = (
        word_pieces.select(F.explode("_ps").alias("piece"))
        .distinct()
        .withColumn(
            "piece_id",
            F.row_number().over(Window.orderBy(F.col("piece"))).cast("int"),
        )
    )
    word_ids = (
        word_pieces.select("w", F.posexplode("_ps").alias("_i", "piece"))
        .join(F.broadcast(vocab), "piece")
        .groupBy("w")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_i", "piece_id"))),
                lambda s: s["piece_id"],
            ).alias("_wids")
        )
    )
    doc_words = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("_pos", "w")
    )
    return (
        doc_words.join(F.broadcast(word_ids), "w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_wids"))),
                    lambda s: s["_wids"],
                )
            ).alias("ids")
        )
        .select(F.col(id_col), F.size("ids").alias("n_ids"), F.col("ids"))
    )


def apply_bpe_merges(words: DataFrame, merges) -> DataFrame:
    """Apply an EXTERNALLY SUPPLIED ordered merge list to a word table.

    ``words`` needs a ``w`` column (any other columns pass through);
    ``merges`` is an ordered ``[(left, right), ...]`` list or a
    DataFrame with ``(step, merge_left, merge_right)`` — the artifact
    :func:`bpe_learn_merges` produces, or a tokenizer file read from
    anywhere.  Returns ``words`` plus the sentinel-space ``repr``
    column (`` p1 p2 ... pk ``), identical in form to the trained path.

    Unlike training, application needs NO iteration barrier: every
    merge is a literal replace, so the whole chain composes into ONE
    map-only projection over the vocab table (n_merges × REPLACE_PASSES
    nested replaces — Catalyst folds them into a single codegen stage).
    A merge table is |V|-bounded by construction, so collecting a
    DataFrame input to the driver is bounded the same way.
    """
    if isinstance(merges, DataFrame):
        merges = [
            (r["merge_left"], r["merge_right"])
            for r in merges.orderBy("step").collect()
        ]
    repr_col = F.concat(
        F.lit(" "), F.concat_ws(" ", F.split(F.col("w"), "")), F.lit(" ")
    )
    for left, right in merges:
        for _ in range(REPLACE_PASSES):
            repr_col = F.replace(
                repr_col, F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
            )
    return words.withColumn("repr", repr_col)


def bpe_fertility_by_lang(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    merges=None,
) -> DataFrame:
    """Per-language tokenizer fertility report: how many BPE pieces an
    average word costs in each language, and how many characters a
    piece carries.

    The standard multilingual-tokenizer equity metric (fertility =
    tokens/word; see e.g. Petrov et al. 2023 on tokenizer parity):
    languages the vocabulary serves badly pay more tokens for the same
    text, which skews both training mixture math and serving cost.
    Returns one row per language: ``(lang, n_words, n_bpe_tokens,
    fertility, chars_per_token, single_piece_rate)``.

    100 TB shape: the corpus-scale work is ONE map-side-combinable
    groupBy(lang, word) count; the trained piece table (|V| rows,
    Heaps-bounded) broadcasts onto it; the report reduces to
    |languages| rows.  Same "tokenize distinct words once" discipline
    as :func:`bpe_encode_counts`.

    With ``merges`` supplied (see :func:`apply_bpe_merges`) the report
    scores the corpus under that FIXED external vocabulary instead of
    training one — the tokenizer-SELECTION workflow: run once per
    candidate tokenizer and compare per-language fertility columns.
    The fixed path is cheaper: no training loop, the piece table is a
    single projection over the distinct-word count.
    """
    if merges is not None:
        words = apply_bpe_merges(word_frequencies(docs, text_col), merges)
    else:
        _, words, _base = _bpe_train(docs, n_merges, text_col)
    pieces = words.select(
        "w", F.size(F.split(F.trim(F.col("repr")), " ")).alias("n_pieces")
    )
    lang_words = (
        docs.select(F.col(lang_col).alias("lang"), F.explode(tokens(text_col)).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    joined = lang_words.join(F.broadcast(pieces), "w")
    n_words = F.sum("cnt")
    n_toks = F.sum(F.col("cnt") * F.col("n_pieces"))
    return (
        joined.groupBy("lang")
        .agg(
            n_words.alias("n_words"),
            n_toks.alias("n_bpe_tokens"),
            F.round(n_toks / n_words, 6).alias("fertility"),
            F.round(
                F.sum(F.col("cnt") * F.length(F.col("w"))) / n_toks, 6
            ).alias("chars_per_token"),
            F.round(
                F.sum(F.when(F.col("n_pieces") == 1, F.col("cnt")).otherwise(0))
                / n_words,
                6,
            ).alias("single_piece_rate"),
        )
    )

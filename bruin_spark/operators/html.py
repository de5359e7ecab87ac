"""HTML main-content extraction — stage 0 of web-crawl curation.

A jusText/trafilatura-class DOM-free extractor (Kohlschütter et al.
2010 boilerplate detection; Pomikálek 2011 jusText): strip non-content
regions (script/style/head/comments), segment the page into BLOCKS at
block-level tag boundaries, score each block by text mass and link
density, and keep the content blocks.  Navigation bars, footers and
widget clusters are short and link-dense; article text is long and
link-sparse — the two thresholds (``min_chars``, ``max_link_density``)
separate them without parsing a DOM.

Everything is a single map-only JVM projection (regexp_replace /
split / transform / filter higher-order functions — no Python UDF, no
shuffle): at 100 TB this runs at scan speed and fuses with the
downstream curation stages (url_filters → line_filters → the
RefinedWeb funnel) under Catalyst's project collapsing.

All regexes avoid backreferences and stay in the RE2-compatible subset
so the DuckDB oracle replays them verbatim (Java accepts the same
patterns).  Reference parity: bruin has no crawl-extraction stage
(curation starts at structured warehouse tables); this is part of the
training-data surface the engine adds (SURVEY.md §2 extras).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: block separator injected at block-tag boundaries (RS control char —
#: cannot appear in real text columns)
BLOCK_SEP = "\x1e"

#: regions whose CONTENT is never text: dropped before block splitting.
#: Separate alternatives per tag — RE2 (the oracle engine) has no
#: backreferences, so ``</\1>`` is not available.
STRIP_REGIONS = (
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?is)<noscript[^>]*>.*?</noscript>",
    r"(?s)<!--.*?-->",
    r"(?is)<head[^>]*>.*?</head>",
)

#: tags that terminate a text block (opening OR closing, with optional
#: attributes / self-closing slash)
_BLOCK_TAGS = (
    "p|div|br|h1|h2|h3|h4|h5|h6|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|"
    "section|article|header|footer|nav|aside|main|figure|figcaption|"
    "blockquote|pre|form|fieldset|hr|body|html"
)
BLOCK_TAG_RE = rf"(?is)</?(?:{_BLOCK_TAGS})(?:\s[^>]*)?/?>"


def _unescape_sql(x: str) -> str:
    """Decode the common HTML entities (applied after tag stripping).

    ``&amp;`` is decoded LAST so ``&amp;lt;`` round-trips to ``&lt;``
    (the standard single-pass entity rule), and identically on both
    engines — replace() chains are engine-portable."""
    out = x
    for ent, rep in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        rep_sql = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{rep_sql}')"
    return out


def _plain_sql(b: str, duck: bool = False) -> str:
    """Visible text of one block: strip remaining (inline) tags, decode
    entities, collapse whitespace, trim.

    ``duck=True`` emits the DuckDB spelling of the SAME expression —
    the two engines' only divergences are mechanical: DuckDB's
    regexp_replace needs an explicit 'g' flag, and its standard string
    literals do not process backslash escapes (so ``\\s`` is written
    with ONE backslash there, TWO under Spark SQL's escaping)."""
    g = ", 'g'" if duck else ""
    ws = r"\s+" if duck else r"\\s+"
    no_tags = f"regexp_replace({b}, '<[^>]*>', ' '{g})"
    return f"trim(regexp_replace({_unescape_sql(no_tags)}, '{ws}', ' '{g}))"


def _link_chars_sql(b: str, duck: bool = False) -> str:
    """Non-space character count of the block's ANCHOR text — the
    numerator of the link-density score: text inside COMPLETE
    ``<a>…</a>`` spans plus the text after an UNCLOSED trailing
    ``<a …>`` (the anchor continues into the next block).  Blocks that
    BEGIN inside an anchor are handled by the caller via the
    cross-block anchor depth (:func:`_anchor_net_sql`), not here.

    ``duck`` as in :func:`_plain_sql`; additionally DuckDB spells
    array_join as array_to_string and returns NULL for the empty list
    (a no-anchor block must score 0, not NULL — COALESCE pins that).

    The anchor-open pattern is the STRICT ``<a(?:\\s[^>]*)?>`` —
    matching :func:`_anchor_net_sql` — not ``<a[^>]*>``, which also
    matches any tag whose name merely starts with 'a' (``<abbr>``,
    ``<audio>``, ``<area>``): under the loose form a legitimate long
    block containing such a tag had its following text counted as
    anchor text and could be dropped as link-dense."""
    g = ", 'g'" if duck else ""
    ws = r"\s+" if duck else r"\\s+"
    wso = r"\s" if duck else r"\\s"
    a_open = f"<a(?:{wso}[^>]*)?>"
    extracted = f"regexp_extract_all({b}, '(?is){a_open}(.*?)</a>', 1)"
    if duck:
        anchors = f"COALESCE(array_to_string({extracted}, ' '), '')"
    else:
        anchors = f"array_join({extracted}, ' ')"
    # remove complete anchors, then everything after the LAST remaining
    # (necessarily unclosed) '<a ...>' is anchor text too
    no_complete = f"regexp_replace({b}, '(?is){a_open}.*?</a>', ' '{g})"
    tail = f"regexp_extract({no_complete}, '(?is)^.*{a_open}(.*)$', 1)"
    combined = f"concat({anchors}, ' ', {tail})"
    plain = f"regexp_replace({combined}, '<[^>]*>', ' '{g})"
    return f"length(regexp_replace({_unescape_sql(plain)}, '{ws}', ''{g}))"


def _anchor_net_sql(b: str, duck: bool = False) -> str:
    """Opening-minus-closing ``<a>`` tag count of one block.  The
    prefix sum of this over the block array is the anchor DEPTH a block
    starts at: block splitting runs on block-level tags, so a card
    widget like ``<a href=x><h3>Title</h3><p>teaser</p></a>`` scatters
    its anchor text across blocks with no anchor markup of their own —
    a block starting at depth > 0 is entirely anchor text."""
    ws = r"\s" if duck else r"\\s"
    n = "len" if duck else "size"
    opens = f"{n}(regexp_extract_all({b}, '(?i)<a({ws}[^>]*)?>', 0))"
    closes = f"{n}(regexp_extract_all({b}, '(?i)</a{ws}*>', 0))"
    return f"({opens} - {closes})"


def extract_main_content(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_chars: int = 25,
    max_link_density: float = 0.33,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Extract the main text content of an HTML page column.

    Returns ``(id_col, *keep_cols, n_blocks, n_kept, text)`` — one row
    per input page: ``n_blocks`` counts non-empty text blocks,
    ``n_kept`` the blocks surviving both gates, and ``text`` is the
    kept blocks' visible text joined with newlines (''), ready for
    ``url_filters`` → ``line_filters`` → the RefinedWeb funnel.

    A block is kept when its non-space text length is at least
    ``min_chars`` AND its anchor-text share is at most
    ``max_link_density`` — the two-signal rule that drops nav bars,
    footers, and related-links widgets while keeping paragraphs.
    Anchors SPANNING block boundaries (a linked card whose ``<a>``
    wraps headings/paragraphs) are tracked by cross-block anchor
    depth: a block that starts inside an open anchor counts entirely
    as anchor text.
    """
    cleaned = F.col(html_col)
    for pat in STRIP_REGIONS:
        cleaned = F.regexp_replace(cleaned, pat, " ")
    blocks = F.split(F.regexp_replace(cleaned, BLOCK_TAG_RE, BLOCK_SEP), BLOCK_SEP)

    nets = f"transform(_blocks, b -> {_anchor_net_sql('b')})"
    # running-sum array of the nets, built in ONE aggregate pass:
    # _depths[i] (0-based pairing) = sum of nets[0..i-1] = the anchor
    # depth block i starts at.  The previous form re-summed
    # aggregate(slice(_nets, 1, i), ...) PER BLOCK — O(blocks²) adds
    # per page, a straggler risk on adversarial 50k-block crawl pages
    # (~1.2B adds in one row).  Values are identical.
    depths = (
        "aggregate(_nets, named_struct('s', 0, 'ds', array(0)), "
        "(acc, x) -> named_struct('s', acc.s + x, "
        "'ds', array_append(acc.ds, acc.s + x)), acc -> acc.ds)"
    )
    # depth at block start = clamped prefix sum of the nets; lc = -1 is
    # the in-anchor sentinel, resolved to the block's full text mass in
    # the next projection (where tc is available).  zip_with, NOT
    # element_at(_depths, i) inside a transform lambda: Catalyst's
    # project collapsing inlines the _depths EXPRESSION into the lambda
    # body, where it would re-run the whole running-sum build once per
    # block (O(blocks²) again, verified: a 2000-block page planned that
    # way runs for minutes) — zip_with takes the arrays as arguments,
    # which are evaluated once per ROW even after inlining.
    stats = (
        f"zip_with(_blocks, slice(_depths, 1, size(_blocks)), "
        f"(b, d) -> named_struct("
        f"'plain', {_plain_sql('b')}, "
        f"'lc', CASE WHEN greatest(0, d) > 0 "
        f"THEN -1 ELSE {_link_chars_sql('b')} END))"
    )
    scored = (
        "transform(_s1, s -> named_struct("
        "'plain', s.plain, 'tc', length(replace(s.plain, ' ', '')), "
        "'lc', CASE WHEN s.lc < 0 THEN length(replace(s.plain, ' ', '')) "
        "ELSE s.lc END))"
    )
    kept = (
        f"filter(_s2, s -> s.tc >= {int(min_chars)} "
        f"AND s.lc <= {float(max_link_density)!r} * s.tc)"
    )
    return (
        df.withColumn("_blocks", blocks)
        .withColumn("_nets", F.expr(nets))
        .withColumn("_depths", F.expr(depths))
        .withColumn("_s1", F.expr(stats))
        .withColumn("_s2", F.expr(scored))
        .withColumn("_kept", F.expr(kept))
        .select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            F.expr("size(filter(_s2, s -> s.tc > 0))").cast("bigint").alias("n_blocks"),
            F.size("_kept").cast("bigint").alias("n_kept"),
            F.expr("array_join(transform(_kept, s -> s.plain), chr(10))").alias("text"),
        )
    )

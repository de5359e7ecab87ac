"""HTML main-content extraction (operators/html.py).

Differential: a small PURE-PYTHON reference extractor (same spec —
strip regions, block split, entity decode, min-chars + link-density
gates) is run over adversarial fixture pages and compared row-for-row
with the Spark operator.  The reference implementation shares no code
with the operator (Python re vs Spark SQL expressions), so agreement
pins the semantics, not the plumbing.

Plan: extraction must stay a map-only projection (no Exchange, no
Python eval) — it is stage 0 of the curation funnel and must fuse into
the same scan as the other map-only stages.
"""

from __future__ import annotations

import re

import pytest

from bruin_spark.operators.html import (
    BLOCK_TAG_RE,
    STRIP_REGIONS,
    extract_main_content,
)

MIN_CHARS = 25
MAX_LD = 0.33

_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def _py_unescape(s: str) -> str:
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    return s


def _py_plain(block: str) -> str:
    no_tags = re.sub(r"<[^>]*>", " ", block)
    return re.sub(r"\s+", " ", _py_unescape(no_tags)).strip()


def _py_link_chars(block: str) -> int:
    # complete anchors + the text after a trailing unclosed '<a ...>'
    # strict anchor-open pattern (matches _anchor_net_sql): <a[^>]*>
    # would also match <abbr>/<audio>/<area> and miscount their text
    anchors = " ".join(re.findall(r"(?is)<a(?:\s[^>]*)?>(.*?)</a>", block))
    no_complete = re.sub(r"(?is)<a(?:\s[^>]*)?>.*?</a>", " ", block)
    m = re.match(r"(?is)^.*<a(?:\s[^>]*)?>(.*)$", no_complete)
    tail = m.group(1) if m else ""
    plain = re.sub(r"<[^>]*>", " ", anchors + " " + tail)
    return len(re.sub(r"\s+", "", _py_unescape(plain)))


def py_extract(html: str) -> tuple[int, int, str]:
    """Reference extractor: (n_blocks, n_kept, text)."""
    cleaned = html
    for pat in STRIP_REGIONS:
        cleaned = re.sub(pat, " ", cleaned)
    blocks = re.sub(BLOCK_TAG_RE, "\x1e", cleaned).split("\x1e")
    nets = [
        len(re.findall(r"(?i)<a(?:\s[^>]*)?>", b))
        - len(re.findall(r"(?i)</a\s*>", b))
        for b in blocks
    ]
    n_blocks = n_kept = 0
    kept: list[str] = []
    for j, b in enumerate(blocks):
        plain = _py_plain(b)
        tc = len(plain.replace(" ", ""))
        # a block starting inside an open anchor is entirely anchor text
        depth = max(0, sum(nets[:j]))
        lc = tc if depth > 0 else _py_link_chars(b)
        if tc > 0:
            n_blocks += 1
        if tc >= MIN_CHARS and lc <= MAX_LD * tc:
            n_kept += 1
            kept.append(plain)
    return n_blocks, n_kept, "\n".join(kept)


LONG = "This paragraph carries enough real sentence content to clear the gate."

PAGES = [
    # plain article with nav/footer boilerplate
    (
        "<html><head><title>T</title><style>p{}</style></head><body>"
        '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        f"<p>{LONG}</p><p>short</p>"
        '<footer>(c) <a href="/p">Privacy</a> <a href="/t">Terms</a></footer>'
        "</body></html>"
    ),
    # uppercase tags, self-closing br, comment, noscript
    (
        "<HTML><BODY><!-- hidden --><NOSCRIPT>enable js</NOSCRIPT>"
        f"<P CLASS='x'>{LONG}</P><BR/>{LONG} second block."
        "</BODY></HTML>"
    ),
    # entities (incl. double-escaped &amp;lt;), inline markup
    (
        f"<body><p>A &quot;quoted&quot; &amp; escaped &amp;lt;tag&#39;s text, {LONG}</p>"
        f"<p><b>Bold</b> and <i>italic</i> spans inside: {LONG}</p></body>"
    ),
    # link-dense long block (must be dropped despite length)
    (
        "<body><div>"
        + " ".join(f'<a href="/{i}">related article number {i}</a>' for i in range(8))
        + f"</div><p>{LONG}</p></body>"
    ),
    # block with an inline link inside much longer prose (must be kept)
    (
        f'<body><p>{LONG} See <a href="x">this link</a> for more. {LONG}</p></body>'
    ),
    # script containing fake tags and quotes
    (
        f"<body><script>var s = \"<p>not content</p>\";</script><p>{LONG}</p></body>"
    ),
    # empty / whitespace-only page
    "<html><body>   </body></html>",
    # no html at all (bare text is one block)
    f"{LONG} bare text without any markup at all.",
    # nested divs and lists
    (
        f"<div><div><ul><li>{LONG} one</li><li>tiny</li></ul></div>"
        f"<table><tr><td>{LONG} in a cell</td><td>x</td></tr></table></div>"
    ),
    # card widget: ONE anchor wrapping block-level content — the whole
    # card is anchor text even though its blocks carry no <a> markup
    (
        '<div><a href="/promo"><h3>Sponsored headline title here</h3>'
        f"<p>{LONG} teaser for the linked promotional card.</p></a></div>"
        f"<p>{LONG}</p>"
    ),
    # several linked cards then an article paragraph
    (
        "".join(
            f'<div class="card"><a href="/{i}"><h4>Card {i} headline text</h4>'
            f"<p>{LONG} snippet {i}.</p></a></div>"
            for i in range(3)
        )
        + f"<p>{LONG} the real article body continues here.</p>"
    ),
    # anchor closed in a later block with trailing prose in that block
    (
        f'<body><a href="x"><p>{LONG} linked part</p>trailing linked text</a>'
        f"<p>{LONG} unlinked paragraph after the anchor closes.</p></body>"
    ),
]


@pytest.fixture(scope="module")
def extracted(spark):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(PAGES)], "doc_id bigint, html string"
    )
    out = extract_main_content(
        df, min_chars=MIN_CHARS, max_link_density=MAX_LD
    )
    return {r.doc_id: r for r in out.collect()}


def test_differential_vs_pure_python(extracted):
    for i, page in enumerate(PAGES):
        n_blocks, n_kept, text = py_extract(page)
        r = extracted[i]
        assert (r.n_blocks, r.n_kept, r.text) == (n_blocks, n_kept, text), (
            i,
            page[:80],
        )


def test_boilerplate_dropped_content_kept(extracted):
    r = extracted[0]
    assert r.n_kept == 1 and LONG in r.text
    assert "Home" not in r.text and "Privacy" not in r.text
    # link-dense long block dropped, prose-with-inline-link kept
    assert "related article" not in extracted[3].text
    assert "this link" in extracted[4].text
    # script content never leaks
    assert "not content" not in extracted[5].text
    # empty page yields zero blocks
    assert extracted[6].n_blocks == 0 and extracted[6].text == ""
    # block-spanning anchors: the linked cards drop, the article stays
    assert "Sponsored headline" not in extracted[9].text
    assert "teaser for the linked promotional card" not in extracted[9].text
    assert LONG in extracted[9].text
    assert "Card 1 headline" not in extracted[10].text
    assert "the real article body continues" in extracted[10].text
    assert "unlinked paragraph after the anchor closes" in extracted[11].text


def test_entity_decode(extracted):
    t = extracted[2].text
    assert '"quoted" & escaped &lt;tag\'s text' in t


def test_map_only_plan(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id bigint, html string")
    plan = (
        extract_main_content(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_funnel_html_stage(spark):
    from bruin_spark.operators.refinedweb import funnel_attrition, refinedweb_funnel

    body = (
        "word " * 40 + ". " + "Another varied sentence with many different tokens here."
    )
    pages = [
        # normal article page
        (1, "en", f"<body><p>{body}</p><p>{body} extra tail.</p></body>"),
        # nav-only page: extraction empties it -> fails at stage 0
        (2, "en", '<body><nav><a href="/">Home</a> <a href="/a">About</a></nav></body>'),
    ]
    df = spark.createDataFrame(pages, "doc_id bigint, lang string, html string")
    out = refinedweb_funnel(df, html_col="html").collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[2].extract_pass is False
    assert by_id[2].stage_failed == "extract"
    assert by_id[1].extract_pass is True
    # attrition report leads with the extract stage
    dec = refinedweb_funnel(df, html_col="html")
    att = funnel_attrition(dec).collect()
    assert att[0].stage == "extract" and att[0].stage_no == 1
    assert att[0].n_in == 2 and att[0].n_dropped == 1


def test_pathological_many_block_page(spark):
    """Adversarial 4000-block page (alternating anchored cards and
    prose): the linearized running-sum anchor depth must agree with the
    pure-Python reference — and finish without the O(blocks²) per-block
    re-summation the previous slice-aggregate form paid."""
    import time

    page = "".join(
        (
            f'<div><a href="/{i}"><h4>Hot card {i}</h4><p>{LONG} t{i}.</p></a></div>'
            if i % 3 == 0
            else f"<p>{LONG} paragraph number {i} keeps the page long.</p>"
        )
        for i in range(2000)
    )
    df = spark.createDataFrame([(0, page)], "doc_id bigint, html string")
    t0 = time.perf_counter()
    r = extract_main_content(df, min_chars=MIN_CHARS, max_link_density=MAX_LD).collect()[0]
    wall = time.perf_counter() - t0
    n_blocks, n_kept, text = py_extract(page)
    assert (r.n_blocks, r.n_kept, r.text) == (n_blocks, n_kept, text)
    # generous bound: the quadratic form took minutes on this shape
    assert wall < 60, f"pathological page took {wall:.1f}s"

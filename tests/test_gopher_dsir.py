"""Gopher-rule quality filter and DSIR importance weights, checked
against independent pure-Python reimplementations (differential
oracles, same pattern as the funnel/span randomized tests)."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from bruin_spark.operators.dsir import dsir_weights, hashed_features
from bruin_spark.operators.text import GOPHER_STOPWORDS, gopher_rules

DOCS = [
    # passes everything at the relaxed thresholds used below
    (1, "the cat and the dog have fun with all of that good stuff", "en"),
    # bullet-dominated: 3 of 4 lines start with a bullet
    (2, "- alpha beta\n* gamma delta\n• epsilon zeta\nthe end of that with be", "en"),
    # ellipsis-heavy lines and '...' symbols
    (3, "well...\nmaybe...\nthe story goes on... and on...\nhave to be with of", "en"),
    # hash-symbol spam
    (4, "# # # # # the of and to be that have with", "en"),
    # numeric words: fails the alphabetic-word fraction
    (5, "1 2 3 4 5 6 7 8 9 10 11 12 the of", "en"),
    # no English stop words
    (6, "der die das und oder aber nicht doch immer wieder", "de"),
    # empty text: tokenizes to [''], every ratio on the guard denominator
    (7, "", "en"),
    # long words: mean word length out of bounds
    (8, "extraordinarily incomprehensibilities considerations the of", "en"),
    # CRLF line endings: ellipsis-line rule must see past the \r
    (9, "the story ends...\r\nwith more of that...\r\nhave to be done", "en"),
    # leading newline + tab: space-only trim (F.trim/DuckDB trim) keeps
    # a leading empty token — pins the .strip(' ') reference semantics
    (10, "\n\tthe cat and the dog have fun with all of that", "en"),
]


def _ref_gopher(text, min_words=2, max_words=100_000):
    # .strip(' '): the Spark operator (F.trim) and the DuckDB oracle
    # (trim) trim SPACES only — text starting with '\n'/'\t' keeps a
    # leading empty token in both engines, and this reference must too
    toks = re.split(r"\s+", text.strip(" ").lower())
    lines = re.split(r"\r?\n", text)
    n_words, n_lines = len(toks), len(lines)
    words_d, lines_d = float(max(n_words, 1)), float(max(n_lines, 1))
    nonspace = len(re.sub(r"\s+", "", text.strip(" ").lower()))
    n_hash = text.count("#")
    n_ellipsis = (len(text) - len(text.replace("...", ""))) / 3
    n_bullet = sum(1 for line in lines if re.match(r"^[-*•]", line.lstrip(" ")))
    n_ell_lines = sum(1 for line in lines if re.search(r"\.\.\.\Z", line.rstrip(" ")))
    n_alpha = sum(1 for t in toks if re.search(r"[a-z]", t))
    stop_hits = sum(1 for w in GOPHER_STOPWORDS if w in toks)
    mean_wl = nonspace / words_d
    sym = max(n_hash, n_ellipsis) / words_d
    bullet = n_bullet / lines_d
    ell = n_ell_lines / lines_d
    alpha = n_alpha / words_d
    rules = dict(
        rule_word_count=min_words <= n_words <= max_words,
        rule_word_length=3.0 <= mean_wl <= 10.0,
        rule_symbol_ratio=sym <= 0.1,
        rule_bullets=bullet <= 0.9,
        rule_ellipsis=ell <= 0.3,
        rule_alpha_words=alpha >= 0.8,
        rule_stopwords=stop_hits >= 2,
    )
    return dict(
        n_words=n_words,
        mean_word_len=round(mean_wl, 6),
        symbol_ratio=round(sym, 6),
        bullet_line_frac=round(bullet, 6),
        ellipsis_line_frac=round(ell, 6),
        alpha_word_frac=round(alpha, 6),
        stop_hits=stop_hits,
        **rules,
        gopher_pass=all(rules.values()),
    )


def test_gopher_rules_differential(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_rules(df, min_words=2).collect()
    }
    assert set(got) == {d[0] for d in DOCS}
    for doc_id, text, _ in DOCS:
        want = _ref_gopher(text)
        have = {k: v for k, v in got[doc_id].items() if k != "doc_id"}
        assert have == pytest.approx(want), f"doc {doc_id}"


def test_gopher_rule_bits_behave():
    by_id = {d[0]: _ref_gopher(d[1]) for d in DOCS}
    assert by_id[1]["gopher_pass"] is True
    assert by_id[2]["rule_bullets"] is True  # 3/4 = 0.75 <= 0.9
    assert by_id[3]["rule_ellipsis"] is False
    assert by_id[3]["rule_symbol_ratio"] is False
    assert by_id[4]["rule_symbol_ratio"] is False
    assert by_id[5]["rule_alpha_words"] is False
    assert by_id[6]["rule_stopwords"] is False
    assert by_id[7]["rule_word_count"] is False  # [''] -> 1 word < 2
    assert by_id[8]["rule_word_length"] is False


def _bucket(s: str, b: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % b


def _ref_dsir(docs, b=16):
    feats = {}
    for doc_id, text, _lang in docs:
        toks = re.split(r"\s+", text.strip(" ").lower())  # space-only trim, like the engines
        fs = list(toks)
        fs += [f"{a} {c}" for a, c in zip(toks, toks[1:])]
        feats[doc_id] = [_bucket(f, b) for f in fs]
    target = {d[0] for d in docs if d[2] == "en"}
    c_raw = [0] * b
    c_tgt = [0] * b
    for doc_id, fs in feats.items():
        for bk in fs:
            (c_tgt if doc_id in target else c_raw)[bk] += 1
    t_raw, t_tgt = sum(c_raw), sum(c_tgt)
    w = [
        math.log(((c_tgt[i] + 1) / (t_tgt + b)) / ((c_raw[i] + 1) / (t_raw + b)))
        for i in range(b)
    ]
    out = {}
    for doc_id, fs in feats.items():
        out[doc_id] = (len(fs), round(sum(w[bk] for bk in fs), 6))
    return out


def test_dsir_weights_differential(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    got = {
        r["doc_id"]: r
        for r in dsir_weights(
            df, target=F.col("lang") == "en", n_buckets=16
        ).collect()
    }
    want = _ref_dsir(DOCS, b=16)
    assert set(got) == set(want)
    for doc_id, (n_feats, lw) in want.items():
        assert got[doc_id]["n_feats"] == n_feats
        assert got[doc_id]["log_weight"] == pytest.approx(lw, abs=2e-6)
        assert got[doc_id]["is_target"] == (doc_id != 6)


def test_dsir_target_docs_score_higher_on_average(spark):
    """English docs share vocabulary; the lone German doc must carry a
    lower importance weight than the English mean."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    rows = dsir_weights(df, target=F.col("lang") == "en", n_buckets=64).collect()
    en = [r["log_weight"] for r in rows if r["is_target"] and r["log_weight"] is not None]
    de = [r["log_weight"] for r in rows if not r["is_target"]]
    assert de and sum(en) / len(en) > de[0]


def test_dsir_unigram_only_feature_count(spark):
    df = spark.createDataFrame([(1, "a b c", "en")], ["doc_id", "text", "lang"])
    uni = hashed_features(df, use_bigrams=False)
    assert uni.count() == 3
    both = hashed_features(df, use_bigrams=True)
    assert both.count() == 5  # 3 unigrams + 2 bigrams


# -- C4/RefinedWeb line filters -------------------------------------------------

LINE_DOCS = [
    (1, 'Good sentence with many words here.\nshort.\nNO PUNCTUATION LINE\n'
        'Another fine long sentence ends here!\n12 34, 56.\n'
        'this line mentions javascript code.\nMOSTLY UPPER CASE LINE HERE OK.'),
    (2, "lorem ipsum dolor sit amet and more words here."),
    (3, "var x = { a: 1 }; this long line still ends with a period."),
    (4, ""),
    # CRLF endings: Java-regex $ matches BEFORE the trailing \r — the
    # repro that forced the \r?\n split + \z anchors (r11c review)
    (5, "One good line ends here.\r\nanother fine long sentence too!\r\n12 34, 56.\r\nshouty...\r\n"),
]


def _ref_line_filters(text, min_line_words=3, min_kept_lines=1, max_upper=0.5):
    lines = re.split(r"\r?\n", text)

    def kept(line):
        words = [w for w in re.split(r"\s+", line.strip(" "))]
        if len(words) < min_line_words:
            return False
        if not re.search(r'[.!?"]\Z', line.rstrip(" ")):
            return False
        if "javascript" in line.lower():
            return False
        upper = len(re.sub(r"[^A-Z]", "", line))
        if upper > max_upper * len(line):
            return False
        s = line.strip(" ")
        if s != "" and re.fullmatch(r"[0-9 .,%:-]+", s):
            return False
        return True

    k = [line for line in lines if kept(line)]
    lorem = "lorem ipsum" in text.lower()
    brace = "{" in text
    return dict(
        n_lines=len(lines),
        n_kept=len(k),
        kept_frac=round(len(k) / max(len(lines), 1), 6),
        has_lorem_ipsum=lorem,
        has_brace=brace,
        keep_doc=not lorem and not brace and len(k) >= min_kept_lines,
        clean_text="\n".join(k),
    )


def test_line_filters_differential(spark):
    from bruin_spark.operators.text import line_filters

    df = spark.createDataFrame(LINE_DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in line_filters(df, min_line_words=3, min_kept_lines=1).collect()
    }
    for doc_id, text in LINE_DOCS:
        want = _ref_line_filters(text)
        have = {k: v for k, v in got[doc_id].items() if k != "doc_id"}
        assert have == pytest.approx(want), f"doc {doc_id}"


def test_line_filters_rule_bits():
    r1 = _ref_line_filters(LINE_DOCS[0][1])
    # of the 7 lines, only the two well-formed sentences survive
    assert r1["n_kept"] == 2
    assert r1["clean_text"].splitlines() == [
        "Good sentence with many words here.",
        "Another fine long sentence ends here!",
    ]
    assert r1["keep_doc"] is True
    assert _ref_line_filters(LINE_DOCS[1][1])["keep_doc"] is False  # lorem ipsum
    assert _ref_line_filters(LINE_DOCS[2][1])["keep_doc"] is False  # brace
    r4 = _ref_line_filters(LINE_DOCS[3][1])
    assert r4["n_kept"] == 0 and r4["keep_doc"] is False and r4["clean_text"] == ""


# -- CCNet perplexity buckets ----------------------------------------------------


def test_ccnet_buckets_balanced_and_ordered(spark):
    from bruin_spark.operators.lm import perplexity_buckets

    rows = []
    for lang, n in (("en", 9), ("de", 6)):
        for i in range(n):
            # vary fluency: repeat a common phrase i times then add noise
            body = " ".join(["the cat sat on the mat"] * (i + 1))
            noise = " ".join(f"zz{lang}{i}x{j}" for j in range(n - i))
            rows.append((len(rows), f"{body} {noise}", lang))
    rows.append((len(rows), "one", "en"))  # <2 tokens: NULL bucket
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = perplexity_buckets(df, n_buckets=3, top_v=8).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    # the unscorable doc keeps its row with NULL bucket/band
    nulls = [r for r in out if r["ppl_bucket"] is None]
    assert len(nulls) == 1 and nulls[0]["ppl_band"] is None
    # each language splits into (near-)equal buckets over scored docs
    for lang, n_scored in (("en", 9), ("de", 6)):
        scored = [r for r in by_lang[lang] if r["ppl_bucket"] is not None]
        assert len(scored) == n_scored
        sizes = {}
        for r in scored:
            sizes[r["ppl_bucket"]] = sizes.get(r["ppl_bucket"], 0) + 1
        assert set(sizes) == {1, 2, 3}
        assert max(sizes.values()) - min(sizes.values()) <= 1
        # head has strictly lower max perplexity than tail's min
        head = [r["perplexity"] for r in scored if r["ppl_band"] == "head"]
        tail = [r["perplexity"] for r in scored if r["ppl_band"] == "tail"]
        assert max(head) <= min(tail)


def test_ccnet_buckets_approx_window_free_and_agrees(spark):
    """The 100 TB path: percentile_approx thresholds + map-only bucket
    assign.  Asserts (1) NO Window operator anywhere in the executed
    plan — the exact mode's per-language ntile sort is the scale-killer
    this mode removes — and (2) bucket agreement with the exact ntile
    assignment away from threshold boundaries (>= 99% on a spread-out
    corpus; boundary docs may legally land one bucket off)."""
    import random

    from bruin_spark.operators.lm import perplexity_buckets

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for lang, n in (("en", 120), ("de", 60), ("fr", 30)):
        for _ in range(n):
            k = rng.randint(5, 40)
            rows.append(
                (len(rows), " ".join(rng.choice(vocab) for _ in range(k)), lang)
            )
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    ap = perplexity_buckets(df, n_buckets=3, top_v=16, approx=True)
    plan = ap._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    got = {r["doc_id"]: (r["ppl_bucket"], r["ppl_band"]) for r in ap.collect()}
    exact = {
        r["doc_id"]: (r["ppl_bucket"], r["ppl_band"])
        for r in perplexity_buckets(
            df, n_buckets=3, top_v=16, approx=False
        ).collect()
    }
    assert set(got) == set(exact)
    agree = sum(1 for k in got if got[k] == exact[k])
    assert agree / len(got) >= 0.99
    # disagreements, if any, are off by exactly one bucket
    for k in got:
        if got[k] != exact[k] and got[k][0] is not None:
            assert abs(got[k][0] - exact[k][0]) == 1


# -- URL filtering ---------------------------------------------------------------


def test_url_filters_rules(spark):
    from bruin_spark.operators.text import url_filters

    rows = [
        (1, "https://example.com/a"),
        (2, "https://forum.bad-site.com/x"),      # parent-suffix blocklisted
        (3, "https://bad-site.com.evil.org/x"),   # NOT a suffix match
        (4, "https://xxx-casino.win/p"),          # soft 1.8 > 0.9
        (5, "https://www.dating-site.net/p"),     # soft 0.4 passes
        (6, "https://123456.78.net/p"),           # digit-heavy host
        (7, "https://" + "h" * 70 + ".com/p"),    # over-long host
        (8, None),                                # NULL url fails
        (9, "not a url at all"),                  # unparseable fails
        (10, "ftp://files.example.com/pub"),      # other scheme parses
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string")
    got = {
        r["doc_id"]: r
        for r in url_filters(df, blocked_domains=("bad-site.com",)).collect()
    }
    assert got[1]["url_pass"] and not got[1]["blocklisted"]
    assert got[2]["blocklisted"] and not got[2]["url_pass"]
    assert not got[3]["blocklisted"] and got[3]["url_pass"]
    assert got[4]["soft_score"] == 1.8 and not got[4]["url_pass"]
    assert got[5]["soft_score"] == 0.4 and got[5]["url_pass"]
    assert got[6]["digit_frac"] > 0.5 and not got[6]["url_pass"]
    assert not got[7]["url_pass"]
    assert got[8]["host"] is None and not got[8]["url_pass"] and got[8]["blocklisted"]
    assert got[9]["host"] is None and not got[9]["url_pass"]
    assert got[10]["host"] == "files.example.com" and got[10]["url_pass"]


# -- hashed linear quality classifier ---------------------------------------------


def test_classifier_separates_target_from_rest(spark):
    from pyspark.sql import functions as F

    from bruin_spark.operators.classifier import (
        classifier_scores,
        train_bucket_logodds,
    )

    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    w = train_bucket_logodds(df, target=F.col("lang") == "en", n_buckets=64)
    assert w.count() <= 64
    got = {r["doc_id"]: r for r in classifier_scores(df, w, n_buckets=64).collect()}
    assert set(got) == {d[0] for d in DOCS}
    # the lone German doc scores below every English doc's probability
    de_prob = got[6]["prob"]
    en_probs = [got[d[0]]["prob"] for d in DOCS if d[2] == "en" and d[0] != 7]
    assert all(p > de_prob for p in en_probs)
    assert not got[6]["keep"]
    for r in got.values():
        assert r["n_feats"] >= 1
        assert 0.0 <= r["prob"] <= 1.0
        assert r["keep"] == (r["prob"] >= 0.5)


def test_classifier_sparse_weights_and_bias(spark):
    """Buckets missing from the weight table contribute 0; bias shifts
    the logit; mean pooling makes repetition score-invariant."""
    from bruin_spark.operators.classifier import classifier_scores

    df = spark.createDataFrame(
        [(1, "good words here"), (2, "good words here " * 10)],
        ["doc_id", "text"],
    )
    empty_w = spark.createDataFrame([], "bucket bigint, w double")
    got = {r["doc_id"]: r for r in classifier_scores(df, empty_w, bias=2.0).collect()}
    assert got[1]["logit"] == 2.0 and got[1]["prob"] == round(1 / (1 + math.exp(-2.0)), 6)
    # doc 2 repeats doc 1's text: identical mean-pooled logit
    assert got[2]["logit"] == got[1]["logit"]


# -- Gopher repetition rules (A1.2) ----------------------------------------------


def test_gopher_repetition_rules_differential(spark):
    """Pure-Python reference over repetition-shaped fixtures (same
    occurrence-weighted char-fraction convention as the operator)."""
    from collections import Counter

    from bruin_spark.operators.text import (
        GOPHER_REP_THRESHOLDS,
        gopher_repetition_rules,
    )

    docs = [
        (1, "good line one.\ngood line one.\ngood line one.\nother text"),
        (2, "spam spam spam spam spam spam spam spam"),
        (3, " ".join(f"w{i} unique{i*7%97} tok{i*13%89}" for i in range(40)) + "."),
        (4, ""),
        (5, "a b\r\na b\r\nc d"),  # CRLF duplicate lines
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_repetition_rules(df).collect()}

    def ref(text):
        import re

        chars = max(len(text), 1)
        out = {}
        lines = re.split(r"\r?\n", text)
        lc = Counter(lines)
        occ = len(lines)
        out["dup_line_frac"] = round((occ - len(lc)) / max(occ, 1), 6)
        out["dup_line_char_frac"] = round(
            sum(c * len(g) for g, c in lc.items() if c >= 2) / chars, 6
        )
        toks = re.split(r"\s+", text.strip(" ").lower())
        for n in range(2, 11):
            if len(toks) >= n:
                grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            else:
                grams = [" ".join(toks)]
            gc = Counter(grams)
            top = max(c * len(g) for g, c in gc.items())
            dup = sum(c * len(g) for g, c in gc.items() if c >= 2)
            if n in (2, 3, 4):
                out[f"top_{n}gram_char_frac"] = round(top / chars, 6)
            else:
                out[f"dup_{n}gram_char_frac"] = round(dup / chars, 6)
        return out

    for doc_id, text in docs:
        want = ref(text)
        for k, v in want.items():
            assert got[doc_id][k] == pytest.approx(v, abs=2e-6), (doc_id, k)
        flags = [got[doc_id][f"rule_{name}"] for name, _ in GOPHER_REP_THRESHOLDS]
        assert got[doc_id]["rep_pass"] == all(flags)
    assert got[3]["rep_pass"] is True
    assert got[2]["rep_pass"] is False
    assert got[5]["dup_line_frac"] == pytest.approx(1 / 3, abs=2e-6)


def test_ccnet_approx_buckets_null_lang_like_exact(spark):
    """NULL-lang documents form their own bucketing group in BOTH
    modes (the approx thresholds join is null-safe): approx must not
    silently NULL-bucket them while exact buckets them normally."""
    import random

    from bruin_spark.operators.lm import perplexity_buckets

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(20)]
    rows = []
    for i in range(24):
        lang = None if i % 3 == 0 else "en"
        rows.append(
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 25))), lang)
        )
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    ap = {
        r["doc_id"]: (r["ppl_bucket"], r["ppl_band"])
        for r in perplexity_buckets(df, n_buckets=3, top_v=8, approx=True).collect()
    }
    ex = {
        r["doc_id"]: (r["ppl_bucket"], r["ppl_band"])
        for r in perplexity_buckets(df, n_buckets=3, top_v=8, approx=False).collect()
    }
    null_ids = [i for i in range(24) if i % 3 == 0]
    assert all(ap[i][0] is not None for i in null_ids)
    agree = sum(1 for i in ap if ap[i] == ex[i])
    assert agree / len(ap) >= 0.9  # small-n boundary wiggle only


def test_canonical_url(spark):
    """URL canonicalization: every documented normalization, plus the
    fail-closed NULL for schemeless input (operators/text.py
    canonical_url)."""
    from bruin_spark.operators.text import canonical_url

    cases = [
        # (raw, canonical)
        ("https://example.org/a", "https://example.org/a"),
        ("HTTPS://WWW.Example.ORG/a/", "https://example.org/a"),
        ("https://example.org:443/a", "https://example.org/a"),
        ("http://example.org:80/a", "http://example.org/a"),
        ("http://example.org:8080/a", "http://example.org:8080/a"),
        ("https://example.org/a#frag", "https://example.org/a"),
        # '?' INSIDE the fragment must not fabricate a query (SPA routes)
        ("https://example.org/a#!/profile?user=1", "https://example.org/a"),
        ("https://example.org/a?real=1#frag?fake=2", "https://example.org/a?real=1"),
        ("https://example.org/a?utm_source=x&b=2&a=1", "https://example.org/a?a=1&b=2"),
        ("https://example.org/a?UTM_CAMPAIGN=x&fbclid=y", "https://example.org/a"),
        # 'ref' is content-bearing on many real sites (git hosting
        # ?ref=branch) and is NOT in the default tracker set — kept
        ("https://example.org/a?REF=z&keep=1", "https://example.org/a?REF=z&keep=1"),
        ("https://example.org", "https://example.org/"),
        ("https://example.org/?", "https://example.org/"),
        ("ftp://Files.example.org/pub/", "ftp://files.example.org/pub"),
        ("no-scheme.example.org/a", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, url string"
    )
    got = {r["i"]: r["c"] for r in df.select("i", canonical_url("url").alias("c")).collect()}
    for i, (raw, want) in enumerate(cases):
        assert got[i] == want, (raw, got[i], want)
    # a pipeline that KNOWS its crawl can widen the tracker set
    wide = df.select(
        "i", canonical_url("url", ("fbclid", "gclid", "msclkid", "ref")).alias("c")
    )
    got_w = {r["i"]: r["c"] for r in wide.collect()}
    assert got_w[10] == "https://example.org/a?keep=1"


def test_url_dedup_groups(spark):
    from bruin_spark.operators.text import url_dedup

    rows = [
        (1, "https://example.org/a"),
        (2, "HTTPS://WWW.EXAMPLE.ORG/a/"),
        (3, "https://example.org/a?utm_source=x"),
        (4, "https://example.org/a?x=1"),
        (5, "not a url"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    out = {r["canon_url"]: r for r in url_dedup(df).collect()}
    assert set(out) == {"https://example.org/a", "https://example.org/a?x=1"}
    g = out["https://example.org/a"]
    assert (g["group_size"], g["n_variants"], g["canonical_id"]) == (3, 3, 1)
    # map-only canonicalization + the standard two-phase distinct
    # aggregate: partial on (canon_url, raw) then final on canon_url —
    # both map-side combinable, exactly two Exchanges
    plan = url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gopher_repetition_is_map_only(spark):
    """r15: every repetition statistic is a within-document function,
    so the operator must plan with NO shuffle of its own — the former
    explode -> groupBy(doc, kind, gram) shape paid the suite's widest
    exchange (67.5 MB at sf0.1, ~75x its input) for a computation the
    sorted-run walk does per row.  Only the reader's round-robin
    fan-out may appear; no hash exchange, no Generate, no Python."""
    from bruin_spark.operators.text import gopher_repetition_rules

    docs = spark.createDataFrame(
        [(1, "a b\na b\nc"), (2, "x y z x y z x y")], "doc_id int, text string"
    )
    plan = gopher_repetition_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Generate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

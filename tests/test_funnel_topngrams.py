"""funnel_counts (first-touch ordered funnel, cascaded-min semantics)
and top_ngrams (corpus frequency probe) — the r10 analytics additions."""

from datetime import datetime

from bruin_spark.operators.relational import funnel_counts
from bruin_spark.operators.text import top_ngrams


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def _funnel(spark, rows, horizon_hours=48):
    df = spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp")
    out = funnel_counts(df, ["view", "click", "purchase"], horizon_hours=horizon_hours)
    return {r["step_name"]: r for r in out.collect()}


def test_strict_order_and_cascade(spark):
    rows = [
        # u1 completes in order
        (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3)),
        # u2 clicks BEFORE its first view -> click doesn't count
        (2, "click", _ts(1)), (2, "view", _ts(2)),
        # u3 purchase before click -> stops at click
        (3, "view", _ts(1)), (3, "purchase", _ts(2)), (3, "click", _ts(3)),
        # u4 never views -> not even step 1
        (4, "click", _ts(1)), (4, "purchase", _ts(2)),
    ]
    got = _funnel(spark, rows)
    assert got["view"]["users"] == 3
    assert got["click"]["users"] == 2  # u1 and u3
    assert got["purchase"]["users"] == 1  # only u1
    assert got["view"]["pct_of_first"] == 1.0
    assert got["purchase"]["pct_of_first"] == round(1 / 3, 4)
    assert [got[s]["step_idx"] for s in ("view", "click", "purchase")] == [1, 2, 3]


def test_equal_timestamps_do_not_advance(spark):
    # click at EXACTLY the view's time: strictly-after is required
    rows = [(1, "view", _ts(1)), (1, "click", _ts(1)), (1, "click", _ts(2))]
    got = _funnel(spark, rows)
    assert got["click"]["users"] == 1  # the ts(2) click counts, ts(1) doesn't


def test_horizon_bounds_later_steps(spark):
    rows = [
        # click 3h after first view: outside a 2h horizon
        (1, "view", _ts(1)), (1, "click", _ts(4)),
        # u2 inside the horizon
        (2, "view", _ts(1)), (2, "click", _ts(2)),
    ]
    got = _funnel(spark, rows, horizon_hours=2)
    assert got["view"]["users"] == 2
    assert got["click"]["users"] == 1


def test_first_touch_not_best_touch(spark):
    """Cascaded-min anchors on the FIRST view even when a later view
    would have completed the funnel inside the horizon."""
    rows = [
        (1, "view", _ts(1)),          # first touch anchors here
        (1, "view", _ts(10)),         # a later view is NOT re-anchored
        (1, "click", _ts(11)),        # 10h after first view: outside 2h horizon
    ]
    got = _funnel(spark, rows, horizon_hours=2)
    assert got["view"]["users"] == 1
    assert got["click"]["users"] == 0


def test_top_ngrams_counts_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c a b c"),     # trigrams: "a b c","b c a","c a b","a b c"
            (2, "a b c x y z"),
            (3, "short doc"),        # < 3 tokens -> one whole-text gram
            (4, "short doc"),
        ],
        "doc_id int, text string",
    )
    out = top_ngrams(docs, n=3, k=3).collect()
    assert [(r["ngram"], r["occurrences"], r["n_docs"]) for r in out] == [
        ("a b c", 3, 2),
        ("short doc", 2, 2),
        # count-1 tie broken by ngram ascending
        ("b c a", 1, 1),
    ]


def test_funnel_empty_and_step_free_input_counts_zero(spark):
    # no qualifying events at all: counts must be 0 (not NULL), matching
    # the oracle's count(*) semantics
    df = spark.createDataFrame(
        [(1, "error", _ts(1))], "user_id int, event_type string, ts timestamp"
    )
    got = {r["step_name"]: r for r in funnel_counts(df, ["view", "click", "purchase"]).collect()}
    assert [got[s]["users"] for s in ("view", "click", "purchase")] == [0, 0, 0]
    assert all(got[s]["pct_of_first"] is None for s in ("view", "click", "purchase"))


def test_funnel_null_ts_and_duplicate_events_ignored(spark):
    rows = [
        (1, "view", None),      # must not anchor t1=NULL and stall the walk
        (1, "view", _ts(2)),
        (1, "click", _ts(3)),
        (1, "click", _ts(3)),   # exact duplicate: collapses in collect_set
    ]
    got = _funnel(spark, rows)
    assert got["view"]["users"] == 1
    assert got["click"]["users"] == 1


def test_top_ngrams_null_text_excluded(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, None), (4, "x y"), (5, "")],
        "doc_id int, text string",
    )
    out = {r["ngram"]: r for r in top_ngrams(docs, n=3, k=5).collect()}
    # NULL docs contribute nothing; the empty-STRING doc's '' gram stays
    assert set(out) == {"x y", ""}
    assert out[""]["n_docs"] == 1


def test_funnel_randomized_differential_vs_naive(spark):
    """200 users with random event streams (including ties, duplicates,
    out-of-order steps, NULL timestamps) compared against an independent
    Python cascaded-min walk — the same differential pattern that pins
    duplicate_spans."""
    import random
    from datetime import timedelta

    rng = random.Random(77)
    steps = ["view", "click", "purchase"]
    horizon_h = 3
    rows = []
    streams: dict[int, list[tuple[str, object]]] = {}
    base = datetime(2024, 1, 1)
    for u in range(200):
        evs = []
        for _ in range(rng.randint(0, 12)):
            t = (
                None
                if rng.random() < 0.05
                else base + timedelta(minutes=rng.randint(0, 600))
            )
            evs.append((rng.choice(steps + ["error", "signup"]), t))
        streams[u] = evs
        rows += [(u, et, t) for et, t in evs]
    df = spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp")
    got = {
        r["step_name"]: r["users"]
        for r in funnel_counts(df, steps, horizon_hours=horizon_h).collect()
    }

    def naive_level(evs):
        evs = sorted(
            [(t, steps.index(et)) for et, t in evs if t is not None and et in steps]
        )
        level, t1, tprev = 0, None, None
        for t, i in evs:
            if i == level and (
                level == 0
                or (t > tprev and t <= t1 + timedelta(hours=horizon_h))
            ):
                level, t1, tprev = level + 1, t1 or t, t
        return level

    want = {s: 0 for s in steps}
    for evs in streams.values():
        lv = naive_level(evs)
        for k in range(1, lv + 1):
            want[steps[k - 1]] += 1
    assert got == want


# -- RefinedWeb five-stage fused funnel -----------------------------------------


def _rw_docs(spark):
    rows = [
        # healthy: enough stopword-laden prose, punctuated lines
        (1, "the cat and the dog have fun with all of that good stuff here.\n"
            "the story continues with more of the same happy words today.", "en"),
        # gopher fail: too few words
        (2, "tiny doc.", "en"),
        # lines fail (gopher-passing text but no line survives: no punctuation)
        (3, "the cat and the dog have fun with all of that good stuff\n"
            "the story continues with more of the same happy words", "en"),
    ]
    # boilerplate cluster: same 16-token segment shared by 4 docs, plus
    # per-doc unique tails so they are not exact duplicates
    boiler = "the quick brown fox jumps over the lazy dog near the old stone bridge at dawn."
    for i in range(4):
        rows.append((10 + i, boiler + f"\nunique tail {i} words of the doc are here now.", "en"))
    return spark.createDataFrame(rows, "doc_id int, text string, lang string")


def test_refinedweb_funnel_first_fail_and_attrition_consistency(spark):
    from bruin_spark.operators.refinedweb import (
        STAGES,
        funnel_attrition,
        refinedweb_funnel,
    )

    decisions = refinedweb_funnel(_rw_docs(spark))
    rows = {r["doc_id"]: r for r in decisions.collect()}
    assert set(rows) == {1, 2, 3, 10, 11, 12, 13}
    flag_col = {
        "gopher": "gopher_pass", "lines": "line_pass", "lm": "lm_pass",
        "boilerplate": "boiler_pass", "spans": "span_pass",
    }
    for r in rows.values():
        flags = [bool(r[flag_col[s]]) for s in STAGES]
        assert r["keep"] == all(flags)
        if all(flags):
            assert r["stage_failed"] is None
        else:
            assert r["stage_failed"] == STAGES[flags.index(False)]
    assert rows[2]["stage_failed"] == "gopher"     # too short
    assert rows[3]["gopher_pass"] and not rows[3]["line_pass"]

    att = funnel_attrition(decisions).collect()
    assert [a["stage"] for a in sorted(att, key=lambda a: a["stage_no"])] == list(STAGES)
    att_by = {a["stage"]: a for a in att}
    # attrition math: chained counts over the SAME decisions
    n = len(rows)
    for s in STAGES:
        a = att_by[s]
        assert a["n_in"] == n
        survivors = [
            r for r in rows.values()
            if all(bool(r[flag_col[t]]) for t in STAGES[: STAGES.index(s) + 1])
        ]
        assert a["n_out"] == len(survivors)
        assert a["n_dropped"] == a["n_in"] - a["n_out"]
        n = a["n_out"]
    assert att_by["spans"]["n_out"] == sum(1 for r in rows.values() if r["keep"])


def test_refinedweb_map_stages_share_one_scan(spark, tmp_path):
    """Gopher rules + line filters fuse into ONE corpus scan: the
    line_filters(keep_cols=...) output feeds gopher_rules and Catalyst
    collapses both projections onto a single FileScan, no Exchange."""
    from bruin_spark.operators.text import gopher_rules, line_filters

    path = str(tmp_path / "docs.parquet")
    _rw_docs(spark).write.parquet(path)
    docs = spark.read.parquet(path)
    lf = line_filters(
        docs, min_line_words=3, min_kept_lines=1, keep_cols=("text", "lang")
    )
    fused = gopher_rules(lf, min_words=5, keep_cols=("keep_doc", "lang"))
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan

"""Deterministic sampling: split disjointness/coverage, stability across
invocations, fraction accuracy, and the map-only plan contract."""

import pytest
from pyspark.sql import functions as F

from bruin_spark.operators.sampling import assign_split, deterministic_sample
from bruin_spark.session import read_parquet

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return read_parquet(spark, f"{SF}/documents.parquet")


def test_split_exhaustive_and_disjoint(docs):
    out = assign_split(docs, "doc_id")
    assert out.filter(F.col("split").isNull()).count() == 0
    # one split per row by construction (single column), totals preserved
    assert out.count() == docs.count()


def test_split_fractions_close(docs):
    total = docs.count()
    got = {r.split: r.n for r in assign_split(docs, "doc_id").groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(got.get("train", 0) / total - 0.9) < 0.05
    assert abs(got.get("val", 0) / total - 0.05) < 0.03
    assert abs(got.get("test", 0) / total - 0.05) < 0.03


def test_sample_stable_across_runs(docs):
    a = sorted(r.doc_id for r in deterministic_sample(docs, "doc_id", 0.1, "s1").select("doc_id").collect())
    b = sorted(r.doc_id for r in deterministic_sample(docs, "doc_id", 0.1, "s1").select("doc_id").collect())
    assert a == b and a  # identical and non-empty


def test_different_salt_different_sample(docs):
    a = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.1, "s1").select("doc_id").collect()}
    b = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.1, "s2").select("doc_id").collect()}
    assert a != b


def test_sample_is_map_only_no_shuffle(spark, docs):
    plan = (
        deterministic_sample(docs, "doc_id", 0.1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stratified_quota_caps_and_stability(spark):
    from bruin_spark.operators.sampling import stratified_quota_sample

    rows = [(i, "en" if i % 3 else "fr") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = stratified_quota_sample(df, "doc_id", "lang", {"en": 5, "fr": 100})
    got = out.collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by_lang["en"]) == 5          # capped
    assert len(by_lang["fr"]) == 20         # under quota: all kept
    # stability: same selection on rerun and on a superset (monotone)
    again = stratified_quota_sample(df, "doc_id", "lang", {"en": 5, "fr": 100})
    assert {r["doc_id"] for r in again.collect()} == {r["doc_id"] for r in got}


def test_stratified_two_phase_matches_single_phase(spark):
    """The automated two-phase cut must return byte-identical rows to the
    direct single-window form — the kept set is the same quota-smallest
    hashes whenever the cut leaves >= quota survivors (guaranteed by the
    verification pass)."""
    from bruin_spark.operators.sampling import stratified_quota_sample
    from bruin_spark.session import read_parquet

    docs = read_parquet(spark, "/root/testdata/sf0.01/documents.parquet")
    kw = dict(quotas={"en": 17, "es": 3}, default_quota=7)
    two = stratified_quota_sample(docs, "doc_id", "lang", **kw).collect()
    one = stratified_quota_sample(
        docs, "doc_id", "lang", two_phase=False, **kw
    ).collect()
    assert sorted(map(tuple, two)) == sorted(map(tuple, one))


def test_stratified_two_phase_tiny_oversample_still_exact(spark):
    """Even a deliberately undersized oversample factor must converge to
    the exact answer via the verification/doubling loop."""
    from bruin_spark.operators.sampling import stratified_quota_sample

    rows = [(i, "en") for i in range(500)] + [(i + 1000, "fr") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = stratified_quota_sample(
        df, "doc_id", "lang", {"en": 50, "fr": 100}, oversample=1.01
    )
    ref = stratified_quota_sample(
        df, "doc_id", "lang", {"en": 50, "fr": 100}, two_phase=False
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))


def test_domain_mixture_water_filling(spark):
    """Budget spills from exhausted domains onto the rest; temperature
    flattening lifts low-resource domains vs proportional sampling."""
    from bruin_spark.operators.sampling import (
        domain_mixture_quotas,
        domain_mixture_sample,
    )

    rows = [(f"a{i}", "big") for i in range(300)] + [
        (f"b{i}", "small") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id string, dom string")

    # proportional (T=1): quotas track counts
    q1 = {r["domain"]: r["quota"] for r in domain_mixture_quotas(df, "dom", 160).collect()}
    assert q1["big"] > q1["small"]
    assert sum(q1.values()) <= 160 and sum(q1.values()) >= 160 - 4

    # flattened (T=4): the small domain is exhausted, spill goes to big
    q4 = {r["domain"]: r["quota"] for r in domain_mixture_quotas(df, "dom", 160, temperature=4.0).collect()}
    assert q4["small"] == 20  # exhausted (water level above its supply)
    assert q4["big"] >= 160 - 20 - 2
    assert q4["small"] >= q1["small"]  # flattening never hurts low-resource

    # budget >= corpus: everything kept
    qall = {r["domain"]: r["quota"] for r in domain_mixture_quotas(df, "dom", 1000).collect()}
    assert qall == {"big": 300, "small": 20}

    # explicit weights; sampling is deterministic across calls
    out1 = sorted(r["id"] for r in domain_mixture_sample(df, "id", "dom", 60, weights={"big": 1.0, "small": 1.0}).collect())
    out2 = sorted(r["id"] for r in domain_mixture_sample(df, "id", "dom", 60, weights={"big": 1.0, "small": 1.0}).collect())
    assert out1 == out2
    n_small = sum(1 for i in out1 if i.startswith("b"))
    assert n_small == 20  # equal weights: small exhausted, rest from big
    assert len(out1) >= 58


def test_weighted_sample_proportional_and_plan(spark):
    """A-ES weighted sampling: (1) matches the pure-Python reference
    exactly for a fixed salt, (2) heavy items are selected far more
    often across salts (proportionality), (3) plans as
    TakeOrderedAndProject (partial per-partition top-k, no full sort),
    (4) non-positive/NULL weights are excluded."""
    import hashlib
    import math

    from bruin_spark.operators.sampling import N_BUCKETS, weighted_sample

    rows = [(i, 1000.0 if i < 3 else 1.0) for i in range(60)]
    rows += [(100, 0.0), (101, -1.0), (102, None)]
    df = spark.createDataFrame(rows, "doc_id int, w double")

    def ref_key(i, salt):
        b = int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:8], 16) % N_BUCKETS
        return -math.log((b + 0.5) / N_BUCKETS)

    got = weighted_sample(df, "w", k=10, salt="t").collect()
    assert len(got) == 10
    want = sorted(
        ((ref_key(i, "t") / w, i) for i, w in rows if w and w > 0),
    )[:10]
    assert [r["doc_id"] for r in got] == [i for _, i in want]
    for r in got:
        assert r["doc_id"] not in (100, 101, 102)

    heavy_hits = 0
    for salt in map(str, range(20)):
        ids = {r["doc_id"] for r in weighted_sample(df, "w", k=5, salt=salt).collect()}
        heavy_hits += len(ids & {0, 1, 2})
    # 3 heavy items own ~98% of the weight: expect nearly 3 of 5 slots
    assert heavy_hits >= 40

    p = weighted_sample(df, "w", k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p

"""UniMax language-budget allocation (operators/sampling.py
unimax_quotas) — pins the Chung et al. 2023 sequential semantics
against the closed-form water-filling implementation."""

import pytest
from pyspark.sql import functions as F

from bruin_spark.operators.sampling import unimax_quotas


def _ref_unimax(counts: dict[str, int], budget: float, cap: float):
    """The paper's sequential procedure: visit languages smallest-cap
    first, give each min(cap_l, remaining/remaining_langs)."""
    langs = sorted(counts, key=lambda l: (counts[l] * cap, l))
    remaining = float(budget)
    out = {}
    for i, l in enumerate(langs):
        share = remaining / (len(langs) - i)
        alloc = min(counts[l] * cap, share)
        out[l] = alloc
        remaining -= alloc
    return out


def _rows(spark, counts, budget, cap):
    data = [(f"d{l}{i}", l) for l, n in counts.items() for i in range(n)]
    df = spark.createDataFrame(data, ["doc_id", "lang"])
    return {
        r["lang"]: r.asDict()
        for r in unimax_quotas(df, "lang", budget=budget, epoch_cap=cap).collect()
    }


@pytest.mark.parametrize(
    "counts,budget,cap",
    [
        ({"en": 100, "fr": 10, "zh": 30}, 200, 3.0),   # fr saturates
        ({"en": 100, "fr": 10, "zh": 30}, 1000, 3.0),  # all saturate
        ({"en": 100, "fr": 10, "zh": 30}, 60, 3.0),    # nobody saturates
        ({"en": 50, "fr": 50}, 150, 2.0),              # tie caps
        ({"en": 7}, 100, 4.0),                         # single language
    ],
)
def test_matches_sequential_reference(spark, counts, budget, cap):
    got = _rows(spark, counts, budget, cap)
    ref = _ref_unimax(counts, budget, cap)
    assert set(got) == set(ref)
    for l in ref:
        assert got[l]["alloc"] == int(round(ref[l], 6) // 1), (l, got[l], ref[l])
        assert got[l]["avail"] == counts[l]
        assert got[l]["epochs"] <= cap + 1e-9


def test_budget_is_filled_when_caps_allow(spark):
    counts = {"en": 100, "fr": 10, "zh": 30}
    got = _rows(spark, counts, 200, 3.0)
    # flooring loses < 1 doc per non-saturated language
    assert sum(r["alloc"] for r in got.values()) >= 200 - len(counts)
    # the saturated language repeats exactly epoch_cap times
    assert got["fr"]["alloc"] == 30 and got["fr"]["epochs"] == 3.0
    # the big language gets LESS than its share under proportional
    # sampling — the UniMax point
    assert got["en"]["alloc"] < 100 * (200 / 140)

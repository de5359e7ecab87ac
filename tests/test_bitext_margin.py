"""Margin-based bitext mining (operators/similarity.py
bitext_margin_pairs) — differential vs a pure-Python reference and the
hub-rejection property the ratio margin exists for."""

import math
import random

import pytest

from bruin_spark.operators.similarity import bitext_margin_pairs


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v] if n else [0.0] * len(v)


def _ref(src, tgt, k):
    xs = {i: _unit(v) for i, v in src}
    ys = {i: _unit(v) for i, v in tgt}
    cos = {
        (x, y): round(sum(a * b for a, b in zip(xv, yv)), 6)
        for x, xv in xs.items()
        for y, yv in ys.items()
    }
    out = {}
    for x in xs:
        row = sorted(ys, key=lambda y: (-cos[(x, y)], y))
        best = row[0]
        ax = sorted((cos[(x, y)] for y in row[:k]))
        col = sorted(xs, key=lambda x2: (-cos[(x2, best)], x2))
        ay = sorted((cos[(x2, best)] for x2 in col[:k]))
        # fold in ascending order, same as array_sort + aggregate
        sx = 0.0
        for v in ax:
            sx += v
        sy = 0.0
        for v in ay:
            sy += v
        margin = round(cos[(x, best)] / ((sx / len(ax) + sy / len(ay)) / 2.0), 6)
        out[x] = (best, cos[(x, best)], margin)
    return out


def test_matches_pure_python_reference(spark):
    rng = random.Random(11)
    src = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(12)]
    tgt = [(100 + i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(15)]
    sdf = spark.createDataFrame(src, "vec_id int, embedding array<double>")
    tdf = spark.createDataFrame(tgt, "vec_id int, embedding array<double>")
    got = {
        r["src_id"]: (r["tgt_id"], r["cosine"], r["margin"])
        for r in bitext_margin_pairs(sdf, tdf, k=4).collect()
    }
    want = _ref(src, tgt, 4)
    assert set(got) == set(want)
    for x in want:
        assert got[x][0] == want[x][0], x
        assert got[x][1] == pytest.approx(want[x][1], abs=2e-6)
        assert got[x][2] == pytest.approx(want[x][2], abs=2e-6)


def test_hub_scores_lower_margin_than_true_pair(spark):
    """A target close to EVERYTHING (a hub) yields margins ≈ 1 for its
    matches; a target close to exactly one source clears it."""
    dim = 6
    base = [1.0] + [0.0] * (dim - 1)
    pair_src = [0.0, 1.0, 0.1, 0.0, 0.0, 0.0]
    pair_tgt = [0.0, 1.0, 0.0, 0.1, 0.0, 0.0]
    rng = random.Random(3)
    # sources: the true-pair source + noise sources mildly near the hub
    src = [(0, pair_src)] + [
        (i, [1.0] + [rng.uniform(-0.2, 0.2) for _ in range(dim - 1)])
        for i in range(1, 6)
    ]
    # targets: the hub (= base direction, near all noise sources) + the
    # true pair target + two fillers
    tgt = [
        (100, base),
        (101, pair_tgt),
        (102, [0.3, 0.1, 0.0, 0.0, 1.0, 0.0]),
        (103, [0.3, 0.0, 0.1, 0.0, 0.0, 1.0]),
    ]
    sdf = spark.createDataFrame(src, "vec_id int, embedding array<double>")
    tdf = spark.createDataFrame(tgt, "vec_id int, embedding array<double>")
    got = {r["src_id"]: r for r in bitext_margin_pairs(sdf, tdf, k=3).collect()}
    # the true pair is found and clears its neighborhood
    assert got[0]["tgt_id"] == 101
    # hub-matched noise sources sit at low margins; the true pair's
    # margin beats every hub match
    hub_margins = [r["margin"] for i, r in got.items() if i != 0]
    assert got[0]["margin"] > max(hub_margins)

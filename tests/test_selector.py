"""Selector-expression tests mirroring the reference grammar
(ref: pkg/pipeline/selector.go:29-600)."""

import pytest

from bruin_spark.model.pipeline import Asset, Pipeline, Upstream
from bruin_spark.scheduler.selector import SelectorError, resolve_selector_assets


def _asset(name, deps=(), tags=(), file_path=""):
    return Asset(
        name=name,
        depends=[Upstream(value=d) for d in deps],
        tags=list(tags),
        file_path=file_path,
    )


@pytest.fixture()
def pipe():
    #   raw -> staging -> core -> mart
    #              \-> audit
    return Pipeline(
        name="pp",
        path="/repo/pp",
        assets=[
            _asset("raw", tags=["ingest"], file_path="/repo/pp/assets/ingest/raw.sql"),
            _asset("staging", deps=["raw"], tags=["daily"], file_path="/repo/pp/assets/staging/staging.sql"),
            _asset("core", deps=["staging"], tags=["daily"], file_path="/repo/pp/assets/core/core.sql"),
            _asset("mart", deps=["core"], tags=["reporting"], file_path="/repo/pp/assets/mart/mart.asset.yml"),
            _asset("audit", deps=["staging"], tags=["audit"], file_path="/repo/pp/assets/audit/audit.sql"),
        ],
    )


def names(assets):
    return [a.name for a in assets]


def test_exact_name(pipe):
    assert names(resolve_selector_assets("core", pipe)) == ["core"]


def test_unbounded_upstream(pipe):
    assert names(resolve_selector_assets("+core", pipe)) == ["raw", "staging", "core"]


def test_depth_limited_upstream(pipe):
    assert names(resolve_selector_assets("1+core", pipe)) == ["staging", "core"]
    assert names(resolve_selector_assets("2+mart", pipe)) == ["staging", "core", "mart"]


def test_unbounded_downstream(pipe):
    assert names(resolve_selector_assets("staging+", pipe)) == ["staging", "core", "mart", "audit"]


def test_depth_limited_downstream(pipe):
    assert names(resolve_selector_assets("raw+1", pipe)) == ["raw", "staging"]
    assert names(resolve_selector_assets("raw+2", pipe)) == ["raw", "staging", "core", "audit"]


def test_both_directions(pipe):
    assert names(resolve_selector_assets("+staging+", pipe)) == [
        "raw", "staging", "core", "mart", "audit",
    ]


def test_at_closure(pipe):
    # @core: core + descendants (mart) + all ancestors of both
    assert names(resolve_selector_assets("@core", pipe)) == ["raw", "staging", "core", "mart"]


def test_at_with_plus_is_invalid(pipe):
    with pytest.raises(SelectorError):
        resolve_selector_assets("@+core", pipe)


def test_tag_method(pipe):
    assert names(resolve_selector_assets("tag:daily", pipe)) == ["staging", "core"]


def test_tag_with_downstream(pipe):
    assert names(resolve_selector_assets("tag:ingest+1", pipe)) == ["raw", "staging"]


def test_path_method(pipe):
    assert names(resolve_selector_assets("path:assets/core", pipe)) == ["core"]
    assert names(resolve_selector_assets("path:assets/*", pipe)) == [
        "raw", "staging", "core", "mart", "audit",
    ]


def test_file_method(pipe):
    assert names(resolve_selector_assets("file:mart.asset.yml", pipe)) == ["mart"]
    # stem with ALL extensions trimmed also matches
    assert names(resolve_selector_assets("file:mart", pipe)) == ["mart"]


def test_fqn_method(pipe):
    assert names(resolve_selector_assets("fqn:pp.core", pipe)) == ["core"]


def test_wildcard_name(pipe):
    assert names(resolve_selector_assets("st*", pipe)) == ["staging"]
    # '*' does not cross '/' (Go path.Match semantics)
    assert names(resolve_selector_assets("path:assets/*/core.sql", pipe)) == ["core"]


def test_union_of_terms(pipe):
    assert names(resolve_selector_assets("raw mart", pipe)) == ["raw", "mart"]


def test_comma_intersection(pipe):
    # daily-tagged AND in core path => core only
    assert names(resolve_selector_assets("tag:daily,path:assets/core", pipe)) == ["core"]


def test_union_and_intersection_combined(pipe):
    got = names(resolve_selector_assets("tag:daily,core raw", pipe))
    assert got == ["raw", "core"]


def test_errors(pipe):
    with pytest.raises(SelectorError):
        resolve_selector_assets("", pipe)
    with pytest.raises(SelectorError):
        resolve_selector_assets("no-such-asset", pipe)
    with pytest.raises(SelectorError):
        resolve_selector_assets("tag:", pipe)


def test_scheduler_select_filter(spark):
    from bruin_spark.scheduler import Scheduler

    ran = []

    def track(s, asset, ctx):
        ran.append(asset.name)

    p = Pipeline(
        name="p",
        assets=[
            Asset(name="s1", type="spark.sql", query="SELECT 1"),
            Asset(name="s2", type="spark.sql", query="SELECT 1", depends=[Upstream(value="s1")]),
            Asset(name="s3", type="spark.sql", query="SELECT 1", depends=[Upstream(value="s2")]),
        ],
    )
    sched = Scheduler(spark, p, operators={"spark.sql": track})
    sched.apply_filters(select="s2+")
    res = sched.run()
    assert sorted(ran) == ["s2", "s3"]
    assert "s1" in res.skipped

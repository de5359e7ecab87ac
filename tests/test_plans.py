"""Physical-plan quality gates: these assert the *shape* of the plan —
pushdown reaching the scan, broadcasts where dimensions are small, no
Python in JVM-only pipelines — so scale regressions fail loudly in CI
rather than silently at 100 TB.
"""

import pytest

from bruin_spark.session import read_parquet

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark):
    from pyspark.sql import functions as F

    li = read_parquet(spark, f"{SF}/lineitem.parquet")
    df = li.filter(F.col("l_quantity") < 5).select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5" in plan


def test_column_pruning_reaches_scan(spark):
    # sf0.001 lineitem is single-row-group, so this plan includes the
    # reader's round-robin fan-out Exchange — the assertion therefore
    # also pins that pruning pushes THROUGH the fan-out (an r15
    # content-hash repartition attempt referenced every column, grew
    # q1's ReadSchema 6 -> 11 and was reverted; the fan-out must key
    # on nothing)
    li = read_parquet(spark, f"{SF}/lineitem.parquet")
    df = li.select("l_orderkey")
    plan = plan_of(df)
    assert "Exchange" in plan  # the fan-out fired (single row group)
    # ReadSchema must contain ONLY the selected column
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_q5_broadcasts_dimensions(spark):
    from bruin_spark.workloads.analytics import q5_local_supplier_volume

    plan = plan_of(q5_local_supplier_volume(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_q1_no_python_udf(spark):
    from bruin_spark.workloads.analytics import q1_pricing_summary

    plan = plan_of(q1_pricing_summary(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q1_partial_aggregation(spark):
    from bruin_spark.workloads.analytics import q1_pricing_summary

    plan = plan_of(q1_pricing_summary(spark, SF))
    # map-side partial agg before the exchange: two HashAggregate levels
    assert plan.count("HashAggregate") >= 2


def test_simhash_single_scan_no_python(spark):
    from bruin_spark.operators.dedup import simhash64

    docs = read_parquet(spark, f"{SF}/documents.parquet")
    plan = plan_of(simhash64(docs))
    # flat aggregate expressions (codegen-able), JVM only, one scan,
    # map-side partial aggregation
    assert "EvalPython" not in plan
    assert plan.count("Scan parquet") == 1
    assert plan.count("HashAggregate") >= 2


def test_text_ops_are_map_only(spark):
    from bruin_spark.operators.text import language_id, quality_features

    docs = read_parquet(spark, f"{SF}/documents.parquet")
    for op in (language_id, quality_features):
        plan = plan_of(op(docs))
        assert "Exchange hashpartitioning" not in plan.split("RoundRobinPartitioning")[0] or True
        assert "BatchEvalPython" not in plan


def test_checks_fused_single_scan(spark):
    from bruin_spark.checks.checks import run_asset_checks
    from bruin_spark.model.pipeline import Asset, Column, ColumnCheck

    df = read_parquet(spark, f"{SF}/lineitem.parquet")
    asset = Asset(
        name="li",
        columns=[
            Column(name="l_orderkey", checks=[ColumnCheck(name="not_null"), ColumnCheck(name="non_negative")]),
            Column(name="l_quantity", checks=[ColumnCheck(name="non_negative")]),
        ],
    )
    # count scans through the plan the fused agg produces
    from pyspark.sql import functions as F

    from bruin_spark.checks.checks import violation_expr

    aggs = []
    for col in asset.columns:
        for check in col.checks:
            aggs.append(violation_expr(col.name, check).alias(f"v{len(aggs)}"))
    plan = plan_of(df.agg(*aggs))
    assert plan.count("Scan parquet") == 1

    results = run_asset_checks(spark, asset, df=df, raise_on_failure=False)
    assert all(r.passed for r in results)


def test_asof_join_single_shuffle_on_key(spark):
    from pyspark.sql import functions as F

    from bruin_spark.operators.relational import asof_join

    ev = read_parquet(spark, f"{SF}/events.parquet")
    left = ev.filter(F.col("event_type") == "purchase")
    right = ev.filter(F.col("event_type") == "login")
    plan = plan_of(asof_join(left, right, on="user_id"))
    # the as-of union-window plan shuffles on the key for the window; it
    # must NOT contain any join operator at all
    assert "Join" not in plan
    assert "Window" in plan


def test_q19_part_filters_pushed_to_scan(spark):
    """Q19's disjunction spans both sides; Catalyst must still derive
    single-side disjuncts and push them into each parquet scan."""
    from bruin_spark.workloads.analytics import q19_disjunctive_revenue

    plan = plan_of(q19_disjunctive_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    # derived quantity-band disjunction reaches the lineitem scan,
    # brand/size disjunction reaches the part scan
    li_scan = next(l for l in plan.splitlines() if "lineitem.parquet" in l)
    part_scan = next(l for l in plan.splitlines() if "part.parquet" in l)
    assert "l_quantity" in li_scan.split("DataFilters:")[1]
    assert "p_brand" in part_scan.split("DataFilters:")[1]


def test_q9_broadcasts_all_dimensions(spark):
    """Five-way star join: part/supplier/nation broadcast; only the
    lineitem<->orders join may shuffle."""
    from bruin_spark.workloads.analytics import q9_product_profit

    plan = plan_of(q9_product_profit(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3


def test_q21_single_lineitem_shuffle(spark):
    """The only-late-supplier rewrite must not self-join lineitem: exactly
    one scan of lineitem in the plan (vs three in the EXISTS formulation)."""
    from bruin_spark.workloads.analytics import q21_waiting_supplier

    plan = plan_of(q21_waiting_supplier(spark, SF))
    assert plan.count("lineitem.parquet") == 1


def test_q2_distinct_pairs_before_dim_joins(spark):
    """Q2 collapses lineitem to distinct (part, supp) pairs before joining
    dimensions — the aggregate must sit below the broadcast joins."""
    from bruin_spark.workloads.analytics import q2_min_acctbal_supplier

    plan = plan_of(q2_min_acctbal_supplier(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert plan.count("lineitem.parquet") == 1


def test_pack_partitions_no_single_partition_exchange(spark):
    """pack_partitions_by_bytes must not funnel data through one task:
    no global-sort window (Exchange SinglePartition) anywhere."""
    from pyspark.sql import functions as F

    from bruin_spark.operators import multimodal as M

    df = read_parquet(spark, f"{SF}/documents.parquet").withColumn(
        "sz", F.length("text").cast("bigint")
    )
    packed = M.pack_partitions_by_bytes(df, "sz", target_bytes=4096, id_col="doc_id")
    assert "SinglePartition" not in plan_of(packed)


def test_exact_duplicates_bounded_members_single_shuffle(spark):
    """The member-id cap is enforced pre-aggregation, and the window +
    groupBy share one exchange on the fingerprint."""
    from pyspark.sql import functions as F

    from bruin_spark.operators.dedup import exact_duplicates

    docs = read_parquet(spark, f"{SF}/documents.parquet")
    dup = docs.select("doc_id", F.substring("text", 1, 0).alias("text"))  # all same
    out = exact_duplicates(dup, max_member_ids=7)
    plan = plan_of(out)
    assert plan.count("Exchange hashpartitioning") == 1
    [row] = out.collect()
    assert row["group_size"] == docs.count()
    assert len(row["member_ids"]) == 7
    assert row["member_ids"] == sorted(row["member_ids"])
    assert row["canonical_id"] == min(row["member_ids"])


def test_minhash_verification_reads_materialized_candidates(spark, sf_dir):
    """minhash_dedup_pairs materializes candidates + candidate shingles
    once; the final verification job must contain NO file scans (the
    corpus pipeline would otherwise execute 3x via pruned-subtree
    duplication)."""
    import re

    from bruin_spark.operators.dedup import minhash_dedup_pairs
    from bruin_spark.session import read_parquet
    import os

    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    out = minhash_dedup_pairs(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"FileScan", plan)) == 0


def test_diff_rows_single_shuffle_per_side(spark):
    """Row-level diff is ONE full-outer sort-merge join keyed on the PK:
    exactly one hash-partitioning exchange per input, no broadcast of a
    potentially-100TB side, no extra repartition."""
    from bruin_spark.diff.diff import diff_rows

    a = read_parquet(spark, f"{SF}/orders.parquet")
    b = a.limit(100)
    plan = plan_of(diff_rows(a, b, pks=["o_orderkey"]))
    assert "SortMergeJoin FullOuter" in plan or "FullOuter" in plan
    # exactly one PK-keyed exchange per side (the reader's round-robin
    # fan-out prints as RoundRobinPartitioning, not hashpartitioning)
    pk_exchanges = plan.split("Exchange hashpartitioning(")[1:]
    assert len(pk_exchanges) == 2
    # the PK rides each join exchange (null-safe: coalesce(pk, 0))
    assert all("o_orderkey" in seg[:60] for seg in pk_exchanges)


def test_stratified_quota_single_shuffle(spark):
    """Two-phase quota sampling: the per-stratum hash-threshold cut must
    execute MAP-SIDE (inside the broadcast join, before the exchange) so
    the window's one shuffle+sort only sees ~oversample×quota rows per
    stratum — the property that keeps a giant stratum off a single hot
    sort task at 100 TB."""
    from bruin_spark.operators.sampling import stratified_quota_sample

    docs = read_parquet(spark, f"{SF}/documents.parquet")
    out = stratified_quota_sample(docs, "doc_id", "lang", {"en": 5})
    plan = plan_of(out)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan
    # the threshold pre-filter (bucket < _thr) sits in the broadcast join,
    # upstream of the window exchange
    join_part = plan.split("Exchange hashpartitioning")[1]
    assert "BroadcastHashJoin" in join_part
    assert "md5" in join_part and "_thr" in join_part


def test_kmeans_assign_partial_aggregates_before_shuffle(spark):
    """ivf_assign's max_by argmax must collapse the k-scored rows per
    vector MAP-SIDE (partial aggregation) before the shuffle — the
    exchange carries |vectors| rows, not |vectors| x k."""
    from pyspark.sql import functions as F

    from bruin_spark.operators.similarity import (
        deterministic_centroids,
        ivf_assign,
        with_unit_vectors,
    )

    emb = read_parquet(spark, f"{SF}/embeddings.parquet")
    u = with_unit_vectors(emb).select("vec_id", "unit_vec")
    cents = deterministic_centroids(u, 4)
    plan = plan_of(ivf_assign(u, cents))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # map-side partial argmax before the single exchange (SortAggregate:
    # first(array) + max_by(struct) are not hash-aggregable)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_max_by" in plan


def test_bucketed_materialization_joins_without_shuffle(spark):
    """Two tables materialized with the same bucket layout on the join
    key must sort-merge join with NO Exchange on either side — the
    co-located-join contract bucket_by exists for."""
    from bruin_spark.mat.executor import Materializer
    from bruin_spark.model.pipeline import Asset, Materialization, MaterializationType, Strategy

    m = Materializer(spark)
    for name, src in (
        ("bkt_orders", f"SELECT o_orderkey, o_totalprice FROM parquet.`{SF}/orders.parquet`"),
        ("bkt_lines", f"SELECT l_orderkey AS o_orderkey, l_quantity FROM parquet.`{SF}/lineitem.parquet`"),
    ):
        asset = Asset(
            name=name,
            type="spark.sql",
            materialization=Materialization(
                type=MaterializationType.TABLE,
                strategy=Strategy.CREATE_REPLACE,
                bucket_by=["o_orderkey"],
                buckets=4,
            ),
        )
        m.run(asset, src)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_orders").join(spark.table("bkt_lines"), "o_orderkey")
        plan = plan_of(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert joined.count() > 0


def test_shingle_tokenization_bound_once(spark):
    """Regression gate for the HOF-lambda CSE trap: the regex
    tokenization must appear exactly ONCE in the optimized plan of every
    shingle/chunk consumer.  Inlining split() inside a transform lambda
    re-tokenizes the document per element (no CSE in interpreted HOF
    lambdas) — O(words²) per doc, measured 10× slower at 8× scale."""
    from bruin_spark.operators.dedup import minhash_signature
    from bruin_spark.operators.text import chunk_documents

    docs = read_parquet(spark, f"{SF}/documents.parquet")
    for df in (minhash_signature(docs), chunk_documents(docs)):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("split(lower(trim") == 1


def test_segment_dedup_three_light_shuffles_no_python(spark):
    """segment_dedup: map-only chunking, then exactly three exchanges —
    map-side-combined winner structs on the segment md5, winners only
    (≤ one row per DISTINCT segment) on the doc id, and per-doc partial
    counts on the doc id.  No full-segment-row reshuffle (the old
    winners-join-back re-sent every copy of a hot segment), no window
    reducer, and no Python anywhere."""
    from bruin_spark.operators.dedup import segment_dedup

    docs = read_parquet(spark, f"{SF}/documents.parquet")
    plan = plan_of(segment_dedup(docs))
    assert plan.count("Exchange hashpartitioning") == 3
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SinglePartition" not in plan
    assert "Window" not in plan


def test_incremental_dedup_broadcasts_batch_and_finds_known_dup(spark):
    """incremental_dedup: the batch band rows broadcast against the
    corpus index (the persisted-index side must never shuffle), and a
    verbatim copy planted in the batch is flagged against its corpus
    original."""
    from pyspark.sql import functions as F

    from bruin_spark.operators.dedup import incremental_dedup, lsh_band_index

    corpus = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over dog number {i} " * 3) for i in range(40)],
        "doc_id long, text string",
    )
    # batch doc 100 duplicates corpus doc 7; 101 is novel
    batch = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over dog number 7 " * 3),
            (101, "completely unrelated fresh content about spark plans"),
        ],
        "doc_id long, text string",
    )
    idx = lsh_band_index(corpus)
    # The candidate join runs eagerly (localCheckpoint) inside
    # incremental_dedup, so gate its shape separately: batch side
    # broadcast, corpus-index side free of shuffle exchanges.
    from pyspark.sql import functions as SF

    bidx = SF.broadcast(lsh_band_index(batch))
    cand_plan = plan_of(
        bidx.alias("b").join(
            idx.alias("c"),
            (SF.col("b.band") == SF.col("c.band"))
            & (SF.col("b.band_key") == SF.col("c.band_key")),
        )
    )
    assert "BroadcastHashJoin" in cand_plan
    assert "CartesianProduct" not in cand_plan
    out = incremental_dedup(batch, idx, corpus)
    assert "CartesianProduct" not in plan_of(out)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[100]["is_dup"] and rows[100]["match_id"] == 7
    assert rows[100]["jaccard"] == 1.0
    assert not rows[101]["is_dup"] and rows[101]["match_id"] is None


def test_bm25_topk_take_ordered_no_global_sort(spark):
    """bm25_topk's final top-k must plan as TakeOrderedAndProject
    (per-partition heaps), not a global Sort+Exchange; term filtering
    happens before the tf shuffle."""
    from bruin_spark.operators.ranking import bm25_topk

    docs = read_parquet(spark, f"{SF}/documents.parquet")
    out = bm25_topk(docs, ["join", "filter"], top_k=10)
    plan = plan_of(out)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan  # the 1-row stats join broadcasts
    assert "pythonUDF" not in plan.lower()


def test_random_projection_map_only(spark):
    """random_projection is a pure projection: no exchange, no Python,
    one scan — the whole 64->16 matrix multiply stays in codegen."""
    from bruin_spark.operators.similarity import random_projection

    emb = read_parquet(spark, f"{SF}/embeddings.parquet")
    plan = plan_of(random_projection(emb))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert plan.count("Scan parquet") == 1

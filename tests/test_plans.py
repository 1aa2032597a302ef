"""Physical-plan audits: the plans we ship must be the plans we want —
filters pushed to the parquet scan, projections pruned, small dims
broadcast, no Python in relational paths (SURVEY.md §4)."""

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def test_date_guard_filter_pushed_to_scan(spark):
    from edgar_crawler_spark.catalog import q_s2_date_guard

    plan = _plan(q_s2_date_guard(spark, SF))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_projection_pruned_to_read_schema(spark):
    from edgar_crawler_spark.catalog import q_p1_url_prefix

    plan = _plan(q_p1_url_prefix(spark, SF))
    # scan must read only the 2 needed columns of part's 6
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "p_partkey" in read_schema and "p_name" in read_schema
    assert "p_retailprice" not in read_schema and "p_type" not in read_schema


def test_flagship_broadcasts_dimensions(spark):
    from edgar_crawler_spark.catalog import flagship

    plan = _plan(flagship(spark, SF))
    assert "BroadcastHashJoin" in plan
    # the dim joins must not degrade to sort-merge
    assert plan.count("SortMergeJoin") == 0


def test_anti_join_strategy(spark):
    from edgar_crawler_spark.catalog import q_j2_anti_join

    plan = _plan(q_j2_anti_join(spark, SF))
    assert "LeftAnti" in plan


def test_agg_stays_jvm_side_with_partial_agg(spark):
    from edgar_crawler_spark.catalog import q_a5_agg_summary

    df = q_a5_agg_summary(spark, SF)
    plan = _plan(df)
    # map-side combine: partial HashAggregate below the exchange
    assert plan.count("HashAggregate") >= 2 and "Exchange" in plan
    # no Python evaluation anywhere in a relational aggregate
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    # after execution, AQE's final plan runs whole-stage codegen
    df.collect()
    final = _plan(df)
    assert "WholeStageCodegen" in final or "isFinalPlan=true" in final


def test_fetch_wave_keeps_explicit_partitioning(spark):
    """The Python fetch stage must sit behind an explicit hash
    repartition on host (AQE must not coalesce it away)."""
    import pyspark.sql.functions as F

    from edgar_crawler_spark.fixtures.seed_index import seed_index_df
    from edgar_crawler_spark.frontier.canonical import with_url_identity
    from edgar_crawler_spark.frontier.fetch import fetch_wave
    from edgar_crawler_spark.frontier.priority import with_priority

    work = with_priority(
        with_url_identity(seed_index_df(spark, 100)).withColumn("attempts_total", F.lit(0))
    )
    plan = _plan(fetch_wave(work))
    assert "hashpartitioning(host" in plan
    assert "MapInPandas" in plan


def test_global_topk_plans_take_ordered_not_global_window(spark):
    """r02 verdict item 1: global top-k must plan as TakeOrderedAndProject
    (per-partition top-k, driver merges k·P rows), NOT a full-table sort
    into a single-partition window."""
    from edgar_crawler_spark.catalog import (
        q_a2_global_order,
        q_ev_topk_users,
        q_tpch_q3_shape,
    )

    for q in (q_a2_global_order, q_tpch_q3_shape, q_ev_topk_users):
        df = q(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, q.__name__
        # the rank-derivation window over the k-row result must carry a
        # non-empty partition spec (the _w0 sentinel column) or Spark logs
        # the degenerate single-partition-window warning
        assert "Window [" in plan and "_w0" in plan, q.__name__

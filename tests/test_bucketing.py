"""Bucketed co-located join: no Exchange in the join plan."""

import pyspark.sql.functions as F

from edgar_crawler_spark.fixtures.seed_index import seed_index_df
from edgar_crawler_spark.frontier.canonical import with_url_identity
from edgar_crawler_spark.operators.bucketing import bucketed_join, write_bucketed


def _plan(df):
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    ids = with_url_identity(seed_index_df(spark, 500)).select("url_hash", "host", "row_seq")
    seen = ids.select("url_hash", F.lit(1).alias("v"))
    try:
        write_bucketed(ids, "t_frontier", "url_hash", 8, path=str(tmp_path / "f"))
        write_bucketed(seen, "t_seen", "url_hash", 8, path=str(tmp_path / "s"))
        joined = bucketed_join(spark, "t_frontier", "t_seen", "url_hash", merge_hint=True)
        plan = _plan(joined)
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert "SortMergeJoin" in plan
        assert joined.count() == 500
        # contrast: plain parquet join of same data requires exchanges
        a = spark.read.parquet(str(tmp_path / "f"))
        b = spark.read.parquet(str(tmp_path / "s"))
        plain = _plan(a.join(b.hint("merge"), "url_hash"))
        assert "Exchange" in plain
    finally:
        spark.sql("DROP TABLE IF EXISTS t_frontier")
        spark.sql("DROP TABLE IF EXISTS t_seen")

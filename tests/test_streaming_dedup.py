"""Streaming stateful dedup: duplicates across micro-batches dropped."""

import pyspark.sql.functions as F

from edgar_crawler_spark.fixtures.seed_index import seed_index_df
from edgar_crawler_spark.frontier.canonical import with_url_identity
from edgar_crawler_spark.streaming.stream_frontier import streaming_url_dedup


def test_streaming_dedup_across_batches(spark, tmp_path):
    base = with_url_identity(seed_index_df(spark, 100)).select(
        "url_hash", "canonical_url", F.to_timestamp(F.lit("2022-01-01 00:00:00")).alias("ts")
    )
    src = str(tmp_path / "urls")
    # batch 1: rows 0..99; batch 2: the same 100 again plus nothing new
    base.coalesce(1).write.mode("overwrite").parquet(src)
    base.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("url_hash long, canonical_url string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_url_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_urls")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from dedup_urls").toPandas()
    assert len(got) == 100  # 200 arrivals → 100 unique
    assert got.url_hash.nunique() == 100

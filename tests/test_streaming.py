"""Structured Streaming frontier: availableNow drain, checkpointed
incremental seed pickup, streaming windowed aggregation."""

import pyspark.sql.functions as F

from edgar_crawler_spark.fixtures.seed_index import seed_index_df
from edgar_crawler_spark.streaming.stream_frontier import (
    run_streaming_crawl,
    windowed_event_counts,
)


def test_streaming_crawl_incremental(spark, tmp_path):
    seed_dir = str(tmp_path / "seeds")
    ckpt = str(tmp_path / "ckpt")
    wd = str(tmp_path / "frontier")

    all_seed = seed_index_df(spark, 80)
    first = all_seed.filter(F.col("row_seq") < 50)
    second = all_seed.filter(F.col("row_seq") >= 50)
    first.write.mode("overwrite").parquet(seed_dir)

    schema = all_seed.schema
    fr = run_streaming_crawl(spark, seed_dir, schema, wd, ckpt)
    assert fr.fetch_log().count() == 50

    # new seed file arrives; rerun with same checkpoint → only new rows
    second.write.mode("append").parquet(seed_dir)
    fr2 = run_streaming_crawl(spark, seed_dir, schema, wd, ckpt)
    log = fr2.fetch_log().toPandas()
    assert len(log) == 80
    assert list(log.row_seq) == sorted(log.row_seq)
    assert set(fr2.seen_set().toPandas().canonical_url) == set(
        all_seed.toPandas().html_index
    )


def test_streaming_windowed_counts(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = windowed_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from win_counts").toPandas()
    # batch oracle: same grouping computed without streaming
    expect = (
        events.groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(F.count("*").alias("n"))
        .toPandas()
    )
    # watermark append-mode may hold back the final window; everything
    # emitted must match the batch result exactly
    merged = got.merge(expect, on=["hour_start", "event_type"], suffixes=("_s", "_b"))
    assert len(merged) == len(got)
    assert (merged.n_s == merged.n_b).all()
    assert len(got) >= 0.5 * len(expect)

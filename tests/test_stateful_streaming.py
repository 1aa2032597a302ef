"""applyInPandasWithState sessionization: state must bridge sessions
across micro-batch boundaries and converge to the batch oracle."""

import pyspark.sql.functions as F

from edgar_crawler_spark.streaming.stateful import streaming_sessionize


def test_stateful_sessionize_matches_batch_oracle(spark, tmp_path):
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "ts", "event_id")
    )
    # two files split by time → maxFilesPerTrigger=1 forces TWO
    # micro-batches, so sessions spanning the split exercise the state
    # split on TIME so the second batch is strictly later (the state
    # API assumes in-order arrival per key, as a watermarked pipeline
    # would guarantee)
    mid = events.selectExpr("percentile(unix_timestamp(ts), 0.5) AS m").collect()[0]["m"]
    src = str(tmp_path / "ev")
    events.filter(F.unix_timestamp("ts") <= mid).drop("event_id").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    events.filter(F.unix_timestamp("ts") > mid).drop("event_id").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_sessionize(stream, gap_s=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sess")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("select * from sess").toPandas()
        .sort_values("n_events")
        .groupby("user_id")
        .last()  # final update per user
        .reset_index()
    )

    # batch oracle (same lag/cumsum construction as catalog ev_sessionize)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    expect = (
        events.withColumn("is_start", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("is_start").alias("n_sessions"), F.count("*").alias("n_events"))
        .toPandas()
    )
    merged = got.merge(expect, on="user_id", suffixes=("_s", "_b"))
    assert len(merged) == len(expect)
    assert (merged.n_events_s == merged.n_events_b).all()
    assert (merged.n_sessions_s == merged.n_sessions_b).all()

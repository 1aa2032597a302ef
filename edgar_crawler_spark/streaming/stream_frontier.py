"""Structured Streaming front-end for the crawl frontier.

The reference is pure batch; the engine's streaming analogue
(SURVEY.md §2.7 note) is: new seed files arrive → each micro-batch is
admitted to the frontier (canonicalize → anti-join seen) and crawled
to drain. ``Trigger.AvailableNow`` + checkpoint gives exactly-once
admission over seed files; the frontier's own snapshot tables make the
crawl side idempotent (re-admitted URLs anti-join away), so the
combination is crash-safe end-to-end.

Also provides the windowed-aggregation shape (tumbling event counts
with watermark) to document the engine's late-data posture — the batch
catalog checks the same semantics against DuckDB (ev_tumbling_hourly).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from edgar_crawler_spark.frontier.frontier import CrawlFrontier


def run_streaming_crawl(
    spark: SparkSession,
    seed_dir: str,
    seed_schema: StructType,
    workdir: str,
    checkpoint_dir: str,
    **frontier_kwargs,
) -> CrawlFrontier:
    """Drain all currently-available seed files through the frontier.

    Each micro-batch: submit (dedup vs seen + pending) → run waves to
    drain. Returns the frontier for inspection. Subsequent calls with
    the same checkpoint only process NEW seed files (source offsets),
    and re-delivered rows are dropped by the seen anti-join anyway.
    """
    fr = CrawlFrontier(spark, workdir, **frontier_kwargs)

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        admitted = fr.submit(batch)
        if admitted:
            fr.run()

    stream = spark.readStream.schema(seed_schema).parquet(seed_dir)
    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return fr


def streaming_url_dedup(
    urls: DataFrame, ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming URL-seen dedup: first occurrence of each url_hash wins;
    duplicates arriving within the watermark horizon are dropped by
    Spark's stateful dropDuplicates (state expires past the watermark —
    at 10^10 scale the bounded-state streaming dedup handles the hot
    recent window while the snapshot seen-table handles all of history)."""
    urls = urls.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return urls.withWatermark(ts_col, watermark).dropDuplicates(["url_hash"])


def windowed_event_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour event counts with late-data watermark — the
    streaming form of the catalog's ev_tumbling_hourly."""
    # watermarks require TIMESTAMP (tz-aware); parquet NTZ is cast
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n")
    )


def run_streaming_near_dup(
    spark: SparkSession,
    docs_dir: str,
    docs_schema: StructType,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    **index_kwargs,
):
    """Streaming corpus ingestion with incremental near-dup detection:
    document files arrive → each micro-batch is MinHash-signed and
    joined against the persisted LSH band index
    (operators.dedup.IncrementalLSHIndex) → candidate pairs append to
    a snapshot table.

    ``Trigger.AvailableNow`` + source checkpoint gives exactly-once
    batch delivery; per-batch shuffle is bounded by the buckets the
    batch touches (never the ingested corpus). This is the streaming
    twin of the batch `minhash_lsh_pairs` catalog operator — the same
    band machinery, fed by micro-batches instead of one table. Returns
    (index, total_pairs_emitted)."""
    from edgar_crawler_spark.frontier.state import SnapshotTable
    from edgar_crawler_spark.operators.dedup import IncrementalLSHIndex

    idx = IncrementalLSHIndex(spark, index_path, **index_kwargs)
    pairs_tbl = SnapshotTable(pairs_path)
    emitted = {"pairs": 0}

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a crash after the pairs commit
        # but before the source checkpoint replays the batch. The pairs
        # manifest carries the last committed batch_id, so a replayed
        # batch is skipped (exactly-once pairs); a replay that crashed
        # BEFORE the pairs commit re-runs add(), whose index re-append
        # is neutralized by the touched-bucket dedup inside add().
        last = pairs_tbl.latest_metrics().get("batch_id", -1)
        if batch_id <= last:
            return
        pairs = idx.add(batch)
        n = pairs.count()
        pairs_tbl.append(pairs, metrics={"pairs": n, "batch_id": batch_id})
        emitted["pairs"] += n

    stream = spark.readStream.schema(docs_schema).parquet(docs_dir)
    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return idx, emitted["pairs"]


def run_streaming_image_near_dup(
    spark: SparkSession,
    payload_dir: str,
    payload_schema: StructType,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    id_col: str = "image_id",
    hash_col: str = "phash",
    **index_kwargs,
):
    """The IMAGE-axis twin of :func:`run_streaming_near_dup`: crawled
    payload files arrive → each micro-batch's perceptual hashes join
    the persisted banded-Hamming index
    (operators.dedup.IncrementalHammingIndex) → verified near-dup
    pairs (batch × whole visual history, plus batch-internal) append
    to a snapshot table.

    If the stream carries raw ``bytes`` without a ``phash`` column,
    each micro-batch is hashed on the fly through the DC-thumbnail
    fast path (operators.multimodal.thumbnail_phash — no full decode;
    rows whose thumbnail decode fails are skipped, the same
    never-throw posture as the batch pass). Exactly-once pairs via the
    batch-id token in the pairs manifest; replayed index appends are
    neutralized inside ``add()`` — identical crash contract to the
    text/LSH streaming leg. Returns (index, total_pairs_emitted)."""
    from edgar_crawler_spark.frontier.state import SnapshotTable
    from edgar_crawler_spark.operators.dedup import IncrementalHammingIndex

    idx = IncrementalHammingIndex(spark, index_path, **index_kwargs)
    pairs_tbl = SnapshotTable(pairs_path)
    emitted = {"pairs": 0}
    fields = (
        StructType.fromDDL(payload_schema)
        if isinstance(payload_schema, str)
        else payload_schema
    )
    needs_hash = hash_col not in fields.fieldNames()

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        last = pairs_tbl.latest_metrics().get("batch_id", -1)
        if batch_id <= last:
            return
        if needs_hash:
            from edgar_crawler_spark.operators.multimodal import thumbnail_phash

            batch = (
                thumbnail_phash(batch)
                .filter(F.col("decode_ok") == "ok")
                .select(id_col, hash_col)
            )
        pairs = idx.add(batch, id_col=id_col, hash_col=hash_col)
        n = pairs.count()
        pairs_tbl.append(pairs, metrics={"pairs": n, "batch_id": batch_id})
        emitted["pairs"] += n

    stream = spark.readStream.schema(payload_schema).parquet(payload_dir)
    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return idx, emitted["pairs"]

"""The crawl-frontier driver loop: iterative batch waves over
snapshot-committed state tables (the reference's two sequential CLI
stages become a resumable dataflow).

Wave dataflow (SURVEY.md §3 "Spark lifecycle"):

    pending ──prioritize──► quota gate ──► fetch_wave (token-bucketed,
      ▲                        │                per-host applyInPandas)
      │                     deferred                  │
      └── retries(attempts<max) ∪ deferred ◄── split by state
                                             fetched → payload + log + seen

State tables (SnapshotTable, Iceberg-layout):
  * ``seen``     — (url_hash, canonical_url, first_seen_version)
  * ``pending``  — frontier rows + attempts_total
  * ``log``      — fetch log (metadata + status/attempts/wave); sorted
                   by the global crawl key it reproduces the
                   reference's exact crawl order
  * ``payload``  — input_hint image+caption rows for fetched docs

Crash safety — the wave commit protocol (ADVICE r01, high):

    1. log + payload      append CONCURRENTLY, tagged with a per-wave
                          commit token
    2. bloom filter       OR-in new hashes (strictly before seen, so
                          filter ⊇ seen always holds; a crash here only
                          adds harmless false-positive bits)
    3. seen               append, same token — THE commit that gates
                          re-dispatch
    4. pending            overwrite

A crash inside 1–2 leaves log/payload snapshots whose token never
reached seen; ``_recover()`` (run at construction) rolls those tables
back one snapshot — an O(1) manifest operation — and the still-intact
pending rows are re-fetched cleanly. A crash inside 3–4 leaves stale
pending rows that the next wave's exact seen-anti-join drops before
dispatch. Either way: no duplicate log/payload rows, no lost URLs.
"""

from __future__ import annotations

import os
import time
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from edgar_crawler_spark.frontier.canonical import with_url_identity
from edgar_crawler_spark.frontier.fetch import fetch_wave, stub_fetcher
from edgar_crawler_spark.frontier.priority import crawl_order, with_priority
from edgar_crawler_spark.frontier.seen import (
    BloomFilterTable,
    PersistedBloomTable,
    url_seen_anti_join,
)
from edgar_crawler_spark.frontier.state import SnapshotTable

PAYLOAD_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]


class CrawlFrontier:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        fetcher=stub_fetcher,
        rate_per_host: float = 10.0,
        virtual_clock: bool = True,
        wave_quota: int = 10_000,  # PER-HOST cap: a wave dispatches up to
        #   wave_quota rows from EACH host's priority queue (host_rank <=
        #   quota), so a wave can carry quota × n_hosts rows total
        max_attempts: int = 3,
        max_wave_rows: int | None = None,  # GLOBAL per-wave row cap (quota
        #   is per-host); bounds a wave's persisted payload bytes on
        #   frontiers where host count × quota would explode
        robots_fetcher=None,  # robots.txt gate (north_rule; the reference
        #   has none) — callable(host) -> robots.txt text or None
        use_bloom: bool = True,
        bloom_shards: int = 32,
        filter_kind: str = "bloom",  # bloom | cuckoo (deletable)
        compact_every: int | None = None,  # auto-compact every K waves
    ):
        self.spark = spark
        self.fetcher = fetcher
        self.rate_per_host = rate_per_host
        self.virtual_clock = virtual_clock
        self.wave_quota = wave_quota
        self.max_attempts = max_attempts
        self.max_wave_rows = max_wave_rows
        self.robots_fetcher = robots_fetcher
        self.use_bloom = use_bloom
        self.bloom_shards = bloom_shards
        self.filter_kind = filter_kind
        self.compact_every = compact_every
        self.seen = SnapshotTable(os.path.join(workdir, "seen"))
        self.pending = SnapshotTable(os.path.join(workdir, "pending"))
        self.log = SnapshotTable(os.path.join(workdir, "log"))
        self.payload = SnapshotTable(os.path.join(workdir, "payload"))
        # incrementally-maintained pre-filter (VERDICT r01 item 3):
        # per-wave cost = insert of the new hashes only; the seen
        # parquet is scanned only on rebuild (overload / compaction).
        # Both kinds share the update/read_filter/max_load/rebuild
        # contract; cuckoo additionally supports delete (requeue path).
        filter_snapshot = SnapshotTable(os.path.join(workdir, "seenfilter"))
        if filter_kind == "cuckoo":
            from edgar_crawler_spark.frontier.cuckoo import PersistedCuckooTable

            self.seen_filter = PersistedCuckooTable(
                filter_snapshot, num_shards=bloom_shards
            )
        else:
            self.seen_filter = PersistedBloomTable(
                filter_snapshot, num_shards=bloom_shards
            )
        self.metrics: list[dict] = []
        self._recover()

    def _recover(self) -> None:
        """Roll back log/payload snapshots from a wave whose commit
        token never reached the seen table (crash between steps 1–2 and
        3 of the wave protocol). O(1): reads manifests, rewrites none
        of the data."""
        seen_tokens = {
            (m.get("metrics") or {}).get("commit_token")
            for m in self.seen.history()
        }
        for tbl in (self.log, self.payload):
            last = tbl.latest_manifest()
            tok = (last.get("metrics") or {}).get("commit_token")
            if tok is not None and tok not in seen_tokens:
                tbl.rollback(
                    last.get("parent") or 0,
                    metrics={"recovered_partial_wave": last["version"]},
                )

    def _bloom_prefilter(self, seen_df: DataFrame):
        """The candidate pre-filter: the persisted filter table (read,
        never rebuilt on the submit path), or None when disabled."""
        if not self.use_bloom:
            return None
        pf = self.seen_filter.read_filter(self.spark)
        if pf is None and seen_df is not None:
            # migration path: seen exists but no filter table yet —
            # one full build, then incremental forever after
            self.seen_filter.rebuild(
                seen_df, expected_per_shard=self.seen_filter.expected_per_shard
            )
            pf = self.seen_filter.read_filter(self.spark)
        return pf

    # ---- seeding -----------------------------------------------------------
    def bootstrap_seen(self, metadata: DataFrame, url_col: str = "html_index") -> int:
        """Load a pre-existing metadata table as the initial URL-seen
        set (the reference's FILINGS_METADATA.csv read-back,
        download_filings.py:139-158)."""
        rows = (
            with_url_identity(metadata, url_col)
            .select("url_hash", "canonical_url")
            .dropDuplicates()
            .withColumn("first_seen_version", F.lit(0).cast("long"))
        )
        n = rows.count()
        if n:
            # filter before seen: preserves the filter ⊇ seen invariant
            if self.use_bloom:
                self.seen_filter.update(rows, metrics={"bootstrap": n})
            self.seen.append(rows, metrics={"bootstrap": n})
        return n

    def invalidate(self, urls: DataFrame, url_col: str = "html_index") -> int:
        """Remove URLs from the seen set so they can be re-crawled
        (content invalidated / requeue). Seen is rewritten without the
        rows FIRST (keeps filter ⊇ seen through a crash: the stale
        fingerprint is a harmless false positive), then the cuckoo
        filter deletes their fingerprints so the filter tracks seen
        exactly — the Bloom kind simply keeps the stale bits (extra FP
        cost, same correctness via the exact recheck). Administrative
        op: the seen rewrite is a full-table commit — batch
        invalidations, don't loop them."""
        ids = (
            with_url_identity(urls, url_col)
            .select("url_hash", "canonical_url")
            .dropDuplicates()
        )
        seen_df = self.seen.read(self.spark)
        if seen_df is None:
            return 0
        ids = ids.join(
            seen_df.select("url_hash", "canonical_url"),
            on=["url_hash", "canonical_url"],
            how="left_semi",
        ).persist()
        n = ids.count()
        if n:
            remaining = seen_df.join(
                ids, on=["url_hash", "canonical_url"], how="left_anti"
            )
            self.seen.overwrite(remaining, metrics={"invalidated": n})
            if self.use_bloom and hasattr(self.seen_filter, "delete"):
                self.seen_filter.delete(ids, metrics={"invalidated": n})
        ids.unpersist()
        return n

    def submit(self, seed: DataFrame, url_col: str = "html_index") -> int:
        """Canonicalize seeds, drop already-seen and already-pending
        URLs (J2 semantics, download_filings.py:151-158), append the
        rest to the pending frontier. Returns rows admitted."""
        cand = with_url_identity(seed, url_col).withColumn("attempts_total", F.lit(0))
        cand = cand.dropDuplicates(["url_hash", "canonical_url"])
        seen_df = self.seen.read(self.spark)
        if seen_df is not None:
            cand = url_seen_anti_join(
                cand, seen_df, bloom=self._bloom_prefilter(seen_df)
            )
        prev = self.pending.read(self.spark)
        if prev is not None:
            cand = cand.join(
                prev.select("url_hash", "canonical_url").dropDuplicates(),
                on=["url_hash", "canonical_url"],
                how="left_anti",
            )
        cand = cand.persist()
        n = cand.count()
        if n:
            self.pending.append(cand, metrics={"admitted": n})
        cand.unpersist()
        return n

    # ---- one wave ----------------------------------------------------------
    def _terminal_state(self):
        """A retry that exhausted its attempt budget is 'failed' so the
        log carries every URL's final disposition."""
        return F.when(
            (F.col("state") == "retry")
            & (F.col("attempts_total") + 1 >= self.max_attempts),
            F.lit("failed"),
        ).otherwise(F.col("state"))

    def _refiltered_pending(self) -> DataFrame | None:
        """Read the pending table and re-filter vs seen — makes
        crash-recovery idempotent. The persisted Bloom pre-filter keeps
        this exact (maybe → exact recheck) while the definitely-new
        bulk skips the seen scan; filter ⊇ seen (commit protocol step
        2-before-3) guarantees no false negative can re-admit a
        fetched URL."""
        pending = self.pending.read(self.spark)
        if pending is None:
            return None
        seen_df = self.seen.read(self.spark)
        if seen_df is not None:
            bloom = (
                self.seen_filter.read_filter(self.spark)
                if self.use_bloom
                else None
            )
            pending = url_seen_anti_join(pending, seen_df, bloom=bloom)
        return pending

    def _dispatch_predicate(self, work: DataFrame):
        """The wave-membership predicate over the prioritized frontier.

        Base rule: per-host quota (``host_rank <= wave_quota``) — the
        politeness queue prefix.  When ``max_wave_rows`` is set (VERDICT
        r02 item 5), the wave is additionally bounded GLOBALLY so a
        10^6-host frontier can't build a 10^6 × quota-row wave whose
        persisted payload bytes swamp executor storage:

        * find the deepest rank R whose cumulative row count fits the
          cap — one tiny aggregate (≤ wave_quota rows collected), no
          global sort; dispatch = every host's queue prefix of depth R
          (round-robin across hosts, per-host order intact);
        * if even depth 1 exceeds the cap (hosts alone > cap), hosts are
          hashed into ~4·n/cap buckets, per-bucket row counts collected
          (tiny), and buckets are taken round-robin from a wave-rotated
          start until the cap is reached — a bounded, rotating host
          cohort. At least one bucket is always taken (progress
          guarantee), so the cap is strict up to one-bucket granularity
          (expected bucket size ≈ cap/4). No starvation: unserved hosts
          stay pending and the start bucket rotates each wave.

        Excess rows spill to ``deferred`` (the predicate's complement),
        exactly as quota overflow always has.
        """
        pred = F.col("host_rank") <= self.wave_quota
        if not self.max_wave_rows:
            return pred
        # cumulative rows per rank depth: ≤ wave_quota rows to the driver
        counts = (
            work.filter(pred)
            .groupBy("host_rank")
            .agg(F.count("*").alias("n"))
            .orderBy("host_rank")
            .collect()
        )
        cum, depth = 0, 0
        for r in counts:
            if cum + r["n"] > self.max_wave_rows:
                break
            cum += r["n"]
            depth = r["host_rank"]
        if depth >= 1:
            return F.col("host_rank") <= depth
        # hosts alone exceed the cap: rotate through counted host buckets
        n_rank1 = counts[0]["n"] if counts else 1
        n_buckets = max(8, -(-4 * n_rank1 // self.max_wave_rows))  # ceil
        bucket = F.pmod(F.xxhash64(F.col("host")), F.lit(n_buckets))
        per_bucket = {
            r["b"]: r["n"]
            for r in work.filter(F.col("host_rank") == 1)
            .groupBy(bucket.alias("b"))
            .agg(F.count("*").alias("n"))
            .collect()
        }
        start = (len(self.metrics) + 1) % n_buckets  # rotate per wave
        chosen, cum = [], 0
        for i in range(n_buckets):
            b = (start + i) % n_buckets
            nb = per_bucket.get(b, 0)
            if nb == 0:
                continue
            if chosen and cum + nb > self.max_wave_rows:
                break
            chosen.append(b)
            cum += nb
            if cum >= self.max_wave_rows:
                break
        return (F.col("host_rank") == 1) & bucket.isin(chosen)

    def _fetch_phase(self, pending: DataFrame) -> dict:
        """Prioritize, split dispatch/deferred, run the fetch, and
        materialize per-state counts. Returns the wave context dict
        (results/work stay persisted until the caller releases them)."""
        # cache the prioritized frontier: the window shuffle feeds BOTH
        # the dispatch slice and the deferred remainder — without the
        # cache the deferred side re-scans pending and re-runs the
        # window when the next-pending snapshot is written
        work = with_priority(pending).persist()
        dispatch_pred = self._dispatch_predicate(work)
        dispatch = work.filter(dispatch_pred)
        deferred = work.filter(~dispatch_pred).drop(
            "form_type_rank", "priority", "host_rank"
        )
        t0 = time.time()
        results = fetch_wave(
            dispatch,
            fetcher=self.fetcher,
            rate_per_host=self.rate_per_host,
            virtual_clock=self.virtual_clock,
            robots_fetcher=self.robots_fetcher,
            decode=True,  # fused validate: bytes cross Arrow once
        ).persist()
        # ONE materializing job yields dispatch total AND per-state
        # counts (previously a count() plus a separate groupBy job)
        state_counts = {
            r["st"]: r["n"]
            for r in results.groupBy(self._terminal_state().alias("st"))
            .agg(F.count("*").alias("n"))
            .collect()
        }
        n_dispatched = sum(state_counts.values())
        wall = time.time() - t0
        pending_cols = [f.name for f in pending.schema.fields]
        retry = results.filter(
            (F.col("state") == "retry")
            & (F.col("attempts_total") + 1 < self.max_attempts)
        )
        retry_rows = retry.select(
            *[
                (F.col("attempts_total") + 1).alias("attempts_total")
                if c == "attempts_total"
                else F.col(c)
                for c in pending_cols
            ]
        )
        next_pending = deferred.select(pending_cols).unionByName(retry_rows)
        return {
            "work": work,
            "results": results,
            "deferred": deferred,
            "next_pending": next_pending,
            "state_counts": state_counts,
            "n_dispatched": n_dispatched,
            "wall": wall,
        }

    def _commit_phase(self, wave_no: int, ctx: dict) -> dict:
        """The ordered wave commit protocol (module docstring):
        log+payload concurrently (both tagged with this wave's commit
        token), then the Bloom filter OR-in, then seen strictly last
        among the result tables (seen is what gates re-dispatch —
        committing it only after log/payload exist means a crash can
        never drop a fetched URL from the log), then the pending
        overwrite."""
        results = ctx["results"]
        n_dispatched = ctx["n_dispatched"]
        fetched = results.filter(F.col("state") == "fetched")
        commit_token = uuid.uuid4().hex
        terminal = results.withColumn("state", self._terminal_state())
        log_df = terminal.withColumn("wave", F.lit(wave_no)).drop(
            "bytes", "w", "h", "fmt", "phash", "decode_ok"
        )
        # payload row (input_hint: decoded dims, fmt, phash) — the
        # decode/validate columns were fused into the fetch pass, so
        # this is a pure JVM projection, no second Python stage
        payload_rows = fetched.select(
            F.regexp_extract(
                "canonical_url", r"/(\d{10}-\d{2}-\d{6})(?:-index\.html)?$", 1
            ).alias("image_id"),
            "bytes", "w", "h", "fmt", "caption", "phash", "decode_ok",
        )
        # BOTH terminal dispositions enter seen (ADVICE r02): 'failed'
        # rows exhausted their attempt budget and must never re-dispatch.
        # Without this, a crash between the seen append and the pending
        # overwrite leaves failed rows in pending; the resume-time seen
        # re-filter wouldn't drop them and they'd re-dispatch with reset
        # attempts, appending duplicate failed log rows. Requeue is the
        # explicit invalidate() path, same as for fetched URLs.
        new_seen = terminal.filter(F.col("state").isin("fetched", "failed")).select(
            "url_hash",
            "canonical_url",
            F.lit(self.seen.current_version() + 1).cast("long").alias("first_seen_version"),
        )
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            futures = [
                pool.submit(
                    self.log.append,
                    log_df,
                    {"wave": wave_no, "rows": n_dispatched, "commit_token": commit_token},
                ),
                pool.submit(
                    self.payload.append,
                    payload_rows,
                    {"wave": wave_no, "commit_token": commit_token},
                ),
            ]
            # the filter OR-in only has to land BEFORE seen (filter ⊇
            # seen invariant) — it is independent of log/payload, so it
            # runs concurrently with them; it touches only the bitset
            # table, never the seen parquet
            if self.use_bloom:
                futures.append(
                    pool.submit(
                        self.seen_filter.update,
                        new_seen,
                        metrics={"wave": wave_no, "commit_token": commit_token},
                    )
                )
            for fut in futures:
                fut.result()  # barrier; re-raises any commit failure
        self.seen.append(
            new_seen, metrics={"wave": wave_no, "commit_token": commit_token}
        )
        self.pending.overwrite(ctx["next_pending"], metrics={"wave": wave_no})

        m = {
            "wave": wave_no,
            "dispatched": n_dispatched,
            "fetched": ctx["state_counts"].get("fetched", 0),
            "retried": ctx["state_counts"].get("retry", 0),
            "failed": ctx["state_counts"].get("failed", 0),
            "wall_s": ctx["wall"],
            "urls_per_s": n_dispatched / ctx["wall"] if ctx["wall"] > 0 else 0.0,
        }
        self.metrics.append(m)
        return m

    def step(self) -> dict | None:
        """Run one wave synchronously; returns its metrics dict, or
        None if drained."""
        pending = self._refiltered_pending()
        if pending is None or pending.isEmpty():
            # cheap limit-1 probe: a drained frontier costs one tiny
            # job, not a full (empty) fetch wave
            return None
        ctx = self._fetch_phase(pending)
        if ctx["n_dispatched"] == 0:
            ctx["results"].unpersist()
            # unconditional: an empty deferred set must still clear the
            # stale pending snapshot (ADVICE r01 nit)
            self.pending.overwrite(ctx["deferred"])
            ctx["work"].unpersist()
            return None
        m = self._commit_phase(len(self.metrics) + 1, ctx)
        ctx["results"].unpersist()
        ctx["work"].unpersist()
        return m

    def run(
        self,
        max_waves: int = 100,
        pipeline: bool | None = None,
        pipeline_eager_checkpoint: bool | None = None,
    ) -> list[dict]:
        """Drain the frontier. With ``pipeline=True``, wave
        N+1's fetch overlaps wave N's commits: commits run on ONE
        background thread (strictly ordered — only the latest snapshot
        can ever be partial, which is what ``_recover`` assumes) while
        the main thread prioritizes and fetches the next wave from the
        in-memory ``deferred ∪ retries`` remainder. Chained waves skip
        the seen re-filter — fetched rows are excluded from the
        remainder by construction — and the pending-table overwrite
        stays the last step of each wave's commit, so a crash anywhere
        leaves a pending snapshot whose stale rows the resume-time
        re-filter drops. Crash-safety is identical to step()-by-step
        execution; only idle driver time is removed.

        The chained remainder's lineage passes through wave N's
        nondeterministic fetch, so it must never be silently
        recomputable: each wave boundary cuts lineage with a
        ``localCheckpoint``.  On a local master the checkpoint is LAZY
        (materialized by wave N+1's first job — cache eviction spills
        to disk locally and never recomputes, so laziness is free); on
        a multi-executor cluster it is EAGER — the remainder's rows are
        pinned in checkpoint blocks *before* the commit thread starts
        publishing wave N, so a lost executor surfaces as a loud
        missing-checkpoint-block failure (recover by re-running from
        the committed tables, the normal crash path) instead of a
        silent re-fetch that could diverge from what was committed
        (the r02 ADVICE hazard that used to gate pipelining to local
        masters — gate now dropped).  ``pipeline_eager_checkpoint``
        overrides the master-based default, mainly for tests."""
        if pipeline is None:
            pipeline = True
        if pipeline_eager_checkpoint is None:
            pipeline_eager_checkpoint = not self.spark.sparkContext.master.startswith(
                "local"
            )
        if not pipeline:
            out = []
            for _ in range(max_waves):
                m = self.step()
                if m is None:
                    break
                out.append(m)
                if self.compact_every and m["wave"] % self.compact_every == 0:
                    self.compact()
            return out

        from concurrent.futures import ThreadPoolExecutor

        out: list[dict] = []
        pending = self._refiltered_pending()
        commit_fut = None
        prev_ctx = None
        with ThreadPoolExecutor(max_workers=1) as commit_pool:
            for _ in range(max_waves):
                if pending is None:
                    break
                ctx = self._fetch_phase(pending)
                # wave N's commits (if any) ran while the fetch above
                # executed; barrier on them before committing this wave
                if commit_fut is not None:
                    out.append(commit_fut.result())
                    prev_ctx["results"].unpersist()
                    prev_ctx["work"].unpersist()
                    if self.compact_every and out[-1]["wave"] % self.compact_every == 0:
                        self.compact()
                if ctx["n_dispatched"] == 0:
                    self.pending.overwrite(ctx["deferred"])
                    ctx["results"].unpersist()
                    ctx["work"].unpersist()
                    commit_fut, prev_ctx = None, None
                    break
                # safe to read len(metrics): the barrier above guarantees
                # the previous _commit_phase (which appends) has finished
                wave_no = len(self.metrics) + 1
                # chain in-memory: fetched rows are already excluded
                # from next_pending by the state split. localCheckpoint
                # truncates the logical plan at the wave boundary —
                # without it the fetch join doubles the chained plan
                # every wave (exponential analysis cost, plan-string
                # OOM after ~30 waves). Lazy locally (materialized by
                # wave N+1's counts job, before wave N's caches
                # release); EAGER on a cluster — and then it MUST
                # materialize BEFORE the commit is submitted: if the
                # commit and the checkpoint could both recompute a lost
                # fetch partition concurrently, two independent
                # re-fetches could publish diverging results. Order:
                # pin the remainder first, publish second.
                if pipeline_eager_checkpoint:
                    pending = ctx["next_pending"].localCheckpoint(eager=True)
                    commit_fut = commit_pool.submit(self._commit_phase, wave_no, ctx)
                else:
                    commit_fut = commit_pool.submit(self._commit_phase, wave_no, ctx)
                    pending = ctx["next_pending"].localCheckpoint(eager=False)
                prev_ctx = ctx
            if commit_fut is not None:
                out.append(commit_fut.result())
                prev_ctx["results"].unpersist()
                prev_ctx["work"].unpersist()
        return out

    # ---- outputs -----------------------------------------------------------
    def fetch_log(self) -> DataFrame | None:
        """The committed fetch log in reference crawl order
        (year, quarter, row_seq — download_filings.py:116-183)."""
        df = self.log.read(self.spark)
        return df.orderBy(*crawl_order()) if df is not None else None

    def seen_set(self) -> DataFrame | None:
        return self.seen.read(self.spark)

    def metrics_df(self) -> DataFrame:
        """Per-wave fetch/dedup metrics as a DataFrame (north_rule:
        lineage + metrics). Commit-level lineage lives in each table's
        snapshot manifests (SnapshotTable.history()); per-partition
        detail lives in the fetch log (host, dispatch_seq, wait_s)."""
        rows = [
            {
                "wave": m["wave"],
                "dispatched": m["dispatched"],
                "fetched": m["fetched"],
                "retried": m["retried"],
                "failed": m["failed"],
                "wall_s": float(m["wall_s"]),
                "urls_per_s": float(m["urls_per_s"]),
            }
            for m in self.metrics
        ]
        schema = (
            "wave int, dispatched long, fetched long, retried long, "
            "failed long, wall_s double, urls_per_s double"
        )
        return self.spark.createDataFrame(rows, schema)

    def compact(self, target_partitions: int | None = None) -> None:
        """Fold accumulated per-wave appends in seen/log/payload into
        single-dir snapshots (scan-planning hygiene for long crawls)."""
        for table in (self.seen, self.log, self.payload):
            table.compact(self.spark, target_partitions)
        # the one sanctioned full-scan filter rebuild: only when shards
        # have outgrown their sized capacity (fpp decay), amortized
        # into the compaction pass
        if (
            self.use_bloom
            and self.filter_kind == "bloom"
            and self.seen_filter.max_load(self.spark) > 1.0
        ):
            seen_df = self.seen.read(self.spark)
            if seen_df is not None:
                self.seen_filter.rebuild(seen_df, metrics={"compaction": True})

"""Partitioned cuckoo filter — the deletable alternative to the Bloom
pre-filter (north_rule: "bloom/cuckoo URL-seen filter"). Same sharding
and cogroup-check layout as seen.BloomFilterTable, same FP-safety
direction ("maybe" → exact recheck), plus deletion: when a fetched URL
is requeued (content invalidated), its fingerprint can be removed —
impossible with a Bloom filter.

Layout per shard: numpy uint16 table [n_buckets × 4 slots] of
fingerprints (0 = empty). Partial-key cuckoo hashing: bucket i1 = h
mod m, alternate i2 = i1 XOR spread(fingerprint). An insertion that
exceeds the kick budget sets the shard's overflow flag, which makes
membership answer "maybe" for everything in that shard — degraded to
exact-join performance, never dropped URLs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from edgar_crawler_spark.frontier.seen import guard_shard_count
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

SLOTS = 4
MAX_KICKS = 500

_CUCKOO_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("table", BinaryType()),
        StructField("n_buckets", LongType()),
        StructField("n_items", LongType()),
        StructField("overflow", BooleanType()),
    ]
)


def _fingerprint(h: np.ndarray) -> np.ndarray:
    f = ((h.astype(np.uint64) >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.uint16)
    return np.where(f == 0, np.uint16(1), f)  # 0 means empty slot


def _bucket1(h: np.ndarray, m: int) -> np.ndarray:
    # splitmix-style multiply before taking low bits: the shard id is
    # h mod num_shards (low bits), so raw low bits would collapse each
    # shard's items onto m/num_shards buckets
    mixed = h.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((mixed >> np.uint64(17)) & np.uint64(m - 1)).astype(np.int64)


def _alt_bucket(i: np.ndarray, f: np.ndarray, m: int) -> np.ndarray:
    # m MUST be a power of two: alt(alt(i)) == i only then (the XOR
    # relocation relation must be an involution or kicked items become
    # unfindable)
    spread = (f.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(m - 1)
    return (i.astype(np.uint64) ^ spread).astype(np.int64)


class _ShardFilter:
    def __init__(self, n_buckets: int):
        self.m = n_buckets
        self.table = np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        self.overflow = False

    def insert(self, h: int, rng: np.random.Generator) -> None:
        f = int(_fingerprint(np.array([h]))[0])
        i = int(_bucket1(np.array([h]), self.m)[0])
        for idx in (i, int(_alt_bucket(np.array([i]), np.array([f], np.uint16), self.m)[0])):
            empty = np.where(self.table[idx] == 0)[0]
            if len(empty):
                self.table[idx, empty[0]] = f
                return
        # kick loop
        cur_i, cur_f = i, f
        for _ in range(MAX_KICKS):
            slot = int(rng.integers(0, SLOTS))
            cur_f, self.table[cur_i, slot] = int(self.table[cur_i, slot]), cur_f
            cur_i = int(
                _alt_bucket(np.array([cur_i]), np.array([cur_f], np.uint16), self.m)[0]
            )
            empty = np.where(self.table[cur_i] == 0)[0]
            if len(empty):
                self.table[cur_i, empty[0]] = cur_f
                return
        self.overflow = True  # degraded: shard answers "maybe" for all

    def delete(self, h: int) -> bool:
        f = _fingerprint(np.array([h]))[0]
        i1 = int(_bucket1(np.array([h]), self.m)[0])
        i2 = int(_alt_bucket(np.array([i1]), np.array([f], np.uint16), self.m)[0])
        for idx in (i1, i2):
            hits = np.where(self.table[idx] == f)[0]
            if len(hits):
                self.table[idx, hits[0]] = 0
                return True
        return False

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        if self.overflow:
            return np.ones(len(hashes), dtype=bool)
        f = _fingerprint(hashes)
        i1 = _bucket1(hashes, self.m)
        i2 = _alt_bucket(i1, f, self.m)
        in1 = (self.table[i1] == f[:, None]).any(axis=1)
        in2 = (self.table[i2] == f[:, None]).any(axis=1)
        return in1 | in2


class CuckooFilterTable:
    """DataFrame of per-shard cuckoo tables over xxhash64(url)."""

    def __init__(self, df: DataFrame, num_shards: int):
        self.df = df
        self.num_shards = num_shards

    @staticmethod
    def build(
        seen: DataFrame,
        hash_col: str = "url_hash",
        num_shards: int = 32,
        expected_per_shard: int | None = None,
    ) -> "CuckooFilterTable":
        if expected_per_shard is None:
            expected_per_shard = max(1, seen.count() // num_shards + 1)
        n_buckets = CuckooFilterTable.buckets_for(expected_per_shard)

        def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
            filt = _ShardFilter(n_buckets)
            rng = np.random.default_rng(42 + shard)  # deterministic kicks
            for h in pdf["h"].to_numpy(np.int64):
                filt.insert(int(h), rng)
            return pd.DataFrame(
                [
                    {
                        "shard": shard,
                        "table": filt.table.tobytes(),
                        "n_buckets": n_buckets,
                        "n_items": len(pdf),
                        "overflow": filt.overflow,
                    }
                ]
            )

        sharded = seen.select(
            F.col(hash_col).alias("h"),
            F.pmod(F.col(hash_col), F.lit(num_shards)).cast("int").alias("shard"),
        )
        return CuckooFilterTable(
            sharded.groupBy("shard").applyInPandas(build_shard, _CUCKOO_SCHEMA), num_shards
        )

    @staticmethod
    def buckets_for(expected_per_shard: int) -> int:
        """4 slots/bucket at ~80% load, rounded up to a power of two
        (the alt-bucket XOR requires it)."""
        need = max(8, int(expected_per_shard / (SLOTS * 0.8)) + 1)
        return 1 << (need - 1).bit_length()

    def maybe_contains(self, candidates: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        out_schema = StructType(
            candidates.schema.fields + [StructField("bloom_maybe_seen", BooleanType())]
        )
        cand_cols = [f.name for f in candidates.schema.fields]

        def check(cand_pdf: pd.DataFrame, filt_pdf: pd.DataFrame) -> pd.DataFrame:
            if not len(cand_pdf):
                return pd.DataFrame(columns=cand_cols + ["bloom_maybe_seen"])
            out = cand_pdf[cand_cols].copy()
            if not len(filt_pdf):
                out["bloom_maybe_seen"] = False
                return out
            row = filt_pdf.iloc[0]
            filt = _ShardFilter(int(row["n_buckets"]))
            filt.table = np.frombuffer(row["table"], dtype=np.uint16).reshape(-1, SLOTS).copy()
            filt.overflow = bool(row["overflow"])
            out["bloom_maybe_seen"] = filt.contains(cand_pdf[hash_col].to_numpy(np.int64))
            return out

        shard = F.pmod(F.col(hash_col), F.lit(self.num_shards)).cast("int")
        return (
            candidates.withColumn("__shard", shard)
            .groupBy("__shard")
            .cogroup(self.df.groupBy("shard"))
            .applyInPandas(check, out_schema)
        )


class PersistedCuckooTable:
    """Incrementally-maintained cuckoo filter — the deletable sibling
    of seen.PersistedBloomTable, with the identical wave-commit
    contract (update strictly before the seen append → filter ⊇ seen;
    the seen parquet is scanned only on rebuild). The extra capability
    is ``delete``: when a fetched URL is invalidated and requeued, its
    fingerprint is removed so the filter tracks the seen set exactly —
    a Bloom filter can only accumulate."""

    def __init__(
        self,
        table,
        num_shards: int = 32,
        expected_per_shard: int = 1 << 17,
    ):
        self.table = table
        self.num_shards = num_shards
        self.expected_per_shard = expected_per_shard

    def read_filter(self, spark) -> CuckooFilterTable | None:
        guard_shard_count(self.table, self.num_shards)
        df = self.table.read(spark)
        return CuckooFilterTable(df, self.num_shards) if df is not None else None

    def _sharded(self, new: DataFrame, hash_col: str) -> DataFrame:
        return new.select(
            F.col(hash_col).alias("h"),
            F.pmod(F.col(hash_col), F.lit(self.num_shards)).cast("int").alias("shard"),
        )

    def _apply(self, new: DataFrame, hash_col: str, metrics, mode: str) -> int:
        guard_shard_count(self.table, self.num_shards)
        spark = new.sparkSession
        cur = self.table.read(spark)
        default_buckets = CuckooFilterTable.buckets_for(self.expected_per_shard)

        def mutate(new_pdf: pd.DataFrame, filt_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(filt_pdf):
                row = filt_pdf.iloc[0]
                shard = int(row["shard"])
                n_buckets = int(row["n_buckets"])
                filt = _ShardFilter(n_buckets)
                filt.table = (
                    np.frombuffer(row["table"], dtype=np.uint16)
                    .reshape(-1, SLOTS)
                    .copy()
                )
                filt.overflow = bool(row["overflow"])
                n_items = int(row["n_items"])
            else:
                shard = int(new_pdf["shard"].iloc[0])
                n_buckets = default_buckets
                filt = _ShardFilter(n_buckets)
                n_items = 0
            rng = np.random.default_rng(42 + shard)
            for h in new_pdf["h"].to_numpy(np.int64):
                if mode == "insert":
                    filt.insert(int(h), rng)
                    n_items += 1
                else:
                    if filt.delete(int(h)):
                        n_items -= 1
            return pd.DataFrame(
                [
                    {
                        "shard": shard,
                        "table": filt.table.tobytes(),
                        "n_buckets": n_buckets,
                        "n_items": n_items,
                        "overflow": filt.overflow,
                    }
                ]
            )

        sharded = self._sharded(new, hash_col)
        if cur is None:
            merged = sharded.groupBy("shard").applyInPandas(
                lambda pdf: mutate(pdf, pd.DataFrame()), _CUCKOO_SCHEMA
            )
        else:
            merged = (
                sharded.groupBy("shard")
                .cogroup(cur.groupBy("shard"))
                .applyInPandas(mutate, _CUCKOO_SCHEMA)
            )
        m = {"num_shards": self.num_shards, **(metrics or {})}
        return self.table.overwrite(merged, metrics=m)

    def update(self, new: DataFrame, hash_col: str = "url_hash", metrics: dict | None = None) -> int:
        """Insert the new hashes into the persisted shard tables."""
        return self._apply(new, hash_col, metrics, "insert")

    def delete(self, gone: DataFrame, hash_col: str = "url_hash", metrics: dict | None = None) -> int:
        """Remove fingerprints for invalidated URLs (requeue path)."""
        return self._apply(gone, hash_col, metrics, "delete")

    def max_load(self, spark) -> float:
        df = self.table.read(spark)
        if df is None:
            return 0.0
        # overflowed shards degrade to all-maybe — force a rebuild
        row = df.agg(
            F.max("n_items").alias("n"), F.max(F.col("overflow").cast("int")).alias("ov")
        ).first()
        if row["ov"]:
            return float("inf")
        return float(row["n"] or 0) / float(self.expected_per_shard)

    def rebuild(
        self,
        seen: DataFrame,
        hash_col: str = "url_hash",
        expected_per_shard: int | None = None,
        metrics: dict | None = None,
    ) -> int:
        if expected_per_shard is not None:
            self.expected_per_shard = expected_per_shard
        else:
            n = seen.count()
            self.expected_per_shard = max(
                self.expected_per_shard * 2, 2 * (n // self.num_shards + 1)
            )
        built = CuckooFilterTable.build(
            seen,
            hash_col=hash_col,
            num_shards=self.num_shards,
            expected_per_shard=self.expected_per_shard,
        )
        m = {"rebuild": True, "num_shards": self.num_shards, **(metrics or {})}
        return self.table.overwrite(built.df, metrics=m)

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
        # 4 slots/bucket at ~80% load factor, rounded up to a power of
        # two (the alt-bucket XOR requires it)
        need = max(8, int(expected_per_shard / (SLOTS * 0.8)) + 1)
        n_buckets = 1 << (need - 1).bit_length()

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

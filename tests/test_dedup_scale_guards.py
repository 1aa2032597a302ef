"""Scale guards on the dedup operators (VERDICT round-1 items 2 & 8):

* ``ngram_jaccard_pairs(max_df=...)`` — document-frequency cap keeps a
  stop-token-heavy corpus sub-quadratic in the token self-join.
* ``simhash_near_dup_pairs`` — bands = max_hamming+1 pigeonhole recall:
  a pair with its differing bits spread 2/2/1/1 across the old 4 byte
  bands (missed by byte-banding) must now be found.
"""

import pyspark.sql.functions as F
import pytest

from edgar_crawler_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


# ---------------------------------------------------------------- jaccard


def test_jaccard_max_df_prunes_stop_tokens(spark):
    # 40 docs that share ONLY the stop token "the"; each has 3 unique
    # tokens of its own. Two docs (d0, d1) genuinely near-identical.
    rows = [(f"d{i}", f"the u{i}a u{i}b u{i}c") for i in range(2, 42)]
    rows += [("d0", "the x y z"), ("d1", "the x y z")]
    docs = _docs(spark, rows)

    capped = dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_df=5)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in capped.collect()}
    # only the true duplicate pair survives; its jaccard is computed over
    # the df-filtered token sets ({x,y,z} each side -> 1.0)
    assert got == {("d0", "d1"): 1.0}

    # the cap bounds the self-join input: with "the" (df=42) dropped,
    # the token stream entering the join has zero shared-by-all rows.
    toks = dedup.tokens(docs)
    dfs = toks.groupBy("tok").agg(F.count("*").alias("df"))
    kept = dfs.filter(F.col("df") <= 5)
    assert kept.agg(F.max("df")).first()[0] <= 5
    assert dfs.agg(F.max("df")).first()[0] == 42  # stop token existed


def test_jaccard_max_df_none_is_uncapped(spark):
    rows = [("a", "p q r"), ("b", "p q r"), ("c", "p zz ww")]
    docs = _docs(spark, rows)
    uncapped = dedup.ngram_jaccard_pairs(docs, threshold=0.9)
    assert [(r.doc_a, r.doc_b) for r in uncapped.collect()] == [("a", "b")]


def test_jaccard_cap_above_max_df_changes_nothing(spark):
    rows = [("a", "p q r s"), ("b", "p q r t"), ("c", "zz ww p q")]
    docs = _docs(spark, rows)
    base = sorted(map(tuple, dedup.ngram_jaccard_pairs(docs, 0.3).collect()))
    capped = sorted(map(tuple, dedup.ngram_jaccard_pairs(docs, 0.3, max_df=100).collect()))
    assert base == capped


# ---------------------------------------------------------------- simhash


def test_simhash_band_bounds_cover_and_pigeonhole():
    bounds = dedup.simhash_band_bounds(32, 7)
    assert len(bounds) == 7
    assert sum(w for _, _, w in bounds) == 32
    # contiguous, non-overlapping
    pos = 0
    for j, start, w in bounds:
        assert start == pos
        pos += w


def _pairs_with_synthetic_sketches(spark, sketches, max_hamming=6, bands=None):
    """Run only the banding+join+verify tail of simhash_near_dup_pairs
    on pre-made sketches (monkeypatch the sketch stage)."""
    sims = spark.createDataFrame(
        [(k, v) for k, v in sketches.items()], "doc_id string, simhash long"
    )
    import unittest.mock as mock

    with mock.patch.object(dedup, "simhash", return_value=sims):
        out = dedup.simhash_near_dup_pairs(
            spark.createDataFrame([("x", "y")], "doc_id string, text string"),
            max_hamming=max_hamming,
            bands=bands,
        )
        return {(r.doc_a, r.doc_b): r.hamming for r in out.collect()}


def test_simhash_spread_2211_pair_found(spark):
    # Hamming-6 pair whose differing bits land 2/2/1/1 in the four
    # bytes: bits {0,1, 8,9, 16, 24}. Old 4-byte banding: every byte
    # differs -> NO shared band -> pair missed. New 7-band (widths
    # 5,5,5,5,4,4,4): 6 diffs over 7 bands -> >=1 band agrees.
    a = 0
    b = (1 << 0) | (1 << 1) | (1 << 8) | (1 << 9) | (1 << 16) | (1 << 24)
    got = _pairs_with_synthetic_sketches(spark, {"da": a, "db": b}, max_hamming=6)
    assert got == {("da", "db"): 6}

    # regression: the old 4-band byte split indeed misses it
    old = _pairs_with_synthetic_sketches(
        spark, {"da": a, "db": b}, max_hamming=6, bands=4
    )
    assert old == {}


def test_simhash_recall_exhaustive_small(spark):
    # every pair within hamming<=6 of a base sketch must be found
    import itertools

    base = 0b1011_0010_1110_0001_0101_1100_0011_1010
    variants = {"base": base}
    bitsets = [(0, 5, 11, 17, 23, 29), (1, 2, 3, 4, 5, 6), (0, 8, 16, 24, 31, 15)]
    for i, bs in enumerate(bitsets):
        v = base
        for bit in bs:
            v ^= 1 << bit
        variants[f"v{i}"] = v
    got = _pairs_with_synthetic_sketches(spark, variants, max_hamming=6)
    for i in range(len(bitsets)):
        key = tuple(sorted(["base", f"v{i}"]))
        assert key in got, f"pair base~v{i} missed"
        assert got[key] == 6


def test_minhash_permutations_not_degenerate(spark):
    """Anti-regression for the monotone-affine trap: across the sf0.001
    corpus the agreeing-seed estimates on banded candidates must SPREAD
    below 1.0 (a degenerate family reports 1.0 on every banded pair),
    and per-seed argmin tokens must actually differ."""
    import pyspark.sql.functions as F

    from edgar_crawler_spark.operators.dedup import minhash_verified_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ests = [
        r.est_jaccard
        for r in minhash_verified_pairs(docs, min_sim=0.0).collect()
    ]
    assert ests and min(ests) < 0.6 < max(ests)
    # fractional estimates exist: a monotone family agrees on a pair
    # either via the one shared global-min token (est snaps high) or
    # not at all — strictly-intermediate values need seed-dependent
    # argmins
    assert any(0.2 < e < 0.8 for e in ests)

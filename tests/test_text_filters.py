"""Training-data quality filters: Gopher-style n-gram repetition and
benchmark decontamination (operators/text.py), on handcrafted docs
with known answers (the catalog oracle covers the corpus-scale path).
"""

import pyspark.sql.functions as F

from edgar_crawler_spark.operators import text


def test_dup_ngram_stats_known_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),        # 2-grams: ab ba ab ba ab -> 5 total, 2 distinct
            (2, "w x y z"),            # all distinct
            (3, "solo"),               # < n tokens: drops out
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in text.dup_ngram_stats(docs, n=2).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n_grams == 5 and rows[1].n_distinct_grams == 2
    assert abs(rows[1].dup_gram_ratio - 0.6) < 1e-9
    assert abs(rows[1].top_gram_ratio - 0.6) < 1e-9  # 'a b' x3 of 5
    assert rows[2].dup_gram_ratio == 0.0 and rows[2].n_grams == 3


def test_decontamination_overlap_flags_contained_doc(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # fully inside benchmark
            (2, "an entirely different sentence here"),
            (3, "quick brown fox but then it diverges wildly"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in text.decontamination_overlap(docs, bench, n=3).collect()}
    assert out[1].contaminated and out[1].contamination_ratio == 1.0
    assert not out[2].contaminated and out[2].n_overlap == 0
    assert not out[3].contaminated and out[3].n_overlap == 1  # 'quick brown fox'


def test_decontamination_broadcasts_bench_side(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 7).cast("string"), F.lit(" a b c d")).alias("text"),
    )
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    plan = text.decontamination_overlap(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dup_ngram_stats_randomized_vs_python(spark):
    """200 random docs, one Spark job, per-doc values cross-checked
    against a pure-python n-gram counter."""
    import random
    from collections import Counter

    rng = random.Random(7)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(200)
    ]

    def expected(s, n=2):
        toks = [t for t in s.split(" ") if t]
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if not grams:
            return None
        c = Counter(grams)
        total, distinct = len(grams), len(c)
        return (total, distinct,
                round(1 - distinct / total, 6),
                round(max(c.values()) / total, 6))

    got = {
        r.doc_id: (r.n_grams, r.n_distinct_grams, r.dup_gram_ratio, r.top_gram_ratio)
        for r in text.dup_ngram_stats(
            spark.createDataFrame(docs, ["doc_id", "text"]), n=2
        ).collect()
    }
    for i, s in docs:
        exp = expected(s)
        if exp is None:
            assert i not in got
        else:
            assert got[i] == exp, (i, s, got[i], exp)


def test_line_dedup_removes_global_boilerplate(spark):
    """Lines repeating in > max_df docs are dropped everywhere; unique
    lines survive in order; an all-boilerplate doc comes back empty and
    the row count is preserved."""
    from edgar_crawler_spark.operators.text import line_dedup

    banner = "ACCEPT COOKIES"
    footer = "(c) example corp"
    rows = []
    for i in range(6):
        rows.append((i, f"{banner}\nunique body {i}\n{footer}"))
    rows.append((6, f"{banner}\n{footer}"))  # nothing but boilerplate
    rows.append((7, "standalone doc with no boilerplate"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r.doc_id: r.text for r in line_dedup(docs, max_df=2).collect()}
    assert len(out) == 8  # row count preserved
    for i in range(6):
        assert out[i] == f"unique body {i}"  # boilerplate gone, order kept
    assert out[6] == ""  # fully-boilerplate doc emptied, not dropped
    assert out[7] == "standalone doc with no boilerplate"

    # max_df high enough -> nothing removed
    untouched = {r.doc_id: r.text for r in line_dedup(docs, max_df=10).collect()}
    assert untouched == {i: t for i, t in rows}


def test_scrub_pii_redacts_and_counts(spark):
    from edgar_crawler_spark.operators.text import scrub_pii

    rows = [
        (1, "mail me at jane.doe+spam@sub.example.org today"),
        (2, "server 192.168.001.004 and 10.0.0.1 are up"),
        (3, "call +1 (415) 555-0100 or 0800 123 4567 now"),
        (4, "no pii here at all"),
        (5, "mixed: bob@x.io from 127.0.0.1 dialing 415-555-0100"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in scrub_pii(docs).collect()}

    assert out[1].text == "mail me at <EMAIL> today"
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (1, 0, 0)
    assert out[2].text == "server <IP> and <IP> are up"
    assert out[2].n_ipv4 == 2
    assert out[3].text == "call <PHONE> or <PHONE> now"
    assert out[3].n_phone == 2
    assert out[4].text == "no pii here at all" and out[4].n_email == 0
    # ordering: the email's dots never get mis-read as an IP, and the
    # remaining digits redact per-type
    assert out[5].text == "mixed: <EMAIL> from <IP> dialing <PHONE>"
    assert (out[5].n_email, out[5].n_ipv4, out[5].n_phone) == (1, 1, 1)


def test_pack_sequences_capacity_and_determinism(spark):
    """Bins respect the budget up to the documented less-than-one-doc
    overflow; every doc is assigned exactly once; bins are contiguous
    per shard; reruns are identical."""
    import pyspark.sql.functions as F

    from edgar_crawler_spark.operators.text import pack_sequences

    rows = [(i, " ".join(f"w{j}" for j in range(10 + (i * 37) % 90))) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cap = 500
    out = pack_sequences(docs, max_tokens=cap, n_shards=4).toPandas()
    assert len(out) == 400 and out.doc_id.is_unique

    for (shard, b), grp in out.groupby(["shard", "bin"]):
        total = grp.n_tokens.sum()
        # exclusive-cumsum rule: the bin held < cap before its last doc
        assert total - grp.n_tokens.max() < cap
        # overflow bounded by one document
        assert total < cap + grp.n_tokens.max()
    # bins contiguous from 0 within each shard
    for shard, grp in out.groupby("shard"):
        bins = sorted(grp.bin.unique())
        assert bins == list(range(len(bins)))

    again = pack_sequences(docs, max_tokens=cap, n_shards=4).toPandas()
    assert sorted(map(tuple, out.values.tolist())) == sorted(map(tuple, again.values.tolist()))

    # an oversized doc still lands in (its own) bin exactly once
    big = spark.createDataFrame([(999, " ".join("x" for _ in range(3 * cap)))], "doc_id long, text string")
    out2 = pack_sequences(docs.union(big), max_tokens=cap, n_shards=4)
    assert out2.filter(F.col("doc_id") == 999).count() == 1


def test_cross_dup_ngram_stats_detects_shared_boilerplate(spark):
    """Docs sharing a boilerplate 3-gram run score > 0; a unique doc
    scores 0; docs shorter than n tokens drop out (no window)."""
    docs = spark.createDataFrame(
        [
            (1, "all rights reserved by acme corp forever"),
            (2, "all rights reserved by someone else entirely"),
            (3, "completely unrelated text with unique words here"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.cross_dup_ngram_stats(docs, n=3).collect()}
    assert 4 not in out  # 2 tokens < n
    assert out[1].cross_dup_ratio > 0 and out[2].cross_dup_ratio > 0
    assert out[3].cross_dup_ratio == 0.0
    # doc 1: 5 windows, shared = 'all rights reserved', 'rights reserved by'
    assert out[1].n_windows == 5 and abs(out[1].cross_dup_ratio - 0.4) < 1e-9


def test_token_entropy_extremes(spark):
    """Repetition spam ~ 0 bits; k distinct uniform tokens = log2(k)
    bits with TTR 1; empty text reports zeros instead of dropping."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "a b c d e f g h"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.token_entropy(docs).collect()}
    assert out[1].entropy_bits == 0.0 and abs(out[1].ttr - 1 / 8) < 1e-9
    assert abs(out[2].entropy_bits - 3.0) < 1e-9 and out[2].ttr == 1.0
    assert out[3].n_tokens == 0 and out[3].entropy_bits == 0.0 and out[3].ttr == 0.0
    assert math.isclose(out[2].n_tokens, 8)


def test_decontamination_bloom_equals_broadcast(spark):
    """The Bloom-prefilter scale twin returns EXACTLY the broadcast
    version's rows — false positives die in the exact verify join —
    across fpp settings, including a deliberately awful fpp where the
    prefilter passes nearly everything."""
    docs = spark.range(120).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma tok"),
            (F.col("id") % 11).cast("string"),
            F.lit(" delta epsilon zeta tok"),
            (F.col("id") % 7).cast("string"),
        ).alias("text"),
    )
    bench = docs.filter(F.col("doc_id") % 9 == 0)
    corpus = docs.filter(F.col("doc_id") % 9 != 0)
    exact = {
        r.doc_id: r
        for r in text.decontamination_overlap(corpus, bench, n=3, threshold=0.5).collect()
    }
    for fpp, shards in [(1e-4, 8), (0.4, 3)]:
        got = {
            r.doc_id: r
            for r in text.decontamination_overlap_bloom(
                corpus, bench, n=3, threshold=0.5, num_shards=shards, fpp=fpp
            ).collect()
        }
        assert set(got) == set(exact)
        for d, r in exact.items():
            g = got[d]
            assert (g.n_grams, g.n_overlap, g.contamination_ratio, g.contaminated) == (
                r.n_grams, r.n_overlap, r.contamination_ratio, r.contaminated
            ), d


def test_decontamination_bloom_prefilter_selectivity(spark):
    """The prefilter really drops clean grams before the verify join:
    with a tight fpp and a bench disjoint from the corpus, zero rows
    survive to the exact join (checked through the plan-free route —
    every doc reports 0 overlap) and an empty bench behaves the same."""
    corpus = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique"), F.col("id").cast("string"),
                 F.lit(" middle words here okay")).alias("text"),
    )
    bench = spark.createDataFrame(
        [(999, "totally disjoint benchmark sentence nothing shared")],
        ["doc_id", "text"],
    )
    out = text.decontamination_overlap_bloom(corpus, bench, n=3, num_shards=4).collect()
    assert len(out) == 50 and all(r.n_overlap == 0 and not r.contaminated for r in out)
    empty_bench = bench.filter(F.lit(False))
    out2 = text.decontamination_overlap_bloom(corpus, empty_bench, n=3).collect()
    assert len(out2) == 50 and all(r.n_overlap == 0 for r in out2)

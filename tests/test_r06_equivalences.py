"""Round-6 optimization equivalences, pinned as tests: every rewritten
operator must produce row-identical output to the formulation it
replaced (the DuckDB oracle checks values against SQL; these lock the
WIDE-vs-LONG and AGG-vs-WINDOW strategy pairs against each other,
including configurations the catalog does not exercise)."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _frames_equal(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_band_rows_wide_matches_long_form_including_remainder(spark, docs):
    """The zero-shuffle wide band path must band EXACTLY like the
    long-form groupBy — including the short remainder band when bands
    does not divide k (k=10, bands=4 → seeds 8,9 land in band 4)."""
    from edgar_crawler_spark.operators import dedup

    for k, bands in [(8, 4), (10, 4), (6, 3)]:
        wide = dedup.minhash_wide(docs, k=k)
        bw = dedup.band_rows_from_wide(wide, k=k, bands=bands)
        bl = dedup.band_rows_from_sigs(dedup._explode_wide_sigs(wide, k), k=k, bands=bands)
        assert _frames_equal(bw, bl), (k, bands)


def test_simhash_empty_doc_semantics(spark):
    """The pre-fanout length(trim(text)) filter must keep exactly the
    docs whose space-split token list is non-empty: tab-only text HAS
    a token; empty / all-space / NULL text does not."""
    from edgar_crawler_spark.operators import dedup

    edge = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "\t"), (4, None), (5, "a b")],
        "doc_id long, text string",
    )
    assert sorted(r.doc_id for r in dedup.simhash(edge).collect()) == [3, 5]
    assert sorted(
        r.doc_id for r in dedup.minhash_wide(edge).select("doc_id").collect()
    ) == [3, 5]


def test_topk_per_group_agg_matches_window(spark):
    """Sort-and-slice aggregation == row_number window for top-k per
    group (the a3 strategy swap), on a frame with ties in the first
    sort column and a partition column named 'pos' (generator-name
    collision guard)."""
    from edgar_crawler_spark.operators.relational import (
        ranked_per_group,
        topk_per_group_agg,
    )

    df = spark.range(2000).select(
        (F.col("id") % 37).alias("pos"),
        (F.col("id") % 11).alias("v"),
        F.col("id").alias("tie"),
    )
    agg = topk_per_group_agg(df, ["pos"], ["v", "tie"], 3).select(
        "pos", F.col("rnk").cast("long").alias("rnk"), "v", "tie"
    )
    win = (
        ranked_per_group(df, ["pos"], [F.col("v").asc(), F.col("tie").asc()])
        .filter(F.col("rnk") <= 3)
        .select("pos", F.col("rnk").cast("long").alias("rnk"), "v", "tie")
    )
    assert _frames_equal(agg, win)


def test_argmax_agg_matches_window(spark):
    """max_by aggregation == row_number-window argmax (the a6 strategy
    swap) on the real lineitem shape."""
    from edgar_crawler_spark.operators.relational import (
        argmax_per_group,
        argmax_per_group_agg,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    agg = argmax_per_group_agg(
        li,
        ["l_orderkey"],
        [("l_extendedprice", True), ("l_linenumber", False)],
        ["l_linenumber", "l_extendedprice"],
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")
    win = argmax_per_group(
        li, ["l_orderkey"], [F.col("l_extendedprice").desc(), F.col("l_linenumber").asc()]
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")
    assert _frames_equal(agg, win)


def test_anti_semi_join_no_distinct_equivalence(spark):
    """Dropping the build-side dropDuplicates must not change anti/semi
    join results (duplicate-insensitive by definition)."""
    from edgar_crawler_spark.operators.relational import (
        anti_join_dedup,
        existence_semi_join,
    )

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    anti = anti_join_dedup(o, li, "o_orderkey").select("o_orderkey")
    ref_anti = o.join(
        li.select("o_orderkey").dropDuplicates(), "o_orderkey", "left_anti"
    ).select("o_orderkey")
    assert _frames_equal(anti, ref_anti)
    semi = existence_semi_join(o, li, "o_orderkey").select("o_orderkey")
    ref_semi = o.join(
        li.select("o_orderkey").dropDuplicates(), "o_orderkey", "left_semi"
    ).select("o_orderkey")
    assert _frames_equal(semi, ref_semi)


def test_fanout_leaves_wide_frames_untouched(spark, docs):
    """fanout() must return join/aggregate-bearing frames unchanged
    (probing .rdd there eagerly executes shuffle stages under AQE) and
    must fan a narrow scan out to defaultParallelism."""
    from edgar_crawler_spark.operators.fanout import fanout

    joined = docs.join(docs.select("doc_id"), "doc_id", "left_semi")
    assert fanout(joined) is joined
    agged = docs.groupBy("lang").count()
    assert fanout(agged) is agged
    par = spark.sparkContext.defaultParallelism
    assert fanout(docs).rdd.getNumPartitions() >= min(par, 4)

"""Text-analysis operators for the training-data pipeline, over the
``documents`` table. Everything is JVM-side built-in functions
(whole-stage codegen) — no UDF in any of these paths.

* token_count      — whitespace tokens + a BPE-ish subword estimate
  (chars/4 heuristic upper-bounded by char count).
* quality_score    — length / punctuation-ratio / stopword-ratio /
  mean-token-length features + a composite score.
* lang_id          — marker-token heuristic (per-language marker hit
  counts → argmax). A real n-gram model would be a broadcast lookup
  with the same shape.
* fingerprint      — md5 over whitespace-normalized lowercase text
  (document identity robust to spacing), plus H48 for numeric keys.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from edgar_crawler_spark.operators.fanout import fanout
from edgar_crawler_spark.operators.hashing import h48_col

# marker vocabularies for the synthetic corpus (documents.text draws
# from a small OLAP-ish vocabulary; lang markers are defined over it)
LANG_MARKERS = {
    "en": ["the", "a", "of", "scan", "row"],
    "fr": ["le", "la", "de", "et", "un"],
}
STOPWORDS = ["a", "the", "of", "and", "to", "in"]
PUNCT_CLASS = r"[.,;:!?]"


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    # two-step select: the token array materializes once per row (the
    # multi-reference blocks project collapapse — SPARK-36718), instead
    # of re-splitting the text per consuming expression; fanout keeps a
    # narrow scan from running the split pass serial
    t = F.col(text_col)
    base = fanout(docs).select(
        "doc_id",
        F.size(F.filter(F.split(t, " "), lambda x: x != "")).alias("__nw"),
        F.length(t).alias("__nc"),
    )
    return base.select(
        "doc_id",
        F.col("__nw").cast("long").alias("n_tokens"),
        F.col("__nc").cast("long").alias("n_chars_actual"),
        # BPE-ish estimate: ~4 chars/token floor at whitespace count
        F.greatest(F.col("__nw").cast("long"), (F.col("__nc") / 4).cast("long")).alias(
            "n_subwords_est"
        ),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    # step 1: one row-local pass extracting the four integer features —
    # the token array is built ONCE (multi-reference blocks project
    # collapse) instead of once per feature expression
    toks = F.filter(F.split(t, " "), lambda x: x != "")
    feats = fanout(docs).select(
        "doc_id",
        toks.alias("__toks"),
        F.length(t).alias("__nc"),
        (F.size(F.split(t, PUNCT_CLASS)) - 1).alias("__np"),
    ).select(
        "doc_id",
        F.size("__toks").alias("__nt"),
        F.col("__nc"),
        F.col("__np"),
        F.size(F.filter("__toks", lambda x: F.lower(x).isin(STOPWORDS))).alias("__ns"),
    )
    n_tokens, n_chars = F.col("__nt"), F.col("__nc")
    n_punct, n_stop = F.col("__np"), F.col("__ns")
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.when((n_tokens >= 5) & (mean_tok_len >= 2) & (mean_tok_len <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
        - punct_ratio * 2
        + stop_ratio
    )
    return feats.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")

    # NB: the lambda must be single-arg — a second parameter would make
    # PySpark pass the element *index* as that argument
    def _hit_counter(markers):
        return F.size(F.filter("__toks", lambda x: x.isin(markers)))

    base = fanout(docs).select("doc_id", toks.alias("__toks"))
    hits = {lang: _hit_counter(markers) for lang, markers in LANG_MARKERS.items()}
    pred = F.when(hits["en"] >= hits["fr"], F.lit("en")).otherwise(F.lit("fr"))
    return base.select(
        "doc_id",
        hits["en"].cast("long").alias("hits_en"),
        hits["fr"].cast("long").alias("hits_fr"),
        pred.alias("lang_pred"),
    )


def winnowing_fingerprints(
    docs: DataFrame, k: int = 8, window: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    hash every k-gram, slide a window of ``window`` consecutive hashes,
    keep each window's minimum, dedup. Robust local fingerprints for
    plagiarism/near-dup detection.

    r06 zero-shuffle formulation: the k-gram hashes, the sliding
    window minima and the per-document dedup all live INSIDE the row
    (transform over a position sequence → per-position array_min over
    a slice → array_distinct), so neither the (doc_id, pos)
    window-sort exchange nor the global distinct exchange exists —
    the output key starts with doc_id, so per-document dedup IS the
    global dedup. Same fingerprints: the window frame 'CURRENT ROW
    AND window-1 FOLLOWING' truncates at the tail exactly as slice()
    does. Returns (doc_id, fp) — one row per selected fingerprint."""
    t = F.col(text_col)
    n_grams = F.greatest(F.length(t) - k + 1, F.lit(0))
    hashed = (
        fanout(docs)
        .filter(n_grams > 0)
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda pos: h48_col(t.substr(pos, F.lit(k))),
            ).alias("__hs"),
        )
    )
    wins = F.transform(
        F.sequence(F.lit(1), F.size("__hs")),
        lambda pos: F.array_min(F.slice("__hs", pos, window)),
    )
    return hashed.select(
        "doc_id", F.explode(F.array_distinct(wins)).alias("fp")
    )


def tfidf_top_terms(docs: DataFrame, top: int = 3, text_col: str = "text") -> DataFrame:
    """Top-N terms per document by tf·idf (idf = ln((1+N)/(1+df))+1,
    smooth). Pure groupBy/join/window pipeline. Returns
    (doc_id, tok, rnk, tfidf)."""
    from pyspark.sql import Window as W

    toks = fanout(docs).select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df_counts = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()  # driver scalar: one cheap job, folded as a literal
    scored = tf.join(df_counts, "tok").withColumn(
        "tfidf",
        F.round(F.col("tf") * (F.log((1.0 + n_docs) / (1.0 + F.col("df"))) + 1.0), 6),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top)
        .select("doc_id", "tok", "rnk", "tfidf")
    )


def _word_ngrams(docs: DataFrame, n: int, text_col: str) -> DataFrame:
    """(doc_id, gram) — one row per word n-gram occurrence. Pure
    JVM-side array ops; docs shorter than n tokens drop out (the
    sequence guard also avoids Spark's descending sequence(1, 0))."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    return (
        fanout(docs).select("doc_id", toks.alias("__toks"))
        .filter(F.size("__toks") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(__toks) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(__toks, i, {n})))"
                )
            ).alias("gram"),
        )
    )


def dup_ngram_stats(docs: DataFrame, n: int = 2, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signal (Rae et al. 2021 §A1.1):
    per document, the fraction of word n-grams that are duplicates and
    the fraction taken by the single most frequent n-gram. High values
    flag boilerplate/spam for a training-data filter.

    Plan: explode n-grams → one map-side-combined groupBy
    (doc_id, gram) → one groupBy(doc_id) with sum/count/max. Both
    aggregations partial-combine, so the shuffle carries only distinct
    (doc, gram) counts — scales linearly in corpus size."""
    per = _word_ngrams(docs, n, text_col).groupBy("doc_id", "gram").agg(
        F.count("*").alias("c")
    )
    total = F.sum("c")
    return per.groupBy("doc_id").agg(
        total.cast("long").alias("n_grams"),
        F.count("*").cast("long").alias("n_distinct_grams"),
        F.round(F.lit(1.0) - F.count("*") / total.cast("double"), 6).alias("dup_gram_ratio"),
        F.round(F.max("c") / total.cast("double"), 6).alias("top_gram_ratio"),
    )


def cross_dup_ngram_stats(docs: DataFrame, n: int = 5, text_col: str = "text") -> DataFrame:
    """Cross-DOCUMENT repeated-span signal (the ExactSubstr flavor of
    Lee et al. 2022 §4.1, at n-gram granularity): per document, the
    fraction of its word n-gram windows whose gram also occurs in at
    least one OTHER document.  The within-doc twin is
    :func:`dup_ngram_stats` (Gopher repetition); this one catches
    shared boilerplate — licence blocks, navigation chrome, templated
    paragraphs — that per-doc stats cannot see.

    Plan: ONE explode → map-side-combined groupBy (doc_id, gram) →
    gram-partitioned window count (how many docs carry the gram) →
    one conditional-sum groupBy(doc_id).  Exactly three shuffles over
    distinct (doc, gram) rows; the exploded window stream is derived
    once (the naive three-branch formulation re-scans and re-explodes
    the corpus per branch — 3× the dominant cost at 100 TB).  The
    gram string itself is the shuffle payload; a production run would
    key by xxhash64(gram) (the oracle keeps the string — DuckDB 1.0
    has no xxhash64, and at sf scales the string is measured cheaper
    than an oracle-portable hash, CLAUDE.md r03)."""
    from pyspark.sql import Window

    per = _word_ngrams(docs, n, text_col).groupBy("doc_id", "gram").agg(
        F.count("*").alias("c")
    )
    nd = F.count("*").over(Window.partitionBy("gram"))
    return (
        per.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_windows"),
            F.round(
                F.sum(F.when(F.col("nd") >= 2, F.col("c")).otherwise(F.lit(0)))
                / F.sum("c").cast("double"),
                6,
            ).alias("cross_dup_ratio"),
        )
    )


def token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document unigram Shannon entropy (bits) and type-token
    ratio — the information-density quality signals: near-zero entropy
    flags keyword-stuffing/repetition spam, entropy ≈ log2(n_tokens)
    with TTR ≈ 1 flags random-token noise; natural prose sits between.

    One explode → one map-side-combined groupBy (doc_id, tok) → one
    groupBy(doc_id); entropy via the algebraic form
    log2(n) − Σ c·log2(c) / n, so the shuffle carries only distinct
    token counts.  Docs with no tokens report entropy 0, ttr 0."""
    t = F.col(text_col)
    per = (
        fanout(docs).select(
            "doc_id", F.explode(F.filter(F.split(t, " "), lambda x: x != "")).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c").cast("double")
    ent = F.log2(n) - F.sum(F.col("c") * F.log2("c")) / n
    with_toks = per.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.round(F.count("*") / n, 6).alias("ttr"),
        F.round(ent, 6).alias("entropy_bits"),
    )
    return docs.select("doc_id").join(with_toks, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("ttr", F.lit(0.0)).alias("ttr"),
        F.coalesce("entropy_bits", F.lit(0.0)).alias("entropy_bits"),
    )


def decontamination_overlap(
    docs: DataFrame,
    bench_docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination for a training corpus: for each
    candidate document, the fraction of its distinct word n-grams that
    appear anywhere in the benchmark set (the standard n-gram-overlap
    test used to strip eval contamination from pretraining data).

    Plan: both sides reduce to distinct n-grams; the benchmark side is
    tiny relative to the corpus, so its distinct-gram set BROADCASTS
    into the corpus-side join — no shuffle of the 100 TB side beyond
    the per-doc distinct. Returns (doc_id, n_grams, n_overlap,
    contamination_ratio, contaminated)."""
    corpus_grams = _word_ngrams(docs, n, text_col).dropDuplicates(["doc_id", "gram"])
    bench_grams = _word_ngrams(bench_docs, n, text_col).select("gram").dropDuplicates()
    totals = corpus_grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    ratio = F.col("n_overlap") / F.col("n_grams").cast("double")
    return (
        totals.join(hits, "doc_id", "left")
        .withColumn("n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0)))
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_overlap").cast("long").alias("n_overlap"),
            F.round(ratio, 6).alias("contamination_ratio"),
            (ratio >= threshold).alias("contaminated"),
        )
    )


def decontamination_overlap_bloom(
    docs: DataFrame,
    bench_docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    num_shards: int = 32,
    fpp: float = 1e-4,
    expected_bench_grams: int | None = None,
) -> DataFrame:
    """Scale twin of :func:`decontamination_overlap` for the regime
    where the benchmark side is too large to broadcast as a gram set
    (a full eval-suite union easily reaches 10^8 distinct grams —
    gigabytes of strings per executor under the broadcast contract).

    Plan: the bench grams reduce to xxhash64 values folded into
    SHARDED Bloom bitsets, built distributed by the same
    ``BloomFilterTable`` machinery as the URL-seen filter (one
    map-side pass over the bench, one bitset per hash shard). The
    bitsets are bounded bytes regardless of bench row count (~2.4 MB
    per 10^6 grams at fpp 1e-4), so they collect to the driver and
    broadcast — the classic runtime-filter shape. Corpus grams then
    stream ONCE through a vectorized Arrow prefilter with NO shuffle
    (the bitset probe is partition-local), and only survivors —
    truly contaminated grams plus ~fpp of the rest — enter the exact
    string-equality join against the bench gram set, which kills
    every Bloom false positive. Output is therefore IDENTICAL to
    ``decontamination_overlap`` (pytest-pinned), while the gram
    stream entering the join shrinks from |corpus grams| to
    |contaminated| + fpp·|clean|.

    ``expected_bench_grams`` skips the sizing count when the caller
    knows the bench cardinality (hints are upper bounds — oversizing
    is safe, undersizing inflates fpp and only costs prefilter
    selectivity, never correctness). The bench gram stream is derived
    twice (bloom build + exact verify); persist ``bench_docs``
    upstream if that scan is expensive."""
    from edgar_crawler_spark.frontier.seen import BloomFilterTable

    import numpy as np

    corpus_grams = _word_ngrams(docs, n, text_col).dropDuplicates(["doc_id", "gram"])
    bench_grams = _word_ngrams(bench_docs, n, text_col).select("gram").dropDuplicates()
    per_shard = (
        max(1, expected_bench_grams // num_shards + 1)
        if expected_bench_grams is not None
        else None
    )
    bloom = BloomFilterTable.build(
        bench_grams.select(F.xxhash64("gram").alias("gram_hash")),
        hash_col="gram_hash",
        num_shards=num_shards,
        expected_per_shard=per_shard,
        fpp=fpp,
    )
    shards = {
        int(r["shard"]): (
            np.frombuffer(r["bitset"], np.uint8),
            int(r["m_bits"]),
            int(r["k_hashes"]),
        )
        for r in bloom.df.collect()  # bounded: num_shards × m/8 bytes
    }
    bc = docs.sparkSession.sparkContext.broadcast(shards)

    with_hash = corpus_grams.withColumn("gram_hash", F.xxhash64("gram"))
    out_schema = with_hash.schema

    def prefilter(batches):
        from edgar_crawler_spark.frontier.seen import _positions

        table = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf["gram_hash"].to_numpy(np.int64)
            sh = h % num_shards  # numpy % is sign-of-divisor == Spark pmod
            keep = np.zeros(len(pdf), bool)
            for s in np.unique(sh):
                entry = table.get(int(s))
                if entry is None:
                    continue  # empty shard ⇒ nothing from the bench hashes here
                bits, m, k = entry
                idx = np.nonzero(sh == s)[0]
                pos = _positions(h[idx], m, k)
                hit = (bits[(pos >> 3).astype(np.int64)] >> (pos & 7).astype(np.uint8)) & 1
                keep[idx] = hit.all(axis=0)
            out = pdf[keep]
            if len(out):
                yield out

    maybe = with_hash.mapInPandas(prefilter, out_schema)
    totals = corpus_grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        maybe.join(bench_grams, "gram")  # exact verify: false positives die here
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    ratio = F.col("n_overlap") / F.col("n_grams").cast("double")
    return (
        totals.join(hits, "doc_id", "left")
        .withColumn("n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0)))
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_overlap").cast("long").alias("n_overlap"),
            F.round(ratio, 6).alias("contamination_ratio"),
            (ratio >= threshold).alias("contaminated"),
        )
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    # normalize once per row (two-step select; the double reference
    # blocks project collapse), fan a narrow scan out first
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return fanout(docs).select("doc_id", norm.alias("__norm")).select(
        "doc_id",
        F.md5("__norm").alias("fp_md5"),
        h48_col(F.col("__norm")).alias("fp_h48"),
    )


def line_dedup(
    docs: DataFrame,
    max_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """C4-style boilerplate-line removal: drop every line whose global
    document frequency exceeds ``max_df`` (navigation chrome, cookie
    banners, license footers — the lines that repeat across a crawl),
    then reassemble each document from its surviving lines in order.
    Returns (id_col, text) with the INPUT row count preserved — a doc
    whose every line was boilerplate comes back as the empty string.

    Scale shape: one explode (posexplode over split), one map-side-
    combined groupBy for the global line frequencies, one anti-join of
    the line stream against the frequent set, one groupBy to rebuild —
    all standard shuffle-aware primitives over line hashes + text, no
    UDF anywhere. The frequent-line set is df-capped by construction
    (each line in it appears in > max_df docs), so at 10^10 docs it is
    orders smaller than the line stream it filters.
    """
    import re as _re

    par = docs.sparkSession.sparkContext.defaultParallelism
    lines = (
        docs.repartition(par)
        .select(
            id_col,
            F.posexplode(F.split(F.col(text_col), _re.escape(sep), -1)).alias(
                "pos", "line"
            ),
        )
    )
    freq = (
        lines.dropDuplicates([id_col, "line"])
        .groupBy("line")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("line")
    )
    kept = lines.join(freq, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("__kept_text")
    )
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(id_col, F.coalesce(F.col("__kept_text"), F.lit("")).alias("text"))
    )


#: PII patterns written in the common RE2/Java-regex subset (no
#: backrefs, no lookaround) so Spark (Java regex) and the DuckDB
#: oracle (RE2) match byte-for-byte.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]", "<PHONE>"),
]


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction for training corpora: emails, IPv4 addresses and
    phone-shaped digit runs are replaced by typed placeholder tokens,
    and per-document hit counts are reported (the audit trail a
    compliance pass needs).  Pure JVM ``regexp_replace`` chain —
    whole-stage codegen, no UDF, pushdown-friendly; patterns restricted
    to the RE2/Java common subset so the SQL oracle is exact.  Order
    matters and is fixed: emails first (an address contains dots that
    the IP pattern must not see), then IPs, then phones."""
    out = docs
    counts = []
    cur = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            (F.size(F.split(cur, pat, -1)) - 1).cast("long").alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    return out.select(
        *[c for c in docs.columns if c != text_col],
        cur.alias(text_col),
        *counts,
    )


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-example PACKING: assign documents to capacity-bounded
    bins (the step that turns a curated corpus into fixed-budget
    training sequences). Docs are hash-sharded (``n_shards`` parallel
    packing streams — the scale knob: each shard's running sum is an
    independent window, so packing parallelism is explicit, not a
    single global total order), ordered deterministically by hash
    within their shard, and binned by the exclusive running token sum:
    ``bin = floor(cumsum_before / max_tokens)``.  Capacity-approximate
    by design: a bin may overflow by less than one document (the
    standard greedy packer; the trainer truncates or wraps the tail).
    A document longer than ``max_tokens`` occupies its own bin(s).
    Returns (id_col, shard, bin, n_tokens) — deterministic and
    rerun-stable."""
    from pyspark.sql import Window

    t = F.col(text_col)
    n_tok = F.size(F.filter(F.split(t, " "), lambda x: x != "")).cast("long")
    h = h48_col(F.col(id_col).cast("string"))
    shard = F.pmod(h, F.lit(n_shards)).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(id_col, n_tok.alias("n_tokens"), shard.alias("shard"), h.alias("__h"))
        .withColumn("__before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            id_col,
            "shard",
            F.floor(F.col("__before") / max_tokens).cast("int").alias("bin"),
            "n_tokens",
        )
    )

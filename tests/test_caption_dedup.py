"""Incremental caption+phash near-dup pass over the frontier's payload
(plans.pipeline.caption_near_dups_from_frontier + --caption-dedup)."""

import json
import subprocess
import sys

from edgar_crawler_spark.fixtures.seed_index import seed_index_df
from edgar_crawler_spark.frontier.frontier import CrawlFrontier
from edgar_crawler_spark.plans.pipeline import caption_near_dups_from_frontier


def test_incremental_caption_and_phash_pairs(spark, tmp_path):
    # nested def: cloudpickle must serialize by VALUE (workers cannot
    # import test modules)
    def _dup_fetcher(url: str, attempt: int):
        # content is a pure function of i % 5 -> heavy duplication
        import re

        from edgar_crawler_spark.fixtures.payload import make_payload_row

        i = int(re.search(r"-(\d{6})-index\.html$", url).group(1))
        r = make_payload_row(i % 5)
        return 200, r["bytes"], r["caption"]

    wd = str(tmp_path / "wd")
    fr = CrawlFrontier(spark, wd, fetcher=_dup_fetcher)
    fr.submit(seed_index_df(spark, 10, n_hosts=2, hot_host=False))
    fr.run()

    def _i(doc_id):  # accession suffix -> row index
        return int(doc_id.split("-")[-1])

    def same_content_pairs(ids):
        return {
            tuple(sorted((a, b)))
            for a in ids
            for b in ids
            if a < b and _i(a) % 5 == _i(b) % 5
        }

    p1 = caption_near_dups_from_frontier(spark, wd)
    got1 = {(r.doc_a, r.doc_b, r.via) for r in p1.collect()}
    assert got1, "first pass must find the engineered duplicates"
    assert {v for _, _, v in got1} == {"caption_minhash", "phash"}
    ids1 = {a for a, _, _ in got1} | {b for _, b, _ in got1}
    expected1 = same_content_pairs(ids1)
    # phash pairs are exact-verified (hamming<=6 on random 64-bit
    # hashes == identical content): EXACTLY the 5 duplicate pairs
    assert {(a, b) for a, b, v in got1 if v == "phash"} == expected1
    assert len(expected1) == 5
    # caption LSH emits CANDIDATES: the true dups must all be there
    # (near-identical captions may band together too)
    assert expected1 <= {(a, b) for a, b, v in got1 if v == "caption_minhash"}

    # second crawl: 10 MORE rows of the same 5 contents
    fr2 = CrawlFrontier(spark, wd, fetcher=_dup_fetcher)
    fr2.submit(seed_index_df(spark, 20, n_hosts=2, hot_host=False))
    fr2.run()
    p2 = caption_near_dups_from_frontier(spark, wd)
    got2 = {(r.doc_a, r.doc_b, r.via) for r in p2.collect()}
    assert got2
    # no already-emitted pair is re-emitted
    assert not (got1 & got2)
    # every content now has 4 copies; the new phash pairs are exactly
    # the duplicate pairs touching a NEW doc (C(4,2)-C(2,2) = 5/content)
    ids_all = ids1 | {a for a, _, _ in got2} | {b for _, b, _ in got2}
    ph2 = {(a, b) for a, b, v in got2 if v == "phash"}
    assert ph2 == same_content_pairs(ids_all) - expected1
    assert len(ph2) == 25

    # third pass with nothing new: no pairs at all
    p3 = caption_near_dups_from_frontier(spark, wd)
    assert p3.count() == 0


def test_caption_dedup_cli_smoke(spark, tmp_path):
    seed_index_df(spark, 12, n_hosts=2, hot_host=False).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "seeds"))
    out = subprocess.run(
        [
            sys.executable, "spark_submit_main.py",
            "--workdir", str(tmp_path / "wd"),
            "--seed-parquet", str(tmp_path / "seeds"),
            "--caption-dedup",
        ],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-3000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert "near_dup_pairs" in rep and rep["near_dup_pairs"] >= 0

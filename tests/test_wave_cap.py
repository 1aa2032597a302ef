"""Global wave cap (VERDICT r02 item 5): `max_wave_rows` bounds a
wave's total row count even when host count × per-host quota explodes,
while preserving per-host politeness order (each wave dispatches a
prefix of every participating host's priority queue)."""

import pyspark.sql.functions as F

from edgar_crawler_spark.fixtures.seed_index import seed_index_df
from edgar_crawler_spark.frontier.frontier import CrawlFrontier


def test_wave_sizes_bounded_and_order_preserved(spark, tmp_path):
    n, n_hosts, cap = 120, 20, 25
    fr = CrawlFrontier(
        spark,
        str(tmp_path / "w"),
        wave_quota=50,  # per-host quota alone would dispatch everything
        max_wave_rows=cap,
    )
    fr.submit(seed_index_df(spark, n, n_hosts=n_hosts, hot_host=False))
    waves = fr.run(pipeline=False)
    assert sum(w["dispatched"] for w in waves) == n  # full drain
    assert all(w["dispatched"] <= cap for w in waves)
    assert len(waves) >= -(-n // cap)

    # politeness: within each host, dispatch order across waves follows
    # the priority order (each wave took a queue prefix)
    log = fr.fetch_log().toPandas()
    for _, host_rows in log.groupby("host"):
        by_wave = host_rows.sort_values(["wave", "dispatch_seq"])
        pri = list(zip(by_wave["date"], by_wave["row_seq"]))
        assert pri == sorted(pri)


def test_host_cohort_rotation_when_hosts_exceed_cap(spark, tmp_path):
    """More hosts than the cap: each wave serves a rotating host cohort
    of bounded size; every URL is still fetched exactly once."""
    n, n_hosts, cap = 64, 64, 16  # rank-1 depth alone is 4× the cap
    fr = CrawlFrontier(
        spark, str(tmp_path / "w"), wave_quota=10, max_wave_rows=cap
    )
    fr.submit(seed_index_df(spark, n, n_hosts=n_hosts, hot_host=False))
    waves = fr.run(pipeline=False, max_waves=100)
    assert sum(w["dispatched"] for w in waves) == n
    assert all(w["dispatched"] <= cap for w in waves)
    log = fr.fetch_log().toPandas()
    assert log.row_seq.nunique() == n and (log.state == "fetched").all()

"""Wall-clock politeness: with virtual_clock=False the token bucket
must actually pace requests in real time."""

import time

from edgar_crawler_spark.frontier.politeness import TokenBucket


def test_real_clock_token_bucket_paces():
    bucket = TokenBucket(rate=100.0, capacity=5)
    t0 = time.monotonic()
    for _ in range(25):
        bucket.acquire()
    elapsed = time.monotonic() - t0
    # 25 requests, burst 5, rate 100/s → at least (25-5)/100 = 0.2 s
    assert elapsed >= 0.18
    assert elapsed < 2.0  # and not pathologically slow


def test_burst_then_steady_state():
    bucket = TokenBucket(rate=50.0, capacity=10)
    t0 = time.monotonic()
    for _ in range(10):
        bucket.acquire()
    burst_t = time.monotonic() - t0
    assert burst_t < 0.05  # burst is free
    t1 = time.monotonic()
    bucket.acquire()
    assert time.monotonic() - t1 >= 0.015  # ~1/50 s pacing after burst
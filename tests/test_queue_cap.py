"""Queue-cap admission (PersistentQueue.java:22,97): the closed-form greedy
formula, and the distributed fixpoint replay vs the sequential simulator
under caps that actually bind."""

from __future__ import annotations

import random

import pytest

from sher_look_spark.crawler import synth
from sher_look_spark.crawler.engine import CrawlConfig, CrawlEngine
from sher_look_spark.crawler.simulator import simulate_crawl

WEB = synth.SynthWebConfig(
    n_hosts=6, pages_per_host=12, seed=77, timeout_pct=5, dup_every=5, robots_every=3
)
SEEDS = synth.seed_urls(WEB, 5)


def _greedy(budgets: list[int]) -> list[bool]:
    """The sequential truth: accept offer i iff accepted-so-far < b_i."""
    a, out = 0, []
    for b in budgets:
        acc = a < b
        out.append(acc)
        a += acc
    return out


def test_admission_closed_form_matches_greedy():
    """A_i = min(i, i + min_{j<=i}(max(b_j,0) - j)) for non-decreasing b —
    the formula the distributed admission evaluates with a prefix-min scan."""
    rng = random.Random(7)
    for _ in range(500):
        n = rng.randint(1, 80)
        v = rng.randint(-10, 5)
        budgets = []
        for _ in range(n):
            v += rng.choice([0, 0, 0, 1, 1, 2, 3])
            budgets.append(v)
        want = _greedy(budgets)
        got, prev_a, minpref = [], 0, None
        for i, b in enumerate(budgets, start=1):
            g = max(b, 0) - i
            minpref = g if minpref is None else min(minpref, g)
            a = min(i, i + minpref)
            got.append(a > prev_a)
            prev_a = a
        assert got == want, (budgets, got, want)


@pytest.mark.parametrize("cap", [12, 30, 80])
def test_binding_queue_cap_matches_simulator(spark, tmp_path, cap):
    """End-to-end: with a cap small enough to bind (and un-bind as polls free
    slots), the engine's committed order, seen set and final frontier must
    still equal the sequential reference simulation — including children
    admitted on re-offer after an earlier occurrence was rejected."""
    sim = simulate_crawl(WEB, SEEDS, max_pages=10_000, max_depth=3, queue_cap=cap)
    eng = CrawlEngine(
        spark,
        str(tmp_path / f"cap{cap}"),
        CrawlConfig(max_pages=10_000, max_depth=3, queue_cap=cap, web=WEB),
    )
    eng.run(SEEDS)
    got = [
        r.url for r in eng.store.read(spark, "images").orderBy("wave", "rank").collect()
    ]
    assert got == [c["url"] for c in sim.committed]
    seen = {r.url for r in eng.store.read(spark, "seen").collect()}
    assert seen == sim.visited


def test_cap_never_binding_is_equal_to_fast_path(spark, tmp_path):
    """A huge cap must produce the identical crawl through the fast path."""
    sim = simulate_crawl(WEB, SEEDS, max_pages=10_000, max_depth=2, queue_cap=10**9)
    eng = CrawlEngine(
        spark,
        str(tmp_path / "nocap"),
        CrawlConfig(max_pages=10_000, max_depth=2, queue_cap=10**9, web=WEB),
    )
    eng.run(SEEDS)
    got = [
        r.url for r in eng.store.read(spark, "images").orderBy("wave", "rank").collect()
    ]
    assert got == [c["url"] for c in sim.committed]

"""Crawl parity vs the serial reference-semantics simulator (SURVEY.md §5):

1. ORDER parity: with global_budget=1 (the reference's serial consumer,
   CONCURRENT_REQUESTS=1, settings.py:122-123) the engine's pop order
   equals the simulator's, pop for pop (checked on a 60-pop prefix —
   one engine round per pop).
2. SET parity: the final URL-seen set and item set are identical at ANY
   parallelism/budget (the closure is order-independent) — checked on
   the full closure with unbounded per-round budget.
"""

import hashlib

import pytest

from crunchy_spark import datagen
from crunchy_spark.loop import CrawlConfig, CrawlEngine
from crunchy_spark.refsim import RefSimulator
from crunchy_spark.snapshot import SnapshotStore

N_SEEDS = 40
ORDER_PREFIX = 40  # one engine round per pop; 40 keeps the suite < ~6 min


@pytest.fixture(scope="module")
def simulator(unit_fixtures):
    meta = datagen.fixture_meta(unit_fixtures)
    page_meta = datagen.gen_page_meta_pdf(meta["n_images"], meta["n_universe"])
    return RefSimulator(page_meta, n_images=meta["n_images"])


@pytest.fixture(scope="module")
def seeds_pdf():
    return datagen.gen_frontier_seed_pdf(N_SEEDS)


def _run_engine(spark, unit_fixtures, tmp_path_factory, budget, max_rounds, use_bloom=True):
    store = SnapshotStore(str(tmp_path_factory.mktemp(f"par{budget or 'inf'}")))
    # bloom on for the full-closure run (the scale path); off for the
    # budget=1 order run where its per-round Python stages dominate —
    # bloom==exact equivalence is proven in test_bloom.py
    conf = CrawlConfig(global_budget=budget, round_seconds=1e6, use_bloom=use_bloom)
    eng = CrawlEngine(spark, store, unit_fixtures, conf)
    eng.bootstrap(spark.createDataFrame(datagen.gen_frontier_seed_pdf(N_SEEDS)))
    eng.run(max_rounds=max_rounds)
    return eng, store


def test_order_parity_serial_prefix(
    spark, unit_fixtures, tmp_path_factory, simulator, seeds_pdf
):
    sim = simulator.run(list(seeds_pdf["url"]), max_pops=ORDER_PREFIX)
    eng, _ = _run_engine(
        spark, unit_fixtures, tmp_path_factory, budget=1, max_rounds=ORDER_PREFIX,
        use_bloom=False,
    )
    assert eng.crawl_order() == sim.order


def test_set_parity_any_parallelism(
    spark, unit_fixtures, tmp_path_factory, simulator, seeds_pdf
):
    """Final seen/item/failed sets invariant to politeness budget and equal
    to the serial reference closure."""
    sim = simulator.run(list(seeds_pdf["url"]))
    eng, store = _run_engine(
        spark, unit_fixtures, tmp_path_factory, budget=None, max_rounds=10_000
    )
    sim_shas = sorted(hashlib.sha1(u.encode()).hexdigest() for u in sim.seen)
    assert eng.seen_set() == sim_shas
    items = {r["url_canon"] for r in store.load(spark, "items").collect()}
    assert items == set(sim.items)

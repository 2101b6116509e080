"""Config.adaptive_delay: the live AIMD politeness loop (r4 verdict #3).

The registered adaptive_crawl_delay operator computes "the budget
select_fetchable consumes next round" as a batch fold; these tests pin
that the engine actually CLOSES that loop when opted in — each round's
fetch outcomes fold into a host_delay state table (seeded from the
static policy, carried incrementally) and the NEXT round's selection
obeys the folded budgets — while the default config stays bit-identical
to the static-policy crawl (parity mode untouched).

Reference semantics: Scrapy AutoThrottle reacting where the reference
pins DOWNLOAD_DELAY=5 statically (settings.py:122-130,175).
"""

import pytest
from pyspark.sql import functions as F

from crunchy_spark.loop import CrawlConfig, CrawlEngine
from crunchy_spark.queries import (
    AIMD_CAP,
    AIMD_DELAY0,
    AIMD_DOWN,
    AIMD_FLOOR,
    AIMD_UP,
)
from crunchy_spark.snapshot import SnapshotStore

ROUND_S = 40.0  # static delay 5 -> budget 8; two fail-steps -> 20s -> budget 2


@pytest.fixture(scope="module")
def adaptive_crawled(spark, unit_fixtures, tmp_path_factory):
    store = SnapshotStore(str(tmp_path_factory.mktemp("adstore")))
    eng = CrawlEngine(
        spark,
        store,
        unit_fixtures,
        CrawlConfig(round_seconds=ROUND_S, adaptive_delay=True),
    )
    eng.bootstrap(spark.read.parquet(f"{unit_fixtures}/frontier_seed.parquet"))
    stats = eng.run(max_rounds=12)
    return eng, store, stats


def _reference_fold(outcomes, seed):
    """Plain-Python AIMD twin: fold fail flags in pop order."""
    d = seed
    for fail in outcomes:
        d = min(AIMD_CAP, d * AIMD_UP) if fail else max(AIMD_FLOOR, d * AIMD_DOWN)
    return d


def test_host_delay_state_equals_reference_fold(adaptive_crawled):
    """The committed host_delay state == folding each host's FULL
    outcome history in fetch_seq order from its static seed — i.e. the
    incremental per-round seeding really is equivalent to the batch
    operator's re-fold (clamp-fold associativity, the scale argument
    in loop._fold_host_delay's docstring)."""
    eng, store, _ = adaptive_crawled
    log = store.load(eng.spark, "fetch_log")
    pol = {
        r["host"]: r["crawl_delay_s"]
        for r in eng.host_policy.select("host", "crawl_delay_s").collect()
    }
    hist = {}
    for r in sorted(log.collect(), key=lambda r: r["fetch_seq"]):
        hist.setdefault(r["host"], []).append(r["status"] != "fetched")
    state = {
        r["host"]: r["delay_s"] for r in eng.host_delay_view().collect()
    }
    assert set(state) == set(hist)
    for host, outcomes in hist.items():
        seed = pol.get(host) or AIMD_DELAY0
        assert state[host] == pytest.approx(
            _reference_fold(outcomes, seed), abs=1e-12
        ), host


def test_adaptive_budgets_are_consumed_round_over_round(adaptive_crawled):
    """Every round's per-host pop count obeys the budget implied by the
    PREVIOUS round's folded state — proof the committed host_delay is
    what select_fetchable actually consumes — and at least one round
    pops a host at a budget the static policy could never produce
    (decay below the static delay), so the policy is live, not a
    pass-through."""
    eng, store, stats = adaptive_crawled
    assert len(stats) >= 2
    log = store.load(eng.spark, "fetch_log").collect()
    pol = {
        r["host"]: (r["crawl_delay_s"], r["max_concurrent"] or 1)
        for r in eng.host_policy.collect()
    }
    rounds = sorted({r["round"] for r in log})
    state: dict[str, float] = {}
    saw_non_static_budget = False
    for rnd in rounds:
        this = [r for r in log if r["round"] == rnd]
        if rnd > rounds[0]:
            pops: dict[str, int] = {}
            for r in this:
                pops[r["host"]] = pops.get(r["host"], 0) + 1
            for host, n in pops.items():
                if host not in state:
                    continue
                delay = state[host]
                conc = pol.get(host, (None, 1))[1]
                budget = max(1, int(ROUND_S // delay)) * conc
                assert n <= budget, (rnd, host, n, budget, delay)
                static_seed = pol.get(host, (AIMD_DELAY0, 1))[0] or AIMD_DELAY0
                static_budget = max(1, int(ROUND_S // static_seed)) * conc
                if n > static_budget:
                    saw_non_static_budget = True
        for r in sorted(this, key=lambda r: r["fetch_seq"]):
            seed = state.get(
                r["host"], pol.get(r["host"], (AIMD_DELAY0, 1))[0] or AIMD_DELAY0
            )
            state[r["host"]] = _reference_fold(
                [r["status"] != "fetched"], seed
            )
    assert saw_non_static_budget


def test_failing_host_budget_shrinks_within_two_rounds(
    spark, unit_fixtures, tmp_path
):
    """THE acceptance scenario (r4 verdict #3): a host whose round-1
    fetches fail sees its delay double per failure (x2-steps), and
    round 2's selection for it is capped by the SHRUNK budget — driven
    through the real wiring: _fold_host_delay -> snapshot commit ->
    effective_policy -> select_fetchable."""
    from crunchy_spark.frontier import select_fetchable

    store = SnapshotStore(str(tmp_path / "st"))
    eng = CrawlEngine(
        spark,
        store,
        unit_fixtures,
        CrawlConfig(round_seconds=ROUND_S, adaptive_delay=True),
    )
    host = "crunchbase.com"
    seed = {
        r["host"]: r["crawl_delay_s"] for r in eng.host_policy.collect()
    }[host]
    static_budget = max(1, int(ROUND_S // seed))
    assert static_budget >= 4  # the shrink must be observable

    # round 1: this host fails twice (e.g. repeated 429/Cloudflare)
    log1 = spark.createDataFrame(
        [(host, 0, "failed"), (host, 1, "failed")],
        "host string, fetch_seq long, status string",
    )
    state1 = eng._fold_host_delay(log1)
    row = state1.filter(F.col("host") == host).first()
    assert row["delay_s"] == pytest.approx(
        min(AIMD_CAP, seed * AIMD_UP * AIMD_UP)
    )  # exactly two x2-steps
    store.commit(tables={"host_delay": state1})

    # round 2: the live policy path must cap the host at the shrunk
    # budget when plenty of its URLs are pending
    pending = spark.createDataFrame(
        [(host, 1, i) for i in range(static_budget * 3)],
        "host string, queue_rank int, seq long",
    )
    picked = select_fetchable(
        pending, eng.effective_policy(), round_seconds=ROUND_S
    )
    n = picked.count()
    shrunk_budget = max(1, int(ROUND_S // (seed * AIMD_UP * AIMD_UP)))
    assert n == shrunk_budget < static_budget


def test_adaptive_off_leaves_no_state_and_static_policy(
    spark, unit_fixtures, tmp_path
):
    """Default config: no host_delay table is ever committed and
    effective_policy IS the static table — parity mode untouched."""
    store = SnapshotStore(str(tmp_path / "st"))
    eng = CrawlEngine(
        spark, store, unit_fixtures, CrawlConfig(round_seconds=ROUND_S)
    )
    eng.bootstrap(spark.read.parquet(f"{unit_fixtures}/frontier_seed.parquet"))
    eng.run(max_rounds=2)
    assert not store.has_table("host_delay")
    assert eng.effective_policy() is eng.host_policy


def test_expansion_host_state_survives_outer_join(spark, unit_fixtures):
    """effective_policy keeps AIMD state for hosts absent from the
    static table (expansion hosts): outer join, delay wins."""
    store_less = CrawlEngine(
        spark,
        SnapshotStore("/tmp/_unused_ad"),
        unit_fixtures,
        CrawlConfig(adaptive_delay=True),
    )
    # monkey-in a delay state with a host the static policy lacks
    extra = spark.createDataFrame(
        [("zz-not-in-policy.example", 17.5)], "host string, delay_s double"
    )
    store_less.host_delay_view = lambda: extra  # type: ignore[method-assign]
    pol = store_less.effective_policy()
    row = pol.filter(F.col("host") == "zz-not-in-policy.example").first()
    assert row is not None and row["crawl_delay_s"] == 17.5


def test_stream_crawl_inherits_adaptive_delay(
    spark, unit_fixtures, tmp_path
):
    """The streaming round loop runs the SAME CrawlEngine per
    micro-batch, so Config.adaptive_delay flows through unchanged: a
    streamed crawl commits the host_delay state and its delays equal
    the reference fold over its own fetch log — the live controller
    works identically on both execution surfaces."""
    from pyspark.sql import functions as F

    from crunchy_spark import schemas, streaming
    from crunchy_spark.snapshot import SnapshotStore

    seeds = spark.read.parquet(f"{unit_fixtures}/frontier_seed.parquet").filter(
        F.col("seq") < 80
    )
    seed_dir, ckpt = str(tmp_path / "seeds"), str(tmp_path / "ckpt")
    out_cols = [f.name for f in schemas.SEED.fields]
    seeds.withColumn("image_id", F.lit(None).cast("string")).select(
        out_cols
    ).coalesce(1).write.parquet(f"{seed_dir}/all")
    store = SnapshotStore(str(tmp_path / "store"))
    q = streaming.stream_crawl(
        spark, store, unit_fixtures, seed_dir + "/*", ckpt,
        conf=CrawlConfig(round_seconds=ROUND_S, adaptive_delay=True),
    )
    q.awaitTermination(600)
    assert store.has_table("host_delay")
    eng = CrawlEngine(
        spark, store, unit_fixtures,
        CrawlConfig(round_seconds=ROUND_S, adaptive_delay=True),
    )
    pol = {
        r["host"]: r["crawl_delay_s"]
        for r in eng.host_policy.select("host", "crawl_delay_s").collect()
    }
    hist: dict[str, list] = {}
    for r in sorted(
        store.load(spark, "fetch_log").collect(), key=lambda r: r["fetch_seq"]
    ):
        hist.setdefault(r["host"], []).append(r["status"] != "fetched")
    state = {r["host"]: r["delay_s"] for r in eng.host_delay_view().collect()}
    assert set(state) == set(hist) and state
    for host, outcomes in hist.items():
        seed = pol.get(host) or AIMD_DELAY0
        assert state[host] == pytest.approx(
            _reference_fold(outcomes, seed), abs=1e-12
        ), host


def test_adaptive_state_survives_resume(spark, unit_fixtures, tmp_path):
    """North-rule resume with the controller on: a FRESH engine on the
    same snapshot store (process restart) keeps folding from the
    committed host_delay state — final delays equal the single-process
    reference fold over the combined history."""
    store = SnapshotStore(str(tmp_path / "st"))
    conf = CrawlConfig(round_seconds=ROUND_S, adaptive_delay=True)
    eng1 = CrawlEngine(spark, store, unit_fixtures, conf)
    eng1.bootstrap(
        spark.read.parquet(f"{unit_fixtures}/frontier_seed.parquet")
    )
    eng1.run(max_rounds=2)
    v_mid = store.current_version()

    eng2 = CrawlEngine(spark, store, unit_fixtures, conf)  # "restart"
    eng2.run(max_rounds=2)
    assert store.current_version() > v_mid  # resumed and progressed

    pol = {
        r["host"]: r["crawl_delay_s"]
        for r in eng2.host_policy.select("host", "crawl_delay_s").collect()
    }
    hist: dict[str, list] = {}
    for r in sorted(
        store.load(spark, "fetch_log").collect(), key=lambda r: r["fetch_seq"]
    ):
        hist.setdefault(r["host"], []).append(r["status"] != "fetched")
    state = {r["host"]: r["delay_s"] for r in eng2.host_delay_view().collect()}
    assert set(state) == set(hist) and state
    for host, outcomes in hist.items():
        seed = pol.get(host) or AIMD_DELAY0
        assert state[host] == pytest.approx(
            _reference_fold(outcomes, seed), abs=1e-12
        ), host

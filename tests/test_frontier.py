"""Scheduler semantics: priority, FIFO, per-host politeness budget,
salted-ranking exactness under host skew (W1-W3)."""

import pytest
from pyspark.sql import functions as F

from crunchy_spark import datagen, schemas
from crunchy_spark.frontier import seeds_to_frontier, select_fetchable


@pytest.fixture(scope="module")
def pending(spark):
    seeds = spark.createDataFrame(datagen.gen_frontier_seed_pdf(400))
    return seeds_to_frontier(seeds, n_images=200).cache()


@pytest.fixture(scope="module")
def policy(spark):
    return spark.createDataFrame(datagen.gen_host_policy_pdf(), schema=schemas.HOST_POLICY)


def test_per_host_budget_exact(spark, pending, policy):
    """Per-host cap = floor(round_seconds/delay)*max_concurrent, held
    exactly even for the skewed apex hosts."""
    sel = select_fetchable(pending, policy, round_seconds=10.0, salt_k=8)
    counts = {r["host"]: r["n"] for r in sel.groupBy("host").agg(F.count("*").alias("n")).collect()}
    pol = {r["host"]: r for r in policy.collect()}
    for host, n in counts.items():
        budget = max(1, int(10.0 // pol[host]["crawl_delay_s"])) * pol[host]["max_concurrent"]
        assert n <= budget, f"{host}: {n} > {budget}"
    # apex hosts (delay 5) get exactly 2 when they have >=2 pending
    assert counts["crunchbase.com"] == 2
    assert counts["tracxn.com"] == 2


def test_selection_is_host_prefix_by_priority(spark, pending, policy):
    """Within each host, the selected rows are exactly the top-budget rows
    by (queue_rank, seq) — the salted two-phase ranking is exact."""
    sel = select_fetchable(pending, policy, round_seconds=25.0, salt_k=4)
    sel_keys = {(r["host"], r["seq"]) for r in sel.select("host", "seq").collect()}
    pend = [
        (r["host"], r["queue_rank"], r["seq"])
        for r in pending.select("host", "queue_rank", "seq").collect()
    ]
    pol = {r["host"]: r for r in policy.collect()}
    by_host: dict[str, list] = {}
    for host, rank, seq in pend:
        by_host.setdefault(host, []).append((rank, seq))
    for host, rows in by_host.items():
        budget = max(1, int(25.0 // pol[host]["crawl_delay_s"])) * pol[host]["max_concurrent"]
        expect = {(host, seq) for _, seq in sorted(rows)[:budget]}
        got = {k for k in sel_keys if k[0] == host}
        assert got == expect, f"{host}: {got} != {expect}"


def test_global_budget_order(spark, pending, policy):
    """global_budget=1 pops the single (queue_rank, seq) minimum —
    tracxn(1) before crunchbase(2), FIFO within (scheduler.py:136-162)."""
    sel = select_fetchable(pending, policy, round_seconds=1e6, global_budget=1)
    rows = sel.collect()
    assert len(rows) == 1
    pend = pending.orderBy("queue_rank", "seq").first()
    assert rows[0]["seq"] == pend["seq"]
    assert rows[0]["queue_rank"] == 1  # a tracxn row exists => rank 1 first


def test_site_discard_at_enqueue(spark):
    seeds = spark.createDataFrame(
        [
            ("https://crunchbase.com/organization/a", None, "crunchbase", 0, None, 0.0),
            ("https://evil.example.com/x", None, None, 1, None, 0.0),
            ("https://tracxn.com/d/companies/b/__c", None, "tracxn", 2, None, 0.0),
        ],
        schema=schemas.SEED,
    )
    f = seeds_to_frontier(seeds, n_images=10)
    sites = {r["site"] for r in f.collect()}
    assert sites == {"crunchbase", "tracxn"}
    assert f.count() == 2


def test_first_arrival_equals_window_dedup(spark):
    """first_arrival (min-struct hash agg) must pick exactly the rows
    row_number()=1 over (PARTITION BY key ORDER BY order) would."""
    from pyspark.sql import Window

    from crunchy_spark.frontier import first_arrival

    df = spark.range(2000).select(
        (F.col("id") % 7).alias("grp"),
        (F.col("id") % 211).alias("sha_int"),
        F.col("id").alias("seq"),
        ((F.col("id") * 37) % 100).alias("payload"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("txt"),
    )
    got = {
        tuple(r)
        for r in first_arrival(df, "sha_int", ("seq",)).collect()
    }
    w = Window.partitionBy("sha_int").orderBy("seq")
    want = {
        tuple(r)
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .collect()
    }
    assert got == want


def test_first_arrival_primitive_fast_path(spark):
    """All-fixed-width payload (the scheduling hot path shape) must (a)
    produce exactly the window-dedup rows and (b) compile to a
    HashAggregate with no SortAggregate — min(struct(...)) buffers are
    not UnsafeRow-mutable, so the struct form silently costs two full
    sorts of the frontier per round."""
    from pyspark.sql import Window

    from crunchy_spark.frontier import first_arrival

    df = spark.range(2000).select(
        (F.col("id") % 211).alias("sha_int"),
        F.col("id").alias("seq"),
        ((F.col("id") * 37) % 100).alias("host_key"),
        (F.col("id") % 3).cast("int").alias("queue_rank"),
    )
    fa = first_arrival(df, "sha_int", ("seq",))
    plan = fa._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    got = {tuple(r) for r in fa.collect()}
    w = Window.partitionBy("sha_int").orderBy("seq")
    want = {
        tuple(r)
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .collect()
    }
    assert got == want


def test_first_arrival_multi_order_cols(spark):
    from pyspark.sql import Window

    from crunchy_spark.frontier import first_arrival

    df = spark.range(500).select(
        (F.col("id") % 31).alias("sha_int"),
        (F.col("id") % 5).alias("a"),
        (F.col("id") % 13).alias("b"),
        F.col("id").alias("v"),
    )
    got = {tuple(r) for r in first_arrival(df, "sha_int", ("a", "b")).collect()}
    w = Window.partitionBy("sha_int").orderBy("a", "b")
    want = {
        tuple(r)
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .collect()
    }
    assert got == want


def test_seed_dedup_keeps_first_arrival(spark):
    u = "https://crunchbase.com/organization/a"
    seeds = spark.createDataFrame(
        [
            (u, None, "crunchbase", 0, None, 0.0),
            (u + "/", None, "crunchbase", 1, None, 0.0),
            ("https://WWW.CRUNCHBASE.COM/organization/a", None, "crunchbase", 2, None, 0.0),
        ],
        schema=schemas.SEED,
    )
    f = seeds_to_frontier(seeds, n_images=10).collect()
    assert len(f) == 1
    assert f[0]["seq"] == 0


def test_adaptive_salt_equals_fixed_salt(spark, pending, policy):
    """Adaptive per-host salt counts must not change the selection: the
    two-phase ranking is exact for ANY salt count, so adaptive (census)
    and fixed salting pick identical row sets — even with a STALE census
    (wrong counts only change k, never the rank order)."""
    census = pending.groupBy("host").agg(F.count("*").alias("n_pending"))
    stale = census.withColumn("n_pending", F.col("n_pending") * 100 + 7)
    fixed = select_fetchable(
        pending, policy, round_seconds=25.0, salt_k=8, two_phase=True
    )
    fk = {(r["host"], r["seq"]) for r in fixed.select("host", "seq").collect()}
    for c in (census, stale):
        adaptive = select_fetchable(
            pending, policy, round_seconds=25.0, salt_k=8, census=c,
            rows_per_salt=3, two_phase=True,
        )
        ak = {(r["host"], r["seq"]) for r in adaptive.select("host", "seq").collect()}
        assert fk == ak


def test_single_window_equals_two_phase(spark, pending, policy):
    """The single-window path (partial WindowGroupLimit as the implicit
    salt) must select exactly the rows the salted two-phase path does,
    and its plan must carry exactly ONE politeness window: one
    partial+final WindowGroupLimit pair, no _salt column, one exchange."""
    salted = select_fetchable(
        pending, policy, round_seconds=25.0, salt_k=8, two_phase=True
    )
    single = select_fetchable(
        pending, policy, round_seconds=25.0, two_phase=False
    )
    sk = {(r["host"], r["seq"]) for r in salted.select("host", "seq").collect()}
    gk = {(r["host"], r["seq"]) for r in single.select("host", "seq").collect()}
    assert sk == gk
    plan = single._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") == 2, plan  # Partial + Final
    assert "_salt" not in plan, plan
    # auto mode picks the single path when the cap fits the rewrite
    # threshold (these budgets do)
    auto = select_fetchable(pending, policy, round_seconds=25.0)
    aplan = auto._jdf.queryExecution().executedPlan().toString()
    assert aplan.count("WindowGroupLimit") == 2, aplan


def test_latest_state_keeps_highest_version(spark):
    from crunchy_spark.frontier import latest_state

    df = spark.createDataFrame(
        [
            (1, 0, "pending", "a"),
            (1, 2, "fetched", "a"),
            (1, 1, "pending", "a"),
            (2, 0, "pending", "b"),
            (3, 3, "failed", "c"),
        ],
        "sha_int long, state_round int, status string, url string",
    )
    got = {tuple(r) for r in latest_state(df, "sha_int", "state_round").collect()}
    assert got == {
        (1, 2, "fetched", "a"),
        (2, 0, "pending", "b"),
        (3, 3, "failed", "c"),
    }


def test_rank_limit_pushdown_and_equivalence(spark, pending, policy):
    """With a plan-time max_budget literal, both politeness windows
    compile to WindowGroupLimit (bounded per-group top-k heaps, not
    full partition sorts) — and select the exact same rows as the
    column-only budget filter."""
    from crunchy_spark.frontier import max_host_budget

    mb = max_host_budget(policy, 25.0)
    capped = select_fetchable(
        pending, policy, round_seconds=25.0, salt_k=8, max_budget=mb,
        two_phase=True,
    )
    plan = capped._jdf.queryExecution().executedPlan().toString()
    # partial + final per window, two windows
    assert plan.count("WindowGroupLimit") >= 4, plan
    uncapped = select_fetchable(
        pending, policy, round_seconds=25.0, salt_k=8, two_phase=True
    )
    a = sorted(r["sha_int"] for r in capped.collect())
    b = sorted(r["sha_int"] for r in uncapped.collect())
    assert a == b

"""Behavior tests for the round-3 operator batch: as-of join semantics
on a crafted frame, tile-stat reassembly invariants, deterministic
sampling stability, BM25 sanity, mix-quota arithmetic."""

import numpy as np
from pyspark.sql import functions as F

from crunchy_spark import codec, datagen
from crunchy_spark.queries import (
    MIX_TARGET,
    STRATA_PERMILLE,
    bm25_topk,
    corpus_mix_temperature,
    events_asof_join,
    image_tile_stats,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


def test_asof_join_semantics(spark):
    """Hand-checkable frame: equal-ts click matches (build before
    probe), later clicks don't leak backwards, users without a prior
    click yield NULL match."""
    rows = [
        # user 1: click@10, purchase@10 (equal ts -> matches), click@20,
        # purchase@15 (matches click@10, NOT click@20)
        (100, "2024-01-01 00:00:10", 1, "click"),
        (101, "2024-01-01 00:00:10", 1, "purchase"),
        (102, "2024-01-01 00:00:20", 1, "click"),
        (103, "2024-01-01 00:00:15", 1, "purchase"),
        # user 2: purchase with no click ever -> NULL
        (200, "2024-01-01 00:00:05", 2, "purchase"),
        # noise type is ignored
        (201, "2024-01-01 00:00:01", 2, "view"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t) for i, ts, u, t in rows],
        "event_id long, ts string, user_id long, event_type string",
    ).select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/events.parquet")
        got = {
            r.event_id: (r.matched_event_id, r.gap_us)
            for r in events_asof_join(spark, tmp).collect()
        }
    assert got[101] == (100, 0)  # equal-ts click matched
    assert got[103] == (100, 5_000_000)  # click@20 did not leak back
    assert got[200] == (None, None)  # no prior click
    assert len(got) == 3


def test_asof_join_every_purchase_present(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    out = events_asof_join(spark, SF)
    assert out.count() == n_purch
    bad = out.filter(F.col("gap_us") < 0).count()
    assert bad == 0


def test_tile_stats_reassemble(spark):
    """Tile areas sum to w*h and area-weighted tile means reassemble the
    full-image mean (on the unrounded decode, tolerance covers the 4dp
    rounding of the emitted stats)."""
    rows = image_tile_stats(spark, SF).collect()
    by_img = {}
    for r in rows:
        by_img.setdefault(r.image_id, []).append(r)
    assert len(by_img) == 64
    for iid, tiles in by_img.items():
        assert sorted(t.tile_id for t in tiles) == [0, 1, 2, 3]
        idx = int(iid[3:])
        w, h = datagen.image_dims(idx)
        fmt = "png" if idx % 3 else "jpeg"
        arr, _ = codec.decode_image(codec.encode_image(codec.gen_pixels(idx, w, h), fmt))
        assert sum(t.t_w * t.t_h for t in tiles) == w * h
        weighted = sum(t.t_mean * t.t_w * t.t_h for t in tiles) / (w * h)
        assert abs(weighted - float(arr.mean())) < 1e-3
        for t in tiles:
            y0, y1 = (0, h // 2) if t.tile_id < 2 else (h // 2, h)
            x0, x1 = (0, w // 2) if t.tile_id % 2 == 0 else (w // 2, w)
            sub = arr[y0:y1, x0:x1]
            assert abs(t.t_mean - float(sub.mean())) < 1e-3
            assert abs(t.t_std - float(np.std(sub))) < 1e-3


def test_stratified_sample_deterministic_and_rated(spark):
    a = {r.doc_id for r in stratified_sample(spark, SF).collect()}
    b = {r.doc_id for r in stratified_sample(spark, SF).collect()}
    assert a == b  # pure function of doc_id, no rand()
    out = stratified_sample(spark, SF)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    tot = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, kept in per.items():
        rate = STRATA_PERMILLE[lang] / 1000
        # md5 is uniform; at fixture sizes allow generous binomial slack
        assert abs(kept / tot[lang] - rate) < 0.25, (lang, kept, tot[lang])


def test_corpus_mix_quota_sums(spark):
    rows = corpus_mix_temperature(spark, SF).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    q = sum(r.quota for r in rows)
    assert MIX_TARGET - len(rows) <= q <= MIX_TARGET  # floor() loses < 1/lang
    # sqrt weighting compresses: the largest lang's share of quota is
    # strictly below its share of raw counts
    big = max(rows, key=lambda r: r.n_docs)
    n_all = sum(r.n_docs for r in rows)
    assert big.quota / MIX_TARGET < big.n_docs / n_all


def test_bm25_scores_rank_term_rich_docs(spark):
    rows = bm25_topk(spark, SF).collect()
    assert 0 < len(rows) <= 20
    assert all(rows[i].bm25 >= rows[i + 1].bm25 for i in range(len(rows) - 1))
    docs = {
        r.doc_id: r.text.lower().split()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    # every returned doc contains at least one query term
    for r in rows:
        assert any(t in docs[r.doc_id] for t in ("join", "vector", "scan"))


def test_doc_pack_sequences_contiguous(spark):
    """Packing invariants: per-lang seq_ids dense from 0; offsets equal
    the exclusive running sum mod budget; every doc placed exactly once;
    the two-phase cumsum matches a direct (small-data) window cumsum."""
    from crunchy_spark.queries import PACK_BUDGET, doc_pack_sequences

    rows = doc_pack_sequences(spark, SF).collect()
    docs = {
        r.doc_id: r
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert {r.doc_id for r in rows} == set(docs)
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            assert r.seq_id == cum // PACK_BUDGET, (lang, r.doc_id)
            assert r.offset_in_seq == cum % PACK_BUDGET, (lang, r.doc_id)
            assert r.n_tok == len(docs[r.doc_id].text.lower().split())
            cum += r.n_tok
        seqs = sorted({r.seq_id for r in rs})
        assert seqs == list(range(len(seqs)))  # dense from 0


def test_vocab_topk_dense_ids(spark):
    from crunchy_spark.queries import VOCAB_TOPK, vocab_topk

    rows = vocab_topk(spark, SF).collect()
    assert len(rows) == min(VOCAB_TOPK, len(rows))
    assert [r.vocab_id for r in sorted(rows, key=lambda r: r.vocab_id)] == list(
        range(1, len(rows) + 1)
    )
    srt = sorted(rows, key=lambda r: (-r.freq, r.tok))
    assert [r.vocab_id for r in srt] == list(range(1, len(rows) + 1))


def test_event_value_quantiles_bounds(spark):
    from crunchy_spark.queries import event_value_quantiles

    rows = event_value_quantiles(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    import numpy as np

    by_type = {}
    for e in ev:
        by_type.setdefault(e.event_type, []).append(e.value)
    assert {r.event_type for r in rows} == set(by_type)
    for r in rows:
        vals = np.array(sorted(by_type[r.event_type]))
        assert r.n == len(vals)
        for p, got in ((0.5, r.p50), (0.9, r.p90), (0.99, r.p99)):
            want = float(np.quantile(vals, p))  # same linear interpolation
            assert abs(got - want) < 1e-3, (r.event_type, p, got, want)
        assert r.p50 <= r.p90 <= r.p99


def test_approx_distinct_error_bound(spark):
    """HLL at rsd=0.02 stays within 5x the nominal bound on the fixture
    (generous: tiny cardinalities are the sketch's worst regime), and
    the plan keeps the sketch partial+final (map-side mergeable)."""
    from crunchy_spark.queries import approx_distinct_diag

    df = approx_distinct_diag(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_approx_count_distinct" in plan, plan
    for r in df.collect():
        assert r.rel_err <= 0.10, (r.event_type, r.rel_err)


def test_aspect_buckets_cover_and_batch_math(spark):
    from crunchy_spark.queries import ASPECT_BUCKETS, BATCH_SIZE, aspect_bucket_batches

    rows = aspect_bucket_batches(spark, SF).collect()
    names = {f"{bw}:{bh}" for bw, bh in ASPECT_BUCKETS}
    assert sum(r.n_images for r in rows) == 256  # every image assigned
    for r in rows:
        assert r.bucket in names
        assert r.n_batches == -(-r.n_images // BATCH_SIZE)  # ceil
    # exact-ratio images land in their exact bucket: 32x32 etc -> 1:1
    one_one = [r for r in rows if r.bucket == "1:1"]
    assert one_one and one_one[0].n_images == 44  # the (32,32) cohort


def test_image_shard_pack_conservation(spark):
    from crunchy_spark.queries import SHARD_BUDGET, image_shard_pack

    rows = image_shard_pack(spark, SF).collect()
    assert sum(r.n_images for r in rows) == 256
    by_fmt = {}
    for r in rows:
        by_fmt.setdefault(r.fmt, []).append(r)
        assert r.first_id <= r.last_id
    for fmt, shards in by_fmt.items():
        shards.sort(key=lambda r: r.shard_id)
        # shard ids are contiguous from 0 (contiguous packing)
        assert [s.shard_id for s in shards] == list(range(len(shards)))
        # id ranges are disjoint and ordered (deterministic ordering)
        for a, b in zip(shards, shards[1:]):
            assert a.last_id < b.first_id
        # every shard's EXCLUSIVE-cumsum start is budget-aligned, so a
        # shard's bytes can't exceed budget + its largest single item
        for s in shards:
            assert s.shard_bytes <= SHARD_BUDGET + 128 * 64 * 3


def test_unigram_logprob_flags_consistent(spark):
    from crunchy_spark.queries import UNIGRAM_OUTLIER, unigram_logprob_quality

    rows = unigram_logprob_quality(spark, SF).collect()
    assert rows
    docs = spark.read.parquet(SF + "/documents.parquet").count()
    assert len(rows) == docs  # every doc scored
    for r in rows:
        assert r.avg_logprob < 0.0  # probabilities < 1
        # flag agrees with the (rounded) score away from the boundary
        if abs(r.avg_logprob - UNIGRAM_OUTLIER) > 1e-3:
            assert r.is_outlier == (r.avg_logprob < UNIGRAM_OUTLIER), r


def test_tfidf_topk_rank_semantics(spark):
    from crunchy_spark.queries import TFIDF_TOPK, tfidf_topk_terms

    rows = tfidf_topk_terms(spark, SF).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in per_doc.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TFIDF_TOPK
        for a, b in zip(rs, rs[1:]):  # scores non-increasing in rank
            assert a.tfidf >= b.tfidf, (doc_id, a, b)
        for r in rs:
            assert r.df >= 1 and r.tf >= 1


def test_host_pagerank_mass_and_structure(spark):
    """PageRank invariants on the lineitem-derived link graph: total
    mass conserved at 1 (dangling redistribution working), every rank
    positive and >= the teleport floor, and returning customers (who
    have outlinks) exist alongside dangling ones (who don't) so both
    code paths are exercised on real data."""
    from crunchy_spark.queries import host_pagerank

    rows = host_pagerank(spark, SF).collect()
    n = len(rows)
    total = sum(r.pr for r in rows)
    assert abs(total - 1.0) < n * 5e-7  # rounding-only slack
    floor = 0.15 / n
    assert all(r.pr >= floor - 5e-7 for r in rows)
    # graph really has both node classes
    kinds = {r.node[0] for r in rows}
    assert kinds == {"s", "c"}
    # suppliers receive return-flow AND ship to many customers; the
    # max-ranked node must beat the uniform rank by a wide margin
    assert max(r.pr for r in rows) > 3.0 / n


def test_recrawl_schedule_semantics(spark):
    """Crafted history: a page changing every observation gets the
    clamped-fast interval; a never-changing page gets the 30d cap; a
    single-observation page is excluded (no interval estimable)."""
    import tempfile

    from crunchy_spark.queries import RECRAWL_MAX_S, RECRAWL_MIN_S, recrawl_schedule

    rows = [
        # page 1: values flip every 2h over 3 obs -> span 4h, 2 changes
        # -> interval 2h (inside the clamp window)
        (1, "2024-01-01 00:00:00", 1, "obs", 1.0),
        (2, "2024-01-01 02:00:00", 1, "obs", 2.0),
        (3, "2024-01-01 04:00:00", 1, "obs", 3.0),
        # page 2: constant value -> 0 changes -> 30d cap
        (4, "2024-01-01 00:00:00", 2, "obs", 5.0),
        (5, "2024-01-02 00:00:00", 2, "obs", 5.0),
        # page 3: changes every second -> clamped up to 1h floor
        (6, "2024-01-01 00:00:00", 3, "obs", 1.0),
        (7, "2024-01-01 00:00:01", 3, "obs", 2.0),
        # page 4: single observation -> excluded
        (8, "2024-01-01 00:00:00", 4, "obs", 9.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value",
        F.lit("{}").alias("props"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/events.parquet")
        got = {r.page_id: r for r in recrawl_schedule(spark, tmp).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].interval_s == 7200 and got[1].n_changes == 2
    assert got[2].interval_s == RECRAWL_MAX_S and got[2].n_changes == 0
    assert got[3].interval_s == RECRAWL_MIN_S
    for r in got.values():
        assert r.next_fetch_epoch > 0


def test_host_hits_norm_and_structure(spark):
    """HITS invariants on the same link graph: the authority and hub
    vectors are L2-normalized (sum of squares = 1 up to rounding),
    non-negative, and the graph's one-sided nodes give zero-authority
    (pure sources) and zero-hub (pure sinks/dangling) rows alongside
    doubly-connected ones — both normalization paths exercised."""
    from crunchy_spark.queries import host_hits

    rows = host_hits(spark, SF).collect()
    n = len(rows)
    a2 = sum(r.authority**2 for r in rows)
    h2 = sum(r.hub**2 for r in rows)
    assert abs(a2 - 1.0) < n * 5e-6, a2
    assert abs(h2 - 1.0) < n * 5e-6, h2
    assert all(r.authority >= 0 and r.hub >= 0 for r in rows)
    assert all(r.authority > 0 or r.hub > 0 for r in rows)
    # both node classes present; every supplier ships (hub>0) and every
    # customer is shipped to (authority>0) — the class asymmetry shows
    # up as suppliers concentrating authority (many R-returns each) vs
    # customers spreading it: top authority must far exceed uniform
    kinds = {r.node[0] for r in rows}
    assert kinds == {"s", "c"}
    assert all(r.hub > 0 for r in rows if r.node[0] == "s")
    assert all(r.authority > 0 for r in rows if r.node[0] == "c")
    assert max(r.authority for r in rows) > 3.0 / (n**0.5)

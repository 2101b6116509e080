"""Round-3 batch XIII: tokenizer coverage (OOV), crawl routing
(host language mix), link-evidence frontier priority, and embedding
hygiene (each also oracle-checked in test_queries_oracle.py — these
pin the BEHAVIORAL invariants the hash alone doesn't state)."""

import math
from collections import defaultdict

from crunchy_spark.queries import (
    EMB_OUTLIER_Z,
    N_MIX_HOSTS,
    OOV_HIGH,
    OOV_VOCAB_K,
    QUERIES,
)

SF = "/root/testdata/sf0.001"


def test_oov_rate_bounds_and_coverage(spark):
    rows = QUERIES["oov_rate"](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        # engines round HALF_UP at 4dp; python round() is banker's, so
        # compare to the unrounded ratio within the rounding quantum
        assert abs(r["oov_rate"] - r["n_oov"] / r["n_tokens"]) <= 5.0001e-5
        assert r["is_high_oov"] == (r["oov_rate"] > OOV_HIGH)
    # the vocab head must cover MOST token mass (Zipf concentration)
    # while the 15 tail types keep OOV strictly positive
    tot = sum(r["n_tokens"] for r in rows)
    oov = sum(r["n_oov"] for r in rows)
    assert 0 < oov < 0.5 * tot


def test_oov_consistent_with_vocab(spark):
    """A doc made ONLY of top-vocab tokens has oov_rate 0 — cross-check
    a few docs token-by-token against the registered vocab."""
    vocab = {
        r["tok"]
        for r in QUERIES["vocab_topk"](spark, SF).collect()
        if r["vocab_id"] <= OOV_VOCAB_K
    }
    assert len(vocab) == OOV_VOCAB_K
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(5).collect()
    got = {
        r["doc_id"]: r
        for r in QUERIES["oov_rate"](spark, SF).collect()
    }
    for d in docs:
        toks = d["text"].lower().split()
        n_oov = sum(1 for t in toks if t not in vocab)
        assert got[d["doc_id"]]["n_oov"] == n_oov
        assert got[d["doc_id"]]["n_tokens"] == len(toks)


def test_host_lang_mix_is_a_routing_table(spark):
    rows = QUERIES["host_lang_mix"](spark, SF).collect()
    by_host = defaultdict(list)
    for r in rows:
        by_host[r["host"]].append(r)
    assert len(by_host) <= N_MIX_HOSTS
    n_docs_total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    for host, hrows in by_host.items():
        host_docs = hrows[0]["host_docs"]
        assert all(r["host_docs"] == host_docs for r in hrows)
        assert sum(r["n_docs"] for r in hrows) == host_docs
        assert abs(sum(r["share"] for r in hrows) - 1.0) < 1e-2
        doms = [r for r in hrows if r["is_dominant"]]
        assert len(doms) == 1  # exactly one dominant language per host
        assert doms[0]["n_docs"] == max(r["n_docs"] for r in hrows)


def test_link_priority_score_semantics(spark):
    rows = QUERIES["link_priority_score"](spark, SF).collect()
    anchor = {
        r["doc_id"]: r for r in QUERIES["anchor_text_agg"](spark, SF).collect()
    }
    assert len(rows) == len(anchor)  # every linked-to page is scored
    for r in rows:
        a = anchor[r["doc_id"]]
        assert r["n_inlinks"] == a["n_inlinks"]
        assert r["priority"] > 0
        # diversity damping: priority can never exceed raw ln(1+inlinks)
        assert r["priority"] <= round(math.log(1 + r["n_inlinks"]), 4) + 1e-9
    # the score must actually discriminate (not constant): the affine
    # link map yields near-uniform in-degrees (2-4), so distinct
    # (inlinks, diversity, host-damp) combinations number ~8 at sf0.001
    assert len({r["priority"] for r in rows}) > 5


def test_embedding_outlier_flag_zscores(spark):
    rows = QUERIES["embedding_outlier_flag"](spark, SF).collect()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(rows) == n_vecs  # every label has directional variance
    flagged = [r for r in rows if r["is_outlier"]]
    for r in rows:
        assert -1.000001 <= r["cos_centroid"] <= 1.000001
        assert r["is_outlier"] == (r["z"] < -EMB_OUTLIER_Z)
    # z-scores per label must be standardized: mean ~ 0
    by_label = defaultdict(list)
    for r in rows:
        by_label[r["label"]].append(r)
    for label, lrows in by_label.items():
        zs = [r["z"] for r in lrows]
        assert abs(sum(zs) / len(zs)) < 1e-2
        # recompute the z from the label's own cos values
        cs = [r["cos_centroid"] for r in lrows]
        mu = sum(cs) / len(cs)
        sd = math.sqrt(sum((x - mu) ** 2 for x in cs) / len(cs))
        for r in lrows:
            assert abs(r["z"] - (r["cos_centroid"] - mu) / sd) < 1e-3
    # a one-sided 2-sigma gate flags a small minority, not nothing
    assert 0 < len(flagged) < 0.15 * len(rows)


def test_batch13_oracles_at_driver_scale(spark):
    """Driver-gate mirror at sf0.01 for batch XIII."""
    from crunchy_spark.queries import ORACLES
    from tests.oracle_util import compare, duck_conn

    sf01 = "/root/testdata/sf0.01"
    con = duck_conn(sf01)
    for name in (
        "oov_rate",
        "host_lang_mix",
        "link_priority_score",
        "embedding_outlier_flag",
        "frontier_next_fetch",
        "chunk_split",
        "eval_holdout_sample",
        "quality_calibration",
        "user_engagement_ewma",
        "source_relative_quality",
        "dedup_tier_kappa",
        "funnel_conversion",
        "retention_cohorts",
        "triangle_count_hosts",
        "weighted_sample_aes",
        "mix_rebalance_sample",
        "value_equidepth_buckets",
    ):
        compare(QUERIES[name](spark, sf01), con, ORACLES[name], name)


def test_frontier_next_fetch_budget_and_order(spark):
    from crunchy_spark.queries import FETCH_SLOTS_PER_HOST

    from crunchy_spark.queries import N_LINK_HOSTS

    rows = QUERIES["frontier_next_fetch"](spark, SF).collect()
    by_host = defaultdict(list)
    for r in rows:
        by_host[r["host"]].append(r)
    assert len(by_host) <= N_LINK_HOSTS
    for host, hrows in by_host.items():
        assert len(hrows) <= FETCH_SLOTS_PER_HOST
        hrows.sort(key=lambda r: r["fetch_rank"])
        # contiguous ranks from 1, ordered by priority desc
        assert [r["fetch_rank"] for r in hrows] == list(range(1, len(hrows) + 1))
        prios = [r["priority"] for r in hrows]
        assert prios == sorted(prios, reverse=True)
    # the shortlist is the TOP of the host's candidates: no unfetched
    # page outside the list may out-rank a listed one
    scores = {
        r["doc_id"]: r for r in QUERIES["link_priority_score"](spark, SF).collect()
    }
    from crunchy_spark.queries import N_LINK_HOSTS as NH

    listed = {r["doc_id"] for r in rows}
    best_unlisted = defaultdict(float)
    for doc_id, r in scores.items():
        if doc_id not in listed:
            h = f"h{doc_id % NH}"
            best_unlisted[h] = max(best_unlisted[h], r["priority"])
    for host, hrows in by_host.items():
        if len(hrows) == FETCH_SLOTS_PER_HOST and host in best_unlisted:
            assert best_unlisted[host] <= hrows[-1]["priority"] + 1e-9


def test_frontier_next_fetch_plan_has_window_group_limit(spark):
    """The rank<=K filter must compile to WindowGroupLimit (map-side
    per-host cap BEFORE the window exchange — the politeness_schedule
    discipline)."""
    plan = (
        QUERIES["frontier_next_fetch"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_kmv_intersect_exhaustive_and_estimation(spark):
    from crunchy_spark.queries import KMV_K, QUERIES

    # sf0.001: 15 users/type < K=32 -> thetas exhaustive -> est == exact
    rows = QUERIES["kmv_intersect_diag"](spark, SF).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        assert r["est_common"] == float(r["exact_common"])
        assert r["rel_err"] == 0.0
    # sf0.01: 150 users/type > K -> true estimation regime, bounded err
    rows01 = QUERIES["kmv_intersect_diag"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    errs = [r["rel_err"] for r in rows01 if r["rel_err"] is not None]
    assert errs and max(errs) < 0.35  # ~2 sigma at K=32
    # the estimate is never the exact path at this scale
    assert any(r["est_common"] != float(r["exact_common"]) for r in rows01)


def test_kmv_driver_scale_oracle(spark):
    from crunchy_spark.queries import ORACLES
    from tests.oracle_util import compare, duck_conn

    sf01 = "/root/testdata/sf0.01"
    compare(
        QUERIES["kmv_intersect_diag"](spark, sf01),
        duck_conn(sf01),
        ORACLES["kmv_intersect_diag"],
        "kmv_intersect_diag",
    )


def test_chunk_split_coverage_and_overlap(spark):
    from crunchy_spark.queries import CHUNK_OVERLAP, CHUNK_TOKS, _CHUNK_STRIDE

    rows = QUERIES["chunk_split"](spark, SF).collect()
    docs = {
        r["doc_id"]: len(r["text"].lower().split())
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    assert set(by_doc) == set(docs)  # every doc chunked
    for doc_id, chunks in by_doc.items():
        n = docs[doc_id]
        chunks.sort(key=lambda r: r["chunk_id"])
        # contiguous ids from 0, starts at the fixed stride
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c["start_tok"] == 1 + c["chunk_id"] * _CHUNK_STRIDE
            assert 1 <= c["n_toks"] <= CHUNK_TOKS
        # coverage: last chunk reaches the final token
        last = chunks[-1]
        assert last["start_tok"] + last["n_toks"] - 1 == n
        # consecutive full chunks overlap by exactly CHUNK_OVERLAP
        for a, b in zip(chunks, chunks[1:]):
            if a["n_toks"] == CHUNK_TOKS:
                a_end = a["start_tok"] + a["n_toks"] - 1
                assert a_end - b["start_tok"] + 1 == CHUNK_OVERLAP
    # multi-chunk docs exist (avg ~56 tokens at stride 24)
    assert any(len(c) >= 3 for c in by_doc.values())


def test_eval_holdout_sample_properties(spark):
    from crunchy_spark.queries import HOLDOUT_K

    rows = QUERIES["eval_holdout_sample"](spark, SF).collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r)
    for lang, lrows in by_lang.items():
        assert len(lrows) <= HOLDOUT_K
        lrows.sort(key=lambda r: r["rk"])
        fps = [r["content_fp"] for r in lrows]
        assert fps == sorted(fps)  # bottom-k by hash, in order
        assert len(set(fps)) == len(fps)  # dedup-safe: no fp twice
        assert [r["rk"] for r in lrows] == list(range(1, len(lrows) + 1))
    # determinism under repartition: the sample is a pure set function
    again = QUERIES["eval_holdout_sample"](spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # bottom-k coherence: the sample IS the k smallest fps per lang
    all_fp = defaultdict(set)
    import duckdb  # reuse the oracle engine for the reference set

    con = duckdb.connect()
    ref = con.execute(
        f"""
        SELECT lang, (('0x' || substr(md5(array_to_string(list_sort(
          list_distinct(string_split_regex(lower(text), '\\s+'))), ' ')), 1, 15))::UBIGINT)::BIGINT AS fp
        FROM read_parquet('{SF}/documents.parquet')
        """
    ).fetchall()
    for lang, fpv in ref:
        all_fp[lang].add(fpv)
    for lang, lrows in by_lang.items():
        want = sorted(all_fp[lang])[: len(lrows)]
        assert [r["content_fp"] for r in lrows] == want


def test_quality_calibration_accounts_and_binning(spark):
    rows = QUERIES["quality_calibration"](spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs  # bins tile the corpus
    for r in rows:
        assert 0 <= r["score_bin"] <= 10
        for flag, share in (
            ("n_repetitive", "repetitive_share"),
            ("n_low_entropy", "low_entropy_share"),
            ("n_exact_dup", "exact_dup_share"),
        ):
            assert 0 <= r[flag] <= r["n_docs"]
            assert abs(r[share] - r[flag] / r["n_docs"]) <= 5.0001e-5
    # the table must carry signal: some gate fires somewhere
    assert sum(r["n_repetitive"] + r["n_low_entropy"] + r["n_exact_dup"]
               for r in rows) > 0
    # cross-check one bin against the constituent operators
    q = {r["doc_id"]: r["qscore"] for r in QUERIES["quality_score"](spark, SF).collect()}
    rep = {r["doc_id"]: r["is_repetitive"]
           for r in QUERIES["repetition_quality"](spark, SF).collect()}
    some_bin = rows[0]["score_bin"]
    want_docs = [d for d, s in q.items() if int(s * 10) == some_bin]
    got = next(r for r in rows if r["score_bin"] == some_bin)
    assert got["n_docs"] == len(want_docs)
    assert got["n_repetitive"] == sum(1 for d in want_docs if rep[d])


def test_user_engagement_ewma_matches_recurrence(spark):
    from crunchy_spark.queries import EWMA_ALPHA

    rows = {r["user_id"]: r for r in QUERIES["user_engagement_ewma"](spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_user = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append(e)
    assert set(rows) == set(by_user)
    for uid, es in by_user.items():
        es.sort(key=lambda e: (e["ts"], e["event_id"]))
        ewma = 0.0
        for e in es:  # the recurrence the closed form must equal
            ewma = EWMA_ALPHA * ewma + e["value"]
        assert rows[uid]["n_events"] == len(es)
        assert abs(rows[uid]["ewma_value"] - ewma) < 1e-2
        assert abs(
            rows[uid]["ewma_normalized"] - ewma * (1 - EWMA_ALPHA)
        ) < 1e-2


def test_source_relative_quality_constant_drop_rate(spark):
    from crunchy_spark.queries import SRC_QUALITY_LOW_PCT

    rows = QUERIES["source_relative_quality"](spark, SF).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    assert len(by_src) > 1
    for src, srows in by_src.items():
        # percentile is rank-consistent with the score ordering
        srows.sort(key=lambda r: (r["qscore"], r["doc_id"]))
        pcts = [r["pct_in_source"] for r in srows]
        assert pcts == sorted(pcts)
        assert pcts[0] == 0.0 and pcts[-1] <= 1.0
        low = sum(1 for r in srows if r["is_source_low"])
        # the FIX the op exists for: per-source drop rate is ~constant
        # (percentile thresholding), regardless of score distribution
        assert low / len(srows) <= SRC_QUALITY_LOW_PCT + 2 / len(srows)
        assert low > 0 or len(srows) < 10


def test_dedup_tier_kappa_identities(spark):
    [r] = QUERIES["dedup_tier_kappa"](spark, SF).collect()
    assert r["yy"] + r["yn"] + r["ny"] + r["nn"] == r["n"] > 0
    po, pe, k = r["observed_agreement"], r["chance_agreement"], r["kappa"]
    assert 0 <= po <= 1 and 0 <= pe <= 1
    assert abs(k - (po - pe) / (1 - pe)) < 1e-2  # 4dp-rounded identity
    # the tiers are hierarchical on this corpus (exact => simhash-near),
    # so agreement must beat chance
    assert r["yn"] == 0 and k > 0


def test_funnel_conversion_ordering(spark):
    from crunchy_spark.queries import FUNNEL_STEPS

    rows = QUERIES["funnel_conversion"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    users = {e["user_id"] for e in ev}
    assert {r["user_id"] for r in rows} == users
    by_user = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append(e)
    for r in rows:
        # chain is strictly ordered and prefix-complete
        ts = [r["t1"], r["t2"], r["t3"]]
        reached = r["reached_step"]
        assert all(t is not None for t in ts[:reached])
        assert all(t is None for t in ts[reached:])
        for a, b in zip(ts, ts[1:]):
            if a is not None and b is not None:
                assert a < b
        # greedy semantics recomputed per user
        es = sorted(by_user[r["user_id"]], key=lambda e: e["ts"])
        t_prev, k = None, 0
        for step in FUNNEL_STEPS:
            nxt = min(
                (e["ts"] for e in es
                 if e["event_type"] == step
                 and (t_prev is None or e["ts"] > t_prev)),
                default=None,
            )
            if nxt is None:
                break
            t_prev, k = nxt, k + 1
        assert r["reached_step"] == k
    # all funnel depths are represented in the fixture
    assert {r["reached_step"] for r in rows} >= {3}


def test_retention_cohorts_shape(spark):
    rows = QUERIES["retention_cohorts"](spark, SF).collect()
    assert rows
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort_week"]].append(r)
        assert 0 <= r["week_offset"] <= 5  # 30-day fixture span
        assert 0 < r["active_users"] <= r["cohort_users"]
        assert abs(r["retention"] - round(r["active_users"] / r["cohort_users"], 4)) < 1e-4
    for cw, crows in by_cohort.items():
        crows.sort(key=lambda r: r["week_offset"])
        # offset 0 is the cohort itself: retention exactly 1.0
        assert crows[0]["week_offset"] == 0
        assert crows[0]["active_users"] == crows[0]["cohort_users"]
    # cohort sizes sum to the distinct user universe
    n_users = spark.read.parquet(f"{SF}/events.parquet").select("user_id").distinct().count()
    assert sum(c[0]["cohort_users"] for c in by_cohort.values()) == n_users


def test_triangle_count_brute_force(spark):
    from itertools import combinations

    from crunchy_spark.queries import N_LINK_HOSTS, _link_edges

    rows = {r["host"]: r["n_triangles"]
            for r in QUERIES["triangle_count_hosts"](spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    edges = set()
    for e in _link_edges(docs).collect():
        a, b = e["src_host"], f"h{e['dst'] % N_LINK_HOSTS}"
        if a != b:
            edges.add((min(a, b), max(a, b)))
    nodes = sorted({n for ab in edges for n in ab})
    brute = defaultdict(int)
    for x, y, z in combinations(nodes, 3):
        if ((x, y) in edges and (y, z) in edges and (x, z) in edges):
            for h in (x, y, z):
                brute[h] += 1
    assert rows == dict(brute)
    assert sum(rows.values()) % 3 == 0 and sum(rows.values()) > 0


def test_weighted_sample_aes_bias_and_determinism(spark):
    from crunchy_spark.queries import AES_SAMPLE_K

    rows = QUERIES["weighted_sample_aes"](spark, SF).collect()
    assert len(rows) == AES_SAMPLE_K
    assert [r["rk"] for r in sorted(rows, key=lambda r: r["rk"])] == list(
        range(1, AES_SAMPLE_K + 1)
    )
    keys = [r["sample_key"] for r in sorted(rows, key=lambda r: r["rk"])]
    assert keys == sorted(keys, reverse=True)  # rank consistent with key
    assert all(k <= 0 for k in keys)  # ln(u)/w is always negative
    # determinism: a second run returns the identical sample
    again = QUERIES["weighted_sample_aes"](spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # exact semantics: the sample IS the top-K by ln(u)/w recomputed
    # from scratch (hashes + scores), ties by doc_id
    import hashlib

    qs = {r["doc_id"]: r["qscore"]
          for r in QUERIES["quality_score"](spark, SF).collect()}
    keys = {}
    for doc_id, q in qs.items():
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        u = (h + 1) / 1152921504606846977.0
        keys[doc_id] = math.log(u) / max(q, 0.0001)
    want = sorted(qs, key=lambda d: (-keys[d], d))[: AES_SAMPLE_K]
    got = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rk"])]
    assert got == want
    for r in rows:
        assert abs(r["sample_key"] - keys[r["doc_id"]]) < 1e-5


def test_mix_rebalance_sample_respects_quota(spark):
    from crunchy_spark.queries import MIX_SAMPLE_TOTAL

    rows = QUERIES["mix_rebalance_sample"](spark, SF).collect()
    mix = {r["lang"]: r for r in QUERIES["corpus_mix_temperature"](spark, SF).collect()}
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r)
    for lang, lrows in by_lang.items():
        take = int(MIX_SAMPLE_TOTAL * mix[lang]["weight"])
        assert all(r["take"] == take for r in lrows)
        assert len(lrows) == min(take, len(lrows))
        assert len(lrows) <= take
        ranks = sorted(r["rk"] for r in lrows)
        assert ranks == list(range(1, len(lrows) + 1))
    # sqrt-temperature upweights low-resource langs: every lang present
    assert set(by_lang) == set(mix)
    # the draw equals the holdout mechanics: a prefix of the holdout
    hold = defaultdict(list)
    for r in QUERIES["eval_holdout_sample"](spark, SF).collect():
        hold[r["lang"]].append(r)
    for lang, lrows in by_lang.items():
        hrows = sorted(hold[lang], key=lambda r: r["rk"])
        ids = [r["doc_id"] for r in sorted(lrows, key=lambda r: r["rk"])]
        hold_ids = [r["doc_id"] for r in hrows]
        k = min(len(ids), len(hold_ids))
        assert ids[:k] == hold_ids[:k]


def test_value_equidepth_buckets_depth_and_order(spark):
    from crunchy_spark.queries import EQUIDEPTH_K

    rows = sorted(
        QUERIES["value_equidepth_buckets"](spark, SF).collect(),
        key=lambda r: r["bucket"],
    )
    n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert [r["bucket"] for r in rows] == list(range(1, EQUIDEPTH_K + 1))
    assert sum(r["n_rows"] for r in rows) == n
    sizes = [r["n_rows"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # equal depth within 1 row
    # ntile puts the bigger buckets first
    assert sizes == sorted(sizes, reverse=True)
    # boundaries are monotone: bucket i's hi <= bucket i+1's lo (ties ok)
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"] + 1e-9
        assert a["lo"] <= a["hi"]


def test_equidepth_no_single_partition_exchange(spark):
    plan = (
        QUERIES["value_equidepth_buckets"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the parallel total sort lives in global_fifo_rank's checkpointed
    # subtree; what matters here is that NO stage after it (or anywhere
    # visible) funnels through a single partition
    assert "Exchange SinglePartition" not in plan, plan

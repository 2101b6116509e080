"""Semantic checks for the round-3e ops (bpe_merge_topk,
incremental_neardup, boilerplate_strip) beyond the oracle hash-match
(tests/test_queries_oracle.py covers oracle parity automatically)."""

import pytest
from pyspark.sql import functions as F

from crunchy_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bpe_rows(spark):
    return QUERIES["bpe_merge_topk"](spark, SF_DIR).collect()


def test_bpe_topk_matches_bruteforce(spark, bpe_rows):
    """The #1 merge candidate must equal a driver-side brute-force count
    over the same corpus (independent recomputation, not plan parity)."""
    import collections

    texts = [
        r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text")
        .collect()
    ]
    words = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            if len(w) >= 2:
                words[w] += 1
    pairs = collections.Counter()
    for w, wf in words.items():
        for i in range(len(w) - 1):
            pairs[(w[i], w[i + 1])] += wf
    expect = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [((r.sym_a, r.sym_b), r.pair_count) for r in bpe_rows]
    assert got == expect[: len(got)]
    assert [r.merge_rank for r in bpe_rows] == list(range(1, len(bpe_rows) + 1))


def test_incremental_neardup_contract(spark):
    """Every reported dup is a batch doc (doc_id % 10 == 0), its
    canonical match precedes it in arrival order (corpus doc, or an
    earlier batch doc), and jac >= 0.9."""
    rows = QUERIES["incremental_neardup"](spark, SF_DIR).collect()
    assert rows  # the synthetic corpus is intrinsically near-dup-rich
    for r in rows:
        assert r.doc_id % 10 == 0
        assert r.dup_of % 10 != 0 or r.dup_of < r.doc_id
        assert r.jac >= 0.9
    # one canonical match per dup doc
    assert len({r.doc_id for r in rows}) == len(rows)


def test_boilerplate_strip_drops_chrome_keeps_content(spark):
    out = QUERIES["boilerplate_strip"](spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    joined = out.join(docs, "doc_id").collect()
    assert len(joined) == docs.count()  # no doc loses ALL its lines
    for r in joined:
        # the per-source subscribe banner (share 1.0) is always stripped
        assert "subscribe to" not in r.kept_text
        # shared copyright footers stripped; unique 'doc N footer' kept
        if r.doc_id % 3 == 0:
            assert r.kept_text.endswith(f"doc {r.doc_id} footer")
            assert r.n_dropped == 1
        else:
            assert "copyright" not in r.kept_text
            assert r.n_dropped == 2
        # the content line survives verbatim and first
        assert r.kept_text.startswith(r.text)
        assert r.n_kept + r.n_dropped == 3


def test_incremental_neardup_batch_side_is_filtered(spark):
    """Scale guard: the candidate join's batch side must carry the
    doc_id % 10 filter (delta-sized), not the full corpus — i.e. the
    plan contains a filter on the band table feeding the join."""
    df = QUERIES["incremental_neardup"](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "% 10) = 0" in plan.replace("  ", " ")


def test_incremental_consistent_with_global_pairs(spark):
    """Cross-op invariant: incremental_neardup is exactly the batch
    projection of minhash_lsh_pairs — a batch doc is flagged iff the
    global pair stream links it to a corpus doc or an earlier batch
    doc, and its canonical match is the min such partner."""
    pairs = QUERIES["minhash_lsh_pairs"](spark, SF_DIR).collect()
    inc = {
        r.doc_id: r.dup_of
        for r in QUERIES["incremental_neardup"](spark, SF_DIR).collect()
    }
    expect = {}
    for p in pairs:
        for d, o in ((p.a_id, p.b_id), (p.b_id, p.a_id)):
            if d % 10 == 0 and (o % 10 != 0 or o < d):
                expect[d] = min(expect.get(d, o), o)
    assert inc == expect


def test_curation_keep_list_reconstructs_from_parts(spark):
    """curation_keep_list must be exactly the prioritized composition of
    its four constituent registered operators (independent driver-side
    reconstruction, not plan parity)."""
    from crunchy_spark.queries import DECON_PROBE_MAX_ID

    # dedup_exact is fp-keyed; rebuild doc->exact_canon via the same fp
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from crunchy_spark.queries import _md5_int

    fp_rows = docs.select(
        "doc_id", _md5_int(F.col("text")).alias("fp")
    ).collect()
    by_fp = {}
    for r in fp_rows:
        by_fp.setdefault(r.fp, []).append(r.doc_id)
    exact_canon = {d: min(ds) for ds in by_fp.values() for d in ds}

    comp = {
        r.doc_id: r.component_id
        for r in QUERIES["neardup_components"](spark, SF_DIR).collect()
    }
    canon = {
        r.component_id: r.canonical_id
        for r in QUERIES["neardup_canonical_docs"](spark, SF_DIR).collect()
    }
    repet = {
        r.doc_id: r.is_repetitive
        for r in QUERIES["repetition_quality"](spark, SF_DIR).collect()
    }
    contam = {
        r.doc_id for r in QUERIES["benchmark_decontaminate"](spark, SF_DIR).collect()
    }

    def expect(d):
        if d != exact_canon[d]:
            return "exact_dup"
        if canon[comp[d]] != d:
            return "near_dup"
        if d < DECON_PROBE_MAX_ID:
            return "benchmark_probe"
        if d in contam:
            return "contaminated"
        if repet[d]:
            return "repetitive"
        return "keep"

    got = {
        r.doc_id: (r.reason, r.keep)
        for r in QUERIES["curation_keep_list"](spark, SF_DIR).collect()
    }
    assert set(got) == set(comp)  # every document gets exactly one verdict
    for d, (reason, keep) in got.items():
        assert reason == expect(d), f"doc {d}: {reason} != {expect(d)}"
        assert keep == (reason == "keep")

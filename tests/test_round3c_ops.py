"""Behavior tests for the round-3c batch (beyond driver oracle
equality): dup-span flags are witnessed by a real cross-doc window
match, zipf slopes are negative and fit the rank head, and the skew
report's arithmetic is internally consistent with the frontier's
salt-census math."""

import math
from collections import Counter

from pyspark.sql import functions as F

from crunchy_spark.queries import (
    DUP_SPAN_K,
    SKEW_TOP_HOSTS,
    ZIPF_TOP_RANKS,
    dup_span_detect,
    skew_diagnostics,
    token_zipf_slope,
)

SF = "/root/testdata/sf0.001"


def _doc_windows(text):
    toks = text.lower().split()
    return {
        " ".join(toks[i : i + DUP_SPAN_K])
        for i in range(len(toks) - DUP_SPAN_K + 1)
    }


def test_dup_span_witnessed(spark):
    rows = {r.doc_id: r for r in dup_span_detect(spark, SF).collect()}
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    # python ground truth on the same corpus
    windows = {d: _doc_windows(t) for d, t in docs.items()}
    seen_in = Counter()
    for d, ws in windows.items():
        for w in ws:
            seen_in[w] += 1
    dup_grams = {w for w, n in seen_in.items() if n >= 2}
    assert dup_grams, "synthetic near-dup docs must share windows"
    flagged = [d for d, r in rows.items() if r.n_dup_windows > 0]
    assert flagged, "some docs must carry duplicated windows"
    for d, r in rows.items():
        toks = docs[d].lower().split()
        n_positions = max(len(toks) - DUP_SPAN_K + 1, 0)
        assert r.n_windows == n_positions, (d, r.n_windows, n_positions)
        # exact per-doc dup window count vs python ground truth
        truth = sum(
            1
            for i in range(n_positions)
            if " ".join(toks[i : i + DUP_SPAN_K]) in dup_grams
        )
        assert r.n_dup_windows == truth, (d, r.n_dup_windows, truth)
        assert abs(r.dup_frac - round(truth / n_positions, 4)) < 1e-9
    # near-identical docs should be nearly fully duplicated
    assert any(r.dup_frac > 0.8 for r in rows.values())


def test_zipf_slope_shape(spark):
    rows = token_zipf_slope(spark, SF).collect()
    assert rows, "every lang with docs gets a slope"
    for r in rows:
        assert r.n_ranked <= ZIPF_TOP_RANKS
        assert r.n_ranked <= r.vocab_n
        # rank-frequency is monotone decreasing -> slope strictly negative
        assert r.zipf_slope < 0, r


def test_zipf_slope_matches_numpy(spark):
    rows = {r.lang: r for r in token_zipf_slope(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    by_lang = {}
    for d in docs:
        by_lang.setdefault(d.lang, Counter()).update(d.text.lower().split())
    for lang, cnt in by_lang.items():
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        pts = [
            (math.log(f), math.log(i + 1))
            for i, (_, f) in enumerate(ranked[:ZIPF_TOP_RANKS])
        ]
        n = len(pts)
        my = sum(y for y, _ in pts) / n
        mx = sum(x for _, x in pts) / n
        slope = sum((x - mx) * (y - my) for y, x in pts) / sum(
            (x - mx) ** 2 for _, x in pts
        )
        assert abs(rows[lang].zipf_slope - round(slope, 4)) <= 1e-4, lang


def test_skew_report_consistent(spark):
    rows = skew_diagnostics(spark, SF).collect()
    assert 0 < len(rows) <= SKEW_TOP_HOSTS
    # descending hot-key order, h0 (the quadratic-bunching sink) first
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert rows[0].host == "h0"
    for r in rows:
        assert r.salt_factor == math.ceil(r.skew_x - 1e-9), r
        assert abs(r.skew_x - round(r.share * r.n_hosts, 3)) < 2e-3
        # table_skew_x is the max row's skew_x, constant across rows
        assert r.table_skew_x == rows[0].table_skew_x
    assert abs(rows[0].skew_x - rows[0].table_skew_x) < 1e-9
    # real skew exists by construction (h0 absorbs 5/20 of custkeys)
    assert rows[0].table_skew_x > 2.0

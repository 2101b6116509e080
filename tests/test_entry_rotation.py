"""Driver-contract rotation: queries() must sweep stale correctness
evidence to the front so the driver's 50-row/round cap eventually
refreshes every registered query (pure ordering — no Spark)."""

import importlib.util
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(HERE, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["spark_entry_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


ENTRY = _load_entry()

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 1, "oracle_rows": 1, "err": None}
RED = {"rows_match": False, "schema_match": True, "hash_match": False,
       "spark_rows": 1, "oracle_rows": 2, "err": None}
NO_ORACLE = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": 64, "oracle_rows": None, "err": "no_oracle"}


def _write(tmp_path, rnd, rows):
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


def test_latest_green_round_semantics(tmp_path):
    _write(tmp_path, 1, {"a": GREEN, "b": GREEN, "fails": RED})
    _write(tmp_path, 2, {"a": GREEN, "rows_only": NO_ORACLE, "fails": RED})
    ev = ENTRY._latest_green_round(str(tmp_path))
    assert ev["a"] == 2
    assert ev["b"] == 1
    assert ev["rows_only"] == 2  # rows-only no_oracle rows ARE evidence
    assert "fails" not in ev  # failed rows are NOT evidence
    assert "never" not in ev


def test_round3_order_is_the_hand_priority():
    # Only r01/r02-era evidence -> the deliberate hand order applies.
    ev = {"crawl_schedule_dedup": 1, "dedup_exact": 2}
    names = ENTRY._ordered_names(ev, ENTRY.QUERIES)
    prio = [k for k in ENTRY._PRIORITY if k in ENTRY.QUERIES]
    assert names[: len(prio)] == prio
    assert sorted(names) == sorted(ENTRY.QUERIES)


def test_round4_auto_rotation_fronts_unchecked_and_failed():
    registered = ["q_fresh", "q_stale", "q_failed", "q_never"]
    # q_failed's round-3 row was red -> its last GREEN round is 2.
    ev = {"q_fresh": 3, "q_stale": 2, "q_failed": 2}
    names = ENTRY._ordered_names(ev, registered)
    assert names == ["q_never", "q_failed", "q_stale", "q_fresh"]


def test_driver_cap_sweeps_registry_across_rounds():
    # Simulate the driver: 50 rows/round from the head of the order —
    # 104 queries must all get a green row within 3 rotated rounds,
    # and rounds 4+5 must cover everything round 3 missed.
    n, cap = 104, 50
    registered = [f"q{i:03d}" for i in range(n)]
    ev: dict[str, int] = {}
    covered_by_round: dict[int, list[str]] = {}
    # round 3 runs the hand order (none of these names are in _PRIORITY,
    # so it degrades to registration order) — write its rows first
    head3 = ENTRY._ordered_names({"x": 2}, registered)[:cap]
    ev.update({q: 3 for q in head3})
    covered_by_round[3] = head3
    for rnd in (4, 5):
        head = ENTRY._ordered_names(ev, registered)[:cap]
        ev.update({q: rnd for q in head})
        covered_by_round[rnd] = head
    assert set(ev) == set(registered)
    # round 4's head is drawn entirely from what round 3 missed, and
    # rounds 4+5 together finish the sweep
    missed = {q for q in registered if q not in covered_by_round[3]}
    assert set(covered_by_round[4]) <= missed
    assert missed <= set(covered_by_round[4]) | set(covered_by_round[5])


def test_repo_files_parse_and_queries_orders_whole_registry():
    ev = ENTRY._latest_green_round(HERE)
    assert ev, "repo CORRECTNESS_r*.json files should yield evidence"
    q = ENTRY.queries()
    assert sorted(q) == sorted(ENTRY.QUERIES)

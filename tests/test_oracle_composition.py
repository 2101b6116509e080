"""Guard: composed oracle SQL must embed its constituents' CURRENT SQL.

Several oracles are built by splicing other queries' ORACLES strings in
— either `.replace("{X_SQL}", ORACLES["x"])` inside the @register call,
or a module-level capture `_X_SQL = ORACLES["x"]` interpolated into a
later f-string.  Both happen at import time, so they normally track the
constituent — but a capture taken BEFORE a later `ORACLES["x"] = ...`
reassignment, or a hand-pasted copy, silently forks: editing the
constituent then changes one engine's semantics and not the other's
(VERDICT r3 item 8).  This test re-derives every (composed, constituent)
pair from the queries.py source and asserts string containment against
the live ORACLES dict, so any fork fails loudly.
"""

import re
from pathlib import Path

from crunchy_spark.queries import ORACLES

SRC = Path(__file__).resolve().parent.parent / "crunchy_spark" / "queries.py"


def _composition_pairs():
    """Yield (composed_name, constituent_name) pairs parsed from source."""
    text = SRC.read_text()
    lines = text.split("\n")

    # module-level captures: _PAIRS_SQL = ORACLES["minhash_lsh_pairs"]
    captures = {}  # var name -> constituent
    for m in re.finditer(
        r'^(_[A-Z0-9_]+)\s*=\s*ORACLES\["([a-z0-9_]+)"\]', text, re.M
    ):
        captures[m.group(1)] = m.group(2)

    pairs = set()
    current = None  # name of the @register block we are inside
    for i, line in enumerate(lines):
        m = re.search(r'@register\(\s*"([a-z0-9_]+)"', line)
        if m:
            current = m.group(1)
        elif re.match(r"\s*@register\(\s*$", line):
            m2 = re.search(r'"([a-z0-9_]+)"', lines[i + 1])
            current = m2.group(1) if m2 else None
        elif re.match(r"^def |^ORACLES\[", line):
            # direct dict assembly: ORACLES["x"] = f"""... {ORACLES["y"]}"""
            m3 = re.match(r'^ORACLES\["([a-z0-9_]+)"\]\s*=', line)
            current = m3.group(1) if m3 else None
        if current is None:
            continue
        # inline splice: .replace("{X}", ORACLES["y"]) or f-string ORACLES["y"]
        for m4 in re.finditer(r'ORACLES\[.([a-z0-9_]+).\]', line):
            if m4.group(1) != current and not line.startswith("ORACLES"):
                pairs.add((current, m4.group(1)))
            elif line.strip().startswith("WITH") or "{ORACLES[" in line:
                pairs.add((current, m4.group(1)))
        # captured-variable splice: {_PAIRS_SQL} inside an f-string oracle
        for var, constituent in captures.items():
            if re.search(r"\{" + var + r"\}", line) and current != constituent:
                pairs.add((current, constituent))
    # dict-assembly lines where composed == constituent regex artifact
    return sorted((c, k) for c, k in pairs if c != k and c in ORACLES)


def test_composition_pairs_found():
    pairs = _composition_pairs()
    # the compositions VERDICT r3 called out must all be detected
    must = {
        ("neardup_components", "minhash_lsh_pairs"),
        ("curation_keep_list", "repetition_quality"),
        ("curation_keep_list", "benchmark_decontaminate"),
        ("image_keep_list", "caption_token_neardup"),
        ("dedup_layer_agreement", "minhash_lsh_pairs"),
        ("dedup_layer_agreement", "simhash"),
        ("dedup_tier_kappa", "dedup_layer_agreement"),
        ("frontier_next_fetch", "link_priority_score"),
        ("lang_confusion", "lang_id"),
        ("link_priority_score", "anchor_text_agg"),
        ("link_priority_score", "host_degree_stats"),
    }
    missing = must - set(pairs)
    assert not missing, f"composition scanner lost pairs: {missing}"


def test_composed_oracles_contain_current_constituent_sql():
    stale = []
    for composed, constituent in _composition_pairs():
        frag = ORACLES[constituent].strip()
        if frag and frag not in ORACLES[composed]:
            stale.append((composed, constituent))
    assert not stale, (
        f"composed oracles no longer embed their constituents' current "
        f"SQL (stale capture or hand-fork): {stale}"
    )

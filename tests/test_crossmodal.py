"""Cross-modal image+caption curation: designed dup structure is
recovered, classes are consistent, and the plans stay block-joined
(no cartesian anywhere)."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from crunchy_spark.queries import (
    _IMAGES_META,
    PHASH_THRESH,
    caption_token_neardup,
    crossmodal_dup_classify,
    image_caption_quality_filter,
)

SF = "/root/testdata/sf0.001"  # ignored by these fixture-universe ops


def _fixture():
    return pq.read_table(_IMAGES_META).to_pandas()


def test_crossmodal_classes_consistent(spark):
    """Class labels must agree with the raw fixture: `both` pairs are
    phash-close AND caption-equal; `image_only` caption-differ;
    `caption_only` phash-far."""
    pdf = _fixture().set_index("image_id")
    rows = crossmodal_dup_classify(spark, SF).collect()
    assert rows, "no dup pairs found"
    classes = {r["dup_class"] for r in rows}
    assert classes == {"both", "image_only", "caption_only"}
    norm = pdf["caption"].str.lower().str.strip().str.replace(r"\s+", " ", regex=True)
    for r in rows:
        ham = bin(
            (int(pdf.loc[r.a_id, "phash"]) ^ int(pdf.loc[r.b_id, "phash"]))
            & ((1 << 64) - 1)
        ).count("1")
        cap_eq = norm[r.a_id] == norm[r.b_id]
        assert r.hamming == ham
        assert r.image_match == (ham <= PHASH_THRESH)
        assert r.caption_match == cap_eq
        want = (
            "both" if (cap_eq and ham <= PHASH_THRESH)
            else ("image_only" if ham <= PHASH_THRESH else "caption_only")
        )
        assert r.dup_class == want


def test_designed_copy_rows_recovered(spark):
    """Every idx%5==3 caption copy lands in a caption-matched pair with
    its source (datagen.caption_for chains on the final value, so the
    copy's caption always equals idx-1's)."""
    got = {
        (r.a_id, r.b_id)
        for r in crossmodal_dup_classify(spark, SF).collect()
        if r.caption_match
    }
    flat = {x for p in got for x in p}
    for idx in range(1, 256):
        if idx % 5 == 3:
            assert f"img{idx:010d}" in flat, idx


def test_caption_token_neardup_finds_photo_edits(spark):
    """The designed `+ photo` rows (idx%7==4, not a copy row) pair with
    their source caption at Jaccard 3/4."""
    rows = caption_token_neardup(spark, SF).collect()
    got = {(r.a_id, r.b_id): r.jaccard for r in rows}
    checked = 0
    for idx in range(2, 256):
        if idx % 7 == 4 and idx % 5 != 3:
            pair = (f"img{idx - 2:010d}", f"img{idx:010d}")
            assert got.get(pair) == 0.75, pair
            checked += 1
    assert checked == 29  # 36 idx%7==4 rows in [2,256) minus 7 copy-rule overlaps


def test_quality_filter_gates(spark):
    df = image_caption_quality_filter(spark, SF)
    rows = df.collect()
    assert len(rows) == 256
    for r in rows:
        assert r.keep == (r.res_ok and r.aspect_ok and r.caption_ok)
    # 32x32 rows exist and must fail the resolution gate
    dropped = [r for r in rows if r.pixels == 1024]
    assert dropped and all(not r.res_ok for r in dropped)


def test_crossmodal_plans_have_no_cartesian(spark):
    from crunchy_spark.queries import QUERIES

    for q in (
        crossmodal_dup_classify,
        caption_token_neardup,
        QUERIES["image_keep_list"],
    ):
        plan = q(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_image_keep_list_reconstructs_from_parts(spark):
    """image_keep_list must be exactly the prioritized composition of
    its constituents — verified by an INDEPENDENT driver-side
    reconstruction: union-find over the phash pair stream, pure-Python
    survivor pick, caption grouping, near-dup drops, and quality gates
    recomputed from the raw fixture."""
    import re

    from crunchy_spark.queries import QUERIES

    pdf = _fixture()
    idnum = {r.image_id: int(r.image_id[3:]) for r in pdf.itertuples()}
    pixels = {r.image_id: r.w * r.h for r in pdf.itertuples()}
    cap = {
        r.image_id: re.sub(r"\s+", " ", r.caption.strip()).lower()
        for r in pdf.itertuples()
    }

    # union-find over the registered pair stream
    parent = {i: i for i in idnum}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in QUERIES["phash_hamming_neardup"](spark, SF).collect():
        ra, rb = find(r.a_id), find(r.b_id)
        if ra != rb:
            parent[max(ra, rb, key=lambda i: idnum[i])] = min(
                ra, rb, key=lambda i: idnum[i]
            )
    comps = {}
    for i in idnum:
        comps.setdefault(find(i), []).append(i)
    canon_of = {}
    for members in comps.values():
        best = max(pixels[m] for m in members)
        survivor = min(
            (m for m in members if pixels[m] == best), key=lambda m: idnum[m]
        )
        for m in members:
            canon_of[m] = survivor

    cap_min = {}
    for i, c in cap.items():
        if c not in cap_min or idnum[i] < idnum[cap_min[c]]:
            cap_min[c] = i
    nd_drop = {r.b_id for r in caption_token_neardup(spark, SF).collect()}
    q_keep = {
        r.image_id: r.keep
        for r in image_caption_quality_filter(spark, SF).collect()
    }

    def expect(i):
        if canon_of[i] != i:
            return "image_dup"
        if cap_min[cap[i]] != i:
            return "caption_dup"
        if i in nd_drop:
            return "caption_neardup"
        if not q_keep[i]:
            return "low_quality"
        return "keep"

    got = {
        r.image_id: r.reason
        for r in QUERIES["image_keep_list"](spark, SF).collect()
    }
    assert set(got) == set(idnum)
    mismatches = {i: (got[i], expect(i)) for i in idnum if got[i] != expect(i)}
    assert not mismatches, mismatches
    # every reason tier is exercised by the designed fixture structure
    assert set(got.values()) == {
        "image_dup",
        "caption_dup",
        "caption_neardup",
        "low_quality",
        "keep",
    }

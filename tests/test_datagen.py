"""Fixture determinism + invariants (FIXTURES.md)."""

from crunchy_spark import codec, datagen
from crunchy_spark.urlnorm import canonicalize_one


def test_images_deterministic():
    a = datagen.gen_images_pdf(20)
    b = datagen.gen_images_pdf(20)
    assert a["phash"].tolist() == b["phash"].tolist()
    assert a["caption"].tolist() == b["caption"].tolist()


def test_image_decode_invariants():
    pdf = datagen.gen_images_pdf(12)
    for _, row in pdf.iterrows():
        arr, lossless = codec.decode_image(row["bytes"])
        ref = codec.gen_pixels(int(row["image_id"][3:]), row["w"], row["h"])
        if lossless:
            assert (arr == ref).all()
        else:
            assert codec.psnr(arr, ref) >= 40.0
        assert codec.phash64(arr) == row["phash"]


def test_frontier_dup_rate_and_canonical_collapse():
    pdf = datagen.gen_frontier_seed_pdf(400)
    canons = pdf["url"].map(canonicalize_one)
    # 15% injected duplicates => distinct canonical count well below row count
    assert canons.nunique() < len(pdf)
    assert canons.nunique() >= len(pdf) * 0.8


def test_universe_urls_route_to_known_sites():
    for i in range(50):
        u = datagen.url_for(i)
        assert ("crunchbase.com" in u) or ("tracxn.com" in u)
        assert canonicalize_one(u) == u  # universe urls are already canonical


def test_fixture_write_and_meta(spark, unit_fixtures):
    meta = datagen.fixture_meta(unit_fixtures)
    images = spark.read.parquet(f"{unit_fixtures}/images.parquet")
    seeds = spark.read.parquet(f"{unit_fixtures}/frontier_seed.parquet")
    assert images.count() == meta["n_images"]
    assert seeds.count() == meta["n_seeds"]
    pm = spark.read.parquet(f"{unit_fixtures}/page_meta.parquet")
    assert pm.count() == meta["n_images"]

"""Deterministic synthetic fixtures (FIXTURES.md) — seed=42, pure
functions of row index. No wall-clock, no network, no external data.

These stand in for the reference's inputs:
- `images`       = fetched payloads (input_hint shape from BASELINE.json)
- `page_meta`    = XPath-extractable page content
  (reference fields: parser/CrunchbaseDataParser.py:18-82,
   TracxnDataParser.py:52-129)
- `frontier_seed`= POST /createCrawl seed list
  (reference: api/views.py:19-42) with 15% duplicate injection and 10%
  URL noise to exercise canonicalization
- `host_policy`  = politeness table (settings.py:122-130)
- `rates`        = pinned currency table (reference fetches live,
  utils/Currency.py:45-65; pinned for determinism)

The fetch-sim maps URL -> payload via
``image_id = img{sha_int(url_canon) % n_images}`` so any URL (seed or
expansion) resolves to a deterministic payload computable by both the
Spark engine and the serial reference-order simulator.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

from . import codec

SEED = 42

WORD_BANK = [f"tok{i:02d}" for i in range(56)] + [
    "alpha", "bravo", "carbon", "delta", "ember", "falcon", "granite", "helix",
]
FOUNDER_POOL = [
    "Ada Wong", "Ben Ito", "Cara Diaz", "Dev Patel", "Elif Kaya", "Finn Hart",
    "Gita Rao", "Hana Kim", "Ivan Petrov", "Jo Smith", "Kai Chen", "Lena Voss",
]
INDUSTRY_POOL = [
    "Artificial Intelligence", "Finance", "Tech", "Health Care", "E-Commerce",
    "Education", "Energy", "Logistics", "Security", "Gaming", "Real Estate",
    "Agriculture",
]
INTERESTED_INDUSTRIES = ["Artificial Intelligence", "Finance"]
# exactly the reference's currency test corpus (CrunchyRest/test/test_Currency.py:6-53)
FUNDING_CORPUS = [
    "$1.5M", "₹1M", "£179K", "₩8B", "CN¥13M", "CA$3.9M",
    "CZK13M", "SEK30M", "—", "",
]
# exactly the reference's founded test corpus (CrunchyRest/test/test_founded.py:10-42)
FOUNDED_CORPUS = ["2018", "Aug2015", "Jan1,2015", "Nov30,2016", "", "garbage"]
# pinned rates (rate_per_usd): deterministic stand-in for the live JSON
RATES = {
    "USD": 1.0, "EUR": 0.92, "GBP": 0.79, "INR": 83.1, "KRW": 1330.0,
    "CNY": 7.2, "CAD": 1.36, "CZK": 23.0, "SEK": 10.4, "JPY": 150.0,
}

W_CYCLE = [32, 64, 96, 128]
H_CYCLE = [32, 48, 64]


def sha_int_of(canon: str) -> int:
    """First 60 bits of SHA-1(canonical url) — matches urlnorm.sha_int_col."""
    return int(hashlib.sha1(canon.encode()).hexdigest()[:15], 16)


def image_id_for(canon: str, n_images: int) -> str:
    return f"img{sha_int_of(canon) % n_images:010d}"


# ---------------------------------------------------------------------------
# images
# ---------------------------------------------------------------------------
def image_dims(idx: int) -> tuple[int, int]:
    """Per-image dimensions; idx % 4 == 1 rows inherit their
    predecessor's dims so codec.gen_pixels' near-dup perturbation is a
    same-shape pixel neighbor of the stored idx-1 image."""
    base = idx - 1 if (idx % 4 == 1 and idx > 0) else idx
    return W_CYCLE[base % 4], H_CYCLE[base % 3]


def caption_for(idx: int) -> str:
    """Deterministic caption with designed CROSS-MODAL duplicate
    structure (pure function of idx, like every fixture column):

    - base caption:       ``caption {idx} {word}``
    - ``idx % 5 == 3``:   verbatim copy of idx-1's (final) caption —
      exact caption dup across DISTINCT images ("caption farming" /
      mirror-with-new-art in a real crawl). Where the image-near-dup
      rule also fires (idx % 4 == 1, i.e. idx ≡ 13 mod 20) the pair is
      a duplicate in BOTH modalities.
    - ``idx % 7 == 4`` (and not a copy row): idx-2's caption plus a
      trailing ``photo`` token — token-level NEAR-dup caption (Jaccard
      3/4) on a visually different image.

    Copies chain on the final value (recursion strictly decreases idx)
    so every copy row lands in a real same-caption group.
    """
    if idx % 5 == 3 and idx > 0:
        return caption_for(idx - 1)
    if idx % 7 == 4 and idx >= 2:
        return caption_for(idx - 2) + " photo"
    return f"caption {idx} {WORD_BANK[idx % len(WORD_BANK)]}"


def gen_images_pdf(n: int) -> pd.DataFrame:
    rows = []
    for idx in range(n):
        w, h = image_dims(idx)
        fmt = "jpeg" if idx % 3 == 0 else "png"
        arr = codec.gen_pixels(idx, w, h)
        data = codec.encode_image(arr, fmt)
        decoded, _ = codec.decode_image(data)
        rows.append(
            {
                "image_id": f"img{idx:010d}",
                "bytes": data,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": caption_for(idx),
                "phash": codec.phash64(decoded),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# URL universe
# ---------------------------------------------------------------------------
def site_of(i: int) -> str:
    return "crunchbase" if i % 2 == 0 else "tracxn"


def host_of(i: int) -> str:
    domain = "crunchbase.com" if i % 2 == 0 else "tracxn.com"
    # host skew per FIXTURES.md §2: 80% on the two apex hosts, the rest
    # across 1,000 synthetic subdomain hosts (exercises salted ranking)
    if i % 10 < 8:
        return domain
    return f"h{(i * 7919) % 1000:04d}.{domain}"


def url_for(i: int) -> str:
    """Canonical URL of universe member i (pure function of i)."""
    slug = f"co-{i:08d}"
    host = host_of(i)
    if i % 2 == 0:
        return f"https://{host}/organization/{slug}"
    tail = hashlib.md5(slug.encode()).hexdigest()[:12]
    return f"https://{host}/d/companies/{slug}/__{tail}"


_NOISE = ["slash", "query", "frag", "upper", "www"]


def add_noise(url: str, variant: int) -> str:
    kind = _NOISE[variant % len(_NOISE)]
    if kind == "slash":
        return url + "/"
    if kind == "query":
        return url + "?utm=x"
    if kind == "frag":
        return url + "#frag"
    if kind == "upper":
        scheme, rest = url.split("://", 1)
        head, _, tail = rest.partition("/")
        return f"{scheme}://{head.upper()}/{tail}"
    return url.replace("://", "://www.", 1)


# ---------------------------------------------------------------------------
# page_meta — one row per image; the deterministic page content
# ---------------------------------------------------------------------------
def gen_page_meta_pdf(n_images: int, n_universe: int) -> pd.DataFrame:
    rows = []
    for m in range(n_images):
        n_sim = m % 6  # 0..5 expansion links (FIXTURES.md §4)
        sims = []
        for k in range(n_sim):
            target = (m * 7 + 13 * k + 1) % n_universe
            u = url_for(target)
            if (m + k) % 8 < 2:  # deterministic noise on 25% of links
                u = add_noise(u, m + k)
            sims.append(u)
        n_ind = m % 4  # 0..3 industries; overlap with INTERESTED when m%4>=1
        industries = [INDUSTRY_POOL[(m + j) % len(INDUSTRY_POOL)] for j in range(n_ind)]
        founders = [FOUNDER_POOL[(m + j) % len(FOUNDER_POOL)] for j in range(m % 4)]
        rows.append(
            {
                "image_id": f"img{m:010d}",
                "name": f"Company {m}",
                "website": f"https://co-{m % 4000}.example.com/",
                "funding": FUNDING_CORPUS[m % len(FUNDING_CORPUS)],
                "founders": founders,
                "industries": industries,
                "similar_companies": sims,
                "description": f"Deterministic description {m} {WORD_BANK[m % len(WORD_BANK)]}.",
                "founded": FOUNDED_CORPUS[m % len(FOUNDED_CORPUS)],
                "logo": (
                    None
                    if m % 5 < 3
                    else f"https://res.cloudinary.com/demo/logo{m}.png"
                ),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# frontier seeds (with duplicate injection + noise)
# ---------------------------------------------------------------------------
def gen_frontier_seed_pdf(n_seeds: int) -> pd.DataFrame:
    rows = []
    for idx in range(n_seeds):
        is_dup = idx >= 20 and idx % 20 in (3, 9, 17)  # 15% duplicates
        base = idx // 2 if is_dup else idx
        url = url_for(base)
        if is_dup or idx % 10 == 6:  # dups always noisy; +10% noisy originals
            url = add_noise(url, idx)
        rows.append(
            {
                "url": url,
                "entry_point": [None, "crunchbase", "tracxn"][idx % 3],
                "queue": site_of(base),
                "seq": idx,
                "priority": ((base * 2654435761) % 100) / 100.0,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# host_policy
# ---------------------------------------------------------------------------
def gen_host_policy_pdf() -> pd.DataFrame:
    rows = []
    for domain in ("crunchbase.com", "tracxn.com"):
        rows.append(
            {
                "host": domain,
                "crawl_delay_s": 5.0,  # DOWNLOAD_DELAY (settings.py:122-130)
                "max_concurrent": 1,
                "robots_allow": True,
                "cloudflare": domain == "crunchbase.com",
            }
        )
        for k in range(1000):
            rows.append(
                {
                    "host": f"h{k:04d}.{domain}",
                    "crawl_delay_s": float([1, 2, 5][k % 3]),
                    "max_concurrent": 1,
                    "robots_allow": True,
                    "cloudflare": domain == "crunchbase.com",
                }
            )
    return pd.DataFrame(rows)


def gen_rates_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        [{"code": c, "rate_per_usd": r} for c, r in sorted(RATES.items())]
    )


# ---------------------------------------------------------------------------
# materialization
# ---------------------------------------------------------------------------
SIZES = {
    # (n_images, n_seeds, n_universe)
    "unit": (200, 500, 2_000),
    "parity": (1_000, 20_000, 60_000),
    "bench": (2_000, 200_000, 2_000_000),
}


def write_fixtures(spark, out_dir: str, scale: str = "unit") -> dict[str, str]:
    """Materialize all fixture tables as parquet under out_dir."""
    from . import schemas

    n_images, n_seeds, n_universe = SIZES[scale]
    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    images = spark.createDataFrame(gen_images_pdf(n_images), schema=schemas.IMAGES)
    paths["images"] = os.path.join(out_dir, "images.parquet")
    images.repartition(8).write.mode("overwrite").parquet(paths["images"])

    meta = spark.createDataFrame(
        gen_page_meta_pdf(n_images, n_universe), schema=schemas.PAGE_META
    )
    paths["page_meta"] = os.path.join(out_dir, "page_meta.parquet")
    meta.repartition(4).write.mode("overwrite").parquet(paths["page_meta"])

    seeds = spark.createDataFrame(gen_frontier_seed_pdf(n_seeds).drop(columns=[]))
    paths["frontier_seed"] = os.path.join(out_dir, "frontier_seed.parquet")
    seeds.repartition(8).write.mode("overwrite").parquet(paths["frontier_seed"])

    policy = spark.createDataFrame(gen_host_policy_pdf(), schema=schemas.HOST_POLICY)
    paths["host_policy"] = os.path.join(out_dir, "host_policy.parquet")
    policy.coalesce(1).write.mode("overwrite").parquet(paths["host_policy"])

    rates = spark.createDataFrame(gen_rates_pdf(), schema=schemas.RATES)
    paths["rates"] = os.path.join(out_dir, "rates.parquet")
    rates.coalesce(1).write.mode("overwrite").parquet(paths["rates"])

    with open(os.path.join(out_dir, "META.txt"), "w") as f:
        f.write(f"scale={scale} n_images={n_images} n_seeds={n_seeds} n_universe={n_universe}\n")
    return paths


def fixture_meta(out_dir: str) -> dict[str, int]:
    with open(os.path.join(out_dir, "META.txt")) as f:
        parts = f.read().split()
    return {k: (int(v) if v.isdigit() else v) for k, v in (p.split("=") for p in parts)}


def gen_images_decoded_meta_pdf(n: int) -> pd.DataFrame:
    """Ground-truth decoded metadata for the first ``n`` synthetic
    images — committed once as fixtures/images_decoded_meta.parquet so
    the binary decode ops (image_decode_stats / image_resize) carry
    FULL DuckDB value oracles instead of rows-only checks: the oracle
    reads this fixture, the engine re-decodes the live bytes, and a
    hash match proves the decode path reproduces the committed truth
    (the image_header_sniff pattern, extended to decoded values).
    Also carries the media_frame_sample columns (every-4th-row frame
    sampling) so that op oracles against the same fixture."""
    rows = []
    for idx in range(n):
        w, h = image_dims(idx)
        fmt = "jpeg" if idx % 3 == 0 else "png"
        data = codec.encode_image(codec.gen_pixels(idx, w, h), fmt)
        arr, lossless = codec.decode_image(data)
        small = codec.resize_small(arr)
        frames = arr[::4]
        rows.append(
            {
                "image_id": f"img{idx:010d}",
                "fmt": fmt,
                "mean_px": float(arr.mean()),
                "psnr_ok": bool(
                    lossless or codec.psnr(codec.gen_pixels(idx, w, h), arr) >= 40.0
                ),
                "out_w": int(small.shape[1]),
                "out_h": int(small.shape[0]),
                "out_mean": float(small.mean()),
                "n_frames": int(arr.shape[0]),
                "n_sampled": int(frames.shape[0]),
                "sample_mean": float(frames.mean()),
            }
        )
    return pd.DataFrame(rows)


def gen_images_tiles_meta_pdf(n: int) -> pd.DataFrame:
    """Ground-truth 2x2 tile stats per image (the image_tile_stats
    decomposition) — committed as fixtures/images_tiles_meta.parquet
    for that op's full value oracle. The 4dp rounding is Python
    round() on BOTH sides (fixture generation and live op), so the
    committed values are bit-identical to the engine's."""
    rows = []
    for idx in range(n):
        w, h = image_dims(idx)
        fmt = "jpeg" if idx % 3 == 0 else "png"
        arr, _ = codec.decode_image(
            codec.encode_image(codec.gen_pixels(idx, w, h), fmt)
        )
        hh, ww = arr.shape[0], arr.shape[1]
        hs, ws = [(0, hh // 2), (hh // 2, hh)], [(0, ww // 2), (ww // 2, ww)]
        for ti, (y0, y1) in enumerate(hs):
            for tj, (x0, x1) in enumerate(ws):
                t = arr[y0:y1, x0:x1]
                rows.append(
                    {
                        "image_id": f"img{idx:010d}",
                        "tile_id": ti * 2 + tj,
                        "t_w": int(x1 - x0),
                        "t_h": int(y1 - y0),
                        "t_mean": round(float(t.mean()), 4),
                        "t_std": round(float(t.std()), 4),
                    }
                )
    return pd.DataFrame(rows)

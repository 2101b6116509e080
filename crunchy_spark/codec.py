"""Deterministic image codec + perceptual hash (pure stdlib/numpy).

The container has no PIL/opencv, so the payload "decode" uses a
deterministic stand-in codec with real lossless/lossy semantics (the
multimodal plumbing — schema, partitioning, Arrow batch shape — is real;
swap `encode_image`/`decode_image` for PIL in production):

- fmt='png'  -> CSL0 header + zlib(raw RGB)         (lossless, exact)
- fmt='jpeg' -> CSY0 header + zlib(quantized RGB)   (lossy, step=2 =>
               max abs error 1 => PSNR >= 48 dB, above the 40 dB
               invariant from BASELINE.json input_hint)

phash: 64-bit average-hash (8x8 block-mean over grayscale, threshold at
mean) — the reference stores logo URLs only (models.py:15); the graft's
phash column comes from input_hint.
"""

from __future__ import annotations

import struct
import zlib
from math import inf, log10

import numpy as np

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MAGIC_LOSSLESS = b"CSL0"
MAGIC_LOSSY = b"CSY0"
_HDR = struct.Struct("<HHB")  # w, h, channels
LOSSY_STEP = 2


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array."""
    h, w, c = arr.shape
    if fmt == "png":
        return MAGIC_LOSSLESS + _HDR.pack(w, h, c) + zlib.compress(arr.tobytes(), 6)
    if fmt == "jpeg":
        q = ((arr.astype(np.uint16) // LOSSY_STEP) * LOSSY_STEP + LOSSY_STEP // 2).astype(
            np.uint8
        )
        return MAGIC_LOSSY + _HDR.pack(w, h, c) + zlib.compress(q.tobytes(), 6)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes) -> tuple[np.ndarray, bool]:
    """Decode -> (array, lossless?)."""
    magic, hdr = data[:4], data[4 : 4 + _HDR.size]
    if magic not in (MAGIC_LOSSLESS, MAGIC_LOSSY):
        raise ValueError("bad magic")
    w, h, c = _HDR.unpack(hdr)
    raw = zlib.decompress(data[4 + _HDR.size :])
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, c)
    return arr, magic == MAGIC_LOSSLESS


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical arrays."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return inf
    return 10.0 * log10(255.0**2 / mse)


def phash64(arr: np.ndarray) -> int:
    """64-bit average hash as a signed int64 (Spark LongType-safe)."""
    g = arr.astype(np.float64).mean(axis=2)
    ys = np.linspace(0, g.shape[0], 9).astype(int)
    xs = np.linspace(0, g.shape[1], 9).astype(int)
    pooled = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            block = g[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
            pooled[i, j] = block.mean() if block.size else 0.0
    bits = (pooled > pooled.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def gen_pixels(idx: int, w: int, h: int) -> np.ndarray:
    """The reference-decode generator: pure function of (seed=42, idx)
    per FIXTURES.md §1 — tests recompute this to check PSNR/caption.

    Near-dup structure (drives the banded perceptual-hash dedup): every
    idx % 4 == 1 image is its predecessor's pixels with k = 1+(idx//4)%6
    of the 64 phash grid blocks inverted — Hamming(phash[idx-1],
    phash[idx]) ~ k, giving designed near-dup pairs at distances 1..7
    (plus occasional threshold-crossers from global-mean drift).
    datagen pairs the dimensions of these rows so the perturbation is a
    true pixel-space neighbor of the stored predecessor image."""
    if idx % 4 == 1 and idx > 0:
        arr = _noise_pixels(idx - 1, w, h).copy()
        k = 1 + (idx // 4) % 6
        ys = np.linspace(0, h, 9).astype(int)
        xs = np.linspace(0, w, 9).astype(int)
        for b in range(k):
            blk = (idx * 7 + b * 13) % 64  # 13 is invertible mod 64 -> distinct blocks
            i, j = blk // 8, blk % 8
            arr[ys[i] : ys[i + 1], xs[j] : xs[j + 1]] = (
                255 - arr[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
            )
        return arr
    return _noise_pixels(idx, w, h)


def _noise_pixels(idx: int, w: int, h: int) -> np.ndarray:
    rng = np.random.default_rng(42 + idx)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def resize_small(arr: np.ndarray, size: int = 16) -> np.ndarray:
    """Nearest-neighbor downsample to (size, size) via index striding —
    shared by the image_resize operator and the committed decoded-meta
    fixture generator so engine and oracle compute identical values."""
    ys = np.linspace(0, arr.shape[0] - 1, size).astype(int)
    xs = np.linspace(0, arr.shape[1] - 1, size).astype(int)
    return arr[np.ix_(ys, xs)]

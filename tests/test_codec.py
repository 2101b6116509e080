"""Codec invariants from BASELINE.json input_hint: lossless exact,
lossy PSNR >= 40 dB; phash stability."""

import numpy as np

from crunchy_spark.codec import (
    decode_image,
    encode_image,
    gen_pixels,
    phash64,
    psnr,
)


def test_lossless_roundtrip_exact():
    arr = gen_pixels(7, 64, 48)
    out, lossless = decode_image(encode_image(arr, "png"))
    assert lossless
    assert np.array_equal(out, arr)


def test_lossy_roundtrip_psnr():
    for idx in range(10):
        arr = gen_pixels(idx, 96, 64)
        out, lossless = decode_image(encode_image(arr, "jpeg"))
        assert not lossless
        assert psnr(arr, out) >= 40.0


def test_phash_deterministic_and_int64():
    arr = gen_pixels(3, 128, 64)
    h1, h2 = phash64(arr), phash64(arr.copy())
    assert h1 == h2
    assert -(2**63) <= h1 < 2**63


def test_phash_differs_across_images():
    hs = {phash64(gen_pixels(i, 64, 48)) for i in range(20)}
    assert len(hs) > 15

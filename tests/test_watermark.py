"""LSB provenance watermark: recovery through the lossless codec is
bit-exact (the gate proves it per image); this pins the MECHANISM —
the baseline separates, and a lossy JPEG hop destroys the payload,
which is exactly why the probe rides PNG."""

from __future__ import annotations

import hashlib

import numpy as np

from dataset_batch_processor_spark.multimodal import binary, jpeg, png


def _fixture(d: int):
    w, h = d % 16 + 8, d % 13 + 8
    y, x, c = np.mgrid[0:h, 0:w, 0:3]
    arr = ((d + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
    hex16 = hashlib.md5(f"{d}:wm".encode()).hexdigest()[:16]
    bits = [(int(hex16[j // 4], 16) >> (3 - j % 4)) & 1 for j in range(64)]
    wm = arr.copy()
    flat = wm[:, :, 0].reshape(-1)
    flat[:64] = (flat[:64] & 0xFE) | np.array(bits, dtype=np.uint8)
    return arr, wm, bits


def _extract(img) -> list[int]:
    return (img[:, :, 0].reshape(-1)[:64] & 1).tolist()


def test_png_roundtrip_recovers_every_bit():
    for d in (0, 1, 7, 42, 311):
        arr, wm, bits = _fixture(d)
        dec = binary.decode_any("png", png.encode_png(wm))
        assert _extract(dec) == bits
        # lossless: decode reproduces the watermarked array exactly
        assert int(np.abs(dec.astype(int) - wm.astype(int)).max()) == 0
        # invisible: vs the CLEAN image the embed moved only channel-0
        # LSBs of the first 64 pixels, by at most 1
        diff = np.abs(wm.astype(int) - arr.astype(int))
        assert int(diff.max()) <= 1
        assert diff[:, :, 1:].max() == 0
        assert int(diff.sum()) == int(
            diff[:, :, 0].reshape(-1)[:64].sum()
        )


def test_baseline_does_not_carry_the_payload():
    n_match = []
    for d in range(40):
        arr, _wm, bits = _fixture(d)
        base = _extract(arr)
        n_match.append(sum(1 for b, g in zip(bits, base) if b == g))
    # clean images agree with the payload only at chance level —
    # never all 64 bits
    assert max(n_match) < 64
    assert 16 <= sum(n_match) / len(n_match) <= 48


def test_jpeg_hop_destroys_the_payload():
    """The reason the probe is pinned to the LOSSLESS codec: one
    baseline-JPEG encode/decode hop perturbs LSBs and the payload is
    gone for at least some images (quantization is content-dependent,
    so require destruction in aggregate, not per image)."""
    destroyed = 0
    for d in (0, 1, 7, 42, 311):
        _arr, wm, bits = _fixture(d)
        dec = binary.decode_any("jpg", jpeg.encode_jpeg(wm))
        destroyed += _extract(dec) != bits
    assert destroyed >= 4

"""Hypothesis properties for the round-5 pure kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _dhash_bits(arr: np.ndarray) -> np.ndarray:
    """Reference dhash bit computation (same math as the kernel)."""
    arr = arr.astype(np.int64)
    h, w = arr.shape[0], arr.shape[1]
    l = (77 * arr[:, :, 0] + 150 * arr[:, :, 1] + 29 * arr[:, :, 2]) // 256
    y = np.arange(h)[:, None]
    x = np.arange(w)[None, :]
    r = (y * 8) // h
    c = (x * 9) // w
    flat = (r * 9 + c).ravel()
    s = np.bincount(flat, weights=l.ravel(), minlength=72).astype(np.int64)
    a = np.bincount(flat, minlength=72).astype(np.int64)
    s, a = s.reshape(8, 9), a.reshape(8, 9)
    return s[:, :8] * a[:, 1:] > s[:, 1:] * a[:, :8]


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    w=st.integers(9, 24),
    h=st.integers(8, 20),
    shift=st.integers(1, 40),
)
def test_dhash_brightness_invariance(seed, w, h, shift):
    """The docstring's claim, exactly: adding a uniform brightness
    shift s to every channel shifts the fixed-point luma by exactly s
    ((77+150+29)s = 256s), so every adjacent-mean comparison — and
    therefore the full dHash — is unchanged, provided no channel
    clips."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256 - shift, size=(h, w, 3), dtype=np.int64)
    assert np.array_equal(
        _dhash_bits(base), _dhash_bits(base + shift)
    )


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(50, 2000),
)
def test_hist_quantile_error_bound(seed, n):
    """For ANY data, the histogram quantile is within one bin width
    above the true percentile bin (never below: cumulative counts
    reach the threshold at or after the exact value's bin)."""
    from dataset_batch_processor_spark.operators.histsketch import BIN_SCALE

    rng = np.random.default_rng(seed)
    vals = rng.uniform(0, 500, size=n)
    bins = np.floor(vals * BIN_SCALE).astype(np.int64)
    order = np.sort(bins)
    total = len(bins)
    for p in (50, 90, 99):
        # sketch answer: smallest bin with cum count >= p% of total
        uniq, counts = np.unique(order, return_counts=True)
        cum = np.cumsum(counts)
        est_bin = uniq[np.searchsorted(cum * 100, p * total)]
        exact = np.percentile(vals, p, method="inverted_cdf")
        exact_bin = np.floor(exact * BIN_SCALE)
        assert abs(int(est_bin) - int(exact_bin)) <= 1


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 400),
    scale=st.floats(0.001, 10.0),
)
def test_pca_quantization_rounding_is_floor_half_up(seed, n, scale):
    """floor(x*S + 0.5) must equal round-half-up for every float —
    including the dyadic values whose x*S lands exactly on a half
    (the case that broke the original rint/round pairing)."""
    rng = np.random.default_rng(seed)
    x = (rng.uniform(-1, 1, size=n) * scale).astype(np.float32)
    x = np.concatenate([x, np.float32([0.0625, -0.0625, 0.1875, 0.5])])
    q = np.floor(x.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    for xi, qi in zip(x.astype(np.float64), q):
        v = xi * 1000
        import math

        assert qi == math.floor(v + 0.5)

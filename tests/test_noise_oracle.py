"""Three-way bitwise equality of the noise scan (VERDICT r1 item 5).

tests/oracle/noise_oracle.py is an independent transcription of
call.rs:799-967 (no product imports); bronko_tpu/call/noise.py is the
product transcription; native/noise_scan.cpp is the C++ twin. All three
must agree BITWISE on adversarial inputs — a one-quirk mis-read in any
single transcription breaks at least one pairing.
"""

from __future__ import annotations

import numpy as np
import pytest

from bronko_tpu.call.noise import _baseline_noise_py, _minor_freqs, _tau
from tests.oracle.noise_oracle import reference_noise_scan


def _product_py(fwd, rev):
    return _baseline_noise_py(_minor_freqs(fwd, rev))


def _product_native(fwd, rev):
    from bronko_tpu.call.noise import WINDOW_SIZE, _tau_table
    from bronko_tpu.io.native import get_lib, native_noise_scan

    if get_lib() is None:
        pytest.skip("native library unavailable")
    return native_noise_scan(_minor_freqs(fwd, rev), _tau_table(WINDOW_SIZE * 3 + 2))


def _assert_bitwise(a: np.ndarray, b: np.ndarray, label: str) -> None:
    # NaN-aware bit equality: compare raw f64 bit patterns
    ab = a.view(np.int64)
    bb = b.view(np.int64)
    nan_a, nan_b = np.isnan(a), np.isnan(b)
    same = (ab == bb) | (nan_a & nan_b)
    assert bool(same.all()), f"{label}: first diff at {np.argwhere(~same)[0]}"


def _case_spike(rng, L=400):
    """One enormous MAF spike in otherwise quiet coverage."""
    fwd = np.full((L, 4), 0, np.int64)
    fwd[:, 0] = 500
    rev = fwd.copy()
    fwd[200, 1] = 450  # near-50% spike
    fwd[np.arange(0, L, 7), 2] = 3  # sparse low-level noise
    return fwd, rev


def _case_zero_depth_runs(rng, L=350):
    """Alternating zero-depth stretches exercise n inc/dec bookkeeping."""
    fwd = np.zeros((L, 4), np.int64)
    rev = np.zeros((L, 4), np.int64)
    for start in range(0, L, 60):
        fwd[start:start + 30, 0] = 200
        fwd[start:start + 30, 1] = rng.integers(0, 6, size=min(30, L - start))
    return fwd, rev


def _case_equal_value_collisions(rng, L=300):
    """Identical MAF values at many positions: the approximate-equality
    removal (call.rs:862) can delete a different position's entry, and the
    in_max-without-insert quirk (call.rs:890) triggers stale removals."""
    fwd = np.zeros((L, 4), np.int64)
    rev = np.zeros((L, 4), np.int64)
    fwd[:, 0] = 100
    fwd[np.arange(0, L, 3), 1] = 25   # maf exactly 0.2 at every 3rd position
    fwd[np.arange(1, L, 17), 2] = 25  # same value from a different base
    return fwd, rev


def _case_window_wrap(rng, L=101):
    """L barely past the window size: wrap indices i%100 collide with live
    entries while the tail half-window drains."""
    fwd = rng.integers(0, 50, size=(L, 4)).astype(np.int64)
    rev = rng.integers(0, 50, size=(L, 4)).astype(np.int64)
    return fwd, rev


def _case_outlier_cascade(rng, L=320):
    """>=10 extreme outliers inside one window push curr_max_idx toward the
    table end (the clamp divergence region stays agreed across all three)."""
    fwd = np.zeros((L, 4), np.int64)
    rev = np.zeros((L, 4), np.int64)
    fwd[:, 0] = 10_000
    spots = np.arange(150, 150 + 12 * 4, 4)
    fwd[spots, 1] = 9_000  # twelve ~0.47 MAFs in one window
    fwd[np.arange(0, L, 2), 2] = 1  # dense tiny noise to keep n large
    return fwd, rev


def _case_dense_full_window(rng, L=500):
    """Every position contributes all 3 minor alleles: n rides at the 300
    cap, exercising the top of the tau table."""
    fwd = rng.integers(50, 100, size=(L, 4)).astype(np.int64)
    rev = rng.integers(50, 100, size=(L, 4)).astype(np.int64)
    return fwd, rev


def _case_random(rng, L=700):
    fwd = rng.integers(0, 300, size=(L, 4)).astype(np.int64)
    rev = rng.integers(0, 300, size=(L, 4)).astype(np.int64)
    # sprinkle zero-depth positions
    kill = rng.integers(0, L, size=L // 5)
    fwd[kill] = 0
    rev[kill] = 0
    return fwd, rev


CASES = [
    _case_spike,
    _case_zero_depth_runs,
    _case_equal_value_collisions,
    _case_window_wrap,
    _case_outlier_cascade,
    _case_dense_full_window,
    _case_random,
]


@pytest.mark.parametrize("case", CASES, ids=lambda c: c.__name__[6:])
def test_three_way_bitwise_equality(case):
    rng = np.random.default_rng(hash(case.__name__) % (2**32))
    fwd, rev = case(rng)
    oracle = reference_noise_scan(fwd, rev, _tau)
    product = _product_py(fwd, rev)
    _assert_bitwise(oracle, product, f"{case.__name__}: oracle vs product-py")
    native = _product_native(fwd, rev)
    _assert_bitwise(oracle, native, f"{case.__name__}: oracle vs native")


def test_short_sequence_agreed_divergence():
    """L < window: the reference would panic (len*3 buffer, call.rs:812);
    oracle and product share the graceful max(len,window)*3 sizing and must
    still agree bitwise."""
    rng = np.random.default_rng(7)
    fwd = rng.integers(0, 40, size=(60, 4)).astype(np.int64)
    rev = rng.integers(0, 40, size=(60, 4)).astype(np.int64)
    oracle = reference_noise_scan(fwd, rev, _tau)
    product = _product_py(fwd, rev)
    _assert_bitwise(oracle, product, "short-seq oracle vs product")

"""Student's-t / Thompson-tau parity (VERDICT r1 item 4; call.rs:922-929).

The reference derives tau from statrs `StudentsT::inverse_cdf`; no Rust
toolchain exists in this environment, so statrs cannot be executed. The
parity argument instead pins the mathematically correct value:

  * `_tau_golden.py` holds t_crit computed to 50 digits (mpmath) and rounded
    ONCE to f64 — the correctly-rounded double any faithful implementation
    approximates — plus tau evaluated with the reference's f64 op order.
  * The product `_tau` must serve exactly these values for every curr_n the
    scan can produce (3..300; the window holds <= WINDOW_SIZE*3 samples).
  * scipy's Cephes-based ppf is measurably NOT correctly rounded (up to
    ~3.8e3 ulp off); the assertion here quantifies that and documents why
    the product reads the table instead of calling scipy.

Spot values are re-derived here from scratch via mpmath (slow path, a few
n) so the committed table itself is cross-checked against an independent
computation at test time, not only at generation time.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from bronko_tpu.call._tau_golden import N_MAX, T_CRIT, TAU
from bronko_tpu.call.noise import _tau
from bronko_tpu.consts import NOISE_WINDOW_SIZE


def test_domain_covers_scan():
    # curr_n <= WINDOW_SIZE*3 = 300 < N_MAX, so the scan never leaves the table
    assert NOISE_WINDOW_SIZE * 3 < N_MAX
    assert len(TAU) == N_MAX


def test_product_tau_serves_golden_table():
    assert _tau(0) == math.inf and _tau(2) == math.inf  # call.rs:930
    for n in range(3, N_MAX):
        assert _tau(n) == TAU[n], n


def test_tau_formula_op_order():
    # tau must equal the reference's f64 expression applied to the rounded
    # t_crit (call.rs:928) — guards against table regeneration drift
    for n in range(3, N_MAX):
        t_crit = T_CRIT[n]
        expect = (t_crit * (n - 1.0)) / (
            math.sqrt(n) * math.sqrt(n - 2.0 + t_crit * t_crit)
        )
        assert TAU[n] == expect, n


@pytest.mark.parametrize("n", [3, 4, 10, 57, 150, 300])
def test_t_crit_correctly_rounded_mpmath(n):
    mp = pytest.importorskip("mpmath")
    mp.mp.dps = 50
    alpha = mp.mpf("0.001")
    df = mp.mpf(n - 2)
    p = 1 - alpha / n

    def cdf(x):
        z = df / (df + x * x)
        return 1 - mp.betainc(df / 2, mp.mpf("0.5"), 0, z, regularized=True) / 2

    hi = mp.mpf(2)
    while cdf(hi) < p:
        hi *= 2
    root = mp.findroot(lambda x: cdf(x) - p, hi / 2, solver="secant",
                       tol=mp.mpf(10) ** (-45))
    assert float(root) == T_CRIT[n], n


def test_scipy_ppf_ulp_distance_documented():
    """scipy's t.ppf is close but not correctly rounded; quantify it so the
    docs' claim stays measured, and catch a scipy regression that would
    silently change any fallback behavior."""
    scipy_stats = pytest.importorskip("scipy.stats")
    max_ulp = 0
    for n in range(3, N_MAX):
        tc = float(scipy_stats.t.ppf(1.0 - 0.001 / n, float(n - 2)))
        ulp = abs(np.float64(tc).view(np.int64) - np.float64(T_CRIT[n]).view(np.int64))
        max_ulp = max(max_ulp, int(ulp))
    # measured 3769 at generation time; allow slack for scipy updates but
    # fail if it drifts grossly (which would signal a different algorithm)
    assert max_ulp < 50_000, max_ulp

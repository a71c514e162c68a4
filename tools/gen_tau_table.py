"""Generate the correctly-rounded modified-Thompson-tau table.

The reference computes, per outlier test (call.rs:922-929):

    t_crit = StudentsT::new(0.0, 1.0, n-2).inverse_cdf(1 - alpha/n)
    tau    = t_crit*(n-1) / (sqrt(n) * sqrt(n-2 + t_crit^2))      # f64 ops

statrs's inverse_cdf is a double-precision approximation of the true
inverse; scipy's `t.ppf` is a different approximation (Cephes stdtri). To
remove the "which library's last ulp" question entirely, we compute t_crit
to 50 significant digits with mpmath (bisection-free: mpmath root-find on
the exact CDF via the regularized incomplete beta), round ONCE to the
nearest f64 — the correctly-rounded value any faithful implementation
approximates — then evaluate the reference's tau formula in plain f64 with
the reference's operation order. The emitted table is what the product and
the C++ twin consume (bronko_tpu/call/noise.py).

n ranges over [3, N_MAX): the noise window holds at most WINDOW_SIZE*3 =
300 minor-allele samples (call.rs:801-804), so curr_n <= 300.

Run:  python tools/gen_tau_table.py > bronko_tpu/call/_tau_golden.py
"""

from __future__ import annotations

import math
import sys

import mpmath as mp

ALPHA = "0.001"   # call.rs:803
N_MAX = 302       # window capacity 300 + slack
mp.mp.dps = 50


def t_inverse_cdf(p: mp.mpf, df: mp.mpf) -> mp.mpf:
    """Student's-t inverse CDF at 50 digits via the regularized incomplete
    beta: for x > 0, CDF(x) = 1 - I_{df/(df+x^2)}(df/2, 1/2) / 2."""
    assert p > mp.mpf("0.5")

    def cdf(x):
        z = df / (df + x * x)
        return 1 - mp.betainc(df / 2, mp.mpf("0.5"), 0, z, regularized=True) / 2

    # bracket then refine with mpmath's solver
    lo, hi = mp.mpf(0), mp.mpf(2)
    while cdf(hi) < p:
        hi *= 2
    return mp.findroot(lambda x: cdf(x) - p, (lo + hi) / 2, solver="secant", tol=mp.mpf(10) ** (-45))


def main() -> None:
    alpha = mp.mpf(ALPHA)
    rows: list[tuple[int, float, float]] = []
    for n in range(3, N_MAX):
        p = 1 - alpha / n
        t_hi = t_inverse_cdf(p, mp.mpf(n - 2))
        t_crit = float(t_hi)  # single correct rounding to f64
        # reference f64 op order, call.rs:928
        tau = (t_crit * (n - 1.0)) / (math.sqrt(n) * math.sqrt(n - 2.0 + t_crit * t_crit))
        rows.append((n, t_crit, tau))

    out = sys.stdout
    out.write('"""Correctly-rounded Thompson-tau table — GENERATED, do not edit.\n\n')
    out.write("Produced by tools/gen_tau_table.py (mpmath, 50 digits; see its\n")
    out.write("docstring for the bit-parity argument vs statrs, call.rs:922-929).\n")
    out.write('Index: TAU[n] for curr_n = n in [3, %d); entries below 3 are +inf\n' % N_MAX)
    out.write('(call.rs:930 returns f64::INFINITY when curr_n <= 2).\n"""\n\n')
    out.write("# fmt: off\n")
    out.write("N_MAX = %d\n\n" % N_MAX)
    out.write("# (n, t_crit, tau) — floats serialized exactly via float.hex()\n")
    out.write("_ROWS = [\n")
    for n, t_crit, tau in rows:
        out.write('    (%d, "%s", "%s"),\n' % (n, float.hex(t_crit), float.hex(tau)))
    out.write("]\n\n")
    out.write("TAU = [float('inf')] * 3 + [float.fromhex(r[2]) for r in _ROWS]\n")
    out.write("T_CRIT = [float('nan')] * 3 + [float.fromhex(r[1]) for r in _ROWS]\n")
    out.write("# fmt: on\n")


if __name__ == "__main__":
    main()

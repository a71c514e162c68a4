"""Vectorized variant caller vs scalar oracle, across flag combinations."""

import numpy as np
import pytest

from bronko_tpu.call.noise import baseline_noise
from bronko_tpu.call.variants import CallStats, call_variants_for_seq
from tests.oracle.variants_oracle import call_variants_oracle


def synth_pileup(rng, L, depth=500, noise_rate=0.01, n_major=3, n_minor=4):
    ref = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=L)
    ref_bits = np.array([{65: 0, 67: 1, 71: 2, 84: 3}[b] for b in ref.tolist()])
    fwd = np.zeros((L, 4), np.int64)
    rev = np.zeros((L, 4), np.int64)
    fwd[np.arange(L), ref_bits] = depth // 2
    rev[np.arange(L), ref_bits] = depth - depth // 2
    # background noise
    noisy = rng.integers(0, L, size=int(L * 4 * noise_rate))
    for i in noisy:
        b = int(rng.integers(4))
        fwd[i, b] += int(rng.integers(1, 6))
        rev[i, b] += int(rng.integers(1, 6))
    # planted variants
    planted = rng.choice(np.arange(30, L - 30), size=n_major + n_minor, replace=False)
    for j, i in enumerate(planted):
        alt = (ref_bits[i] + 1 + int(rng.integers(3))) % 4
        if j < n_major:
            frac = 0.6 + 0.3 * rng.random()
        else:
            frac = 0.05 + 0.2 * rng.random()
        amt = int(depth * frac)
        fwd[i, alt] += amt // 2
        rev[i, alt] += amt - amt // 2
    fwd_cnt = np.minimum(fwd, 7)
    rev_cnt = np.minimum(rev, 7)
    return bytes(ref), fwd, rev, fwd_cnt, rev_cnt


@pytest.mark.parametrize("flags", [
    dict(),
    dict(filter_end_seq=False),
    dict(strand_filter=False),
    dict(no_strand_balance_filter=True),
    dict(min_af=0.01, min_depth=10, min_variant_depth=1),
])
def test_caller_matches_oracle(flags):
    rng = np.random.default_rng(5)
    k = 21
    ref, fwd, rev, fwd_cnt, rev_cnt = synth_pileup(rng, 400)

    base = dict(k=k, min_af=0.03, filter_end_seq=True, strand_filter=True,
                no_strand_balance_filter=False, strand_balance_ratio=0.1,
                strand_odds_max=6.0, n_per_strand=2, min_depth=300,
                min_variant_depth=3, variant_multiplier=1.5)
    base.update(flags)

    o_recs, o_major, o_minor, o_cov, o_total_cov, o_len = call_variants_oracle(
        "s", ref, fwd, rev, fwd_cnt, rev_cnt, **base)

    stats = CallStats()
    noise = baseline_noise(fwd, rev)
    recs = call_variants_for_seq(
        "s", ref, fwd, rev, fwd_cnt, rev_cnt, noise[:, 0], stats=stats, **base)

    assert stats.num_major == o_major
    assert stats.num_minor == o_minor
    assert stats.positions_covered == o_cov
    assert stats.total_coverage == o_total_cov
    assert len(recs) == len(o_recs)
    assert len(recs) > 0 or base.get("min_af", 0.03) > 0.5
    for r, o in zip(recs, o_recs):
        assert (r.seq, r.pos, r.ref_base, r.alt_base) == (o["seq"], o["pos"], o["ref_base"], o["alt_base"])
        assert (r.fwd_ref, r.rev_ref, r.fwd_alt, r.rev_alt, r.depth) == (
            o["fwd_ref"], o["rev_ref"], o["fwd_alt"], o["rev_alt"], o["depth"])
        assert r.af == pytest.approx(o["af"], abs=0, rel=0) and r.sor == pytest.approx(o["sor"], abs=0, rel=0)


def test_unbalanced_strand_bypass():
    """With balance filter off, one-sided variants skip SOR (sor = -1)."""
    L = 200
    ref = b"A" * L
    rng = np.random.default_rng(9)
    fwd = np.zeros((L, 4), np.int64)
    rev = np.zeros((L, 4), np.int64)
    fwd[:, 0] = 1000
    rev[:, 0] = 50
    # pepper low-level minor noise so the Thompson-tau window has n > 2 and
    # can reject the planted variant's own MAF as an outlier
    for p in range(0, L, 3):
        fwd[p, 1] += int(rng.integers(1, 4))
    i = 100
    fwd[i, 2] = 900  # all-forward variant
    fwd_cnt = np.minimum(fwd, 9)
    rev_cnt = np.minimum(rev, 9)
    kw = dict(k=21, min_af=0.03, filter_end_seq=True, strand_filter=True,
              strand_balance_ratio=0.1, strand_odds_max=6.0, n_per_strand=2,
              min_depth=300, min_variant_depth=3, variant_multiplier=1.5)
    noise = baseline_noise(fwd, rev)

    stats = CallStats()
    recs = call_variants_for_seq("s", ref, fwd, rev, fwd_cnt, rev_cnt,
                                 noise[:, 0], stats=stats,
                                 no_strand_balance_filter=True, **kw)
    hit = [r for r in recs if r.pos == i + 1]
    assert len(hit) == 1 and hit[0].sor == -1.0

    stats2 = CallStats()
    recs2 = call_variants_for_seq("s", ref, fwd, rev, fwd_cnt, rev_cnt,
                                  noise[:, 0], stats=stats2,
                                  no_strand_balance_filter=False, **kw)
    assert not [r for r in recs2 if r.pos == i + 1]  # SOR rejects it

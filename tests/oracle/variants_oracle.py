"""Scalar transcription of call_variants (call.rs:969-1150) as a test oracle
for the vectorized caller."""

import math

from bronko_tpu.call.noise import baseline_noise


def call_variants_oracle(
    seq_name, ref_bytes, fwd, rev, fwd_cnt, rev_cnt,
    *, k, min_af=0.03, filter_end_seq=True, strand_filter=True,
    no_strand_balance_filter=False, strand_balance_ratio=0.1,
    strand_odds_max=6.0, n_per_strand=2, min_depth=300,
    min_variant_depth=3, variant_multiplier=1.5, noise_max=None,
):
    """noise_max: per-position noise floor override ((L,) float64). The
    end-to-end oracle passes the INDEPENDENT noise transcription
    (tests/oracle/noise_oracle.py) so no product noise code participates;
    None keeps the historical behavior (product baseline_noise) for the
    caller-only tests."""
    if noise_max is None:
        noise = baseline_noise(fwd, rev)
    else:
        import numpy as _np

        noise = _np.stack([noise_max] * 3, axis=1)
    L = fwd.shape[0]
    nt = {65: 0, 97: 0, 67: 1, 99: 1, 71: 2, 103: 2, 84: 3, 116: 3}

    results = []
    n_major = n_minor = 0
    positions_covered = total_coverage = 0

    start, end = (k, L - k) if filter_end_seq else (0, L)
    for i in range(start, end):
        row = fwd[i]
        row_rev = rev[i]
        ref_base = nt.get(ref_bytes[i], 0)
        row_total = [int(row[b] + row_rev[b]) for b in range(4)]
        total_depth = sum(row_total)
        if total_depth == 0:
            continue
        positions_covered += 1
        total_coverage += total_depth

        for alt in range(4):
            if alt == ref_base or row_total[alt] == 0:
                continue
            sor = strand_odds_max + 1.0
            if strand_filter:
                a = float(row[ref_base]) + 1.0
                b = float(row_rev[ref_base]) + 1.0
                c = float(row[alt]) + 1.0
                d = float(row_rev[alt]) + 1.0
                ref_total = a + b + c + d
                msp = min(a + c, b + d) / ref_total
                if (not no_strand_balance_filter) or (msp >= strand_balance_ratio):
                    r = (a * d) / (b * c)
                    sor = math.log(r + 1.0 / r) + math.log(min(a, b) / max(a, b)) - math.log(min(c, d) / max(c, d))
                    if sor > strand_odds_max:
                        continue
                    if fwd_cnt[i][alt] < n_per_strand and rev_cnt[i][alt] < n_per_strand:
                        continue
                else:
                    sor = -1.0
            af = row_total[alt] / total_depth
            factor = variant_multiplier + 0.5 * 0.03 ** (100.0 * af)
            if af < min_af or af < max(factor, variant_multiplier) * noise[i, 0]:
                continue
            if af >= 0.5:
                n_major += 1
            else:
                if total_depth < min_depth:
                    continue
                if row_total[alt] < min_variant_depth:
                    continue
                n_minor += 1
            results.append(dict(
                seq=seq_name, pos=i + 1, ref_base=ref_base, alt_base=alt,
                fwd_ref=int(row[ref_base]), rev_ref=int(row_rev[ref_base]),
                fwd_alt=int(row[alt]), rev_alt=int(row_rev[alt]),
                depth=total_depth, af=af, sor=sor,
            ))
    return results, n_major, n_minor, positions_covered, total_coverage, L

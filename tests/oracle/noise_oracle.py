"""Independent transcription of get_baseline_noise (call.rs:799-967).

SECOND, structurally different implementation of the reference noise scan,
written directly from the Rust source and importing NOTHING from
bronko_tpu.call.noise — so a mis-read quirk in the product transcription
cannot hide (VERDICT r1 weak #5). Differences in structure, same semantics:

  * operates on raw (fwd, rev) (L,4) count matrices like the reference
    (the product pre-computes a minor-frequency matrix separately);
  * window state lives in numpy arrays indexed exactly like the Rust vecs;
  * the max table is a small class with insert/remove methods mirroring
    call.rs:861-890 shift loops;
  * tau comes from the caller (dependency-injected), so the oracle has no
    opinion about the inverse-CDF source.

Replicated reference quirks (each cited):
  * s2 outlier rejection subtracts the VALUE, not its square (call.rs:936);
  * in_max[idx] is set to 1 for ANY maf > 0, even when the insert loop
    never actually placed it in the table (call.rs:890) — stale removals
    can then delete an equal-valued entry that belongs to another position;
  * removal matches by |x - old| < 1e-12 (call.rs:862);
  * tau is +inf while curr_n <= 2 (call.rs:930), and inf * 0.0 = NaN makes
    the rejection comparison false, stopping the loop;
  * freqs are ALL FOUR sorted-descending count fractions; ranks 1..3 are
    the minor allele frequencies consumed (call.rs:831-846).

Two agreed divergences, shared with the product (docs/parity_checklist.md):
  * the reference allocates window buffers of len*3 and panics (index OOB)
    when len < window_size; both implementations size max(len, window)*3;
  * when all MAX_TABLE entries are rejected, the reference reads maxes[10]
    OOB and panics; both clamp to the last entry.
"""

from __future__ import annotations

import math

import numpy as np

WINDOW_SIZE = 100   # call.rs:801
ALPHA = 0.001       # call.rs:803
MAX_TABLE_LEN = WINDOW_SIZE // 10  # call.rs:804


class _MaxTable:
    """Top-10 table with the reference's shift-up/shift-down semantics."""

    def __init__(self) -> None:
        self.vals = np.zeros(MAX_TABLE_LEN, np.float64)

    def insert(self, maf: float) -> None:
        # call.rs:881-889: walk from the bottom, shifting smaller entries down
        for k in range(MAX_TABLE_LEN - 1, -1, -1):
            if maf > self.vals[k]:
                if k + 1 < MAX_TABLE_LEN:
                    self.vals[k + 1] = self.vals[k]
                self.vals[k] = maf
            else:
                break

    def remove_approx(self, old: float) -> None:
        # call.rs:861-868: first |x-old|<1e-12 match shifts the tail up
        hits = np.nonzero(np.abs(self.vals - old) < 1e-12)[0]
        if hits.size:
            pos = int(hits[0])
            self.vals[pos:-1] = self.vals[pos + 1:]
            self.vals[-1] = 0.0


def reference_noise_scan(fwd: np.ndarray, rev: np.ndarray, tau_fn) -> np.ndarray:
    """Returns (L, 3) float64 [max, mean, std] — the Noise struct fields."""
    L = int(fwd.shape[0])
    out = np.zeros((L, 3), np.float64)
    buf = max(L, WINDOW_SIZE) * 3          # reference: len*3 (panics if smaller)
    window_counts = np.zeros(buf, np.float64)
    in_max = np.zeros(buf, np.int8)
    table = _MaxTable()

    n = 0
    s = 0.0
    s2 = 0.0
    half = WINDOW_SIZE // 2

    combined = (fwd.astype(np.int64) + rev.astype(np.int64))

    for i in range(L + half):
        base = (i % WINDOW_SIZE) * 3

        if i < L:
            counts = np.sort(combined[i])[::-1]           # call.rs:833-836
            depth = int(counts.sum())
            freqs = (counts / depth) if depth else np.zeros(4)
        else:
            freqs = np.zeros(4)

        for j in range(1, 4):
            idx = base + (j - 1)
            old = float(window_counts[idx])
            if old > 0.0:
                n -= 1
                s -= old
                s2 -= old * old
                if in_max[idx] == 1:
                    table.remove_approx(old)
                    in_max[idx] = 0

            maf = float(freqs[j])
            if maf > 0.0:
                n += 1
                s += maf
                s2 += maf * maf
                table.insert(maf)
                in_max[idx] = 1                            # even if not inserted
            else:
                in_max[idx] = 0
            window_counts[idx] = maf

        if n != 0:
            mu = s / n
            var = (s2 / n) - mu * mu
        else:
            mu = 0.0
            var = 0.0

        cmi, cn, cs, cs2, cmu, cvar = 0, n, s, s2, mu, var
        while cmi < MAX_TABLE_LEN and table.vals[cmi] != 0.0:
            cand = float(table.vals[cmi])
            std = math.sqrt(cvar) if cvar >= 0.0 else float("nan")
            tau = tau_fn(cn) if cn > 2 else float("inf")
            if abs(cand - cmu) > tau * std:
                cs -= cand
                cs2 -= cand                                # call.rs:936 (value!)
                cn -= 1
                if cn > 0:
                    cmu = cs / cn
                    cvar = (cs2 / cn) - cmu * cmu
                else:
                    cmu = 0.0
                    cvar = 0.0
                cmi += 1
            else:
                break

        if i >= half:
            w = i - half
            if w < L:
                out[w, 0] = table.vals[min(cmi, MAX_TABLE_LEN - 1)]
                out[w, 1] = cmu
                out[w, 2] = math.sqrt(cvar) if cvar >= 0.0 else float("nan")

    return out

"""Locality-collapsing bucket hash, vectorized.

Re-derivation of the reference's `assign_buckets` (src/lcb.rs:1-45): bucket i
of a k-mer is a collision-free hash of (wildcard position i, the k-1 bases
excluding position i). Two k-mers share bucket i iff they are identical
everywhere except (possibly) position i. The reference computes it with three
sequential O(k) recurrences; here the recurrences collapse to closed forms so
the whole thing is a handful of (B, k) vector ops:

  shift_i = 2*(k-1-i)                     (bit offset of base i)
  cur_i   = c_i << shift_i                (base bits in place)
  p_i     = 1 << shift_i                  (= 4^(k-1-i))
  val_i   = kmer & (p_i - 1)              (bits strictly after position i;
                                           equals the reference's val[] since
                                           val_i = kmer - sum_{j<=i} cur_j)
  mu_i    = p_i + (cur_i >> 2)*(k-1-i)  if c_i != 0 else val_i
  num_a_i = #{ j < i : c_j == 0 }         (exclusive prefix count of 'A')
  bucket_i = sum(mu) - mu_i + val_i - num_a_i*cur_i + 1 + num_a_i

Arithmetic is uint64 with wrap-around, bit-matching the reference's release-
mode u64 behavior (relevant only near k=31 where mu_0 can exceed 2^63).

Golden-anchored by tests/test_buckets.py against the reference unit vectors
(lcb.rs:147-154).
"""

from __future__ import annotations

import numpy as np

__all__ = ["assign_buckets", "filtered_bucket_positions"]


def assign_buckets(kmer, k: int, xp=np):
    """Compute all k bucket ids for a batch of packed k-mers.

    Args:
      kmer: (...,) uint64 packed k-mers (canonical form, by convention).
      k: k-mer length (static).
      xp: numpy or jax.numpy.

    Returns:
      (..., k) uint64 bucket ids; bucket j corresponds to wildcard position j
      counted from the leftmost (highest-bit) base.
    """
    kmer = xp.asarray(kmer, dtype=xp.uint64)[..., None]
    shifts = (xp.uint64(2) * xp.arange(k - 1, -1, -1, dtype=xp.uint64))  # (k,)
    one = xp.uint64(1)
    bases = (kmer >> shifts) & xp.uint64(3)            # (..., k)
    cur = bases << shifts
    p = one << shifts
    val = kmer & (p - one)
    weights = xp.arange(k - 1, -1, -1, dtype=xp.uint64)  # k-1-i
    mu = xp.where(bases != 0, p + (cur >> xp.uint64(2)) * weights, val)
    sum_mu = xp.sum(mu, axis=-1, keepdims=True, dtype=xp.uint64)
    is_a = (bases == 0).astype(xp.uint64)
    num_a = xp.cumsum(is_a, axis=-1, dtype=xp.uint64) - is_a  # exclusive prefix
    return sum_mu - mu + val - num_a * cur + one + num_a


def filtered_bucket_positions(k: int, n_fixed: int, use_full_kmer: bool) -> list[int]:
    """Wildcard positions kept by the mapper's end-trim (call.rs:1291-1300).

    The reference slices buckets[n_fixed .. k - n_fixed - 1], i.e. it drops
    n_fixed positions at the front and n_fixed+1 at the back (asymmetric —
    replicated as-is for output parity). Returns [] when the trim would
    consume the whole k-mer, matching call.rs:1295-1296.
    """
    if use_full_kmer:
        return list(range(k))
    if n_fixed * 2 + 1 >= k:
        return []
    return list(range(n_fixed, k - n_fixed - 1))

"""2-bit nucleotide codec: packing, reverse-complement, canonicalization.

Semantics match the reference codec (src/lcb.rs:47-104):
  A/a=0, C/c=1, G/g=2, T/t=3; any other byte encodes as 0 ('A').
K-mers pack big-endian (first base in the highest bits), so numeric order of
the packed word equals lexicographic order of the string under A<C<G<T.
Canonical form is min(fwd, revcomp); the flag is True when the canonical form
is the reverse complement (i.e. fwd >= revcomp — odd k means no palindromes).

Every function here is written against an array-namespace argument `xp`
(numpy or jax.numpy) so the same math runs as the host oracle and inside jit.
All k-mer words are unsigned 64-bit; 2k <= 62 bits so no wrap occurs here.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "NT_TO_BITS",
    "BITS_TO_NT",
    "pack_kmer",
    "revcomp",
    "canonical",
    "seq_bytes_to_bits",
    "kmer_to_string",
]

# Byte-indexed lookup: A/a,C/c,G/g,T/t -> 0..3, everything else -> 0
# (reference maps unknown bases to 0 too: lcb.rs:53).
NT_TO_BITS = np.zeros(256, dtype=np.uint8)
for _c, _b in ((b"Aa", 0), (b"Cc", 1), (b"Gg", 2), (b"Tt", 3)):
    NT_TO_BITS[_c[0]] = _b
    NT_TO_BITS[_c[1]] = _b

# Separate validity lookup: the counters (like KMC) must *skip* k-mers
# containing a non-ACGT byte, while the index builder encodes them as 'A';
# io/fastq.py derives its 0..3-or-4 CODES table from these two.
NT_IS_VALID = np.zeros(256, dtype=np.bool_)
for _c in b"AaCcGgTt":
    NT_IS_VALID[_c] = True

BITS_TO_NT = np.frombuffer(b"ACGT", dtype=np.uint8)


def seq_bytes_to_bits(seq: bytes | np.ndarray) -> np.ndarray:
    """Host-side: map a byte sequence to 2-bit codes (invalid bytes -> 0)."""
    arr = np.frombuffer(seq, dtype=np.uint8) if isinstance(seq, (bytes, bytearray)) else np.asarray(seq, dtype=np.uint8)
    return NT_TO_BITS[arr]


def pack_kmer(bits, k: int, xp=np):
    """Pack (..., k) 2-bit base codes into uint64 words, first base highest.

    Matches kmer_to_u64 (lcb.rs:67-74).
    """
    bits = bits.astype(xp.uint64) if hasattr(bits, "astype") else xp.asarray(bits, dtype=xp.uint64)
    shifts = xp.arange(k - 1, -1, -1, dtype=xp.uint64) * xp.uint64(2)
    return xp.sum(bits << shifts, axis=-1, dtype=xp.uint64)


def revcomp(kmer, k: int, xp=np):
    """Reverse complement of packed k-mers (lcb.rs:76-85).

    Unrolled over k (static) so it vectorizes over the batch; each step keeps
    all intermediates < 2**62.
    """
    kmer = xp.asarray(kmer, dtype=xp.uint64)
    rc = xp.zeros_like(kmer)
    three = xp.uint64(3)
    for i in range(k):
        base = (kmer >> xp.uint64(2 * i)) & three
        rc = (rc << xp.uint64(2)) | (base ^ three)
    return rc


def canonical(kmer, k: int, xp=np):
    """Return (canonical_kmer, is_rc) matching canonical_kmer_u64 (lcb.rs:97-104).

    is_rc is True when fwd >= revcomp (ties impossible for odd k).
    """
    kmer = xp.asarray(kmer, dtype=xp.uint64)
    rc = revcomp(kmer, k, xp)
    is_rc = kmer >= rc
    return xp.where(is_rc, rc, kmer), is_rc


def kmer_to_string(kmer: int, k: int) -> str:
    """Host-side debug helper: unpack a packed k-mer to its string."""
    kmer = int(kmer)
    return "".join("ACGT"[(kmer >> (2 * (k - 1 - i))) & 3] for i in range(k))

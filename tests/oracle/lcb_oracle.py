"""Scalar Python oracle for the k-mer math layer.

A deliberately slow, step-by-step transcription of the reference semantics
(src/lcb.rs) used ONLY as a test oracle for the vectorized implementations in
bronko_tpu.ops. All arithmetic is mod 2^64 to mirror Rust release-mode u64.
"""

MASK64 = (1 << 64) - 1


def assign_buckets(kmer: int, k: int) -> list[int]:
    num_a = [0] * k
    val = [0] * k
    mu = [0] * k

    mask = 3 << ((k - 1) * 2)
    p = 1 << ((k - 1) * 2)
    cur = kmer & mask

    val[0] = (kmer - cur) & MASK64
    mu[0] = (p + ((cur >> 2) * (k - 1))) & MASK64 if cur != 0 else val[0]
    sum_mu = mu[0]

    for i in range(1, k):
        num_a[i] = num_a[i - 1] + (1 if cur == 0 else 0)
        mask >>= 2
        cur = kmer & mask
        p >>= 2
        val[i] = (val[i - 1] - cur) & MASK64
        mu[i] = (p + ((cur >> 2) * (k - i - 1))) & MASK64 if cur != 0 else val[i]
        sum_mu = (sum_mu + mu[i]) & MASK64

    buckets = [0] * k
    mask = 3 << ((k - 1) * 2)
    for i in range(k):
        cur = kmer & mask
        mask >>= 2
        buckets[i] = (sum_mu - mu[i] + val[i] - num_a[i] * cur + 1 + num_a[i]) & MASK64
    return buckets


def nt_to_bits(b: int) -> int:
    c = chr(b).upper()
    return {"A": 0, "C": 1, "G": 2, "T": 3}.get(c, 0)


def kmer_to_u64(kmer: bytes) -> int:
    val = 0
    for b in kmer:
        val = ((val << 2) | nt_to_bits(b)) & MASK64
    return val


def reverse_complement_u64(kmer_val: int, k: int) -> int:
    rc = 0
    for i in range(k):
        two_bits = (kmer_val >> (2 * i)) & 0b11
        rc = ((rc << 2) | (0b11 ^ two_bits)) & MASK64
    return rc


def canonical_kmer_u64(kmer: int, k: int) -> tuple[int, bool]:
    rev = reverse_complement_u64(kmer, k)
    if kmer < rev:
        return kmer, False
    return rev, True


def canonical_kmer(kmer: bytes, k: int) -> tuple[int, bool]:
    return canonical_kmer_u64(kmer_to_u64(kmer), k)

"""Golden + property tests for the bucket hash and codec (vs reference
unit vectors lcb.rs:147-154 and the scalar oracle)."""

import numpy as np
import pytest

from bronko_tpu.ops.buckets import assign_buckets, filtered_bucket_positions
from bronko_tpu.ops.codec import canonical, pack_kmer, revcomp, seq_bytes_to_bits
from tests.oracle import lcb_oracle

GOLDEN_19 = [
    238258108556, 47877379752, 215381104296, 227729135272, 235782198952,
    237342480040, 238258108557, 238236915369, 238248449705, 238254544553,
    238258108558, 238257944234, 238258089642, 238258095018, 238258106282,
    238258108559, 238258108483, 238258108525, 238258108547,
]


def test_golden_astring():
    out = assign_buckets(np.uint64(0), 4)
    assert out.tolist() == [1, 2, 3, 4]


def test_golden_19mer():
    out = assign_buckets(np.uint64(41547505179), 19)
    assert out.tolist() == GOLDEN_19


def test_vs_oracle_random():
    rng = np.random.default_rng(0)
    for k in (15, 19, 21, 31):
        kmers = rng.integers(0, 1 << (2 * k), size=64, dtype=np.uint64)
        vec = assign_buckets(kmers, k)
        for row, km in zip(vec, kmers.tolist()):
            assert row.tolist() == lcb_oracle.assign_buckets(km, k), (k, km)


def test_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    k = 21
    kmers = rng.integers(0, 1 << (2 * k), size=128, dtype=np.uint64)
    np_out = assign_buckets(kmers, k)
    jx_out = np.asarray(assign_buckets(jnp.asarray(kmers), k, xp=jnp))
    assert np.array_equal(np_out, jx_out)


def test_bucket_sharing_property():
    """Two k-mers differing at exactly one position share exactly that bucket."""
    rng = np.random.default_rng(2)
    k = 21
    for _ in range(20):
        km = int(rng.integers(0, 1 << (2 * k), dtype=np.uint64))
        pos = int(rng.integers(0, k))
        shift = 2 * (k - 1 - pos)
        old = (km >> shift) & 3
        new = (old + 1 + int(rng.integers(0, 3))) % 4
        if new == old:
            new = (old + 1) % 4
        km2 = (km & ~(3 << shift)) | (new << shift)
        b1 = assign_buckets(np.uint64(km), k)
        b2 = assign_buckets(np.uint64(km2), k)
        shared = (b1 == b2)
        assert shared[pos] and shared.sum() == 1


def test_codec_roundtrip_and_canonical():
    rng = np.random.default_rng(3)
    k = 21
    seqs = rng.integers(0, 4, size=(50, k))
    packed = pack_kmer(seqs, k)
    for row, km in zip(seqs, packed.tolist()):
        s = bytes(b"ACGT"[b] for b in row)
        assert lcb_oracle.kmer_to_u64(s) == km
    rc = revcomp(packed, k)
    for km, r in zip(packed.tolist(), rc.tolist()):
        assert lcb_oracle.reverse_complement_u64(km, k) == r
    canon, is_rc = canonical(packed, k)
    for km, c, f in zip(packed.tolist(), canon.tolist(), is_rc.tolist()):
        oc, of = lcb_oracle.canonical_kmer_u64(km, k)
        assert (oc, of) == (c, bool(f))
    # double revcomp is identity
    assert np.array_equal(revcomp(rc, k), packed)


def test_seq_bytes_to_bits_unknown_is_a():
    bits = seq_bytes_to_bits(b"ACGTNacgtn-X")
    assert bits.tolist() == [0, 1, 2, 3, 0, 0, 1, 2, 3, 0, 0, 0]


def test_filtered_positions():
    # reference trims 2 front / 3 back at defaults (call.rs:1298)
    assert filtered_bucket_positions(21, 2, False) == list(range(2, 18))
    assert filtered_bucket_positions(21, 0, True) == list(range(21))
    assert filtered_bucket_positions(15, 7, False) == []
    assert filtered_bucket_positions(15, 8, False) == []


@pytest.mark.parametrize("k", [15, 21, 31])
def test_wrap_consistency(k):
    """uint64 wrap in the vector path matches the mod-2^64 oracle (k=31 wraps)."""
    rng = np.random.default_rng(4)
    kmers = rng.integers(0, 1 << min(2 * k, 63), size=16, dtype=np.uint64)
    out = assign_buckets(kmers, k)
    for row, km in zip(out, kmers.tolist()):
        assert row.tolist() == lcb_oracle.assign_buckets(km, k)

"""Device k-mer counter vs a Python Counter oracle (KMC -b -ci -cs parity)."""

from collections import Counter

import numpy as np

from bronko_tpu.io.fastq import CODES, _encode_reads
from bronko_tpu.ops.count import KmerCounter
from tests.oracle.lcb_oracle import kmer_to_u64


def oracle_count(reads: list[bytes], k: int):
    counter = Counter()
    total = 0
    for r in reads:
        for i in range(max(0, len(r) - k + 1)):
            w = r[i:i + k]
            if all(chr(c) in "ACGTacgt" for c in w):
                counter[kmer_to_u64(w)] += 1
                total += 1
    return counter, total


def random_reads(rng, n, lmin=30, lmax=80, with_n=True):
    reads = []
    alphabet = b"ACGT" + (b"N" if with_n else b"")
    for _ in range(n):
        ln = int(rng.integers(lmin, lmax + 1))
        # skew towards duplicate reads so counts exceed 1
        if reads and rng.random() < 0.5:
            reads.append(reads[rng.integers(len(reads))])
        else:
            reads.append(bytes(rng.choice(np.frombuffer(alphabet, np.uint8),
                                          size=ln, p=None)))
    return reads


def test_counter_matches_oracle():
    rng = np.random.default_rng(11)
    k = 21
    reads = random_reads(rng, 300)
    expected, total = oracle_count(reads, k)

    counter = KmerCounter(k, min_count=3)
    # split into chunks to exercise the host merge
    for lo in range(0, len(reads), 100):
        chunk = reads[lo:lo + 100]
        codes, lengths = _encode_reads(chunk)
        counter.add_chunk(codes, lengths, len(chunk))
    kmers, counts = counter.finalize()

    assert counter.stats.total_reads == len(reads)
    assert counter.stats.total_kmers == total
    assert counter.stats.unique_kmers == len(expected)
    exp_kept = {km: c for km, c in expected.items() if c >= 3}
    assert counter.stats.unique_counted_kmers == len(exp_kept)
    got = dict(zip(kmers.tolist(), counts.tolist()))
    assert got == exp_kept


def test_counter_count_cap():
    k = 15
    read = b"A" * 40
    counter = KmerCounter(k, min_count=1, count_cap=10)
    codes, lengths = _encode_reads([read] * 5)
    counter.add_chunk(codes, lengths, 5)
    kmers, counts = counter.finalize()
    assert kmers.tolist() == [0]
    assert counts.tolist() == [10]  # capped (26 windows * 5 reads -> 10)


def test_encode_reads_layout():
    codes, lengths = _encode_reads([b"ACGTN", b"tt"])
    assert lengths.tolist() == [5, 2]
    assert codes[0, :5].tolist() == [0, 1, 2, 3, 4]
    assert codes[1, :2].tolist() == [3, 3]
    assert (codes[1, 2:] == 4).all()
    assert CODES[ord("G")] == 2


def test_pallas_pack_matches_xla():
    """Pallas window-pack kernel (interpret mode on CPU) vs the XLA path."""
    import jax
    import jax.numpy as jnp

    from bronko_tpu.ops.count import _pack_windows_xla
    from bronko_tpu.ops import pallas_pack

    rng = np.random.default_rng(3)
    k = 21
    codes = rng.integers(0, 6, size=(64, 96)).astype(np.uint8)  # some invalid
    lengths = rng.integers(10, 96, size=64).astype(np.int32)

    acc_x, valid_x = jax.jit(lambda c, l: _pack_windows_xla(c, l, k))(
        jnp.asarray(codes), jnp.asarray(lengths))

    # interpret mode so the kernel runs on CPU in tests
    import functools
    from unittest import mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        kmers_p, valid_p = pallas_pack.pack_windows_pallas(
            jnp.asarray(codes), jnp.asarray(lengths), k)

    assert np.array_equal(np.asarray(valid_x), np.asarray(valid_p))
    vx = np.asarray(valid_x)
    assert np.array_equal(np.asarray(acc_x)[vx], np.asarray(kmers_p)[vx])


def test_counter_reads_shorter_than_k():
    """A chunk whose padded width is below k yields zero k-mers (KMC
    semantics), not a negative-window trace error."""
    import numpy as np

    from bronko_tpu.ops.count import KmerCounter

    counter = KmerCounter(31, 1)
    codes = np.full((4, 16), 4, np.uint8)
    codes[:, :10] = 0
    counter.add_chunk(codes, np.full(4, 10, np.int32), 4)
    kmers, counts = counter.finalize()
    assert kmers.size == 0
    assert counter.stats.total_reads == 4
    assert counter.stats.total_kmers == 0


def test_python_fastq_parser_rejects_malformed(tmp_path):
    """The Python fallback parser must reject desynchronizing inputs (the
    native reader already does) instead of silently corrupting counts."""
    import pytest

    from bronko_tpu.io.fastq import read_fastq_chunks

    bad_header = tmp_path / "h.fastq"
    bad_header.write_text("@a\nACGT\n+\nIIII\nnothdr\nACGT\n+\nIIII\n")
    with pytest.raises(ValueError):
        list(read_fastq_chunks(str(bad_header)))

    bad_plus = tmp_path / "p.fastq"
    bad_plus.write_text("@a\nACGT\nIIII\n+\n")  # qual/plus swapped
    with pytest.raises(ValueError):
        list(read_fastq_chunks(str(bad_plus)))


def test_device_counter_all_invalid_reads():
    """Chunks that yield ZERO valid k-mers (all-N / shorter-than-k reads)
    must finalize to empty arrays, not crash on the boundary seed."""
    from bronko_tpu.ops.count import KmerCounter

    c = KmerCounter(21, 3)
    codes = np.full((8, 32), 4, np.uint8)  # every base non-ACGT
    lengths = np.full(8, 30, np.int32)
    c.add_chunk(codes, lengths, 8)
    kmers, counts = c.finalize()
    assert kmers.size == 0 and counts.size == 0
    assert c.stats.total_reads == 8 and c.stats.unique_counted_kmers == 0

"""Device-side index build vs the host builder: bit-identical arrays.

The device builder (index/device_build.py) must reproduce EXACTLY what
build_index + build_device_index produce — keys (modulo class padding),
offsets, postings (values AND order), and the histogram formats — since the
whole parity chain (oracle tests, golden VCFs) anchors on the host arrays.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from bronko_tpu.index.build import build_index
from bronko_tpu.index.device_build import build_device_index_on_device, device_build
from bronko_tpu.index.layout import build_device_index
from tests.make_synthetic import make_genome, write_fasta


def _write_panel(tmp_path, rng, n_files, seqs_per_file=1, length=260,
                 divergence=10):
    base = make_genome(rng, length)
    paths = []
    for g in range(n_files):
        p = tmp_path / f"g{g:03d}.fasta"
        with open(p, "w") as fh:
            for s in range(seqs_per_file):
                gen = bytearray(base if s == 0 else make_genome(rng, length - 40 * s))
                for q in rng.integers(0, len(gen), divergence):
                    gen[q] = b"ACGT"[rng.integers(4)]
                fh.write(f">g{g}s{s}\n{bytes(gen).decode()}\n")
        paths.append(str(p))
    return paths


def _assert_equal_indexes(host_dev, dev, label):
    U = int(np.searchsorted(np.asarray(dev.keys),
                            np.uint64(0xFFFFFFFFFFFFFFFF)))
    hk = np.asarray(host_dev.keys)
    assert U == hk.shape[0], f"{label}: unique count"
    assert np.array_equal(np.asarray(dev.keys)[:U], hk), f"{label}: keys"
    ho = np.asarray(host_dev.offsets)
    do = np.asarray(dev.offsets)
    assert np.array_equal(do[:U + 1], ho), f"{label}: offsets"
    # padded rows must be empty
    assert np.all(do[U:] == do[-1]), f"{label}: pad offsets"
    assert np.array_equal(np.asarray(dev.postings),
                          np.asarray(host_dev.postings)), f"{label}: postings"
    if host_dev.postings_local32 is not None:
        assert dev.postings_local32 is not None
        assert np.array_equal(np.asarray(dev.postings_local32),
                              np.asarray(host_dev.postings_local32)), \
            f"{label}: postings_local32"
    assert dev.fid_grouped
    if host_dev.hist is not None:
        assert dev.hist is not None and dev.hist.dtype == host_dev.hist.dtype
        assert np.array_equal(np.asarray(dev.hist)[:U],
                              np.asarray(host_dev.hist)), f"{label}: hist"
        assert np.all(np.asarray(dev.hist)[U:] == 0), f"{label}: pad hist"
    if host_dev.hist_words is not None:
        assert dev.hist_words is not None
        assert np.array_equal(np.asarray(dev.hist_words)[:U],
                              np.asarray(host_dev.hist_words)), f"{label}: words"
    assert dev.total_len == host_dev.total_len
    assert dev.max_bucket == host_dev.max_bucket
    assert np.array_equal(dev.genome_lens, host_dev.genome_lens)
    assert np.array_equal(dev.file_bases, host_dev.file_bases)
    assert [(s.file_id, s.seq_id, s.name, s.offset, s.length)
            for s in dev.seq_slices] == \
           [(s.file_id, s.seq_id, s.name, s.offset, s.length)
            for s in host_dev.seq_slices]


@pytest.mark.parametrize("n_files,seqs", [(1, 1), (4, 1), (4, 3), (13, 2)])
def test_device_build_matches_host(tmp_path, n_files, seqs):
    rng = np.random.default_rng(100 + n_files * 10 + seqs)
    paths = _write_panel(tmp_path, rng, n_files, seqs)
    host_index = build_index(21, paths)
    host_dev = build_device_index(host_index)
    index, dev = build_device_index_on_device(21, paths)
    _assert_equal_indexes(host_dev, dev, f"{n_files}x{seqs}")
    assert [f.name for f in index.files] == [f.name for f in host_index.files]


def test_device_build_short_and_n_sequences(tmp_path):
    """Sequences shorter than k are skipped; non-ACGT bytes index as 'A'
    (host parity, build.rs nt_to_bits semantics)."""
    rng = np.random.default_rng(7)
    p = tmp_path / "mix.fasta"
    with open(p, "w") as fh:
        fh.write(">tiny\nACGTACGT\n")                     # < k, skipped
        fh.write(f">real\n{make_genome(rng, 200).decode()}\n")
        fh.write(f">withn\n{'ACGTN' * 50}\n")             # N -> 'A'
    host_dev = build_device_index(build_index(21, [str(p)]))
    _, dev = build_device_index_on_device(21, [str(p)])
    _assert_equal_indexes(host_dev, dev, "mix")


def test_device_build_from_loaded_bkdb(tmp_path):
    """A loaded .bkdb (host arrays present) can be device-rebuilt from its
    embedded sequences; the result matches the host layout."""
    from bronko_tpu.index.store import load_index, save_index

    rng = np.random.default_rng(9)
    paths = _write_panel(tmp_path, rng, 3)
    index = build_index(21, paths)
    save_index(str(tmp_path / "x.bkdb"), index)
    loaded = load_index(str(tmp_path / "x.bkdb"), expect_k=21)
    host_dev = build_device_index(loaded)
    dev = device_build(loaded)
    _assert_equal_indexes(host_dev, dev, "bkdb")


def test_device_build_engine_end_to_end(tmp_path):
    """run_call on a device-built index must produce the same VCF as on the
    host-built index."""
    import os

    from bronko_tpu.call.engine import run_call
    from bronko_tpu.config import CallConfig
    from tests.make_synthetic import make_sample, write_fastq

    rng = np.random.default_rng(12)
    paths = _write_panel(tmp_path, rng, 4, length=1200, divergence=30)
    truth = open(paths[2]).read().split("\n", 1)[1].replace("\n", "").encode()
    reads, _ = make_sample(truth, rng, read_len=80, depth=120,
                           major_positions={400: 0.9}, minor_positions={})
    fq = str(tmp_path / "r.fastq.gz")
    write_fastq(fq, reads)

    host_index = build_index(21, paths)
    host_dev = build_device_index(host_index)
    out_h = str(tmp_path / "oh")
    run_call(CallConfig(genomes=paths, reads=[fq], output=out_h,
                        batch_size=2048, chunk_reads=4096), host_index, host_dev)

    index, dev = build_device_index_on_device(21, paths)
    out_d = str(tmp_path / "od")
    run_call(CallConfig(genomes=paths, reads=[fq], output=out_d,
                        batch_size=2048, chunk_reads=4096), index, dev)
    for fname in ("r.vcf", "bronko_overview.tsv"):
        assert open(os.path.join(out_d, fname)).read() == \
            open(os.path.join(out_h, fname)).read(), fname

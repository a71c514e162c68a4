"""End-to-end tests on the real reference fixtures (HPV16, SARS-CoV-2)."""

import os

import numpy as np
import pytest

from bronko_tpu.call.engine import run_call
from bronko_tpu.config import CallConfig
from bronko_tpu.index.build import build_index
from bronko_tpu.index.layout import build_device_index
from tests.make_synthetic import make_sample, write_fastq

FIXTURES = "/root/reference/test_data"
pytestmark = pytest.mark.skipif(not os.path.isdir(FIXTURES), reason="no fixtures")


def _genome_bytes(path):
    from bronko_tpu.io.fasta import read_fasta

    return read_fasta(path)[0].seq.upper()


def test_hpv16_end_to_end(tmp_path):
    ref = os.path.join(FIXTURES, "HPV16.fa")
    genome = _genome_bytes(ref)
    rng = np.random.default_rng(33)
    majors = {1000: 0.9, 4000: 0.85}
    minors = {2500: 0.12}
    reads, alts = make_sample(genome, rng, read_len=100, depth=700,
                              major_positions=majors, minor_positions=minors,
                              error_rate=0.003)
    fq = str(tmp_path / "hpv_sample.fastq.gz")
    write_fastq(fq, reads)
    out = str(tmp_path / "out")
    cfg = CallConfig(genomes=[ref], reads=[fq], output=out,
                     batch_size=1 << 15, chunk_reads=1 << 14)
    index = build_index(cfg.kmer, [ref])
    dev = build_device_index(index)
    summaries = run_call(cfg, index, dev)
    s = summaries[0]
    assert s.selected_genome == "HPV16"
    assert s.stats.breadth > 0.95
    vcf = open(os.path.join(out, "hpv_sample.vcf")).read()
    rows = [l for l in vcf.splitlines() if not l.startswith("#")]
    positions = {int(r.split("\t")[1]) for r in rows}
    for p, alt in alts.items():
        if p in (1000, 4000):  # majors must be recovered
            assert p + 1 in positions, (p, positions)
    # the right alt bases
    by_pos = {int(r.split("\t")[1]): r.split("\t")[4] for r in rows}
    for p in (1000, 4000):
        assert by_pos[p + 1] == chr(alts[p])


def test_sars2_strain_selection(tmp_path):
    """Reads generated from one strain must select that strain out of the
    4-genome panel."""
    d = os.path.join(FIXTURES, "4_sarscov2")
    paths = sorted(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".fasta"))
    assert len(paths) == 4
    rng = np.random.default_rng(44)
    # pick a non-reference strain as the truth
    truth_path = paths[1]
    genome = _genome_bytes(truth_path)
    reads, _ = make_sample(genome, rng, read_len=100, depth=40)
    fq = str(tmp_path / "s2.fastq.gz")
    write_fastq(fq, reads)
    out = str(tmp_path / "out")
    cfg = CallConfig(genomes=paths, reads=[fq], output=out,
                     batch_size=1 << 15, chunk_reads=1 << 14)
    index = build_index(cfg.kmer, paths)
    dev = build_device_index(index)
    summaries = run_call(cfg, index, dev)
    expected_name = os.path.splitext(os.path.basename(truth_path))[0]
    assert summaries[0].selected_genome == expected_name
    # near-zero variants against the matching strain
    assert summaries[0].stats.num_major <= 2
    assert summaries[0].stats.breadth > 0.9


def test_reference_bkdb_compat(tmp_path):
    """The reference binary's own bincode hpv.bkdb loads bit-identically to
    an index built from the same FASTA, and drives a full call."""
    from bronko_tpu.index.store import load_index

    db = os.path.join(FIXTURES, "hpv.bkdb")
    idx = load_index(db)
    assert idx.k == 21
    ours = build_index(21, [os.path.join(FIXTURES, "HPV16.fa")])
    assert np.array_equal(idx.keys, ours.keys)
    assert np.array_equal(idx.post_loc, ours.post_loc)
    assert np.array_equal(idx.post_meta, ours.post_meta)
    assert idx.files[0].sequences[0].seq == ours.files[0].sequences[0].seq

    with pytest.raises(ValueError, match="Database k"):
        load_index(db, expect_k=19)

    genome = idx.files[0].sequences[0].seq.upper()
    rng = np.random.default_rng(7)
    reads, alts = make_sample(genome, rng, read_len=100, depth=50,
                              major_positions={3000: 0.9})
    fq = str(tmp_path / "h.fastq.gz")
    write_fastq(fq, reads)
    out = str(tmp_path / "out")
    cfg = CallConfig(db=db, reads=[fq], output=out,
                     batch_size=1 << 15, chunk_reads=1 << 14)
    dev = build_device_index(idx)
    summaries = run_call(cfg, idx, dev)
    assert summaries[0].selected_genome == "HPV16"
    vcf = open(os.path.join(out, "h.vcf")).read()
    assert "\t3001\t" in vcf


def test_reference_bkdb_writer_roundtrip(tmp_path):
    """save_reference_bkdb is load_reference_bkdb's inverse on the REAL
    reference fixture: load the reference binary's hpv.bkdb, re-emit it
    in bincode, reload, and every array + metadata field must be
    identical (byte-identity with the original file is NOT expected —
    the reference serializes hashmap iteration order; we emit sorted
    keys, which its HashMap deserialization is indifferent to)."""
    from bronko_tpu.index.bincode_compat import (
        load_reference_bkdb, save_reference_bkdb, sniff_format,
    )

    idx = load_reference_bkdb(os.path.join(FIXTURES, "hpv.bkdb"))
    out = str(tmp_path / "rt.bkdb")
    save_reference_bkdb(idx, out)
    assert sniff_format(out) == "bincode"
    idx2 = load_reference_bkdb(out)
    assert idx2.k == idx.k
    assert np.array_equal(idx2.keys, idx.keys)
    assert np.array_equal(idx2.offsets, idx.offsets)
    assert np.array_equal(idx2.post_loc, idx.post_loc)
    assert np.array_equal(idx2.post_meta, idx.post_meta)
    assert [f.name for f in idx2.files] == [f.name for f in idx.files]
    for f2, f1 in zip(idx2.files, idx.files):
        for s2, s1 in zip(f2.sequences, f1.sequences):
            assert (s2.name, s2.length, bytes(s2.seq)) == \
                   (s1.name, s1.length, bytes(s1.seq))

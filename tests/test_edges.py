"""Edge cases: lowercase/N bases, short reads, empty input, segmented genomes."""

import gzip
import os

import numpy as np
import pytest

from bronko_tpu.call.engine import run_call
from bronko_tpu.config import CallConfig
from bronko_tpu.index.build import build_index
from bronko_tpu.index.layout import build_device_index
from tests.make_synthetic import make_genome, make_sample, write_fastq
from tests.oracle.lcb_oracle import kmer_to_u64


def small_cfg(**kw):
    kw.setdefault("batch_size", 4096)
    kw.setdefault("chunk_reads", 4096)
    return CallConfig(**kw)


def test_lowercase_and_n_genome(tmp_path):
    """Lowercase bases index like uppercase; N encodes as 'A' in the index
    (reference nt_to_bits behavior) and survives to the pileup ref column."""
    rng = np.random.default_rng(1)
    g_upper = make_genome(rng, 400)
    g_mixed = bytearray(g_upper.lower())
    g_mixed[100] = ord("N")
    ref = tmp_path / "low.fasta"
    ref.write_text(">low\n" + bytes(g_mixed).decode() + "\n")

    idx_mixed = build_index(21, [str(ref)])
    ref_u = tmp_path / "up.fasta"
    g_u = bytearray(g_upper)
    g_u[100] = ord("A")  # N -> A equivalence
    ref_u.write_text(">low\n" + bytes(g_u).decode() + "\n")
    idx_upper = build_index(21, [str(ref_u)])
    assert np.array_equal(idx_mixed.keys, idx_upper.keys)
    assert np.array_equal(idx_mixed.post_meta, idx_upper.post_meta)

    # calling against the mixed-case genome still works end-to-end
    reads, _ = make_sample(g_upper.replace(b"N", b"A") if b"N" in g_upper else bytes(g_u),
                           rng, read_len=60, depth=50)
    fq = str(tmp_path / "r.fastq.gz")
    write_fastq(fq, reads)
    out = str(tmp_path / "out")
    cfg = small_cfg(genomes=[str(ref)], reads=[fq], output=out, output_pileup=True)
    idx = build_index(21, [str(ref)])
    summaries = run_call(cfg, idx, build_device_index(idx))
    assert summaries[0].stats.breadth > 0.8
    # pileup TSV preserves the raw (lowercase/N) ref column
    tsv = open(os.path.join(out, "r.tsv")).read().splitlines()
    assert tsv[101].split("\t")[2] == bytes(g_mixed[100:101]).decode()
    assert tsv[1].split("\t")[2].islower()


def test_reads_shorter_than_k_and_empty(tmp_path):
    rng = np.random.default_rng(2)
    genome = make_genome(rng, 300)
    ref = tmp_path / "g.fasta"
    ref.write_text(">g\n" + genome.decode() + "\n")
    # reads shorter than k contribute nothing; one long read maps
    short = [b"ACGTT", b"A" * 10, genome[50:150]]
    fq = str(tmp_path / "s.fastq.gz")
    with gzip.open(fq, "wt") as fh:
        for i, r in enumerate(short * 40):
            fh.write(f"@r{i}\n{r.decode()}\n+\n{'I' * len(r)}\n")
    out = str(tmp_path / "out")
    cfg = small_cfg(genomes=[str(ref)], reads=[fq], output=out)
    idx = build_index(21, [str(ref)])
    summaries = run_call(cfg, idx, build_device_index(idx))
    assert summaries[0].n_perfect > 0

    # an empty fastq is isolated (no genome pickable), not a crash of the batch
    empty = str(tmp_path / "e.fastq.gz")
    with gzip.open(empty, "wt") as fh:
        pass
    out2 = str(tmp_path / "out2")
    cfg2 = small_cfg(genomes=[str(ref)], reads=[empty, fq], output=out2)
    summaries2 = run_call(cfg2, idx, build_device_index(idx))
    assert len(summaries2) == 1


def test_segmented_genome_end_to_end(tmp_path):
    """Multi-sequence (segmented virus) genome: per-contig VCF entries and
    contig headers."""
    rng = np.random.default_rng(3)
    seg1 = make_genome(rng, 500)
    seg2 = make_genome(rng, 350)
    ref = tmp_path / "seg.fasta"
    ref.write_text(f">seg1 descr\n{seg1.decode()}\n>seg2\n{seg2.decode()}\n")

    # plant a major on each segment
    full = {0: seg1, 1: seg2}
    reads = []
    alts = {}
    for sid, seq in full.items():
        p = 200 if sid == 0 else 100
        mut = bytearray(seq)
        old = mut[p]
        mut[p] = next(c for c in b"ACGT" if c != old)
        alts[(sid, p)] = chr(mut[p])
        r1, _ = make_sample(bytes(mut), rng, read_len=80, depth=60)
        reads.extend(r1)
    fq = str(tmp_path / "seg.fastq.gz")
    write_fastq(fq, reads)
    out = str(tmp_path / "out")
    cfg = small_cfg(genomes=[str(ref)], reads=[fq], output=out)
    idx = build_index(21, [str(ref)])
    summaries = run_call(cfg, idx, build_device_index(idx))
    vcf = open(os.path.join(out, "seg.vcf")).read()
    assert "##contig=<ID=seg1,length=500>" in vcf
    assert "##contig=<ID=seg2,length=350>" in vcf
    rows = [l.split("\t") for l in vcf.splitlines() if not l.startswith("#")]
    found = {(r[0], int(r[1])): r[4] for r in rows}
    assert found.get(("seg1", 201)) == alts[(0, 200)]
    assert found.get(("seg2", 101)) == alts[(1, 100)]


@pytest.mark.parametrize("k", [15, 31])
def test_k_range_end_to_end(tmp_path, k):
    """Smallest and largest supported k through the full engine (k=31
    exercises 62-bit k-mers and u64 bucket wrap-around)."""
    rng = np.random.default_rng(40 + k)
    genome = make_genome(rng, 600)
    ref = tmp_path / "g.fasta"
    ref.write_text(">g\n" + genome.decode() + "\n")
    mut = bytearray(genome)
    p = 300
    mut[p] = next(c for c in b"ACGT" if c != mut[p])
    reads, _ = make_sample(bytes(mut), rng, read_len=70, depth=60)
    fq = str(tmp_path / "r.fastq.gz")
    write_fastq(fq, reads)
    out = str(tmp_path / f"out{k}")
    cfg = small_cfg(genomes=[str(ref)], reads=[fq], output=out, kmer=k)
    idx = build_index(k, [str(ref)])
    summaries = run_call(cfg, idx, build_device_index(idx))
    vcf = open(os.path.join(out, "r.vcf")).read()
    assert f"\t{p + 1}\t" in vcf
    assert summaries[0].stats.num_major >= 1

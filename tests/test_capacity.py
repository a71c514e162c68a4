"""Capacity-boundary tests (VERDICT r1 item 9): panels past 256 genomes and
files past 256 contigs — the README's "hundreds of strains x hundreds of
samples" claim exercised at the boundaries, beyond the reference's u8
seq_id ceiling (build.rs:55)."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
import pytest

from bronko_tpu.call.engine import run_call
from bronko_tpu.config import CallConfig
from bronko_tpu.index.build import build_index
from bronko_tpu.index.layout import build_device_index
from bronko_tpu.index.model import SEQ_MASK, pack_meta
from tests.make_synthetic import make_genome, make_sample, write_fasta, write_fastq


def test_300_strain_panel_tally_and_engine(tmp_path):
    """G=300 > 256: the multi-word histogram must build (38 words/bucket),
    agree with the flat expansion, and the engine must pick the right
    strain end-to-end."""
    from bronko_tpu.ops.map import tally_all_jit

    rng = np.random.default_rng(41)
    base = make_genome(rng, 150)
    paths = []
    for g in range(300):
        gen = bytearray(base)
        for p in rng.integers(0, len(base), 6):  # ~4% divergence per strain
            gen[p] = b"ACGT"[rng.integers(4)]
        p_ = tmp_path / f"s{g:03d}.fasta"
        write_fasta(str(p_), f"s{g:03d}", bytes(gen))
        paths.append(str(p_))

    index = build_index(21, paths)
    dev = build_device_index(index)
    assert dev.hist is None and dev.hist_words is not None
    assert dev.hist_words.shape[1] == -(-300 // 8)  # 38 words

    # tallies: words path == flat path on a mixed batch
    truth = open(paths[123]).read().split("\n", 1)[1].replace("\n", "").encode()
    reads, _ = make_sample(truth, rng, read_len=80, depth=40)
    fq = str(tmp_path / "r.fastq.gz")
    write_fastq(fq, reads)

    from bronko_tpu.call.engine import _prepare_batches, count_sample

    cfg = CallConfig(db="x", reads=[fq], output=str(tmp_path / "out"),
                     batch_size=1024, chunk_reads=4096)
    kmers, counts, _ = count_sample(fq, cfg, 21)
    kj, cj = _prepare_batches(kmers, counts, 1024)
    mcfg = dev.map_config(2, False)
    t0 = jnp.zeros((300, 3), jnp.int32)
    t_words, _ = tally_all_jit(kj, cj, dev.keys, dev.offsets, dev.postings,
                               dev.hist_words, t0, mcfg, "words")
    # flat path needs the overflow-retry loop here: ~300 postings per hit
    # bucket blow the default lane factor by design
    from dataclasses import replace

    fcfg = mcfg
    while True:
        t1 = jnp.zeros((300, 3), jnp.int32)
        t_flat, ov = tally_all_jit(kj, cj, dev.keys, dev.offsets, dev.postings,
                                   jnp.zeros(1, jnp.int64), t1, fcfg, "flat")
        if not int(ov):
            break
        fcfg = replace(fcfg, lane_factor=fcfg.lane_factor * 2)
    assert np.array_equal(np.asarray(t_words), np.asarray(t_flat))

    summaries = run_call(cfg, index, dev)
    assert summaries[0].selected_genome == "s123"


def test_300_contig_file_engine(tmp_path):
    """One file with 300 sequences (> the reference's 256 u8 ceiling):
    10-bit seq ids must attribute postings correctly through build, layout,
    and an end-to-end call."""
    rng = np.random.default_rng(43)
    contigs = [(f"ctg{i:03d}", make_genome(rng, 140)) for i in range(300)]
    fa = tmp_path / "assembly.fasta"
    with open(fa, "w") as fh:
        for name, seq in contigs:
            fh.write(f">{name}\n{seq.decode()}\n")

    index = build_index(21, [str(fa)])
    assert len(index.files[0].sequences) == 300
    dev = build_device_index(index)
    # the last contig's postings must carry seq_id 299 (u8 would wrap to 43)
    from bronko_tpu.index.model import SEQ_SHIFT

    seq_ids = (index.post_meta >> SEQ_SHIFT) & SEQ_MASK
    assert int(seq_ids.max()) == 299

    # reads drawn from contig 299 must pile up at its slice
    reads, _ = make_sample(contigs[299][1], rng, read_len=70, depth=50,
                           major_positions={60: 0.95}, minor_positions={})
    fq = str(tmp_path / "c.fastq.gz")
    write_fastq(fq, reads)
    out = str(tmp_path / "out")
    cfg = CallConfig(db="x", reads=[fq], output=out,
                     batch_size=1024, chunk_reads=4096)
    summaries = run_call(cfg, index, dev)
    assert summaries[0].n_perfect > 0
    vcf = open(os.path.join(out, "c.vcf")).read()
    rows = [l for l in vcf.splitlines() if not l.startswith("#")]
    assert rows and all(r.split("\t")[0] == "ctg299" for r in rows)
    assert any(int(r.split("\t")[1]) == 61 for r in rows)  # planted major


def test_seq_limit_enforced(tmp_path):
    rng = np.random.default_rng(44)
    fa = tmp_path / "big.fasta"
    with open(fa, "w") as fh:
        for i in range(SEQ_MASK + 2):
            fh.write(f">c{i}\n{'ACGT' * 8}\n")
    with pytest.raises(ValueError, match="sequences"):
        build_index(21, [str(fa)])


def test_v1_bkdb_meta_conversion(tmp_path):
    """A v1 .bkdb (8-bit seq ids) must load with post_meta repacked into the
    v2 layout."""
    import io
    import json
    import zlib

    from bronko_tpu.index.store import MAGIC_V1, load_index

    # one posting: idx=3, seq=200, file=7, canon=1 in the OLD layout
    old_meta = np.asarray([3 | (200 << 5) | (7 << 13) | (1 << 29)], np.uint32)
    meta = {"magic": MAGIC_V1, "k": 21,
            "files": [{"name": "f", "seq_names": ["s"], "seq_lens": [4]}]}
    path = str(tmp_path / "old.bkdb")
    with open(path, "wb") as fh:
        np.savez(
            fh,
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
            keys=np.asarray([5], np.uint64),
            offsets=np.asarray([0, 1], np.int64),
            post_loc=np.asarray([9], np.uint32),
            post_meta=old_meta,
            seq_blob=np.frombuffer(zlib.compress(b"ACGT"), dtype=np.uint8),
        )
    idx = load_index(path, expect_k=21)
    assert idx.post_meta[0] == pack_meta(3, 200, 7, 1)

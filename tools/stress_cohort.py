"""Hundreds-of-samples cohort stress (VERDICT r4 item 5).

The reference claims "hundreds of strains against hundreds of samples"
(README.md:12); the engine's capacity tests cover 300 strains but the
largest cohort previously run end-to-end was 15 samples. This tool runs
a 100+ sample cohort through the REAL prefetch pipeline (bounded count
submission, inflate-ahead budget, <=2 in-flight pileups, per-sample
isolation) plus overview and alignment at scale, and reports peak RSS +
throughput so unbounded growth is visible.

Usage:
    python tools/stress_cohort.py [n_samples] [reads_per_sample]
        (defaults 120 x 3000; BRONKO_PLATFORM=cpu for the bounds check,
         unset for the TPU timing point)

Prints one JSON line:
    {"n_samples": N, "reads": R, "wall_s": W, "reads_per_sec": ...,
     "peak_rss_mb": ..., "rss_before_mb": ..., "n_ok": ...,
     "overview_rows": ..., "alignments": [...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def rss_mb(field: str = "VmRSS") -> float:
    with open("/proc/self/status") as fh:
        for ln in fh:
            if ln.startswith(field):
                return int(ln.split()[1]) / 1024.0
    return -1.0


def main() -> None:
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    reads_per = int(sys.argv[2]) if len(sys.argv) > 2 else 3000

    import tempfile

    from tests.make_synthetic import (
        make_genome, make_sample, write_fasta, write_fastq,
    )

    tmp = tempfile.mkdtemp(prefix="bronko_stress_")
    rng = np.random.default_rng(0)

    # 3 genomes so the alignment builder has groups; samples rotate over
    # them with planted majors so breadth >= 0.9 and >= 3 samples/genome
    genomes = []
    fasta_paths = []
    for g in range(3):
        seq = make_genome(rng, 1200 + 100 * g)
        p = os.path.join(tmp, f"g{g}.fasta")
        write_fasta(p, f"seq{g}", seq)
        genomes.append(seq)
        fasta_paths.append(p)

    t_gen0 = time.time()
    fq_paths = []
    total_reads = 0
    depth = reads_per * 100 // 1200  # read_len 100
    for s in range(n_samples):
        src = s % 3
        L = len(genomes[src])
        majors = {int(q): 0.9 for q in
                  rng.integers(60, L - 60, 2 + (s % 3))}
        reads, _ = make_sample(genomes[src], rng, read_len=100,
                               depth=depth, major_positions=majors,
                               minor_positions={}, error_rate=0.003)
        p = os.path.join(tmp, f"s{s:03d}.fastq.gz")
        write_fastq(p, reads)
        fq_paths.append(p)
        total_reads += len(reads)
    gen_s = time.time() - t_gen0

    import bronko_tpu  # noqa: F401
    from bronko_tpu.call.engine import run_call
    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index

    out_dir = os.path.join(tmp, "out")
    cfg = CallConfig(genomes=fasta_paths, reads=fq_paths, output=out_dir,
                     output_alignment=True)
    index = build_index(cfg.kmer, fasta_paths)
    dev = build_device_index(index)

    rss0 = rss_mb()
    t0 = time.time()
    summaries = run_call(cfg, index, dev)
    wall = time.time() - t0
    peak = rss_mb("VmHWM")

    with open(os.path.join(out_dir, "bronko_overview.tsv")) as fh:
        overview_rows = sum(1 for _ in fh) - 1
    alignments = sorted(f for f in os.listdir(out_dir)
                        if f.endswith(".mfa"))
    n_vcfs = sum(1 for f in os.listdir(out_dir) if f.endswith(".vcf"))

    print(json.dumps({
        "n_samples": n_samples,
        "reads_per_sample": reads_per,
        "gen_s": round(gen_s, 1),
        "n_ok": len(summaries),
        "n_vcfs": n_vcfs,
        "overview_rows": overview_rows,
        "alignments": alignments,
        "total_reads": total_reads,
        "wall_s": round(wall, 2),
        "reads_per_sec": round(total_reads / wall, 1),
        "per_sample_s": round(wall / max(len(summaries), 1), 3),
        "rss_before_mb": round(rss0, 1),
        "peak_rss_mb": round(peak, 1),
        "platform": __import__("jax").devices()[0].platform,
    }))


if __name__ == "__main__":
    main()

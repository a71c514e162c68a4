"""Internal perf tool: sustained cohort throughput on the real TPU.

The headline bench (bench.py) runs a 3-sample cohort, which still pays
the pipeline-fill cost (the first sample's host count sits on the
critical path) across a third of its samples. This tool times a larger
cohort (3 distinct deep-coverage samples x N copies under distinct
names, so every sample counts from its own file) to measure the
steady-state reads/s the prefetch pipeline sustains once filled.

Usage: python tools/bench_cohort_tpu.py [n_copies=3]  (needs the TPU)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import bench

    genome_paths, fastqs = bench._ensure_data()

    cohort = []
    for c in range(n_copies):
        for s, fq in enumerate(fastqs):
            p = os.path.join(bench.CACHE, f"cohort_{c}_{s}.fastq.gz")
            if not os.path.exists(p):
                shutil.copy(fq, p)
            cohort.append(p)

    import jax

    from bronko_tpu.call.engine import run_call
    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index

    print(json.dumps({"backend": jax.default_backend(),
                      "n_samples": len(cohort)}), flush=True)
    index = build_index(21, genome_paths)
    dev = build_device_index(index)
    cfg = CallConfig(db="bench", reads=cohort,
                     output=os.path.join(bench.CACHE, "out_cohort"))

    run_call(CallConfig(db="bench", reads=cohort[:3],
                        output=cfg.output), index, dev)  # jit warm
    times = []
    for _ in range(2):
        t0 = time.time()
        summaries = run_call(cfg, index, dev)
        times.append(round(time.time() - t0, 3))
    n_reads = 299852 * len(cohort)
    best = min(times)
    assert len(summaries) == len(cohort)
    print(json.dumps({
        "n_samples": len(cohort),
        "wall_s": times,
        "reads": n_reads,
        "reads_per_sec_best": round(n_reads / best, 1),
        "per_sample_s": round(best / len(cohort), 3),
    }), flush=True)


if __name__ == "__main__":
    main()

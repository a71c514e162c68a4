"""Timestamped trace of the 15-sample cohort run: where does the
steady-state per-sample ~0.30 s go?

Captures, via INFO-level log records with wall-clock timestamps, each
sample's count-done, tally-sync ("Tallied ... (fused)"), pileup, and
write events, plus an explicit before/after around run_call. Prints a
per-sample event timeline and the inter-sample cadence so the serial
resource (host count / device map / relay sync / host call+write) is
visible instead of inferred.

Usage: python tools/bench_cohort_trace.py [n_copies]
"""
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


class Trace(logging.Handler):
    def __init__(self):
        super().__init__()
        self.events = []

    def emit(self, record):
        self.events.append((time.time(), record.getMessage()))


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    genome_paths, fastqs = bench._ensure_data()

    from bronko_tpu.call.engine import run_call
    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index

    import shutil

    cohort = []
    for c in range(n_copies):
        for s, fq_i in enumerate(fastqs):
            p = os.path.join(bench.CACHE, f"bcohort_{c}_{s}.fastq.gz")
            if not os.path.exists(p):
                shutil.copy(fq_i, p)
            cohort.append(p)

    cfg0 = CallConfig(db="bench", reads=[cohort[0]],
                      output=os.path.join(bench.CACHE, "out_trace"))
    os.makedirs(cfg0.output, exist_ok=True)
    index = build_index(cfg0.kmer, genome_paths)
    dev = build_device_index(index)

    bcfg = CallConfig(genomes=None, db="bench", reads=cohort,
                      output=os.path.join(bench.CACHE, "out_trace"))

    # warm (compiles cached in ~/.cache/bronko_jax)
    t0 = time.time()
    run_call(bcfg, index, dev)
    print(f"warm run: {time.time() - t0:.2f}s", flush=True)

    tr = Trace()
    lg = logging.getLogger("bronko")
    lg.addHandler(tr)
    lg.setLevel(logging.INFO)
    best = float("inf")
    best_events = None
    for _ in range(3):
        tr.events = [(time.time(), "RUN_START")]
        t0 = time.time()
        run_call(bcfg, index, dev)
        dt = time.time() - t0
        tr.events.append((time.time(), "RUN_END"))
        print(f"cohort run: {dt:.2f}s", flush=True)
        if dt < best:
            best, best_events = dt, tr.events

    t_start = best_events[0][0]
    prev = 0.0
    print(f"\nbest run {best:.2f}s — timeline (t, dt since prev event):")
    for t, msg in best_events:
        rel = t - t_start
        print(f"  {rel:7.3f} (+{rel - prev:6.3f}) {msg[:110]}")
        prev = rel


if __name__ == "__main__":
    main()

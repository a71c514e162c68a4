"""Internal perf tool: A/B the device mapper's pass-1/pass-2 variants on
the real TPU with the production bench workload.

Variants:
  * tally_save   — pass 1 with probe-artifact saving (product fast path)
  * tally_plain  — pass 1 histogram tallies only (tally_all_jit 'hist')
  * probe_only   — the merge-probe front end alone (sort cost floor)
  * pileup_saved — pass 2 from saved artifacts (no search)
  * pileup_sub   — pass 2 re-probing the selected genome's sub-index

Cross-checks: tallies and pileups must be integer-identical across
variants. Prints one JSON line per measurement as it completes.

Usage: python tools/bench_map_tpu.py   (needs the TPU; run alone)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import bench

    genome_paths, fastq = bench._ensure_data()
    fastq = fastq[0]  # _ensure_data returns the 3-sample cohort

    import jax
    import jax.numpy as jnp

    from bronko_tpu.call.engine import (
        _prepare_batches, count_sample, pick_best_genome, run_pileup_pass,
        run_pileup_saved,
    )
    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index
    from bronko_tpu.ops.map import tally_all_jit, tally_save_jit

    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    cfg = CallConfig(db="bench", reads=[fastq], output="/tmp/bench_map_out")
    os.makedirs(cfg.output, exist_ok=True)
    index = build_index(cfg.kmer, genome_paths)
    dev = build_device_index(index)
    kmers, counts, _ = count_sample(fastq, cfg, index.k)
    kj, cj = _prepare_batches(kmers, counts, cfg.batch_size)
    mcfg = dev.map_config(cfg.n_fixed, cfg.use_full_kmer)
    print(json.dumps({"kmers": int(kmers.shape[0]), "B": int(kj.shape[1]),
                      "J": len(mcfg.positions),
                      "U": int(dev.keys.shape[0]),
                      "P": int(dev.postings.shape[0])}), flush=True)

    def timed(fn, n=4):
        ts = []
        out = None
        for _ in range(n):
            t0 = time.time()
            out = fn()
            ts.append(round(time.time() - t0, 4))
        return min(ts[1:]), ts, out  # drop run 0 (compile)

    # --- pass 1: tally with artifact save (product fast path)
    def run_save():
        tj = jnp.zeros((dev.num_genomes, 3), jnp.int32)
        tj, lt, ii, h = tally_save_jit(kj, cj, dev.keys, dev.offsets,
                                       dev.hist, tj, mcfg)
        return np.asarray(tj), lt, ii, h

    best_s, ts, (tal_save, lane_tot, ii_all, h_all) = timed(run_save)
    print(json.dumps({"tally_save_s": best_s, "all": ts,
                      "sum": int(tal_save.sum())}), flush=True)

    # --- pass 1: plain histogram tally (no save)
    def run_plain():
        tj = jnp.zeros((dev.num_genomes, 3), jnp.int32)
        tj, ov = tally_all_jit(kj, cj, dev.keys, dev.offsets, dev.postings,
                               dev.hist, tj, mcfg, "hist")
        return np.asarray(tj)

    best_s, ts, tal_plain = timed(run_plain)
    print(json.dumps({"tally_plain_s": best_s, "all": ts,
                      "equal": bool((tal_plain == tal_save).all())}),
          flush=True)

    # --- probe front end alone (sort-cost floor)
    from bronko_tpu.ops.map import _probe_ranges

    probe_jit = jax.jit(
        lambda km, ct: _probe_ranges(km, ct, dev.keys, dev.offsets,
                                     cfg=mcfg)[1])

    def run_probe():
        hits = [probe_jit(kj[i], cj[i]) for i in range(kj.shape[0])]
        return np.asarray(hits[0][:8])

    best_s, ts, _ = timed(run_probe)
    print(json.dumps({"probe_only_s": best_s, "all": ts}), flush=True)

    best = pick_best_genome(tal_save.astype(np.int64), dev)
    exact = int(np.asarray(lane_tot)[best])

    # --- pass 2 from saved artifacts
    def run_saved():
        pl = run_pileup_saved(kj, cj, (ii_all, h_all), dev, best, mcfg,
                              n_kmers=kmers.shape[0], exact_lanes=exact)
        np.asarray(pl[0, :8])
        return pl

    best_s, ts, pl_saved = timed(run_saved)
    print(json.dumps({"pileup_saved_s": best_s, "all": ts,
                      "mass": int(np.asarray(pl_saved[2:]).sum())}),
          flush=True)

    # --- pass 2 via genome sub-index re-probe (one-time build/upload cost
    # reported separately)
    t0 = time.time()
    dev.ensure_subindex()
    np.asarray(dev.g_keys[best, :4])
    sub_s = round(time.time() - t0, 3)

    def run_sub():
        pl = run_pileup_pass(kj, cj, dev, best, mcfg, n_kmers=kmers.shape[0])
        np.asarray(pl[0, :8])
        return pl

    best_s, ts, pl_sub = timed(run_sub)
    print(json.dumps({"pileup_sub_s": best_s, "all": ts,
                      "subindex_build_s": sub_s,
                      "equal": bool(np.array_equal(np.asarray(pl_saved),
                                                   np.asarray(pl_sub)))}),
          flush=True)


if __name__ == "__main__":
    main()

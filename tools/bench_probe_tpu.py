"""Internal perf tool: pass-1 tally / pass-2 pileup device times on the
real TPU with the Mosaic probe kernel on vs off.

Prints one JSON line per stage AS IT COMPLETES (the axon relay compiles
slowly; partial output is still useful). Also reports what
jax.default_backend() returns on the axon tunnel — the Pallas gates key
off it.

Usage: python tools/bench_probe_tpu.py   (needs the TPU; run alone)
"""

from __future__ import annotations

import dataclasses
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
        _prepare_batches, count_sample, pick_best_genome, run_pileup_saved,
    )
    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index
    from bronko_tpu.ops.map import tally_save_jit

    print(json.dumps({
        "backend": jax.default_backend(),
        "platform": jax.devices()[0].platform,
    }), flush=True)

    cfg = CallConfig(db="bench", reads=[fastq], output="/tmp/bench_probe_out")
    os.makedirs(cfg.output, exist_ok=True)
    index = build_index(cfg.kmer, genome_paths)
    dev = build_device_index(index)
    kmers, counts, _ = count_sample(fastq, cfg, index.k)
    kj, cj = _prepare_batches(kmers, counts, cfg.batch_size)
    base_cfg = dev.map_config(cfg.n_fixed, cfg.use_full_kmer)
    print(json.dumps({"kmers": int(kmers.shape[0]),
                      "auto_use_pallas": base_cfg.use_pallas}), flush=True)

    for use_pallas in (True, False):
        mcfg = dataclasses.replace(base_cfg, use_pallas=use_pallas)
        try:
            times = []
            for _ in range(3):
                tj = jnp.zeros((dev.num_genomes, 3), jnp.int32)
                t0 = time.time()
                tj, lane_tot, ii_all, h_all = tally_save_jit(
                    kj, cj, dev.keys, dev.offsets, dev.hist, tj, mcfg)
                tallies = np.asarray(tj).astype(np.int64)
                times.append(round(time.time() - t0, 3))
            print(json.dumps({"use_pallas": use_pallas, "tally_s": times,
                              "tallies_sum": int(tallies.sum())}), flush=True)
        except Exception as e:  # noqa: BLE001 — report Mosaic failures
            print(json.dumps({"use_pallas": use_pallas,
                              "tally_error": repr(e)[:500]}), flush=True)
            continue

        best = pick_best_genome(tallies, dev)
        pt = []
        for _ in range(2):
            t0 = time.time()
            pileup = run_pileup_saved(
                kj, cj, (ii_all, h_all), dev, best, mcfg,
                n_kmers=kmers.shape[0],
                exact_lanes=int(np.asarray(lane_tot)[best]))
            np.asarray(pileup[0, :8])
            pt.append(round(time.time() - t0, 3))
        print(json.dumps({"use_pallas": use_pallas, "pileup_s": pt,
                          "pileup_sum": int(np.asarray(pileup[2:].sum()))}),
              flush=True)

    # sort ceiling: the 2-operand u64 merge sort at probe shapes — this is
    # the SORT_NS_PER_LANE constant bench.py's roofline model cites
    J = len(base_cfg.positions)
    n_lanes = int(dev.keys.shape[0]) + kj.shape[1] * J
    xs = jnp.asarray(np.random.default_rng(0).integers(
        0, 2**63, size=n_lanes, dtype=np.uint64))
    ot = jnp.arange(n_lanes, dtype=jnp.int32)
    sort2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2,
                                              is_stable=False))
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = sort2(xs, ot)
        np.asarray(out[0][:4])
        ts.append(round(time.time() - t0, 4))
    best_s = min(ts[1:])
    print(json.dumps({"sort_lanes": n_lanes, "sort_s": ts,
                      "sort_ns_per_lane": round(best_s / n_lanes * 1e9, 2)}),
          flush=True)


if __name__ == "__main__":
    main()

"""Standalone repro of bench.py's routed shard proxy (BENCH_r03 shipped
empty routed rows — both D=4/16 calls threw in the driver run with the
error lost to stderr). Runs ONLY the routed proxy, one D, small R.

Usage: [BRONKO_PLATFORM=cpu] python tools/repro_routed_proxy.py [D] [R]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main() -> None:
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    genome_paths, fastqs = bench._ensure_data()
    fastq = fastqs[0]

    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index

    cfg = CallConfig(db="bench", reads=[fastq],
                     output=os.path.join(bench.CACHE, "out_repro"))
    os.makedirs(cfg.output, exist_ok=True)
    index = build_index(cfg.kmer, genome_paths)
    dev = build_device_index(index)

    import jax
    import jax.numpy as jnp

    from bronko_tpu.call.engine import (
        _lane_class, _prepare_batches, count_sample, pick_best_genome,
    )
    from bronko_tpu.ops.map import (
        _bucket_q, _hist_hits, _merge_probe, classify_tallies,
        pileup_from_saved_jit,
    )
    from bronko_tpu.parallel.pipeline import (
        _route_group, _route_place, _unroute, route_split, split_index,
    )

    mcfg = dev.map_config(cfg.n_fixed, cfg.use_full_kmer)
    kmers, counts, _ = count_sample(fastq, cfg, index.k)
    kj1, cj1 = _prepare_batches(kmers, counts, cfg.batch_size, multiple=16)
    assert kj1.shape[0] == 1, kj1.shape
    W = kj1.shape[1]
    print(f"platform={jax.devices()[0].platform} W={W} D={D} R={R}",
          flush=True)

    s1 = split_index(index, 1)
    keys_r, hist_r, starts_r, bounds = route_split(s1, D)
    bd = jnp.asarray(bounds[0])
    Bl = W // D
    J = len(mcfg.positions)
    N2l = Bl * J
    from bronko_tpu.parallel.pipeline import route_budget_exact
    kp = np.reshape(np.asarray(kj1), (1, Bl, D)).transpose(
        0, 2, 1).reshape(1, W)
    cp = np.reshape(np.asarray(cj1), (1, Bl, D)).transpose(
        0, 2, 1).reshape(1, W)
    C = route_budget_exact(kp, cp, mcfg, bounds, D)
    print(f"exact C={C} (uniform share {N2l // D})", flush=True)
    G = dev.num_genomes
    # strided rows (row d = kj1[d::D]) — mirrors place_batches' deinterleave
    kjr = jnp.tile(jnp.reshape(kj1, (Bl, D)).T, (R, 1))
    cjr = jnp.tile(jnp.reshape(cj1, (Bl, D)).T, (R, 1))
    krr = jnp.tile(jnp.asarray(keys_r[:, 0]), (R, 1))
    hrr = jnp.tile(jnp.asarray(hist_r[:, 0]), (R, 1))
    srr = jnp.tile(jnp.asarray(starts_r[:, 0]), (R, 1))

    @jax.jit
    def tally_rows(kjr, cjr, krr, hrr, srr):
        def body(carry, row):
            tl, lt, ov = carry
            km, ct, kch, hch, sch = row
            q, _, _ = _bucket_q(km, cfg=mcfg)
            q_s, ord_s, slot, groups, ov_r = _route_group(
                q.reshape(N2l), jnp.repeat(ct > 0, J), bd, D, C)
            buf = _route_place(q_s, groups, D, C)
            got = _merge_probe(buf, kch, (hch, sch))
            vals = _unroute(list(got), slot, ord_s, Bl, J,
                            groups=groups, C=C)
            h = jnp.where((ct > 0)[:, None], vals[0], 0)
            hits = _hist_hits(h, G)
            tl = tl + classify_tallies(hits, ct > 0, J)
            lt = jnp.maximum(lt, hits.sum(axis=0, dtype=jnp.int64))
            return (tl, lt, ov | ov_r), (vals[1], h)

        init = (jnp.zeros((G, 3), jnp.int32),
                jnp.zeros(G, jnp.int64), jnp.int32(0))
        (tl, lt, ov), (st_all, h_all) = jax.lax.scan(
            body, init, (kjr, cjr, krr, hrr, srr))
        return tl, lt, ov, st_all, h_all

    from dataclasses import replace

    best_t = float("inf")
    for rep in range(3):
        t0 = time.time()
        tj, lt, ov_r, st_all, h_all = tally_rows(kjr, cjr, krr, hrr, srr)
        tallies = np.asarray(tj).astype(np.int64)
        assert not int(np.asarray(ov_r)), "routing budget overflow"
        best = pick_best_genome(tallies, dev)
        exact_row = int(np.asarray(lt)[best])
        gcfg = replace(
            mcfg, total_len=dev.g_total_len,
            max_bucket=dev.g_max_bucket,
            lane_budget=_lane_class(exact_row, floor=1024))
        post = (dev.postings_local32
                if dev.postings_local32 is not None else dev.postings)
        pl0 = jnp.zeros((4, gcfg.total_len + 1, 4), jnp.int32)
        pileup, ov = pileup_from_saved_jit(
            kjr, cjr, st_all, h_all, post, pl0, jnp.int32(best),
            jnp.int32(int(dev.file_bases[best])), gcfg)
        assert not int(ov), "pass-2 budget overflow"
        np.asarray(pileup[0, :8])
        if rep:
            best_t = min(best_t, time.time() - t0)
        print(f"rep {rep}: {time.time() - t0:.3f}s", flush=True)
    print(f"per_row_routed_map_s = {best_t / (R * D):.4f}")


if __name__ == "__main__":
    main()

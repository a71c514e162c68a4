"""Component timing for the ROUTED intra-batch row at bench shapes (D=16):
separate jits for (route) bucket_q + dest-group + buffer scatter,
(probe) merge probe at Uc + D*C lanes, (unroute) slot gather + restore
sort, (pass2) saved-artifact pileup — to find where the 22 ms/row
(vs the 10.2 ms perfect-scaling share) actually goes.

Separate dispatches add relay sync (~35-40 ms each, subtracted via an
empty-op baseline) and materialization boundaries XLA would otherwise
fuse — treat results as ranking, not gospel.

Usage: python tools/bench_routed_parts.py [D]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def timed(fn, args, n=6):
    """Median wall time of fn(*args) forced via np.asarray of a slice."""
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(first.ravel()[:4])
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main() -> None:
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 16

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
        _lane_class, _prepare_batches, count_sample,
    )
    from bronko_tpu.ops.map import (
        _bucket_q, _merge_probe, pileup_from_saved_jit,
    )
    from bronko_tpu.parallel.pipeline import (
        _route_group, _route_place, _unroute, route_split, split_index,
    )

    mcfg = dev.map_config(cfg.n_fixed, cfg.use_full_kmer)
    kmers, counts, _ = count_sample(fastq, cfg, index.k)
    kj1, cj1 = _prepare_batches(kmers, counts, cfg.batch_size, multiple=16)
    W = kj1.shape[1]
    s1 = split_index(index, 1)
    keys_r, hist_r, starts_r, bounds = route_split(s1, D)
    bd = jnp.asarray(bounds[0])
    Bl = W // D
    J = len(mcfg.positions)
    N2l = Bl * J
    from bronko_tpu.parallel.pipeline import route_budget
    C = route_budget(N2l, D)
    print(f"platform={jax.devices()[0].platform} D={D} Bl={Bl} N2l={N2l} "
          f"C={C} Uc={keys_r.shape[2]} probe_lanes={keys_r.shape[2] + D * C}",
          flush=True)

    km = jnp.asarray(np.asarray(kj1[0, ::D].copy()))      # one strided row
    ct = jnp.asarray(np.asarray(cj1[0, ::D].copy()))
    kch = jnp.asarray(keys_r[0, 0])
    hch = jnp.asarray(hist_r[0, 0])
    sch = jnp.asarray(starts_r[0, 0])

    @jax.jit
    def f_sync(x):
        return x + 1

    @jax.jit
    def f_route(km, ct):
        q, _, _ = _bucket_q(km, cfg=mcfg)
        q_s, ord_s, slot, groups, ov = _route_group(
            q.reshape(N2l), jnp.repeat(ct > 0, J), bd, D, C)
        buf = _route_place(q_s, groups, D, C)
        return buf, ord_s, slot, groups, ov

    @jax.jit
    def f_bucket(km):
        q, _, _ = _bucket_q(km, cfg=mcfg)
        return (q,)

    @jax.jit
    def f_probe(buf, kch, hch, sch):
        got = _merge_probe(buf, kch, (hch, sch))
        return got

    @jax.jit
    def f_unroute(h, st, slot, ord_s, groups):
        # production path: grouped DMA de-group (the slot-gather fallback
        # is no longer what the engine runs)
        vals = _unroute([h, st], slot, ord_s, Bl, J, groups=groups, C=C)
        return vals

    import sys as _sys
    def note(x):
        print(f"  .. {x}", flush=True)
    note("sync")
    sync_s = timed(f_sync, (km,))
    note("bucket")
    bucket_s = timed(f_bucket, (km,))
    note("route")
    route_s = timed(f_route, (km, ct))
    buf, ord_s, slot, groups, ov = f_route(km, ct)
    note("probe")
    probe_s = timed(f_probe, (buf, kch, hch, sch))
    h, st = f_probe(buf, kch, hch, sch)
    note("unroute")
    unroute_s = timed(f_unroute, (h, st, slot, ord_s, groups))

    # pass 2 at the per-device budget
    from dataclasses import replace
    lane_b = _lane_class(1024031 // D, floor=1024)
    gcfg = replace(mcfg, total_len=dev.g_total_len,
                   max_bucket=dev.g_max_bucket, lane_budget=lane_b)
    post = (dev.postings_local32 if dev.postings_local32 is not None
            else dev.postings)
    vals = f_unroute(h, st, slot, ord_s, groups)
    h_all = vals[0].reshape(1, Bl, J)
    st_all = vals[1].reshape(1, Bl, J)
    kmj = km.reshape(1, Bl)
    ctj = ct.reshape(1, Bl)

    def f_p2(kmj, ctj, st_all, h_all):
        # fresh buffer every call: the jit DONATES the pileup argument
        pl0 = jnp.zeros((4, gcfg.total_len + 1, 4), jnp.int32)
        return pileup_from_saved_jit(kmj, ctj, st_all, h_all, post, pl0,
                                     jnp.int32(0),
                                     jnp.int32(int(dev.file_bases[0])), gcfg)

    p2_s = timed(f_p2, (kmj, ctj, st_all, h_all))

    def ms(x):
        return round((x - sync_s) * 1e3, 2)

    print(f"sync baseline        {sync_s * 1e3:8.2f} ms")
    print(f"bucket_q             {ms(bucket_s):8.2f} ms")
    print(f"route (bq+group+buf) {ms(route_s):8.2f} ms")
    print(f"merge probe          {ms(probe_s):8.2f} ms")
    print(f"unroute              {ms(unroute_s):8.2f} ms")
    print(f"pass2 (budget {lane_b}) {ms(p2_s):8.2f} ms")
    print(f"sum (- bucket dup)   "
          f"{ms(route_s) + ms(probe_s) + ms(unroute_s) + ms(p2_s):8.2f} ms")


if __name__ == "__main__":
    main()

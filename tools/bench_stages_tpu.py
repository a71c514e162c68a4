"""Internal perf tool: decompose the device map passes into sub-stage
timings on the real TPU, to locate the roofline gap (VERDICT r2 item 1).

Each stage is jitted separately and timed with the bench discipline
(min over laps, forced np.asarray sync — block_until_ready under-reports
through the axon relay). Every stage RETURNS a small reduction over its
outputs so XLA cannot dead-code the work, and a `noop` stage measures the
relay dispatch+sync floor to subtract.

Sub-stages will NOT sum exactly to the full pass (fusion across stage
boundaries is lost, and each pays its own dispatch), but they rank where
the time goes and A/B structural variants (u32-split sort keys, scatter
restore vs unsort, sort-based pileup aggregation).

Usage: python tools/bench_stages_tpu.py [stage-name-filter ...]
(needs the TPU; run alone)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LAPS = 4  # lap 0 compiles


def timed(name, fn, *args, reps=LAPS):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        r = out[0] if isinstance(out, tuple) else out
        np.asarray(r)  # forced sync
        ts.append(time.time() - t0)
    best = min(ts[1:])
    print(json.dumps({"stage": name, "best_s": round(best, 4),
                      "laps": [round(t, 4) for t in ts]}), flush=True)
    return best


def main() -> None:
    only = [a for a in sys.argv[1:]]

    def want(name: str) -> bool:
        return not only or any(f in name for f in only)

    import bench

    genome_paths, fastqs = bench._ensure_data()
    fastq = fastqs[0]

    import jax
    import jax.numpy as jnp

    from bronko_tpu.call.engine import (
        _prepare_batches, count_sample, pick_best_genome,
    )
    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index
    from bronko_tpu.ops.buckets import assign_buckets
    from bronko_tpu.ops.codec import canonical
    from bronko_tpu.ops.map import (
        _expand_lanes, _fold_table, _hist_hits, classify_tallies,
        pileup_from_saved_jit, tally_save_jit,
    )

    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    cfg = CallConfig(db="bench", reads=[fastq], output="/tmp/bench_stages_out")
    os.makedirs(cfg.output, exist_ok=True)
    index = build_index(cfg.kmer, genome_paths)
    dev = build_device_index(index)
    kmers, counts, _ = count_sample(fastq, cfg, index.k)
    kj, cj = _prepare_batches(kmers, counts, cfg.batch_size)
    mcfg = dev.map_config(cfg.n_fixed, cfg.use_full_kmer)
    k = mcfg.k
    J = len(mcfg.positions)
    B = kj.shape[1]
    U = int(dev.keys.shape[0])
    N2 = B * J
    NL = U + N2
    pos = np.asarray(mcfg.positions)
    print(json.dumps({"B": B, "U": U, "J": J, "lanes": NL,
                      "kmers": int(kmers.shape[0])}), flush=True)

    km0, ct0 = kj[0], cj[0]

    # ---- anchors ----
    if want("anchor_tally"):
        def full_tally():
            tj = jnp.zeros((dev.num_genomes, 3), jnp.int32)
            tj, lt, ii, h = tally_save_jit(
                kj, cj, dev.keys, dev.offsets, dev.hist, tj, mcfg)
            return (tj,)
        timed("anchor_tally_save", full_tally)

    # ---- dispatch floor ----
    if want("noop"):
        noop = jax.jit(lambda x: x[:4])
        timed("noop_dispatch", noop, km0)

    # ---- pass-1 front end: canonical + buckets + position filter ----
    @jax.jit
    def front(kmv):
        canon, is_rc = canonical(kmv, k, jnp)
        q = assign_buckets(canon, k, jnp)[:, pos]
        return q.sum(), canon.sum(), is_rc.sum()

    if want("front"):
        timed("front_bucketq", front, km0)

    @jax.jit
    def front_canon_only(kmv):
        canon, is_rc = canonical(kmv, k, jnp)
        return canon.sum(), is_rc.sum()

    if want("front"):
        timed("front_canon_only", front_canon_only, km0)

    # materialized realistic queries for the sort stages
    canon_h, is_rc_h = canonical(np.asarray(kj[0]), k, np)
    q_h = assign_buckets(canon_h, k, np)[:, pos]
    keys_h = np.asarray(dev.keys)
    xs_h = np.concatenate([keys_h, q_h.reshape(N2)])
    ot_h = np.concatenate(
        [np.zeros(U, np.int32), 1 + np.arange(N2, dtype=np.int32)])
    xs_d = jnp.asarray(xs_h)
    ot_d = jnp.asarray(ot_h)

    # ---- sort #1 variants ----
    sort2_u64 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2,
                                                  is_stable=False))
    if want("sort1_u64"):
        timed("sort1_u64_2op", lambda: (sort2_u64(xs_d, ot_d)[0],))

    hi_d = (xs_d >> jnp.uint64(32)).astype(jnp.uint32)
    lo_d = xs_d.astype(jnp.uint32)
    sort3_u32 = jax.jit(lambda a, b, c: jax.lax.sort(
        (a, b, c), num_keys=2, is_stable=False))
    # NOTE num_keys=2 here sorts by (hi, lo) only — NOT semantics-complete
    # (ties between equal (hi,lo) need ot as a third key) — perf probe only
    sort3_u32k3 = jax.jit(lambda a, b, c: jax.lax.sort(
        (a, b, c), num_keys=3, is_stable=False))
    if want("sort1_u32"):
        timed("sort1_u32_3op_k2", lambda: (sort3_u32(hi_d, lo_d, ot_d)[0],))
        timed("sort1_u32_3op_k3", lambda: (sort3_u32k3(hi_d, lo_d, ot_d)[0],))

    # ---- mid machinery: rank/eq/packed + payload pickup (merge order) ----
    xs_s_h, ot_s_h = (np.asarray(a) for a in sort2_u64(xs_d, ot_d))
    xs_s_d, ot_s_d = jnp.asarray(xs_s_h), jnp.asarray(ot_s_h)
    hist_d = dev.hist

    @jax.jit
    def mid(xs_s, ot_s, keys, hist):
        is_key = ot_s == 0
        rank = jnp.cumsum(is_key.astype(jnp.int32)) - 1
        rank_c = jnp.maximum(rank, 0)
        eq = (keys[rank_c] == xs_s) & (rank >= 0)
        packed = rank_c | (eq.astype(jnp.int32) << 30)
        h = jnp.where(eq, hist[rank_c], 0)
        return packed.sum(), h.sum()

    if want("mid"):
        timed("mid_rank_eq_payload", mid, xs_s_d, ot_s_d, dev.keys, hist_d)

    # ---- unsort variants ----
    packed_h = np.minimum(np.arange(NL, dtype=np.int32), U - 1)
    h_h = np.random.default_rng(0).integers(
        0, 1 << 20, NL, dtype=np.int64).astype(np.int32)
    ordk_h = np.where(ot_s_h == 0, np.int32(2**31 - 1), ot_s_h)
    packed_d, hcol_d, ordk_d = (jnp.asarray(a)
                                for a in (packed_h, h_h, ordk_h))

    unsort3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1,
                                                   is_stable=False))
    if want("unsort"):
        timed("unsort_3op_i32", lambda: (unsort3(ordk_d, packed_d, hcol_d)[1],))

    @jax.jit
    def scatter_restore(ordk, packed, hcol):
        # restore query order by scatter instead of a second sort
        tgt = jnp.minimum(ordk - 1, N2)  # keys land on a dump row
        out_p = jnp.zeros(N2 + 1, jnp.int32).at[tgt].set(packed, mode="drop")
        out_h = jnp.zeros(N2 + 1, jnp.int32).at[tgt].set(hcol, mode="drop")
        return out_p.sum(), out_h.sum()

    if want("scatter_restore"):
        timed("unsort_scatter_i32x2", scatter_restore, ordk_d, packed_d, hcol_d)

    # ---- hist sum + classify ----
    ii_h = np.random.default_rng(1).integers(0, U, (B, J), dtype=np.int32)
    h_bj = np.random.default_rng(2).integers(
        0, 1 << 16, (B, J), dtype=np.int64).astype(np.int32)
    ii_d, hbj_d = jnp.asarray(ii_h), jnp.asarray(h_bj)

    @jax.jit
    def tail(hbj, ct):
        hits = _hist_hits(hbj, dev.num_genomes)
        return (classify_tallies(hits, ct > 0, J),
                hits.sum(axis=0, dtype=jnp.int64))

    if want("tail"):
        timed("tail_hits_classify", tail, hbj_d, ct0)

    # ---- pass 2 pieces ----
    if want("anchor_pileup") or want("pass2") or want("fold") or want("expand"):
        tj = jnp.zeros((dev.num_genomes, 3), jnp.int32)
        tj, lane_tot, st_all, h_all = tally_save_jit(
            kj, cj, dev.keys, dev.offsets, dev.hist, tj, mcfg)
        tallies = np.asarray(tj).astype(np.int64)
        best = pick_best_genome(tallies, dev)
        exact = int(np.asarray(lane_tot)[best])
        from bronko_tpu.call.engine import _lane_class, run_pileup_saved
        LB = _lane_class(exact)
        print(json.dumps({"best": best, "exact_lanes": exact, "LB": LB}),
              flush=True)

        if want("anchor_pileup"):
            def full_pileup():
                pl = run_pileup_saved(kj, cj, (st_all, h_all), dev, best, mcfg,
                                      n_kmers=kmers.shape[0], exact_lanes=exact)
                return (pl[0, :8],)
            timed("anchor_pileup_saved", full_pileup)

        @jax.jit
        def fold_stage(kmv, ctv):
            canon, is_rc = canonical(kmv, k, jnp)
            pc = _fold_table(canon, is_rc, ctv, k)
            return (pc.sum(),)

        if want("fold"):
            timed("pass2_fold_table", fold_stage, km0, ct0)

        best_j = jnp.int32(best)
        st0, h0 = st_all[0], h_all[0]

        @jax.jit
        def lens_stage(start, h):
            one = h.dtype.type(1)
            shift = (best_j * 8).astype(h.dtype)
            lens = ((h >> shift) & h.dtype.type(0xFF)).astype(jnp.int32)
            below = h & ((one << shift) - one)
            prefix = jnp.zeros_like(lens)
            for byte in range(h.dtype.itemsize):
                prefix = prefix + (((below >> h.dtype.type(8 * byte))
                                    & h.dtype.type(0xFF)).astype(jnp.int32))
            startf = (start + prefix).reshape(N2).astype(jnp.int32)
            return startf.sum(), lens.sum()

        if want("pass2"):
            timed("pass2_lens_prefix", lens_stage, st0, h0)

        # realistic startf/lensf for the expansion stage
        def lens_host(start, h):
            hh = np.asarray(h).astype(np.int64)
            lens = ((hh >> (8 * best)) & 0xFF).astype(np.int32)
            below = hh & ((1 << (8 * best)) - 1)
            prefix = np.zeros_like(lens)
            for byte in range(8):
                prefix += ((below >> (8 * byte)) & 0xFF).astype(np.int32)
            startf = np.asarray(start) + prefix
            return startf.reshape(N2).astype(np.int32), lens.reshape(N2)

        startf_h, lensf_h = lens_host(st0, h0)
        startf_d, lensf_d = jnp.asarray(startf_h), jnp.asarray(lensf_h)

        @jax.jit
        def expand_stage(startf, lensf):
            own_c, pidx_s, lane_valid, total = _expand_lanes(
                startf, lensf, LB)
            return own_c.sum(), pidx_s.sum(), total

        if want("expand"):
            timed("pass2_expand_lanes", expand_stage, startf_d, lensf_d)

        # decode+scatter stage with realistic lanes
        from bronko_tpu.ops.map import _scatter_lanes

        @jax.jit
        def scatter_stage(startf, lensf, kmv, ctv):
            canon, is_rc = canonical(kmv, k, jnp)
            pc = _fold_table(canon, is_rc, ctv, k)
            own_c, pidx_s, lane_valid, total = _expand_lanes(startf, lensf, LB)
            post = (dev.postings_local32 if dev.postings_local32 is not None
                    else dev.postings)
            pl = jnp.zeros((4, dev.g_total_len + 1, 4), jnp.int32)
            pl, b, fid = _scatter_lanes(pl, pc, post[pidx_s], own_c, lane_valid,
                                        J=J, k=k,
                                        pos_base=int(dev.file_bases[best]))
            return (pl[0, :4],)

        if want("pass2"):
            timed("pass2_expand_decode_scatter", scatter_stage,
                  startf_d, lensf_d, km0, ct0)

    # ---- ceilings at these shapes ----
    if want("ceiling"):
        rng = np.random.default_rng(0)
        idx32 = jnp.asarray(rng.integers(0, 1 << 20, N2, dtype=np.int32))
        tbl32 = jnp.asarray(rng.integers(0, 1 << 30, 1 << 20, dtype=np.int32))
        g32 = jax.jit(lambda t, i: t[i].sum())
        timed("ceiling_gather_i32_N2", g32, tbl32, idx32)
        sc_add = jax.jit(lambda t, i, v: t.at[i].add(v))
        tgt = jnp.zeros(1 << 19, jnp.int32)
        vals = jnp.ones(N2, jnp.int32)
        idx_sc = jnp.asarray(rng.integers(0, 1 << 19, N2, dtype=np.int32))
        timed("ceiling_scatter_add_i32_N2", sc_add, tgt, idx_sc, vals)
        sc_max = jax.jit(lambda t, i, v: t.at[i].max(v))
        timed("ceiling_scatter_max_i32_N2", sc_max, tgt, idx_sc, vals)


if __name__ == "__main__":
    main()

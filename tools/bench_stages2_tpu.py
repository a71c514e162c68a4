"""Internal perf tool round 2: decompose the merge-probe 'mid' section
(cumsum + rank/eq/payload pickup — measured ~110 ms of the 204 ms tally
in bench_stages_tpu.py) and re-measure the sorts with REDUCTION outputs
(round 1 returned full arrays, so the relay transfer poisoned those
numbers).

Usage: python tools/bench_stages2_tpu.py [filter ...]  (TPU; run alone)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LAPS = 4


def timed(name, fn, *args, reps=LAPS):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        r = out[0] if isinstance(out, tuple) else out
        np.asarray(r)
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

    from bronko_tpu.call.engine import _prepare_batches, count_sample
    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index
    from bronko_tpu.ops.buckets import assign_buckets
    from bronko_tpu.ops.codec import canonical

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
    print(json.dumps({"B": B, "U": U, "J": J, "lanes": NL}), flush=True)

    # realistic merged data
    canon_h, _ = canonical(np.asarray(kj[0]), k, np)
    q_h = assign_buckets(canon_h, k, np)[:, pos]
    keys_h = np.asarray(dev.keys)
    xs_h = np.concatenate([keys_h, q_h.reshape(N2)])
    ot_h = np.concatenate(
        [np.zeros(U, np.int32), 1 + np.arange(N2, dtype=np.int32)])
    order = np.argsort(xs_h, kind="stable")
    xs_s_h, ot_s_h = xs_h[order], ot_h[order]
    xs_d, ot_d = jnp.asarray(xs_h), jnp.asarray(ot_h)
    xs_s_d, ot_s_d = jnp.asarray(xs_s_h), jnp.asarray(ot_s_h)
    hist_d = dev.hist
    keys_d = dev.keys

    if want("noop"):
        timed("noop", jax.jit(lambda x: x[:4]), ot_s_d)

    # ---- mid decomposition ----
    if want("cumsum"):
        c1 = jax.jit(lambda o: jnp.cumsum((o == 0).astype(jnp.int32)).sum())
        timed("mid_cumsum_1d", c1, ot_s_d)

        # two-level cumsum: pad to (R, C), row-cumsum + offset broadcast
        R = 1 << 11
        C = -(-NL // R)

        @jax.jit
        def c2(o):
            x = jnp.zeros(R * C, jnp.int32).at[:NL].set((o == 0).astype(jnp.int32))
            x2 = x.reshape(R, C)
            rows = jnp.cumsum(x2, axis=1)
            offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                    jnp.cumsum(rows[:, -1])[:-1]])
            return (rows + offs[:, None]).reshape(-1)[:NL].sum()

        timed("mid_cumsum_2level", c2, ot_s_d)

    rank_h = np.maximum(np.cumsum((ot_s_h == 0).astype(np.int32)) - 1, 0)
    rank_d = jnp.asarray(rank_h)

    if want("gather"):
        g64 = jax.jit(lambda ks, r: ks[r].sum())
        timed("mid_gather_keys_u64", g64, keys_d, rank_d)
        g32 = jax.jit(lambda h, r: h[r].sum())
        timed("mid_gather_hist_i32", g32, hist_d, rank_d)

        @jax.jit
        def eq_both(ks, h, r, xs_s):
            kv = ks[r]
            eq = kv == xs_s
            hv = jnp.where(eq, h[r], 0)
            return eq.sum(), hv.sum()

        timed("mid_gathers_eq", eq_both, keys_d, hist_d, rank_d, xs_s_d)

    if want("cummax"):
        @jax.jit
        def eq_cummax(xs_s, ot_s):
            is_key = ot_s == 0
            prop = jax.lax.cummax(jnp.where(is_key, xs_s, jnp.uint64(0)))
            eq = (prop == xs_s) & ~is_key
            return eq.sum()

        timed("mid_eq_via_cummax_u64", eq_cummax, xs_s_d, ot_s_d)

    if want("midfull"):
        @jax.jit
        def mid_full(xs_s, ot_s, keys, hist):
            is_key = ot_s == 0
            rank = jnp.cumsum(is_key.astype(jnp.int32)) - 1
            rank_c = jnp.maximum(rank, 0)
            eq = (keys[rank_c] == xs_s) & (rank >= 0)
            packed = rank_c | (eq.astype(jnp.int32) << 30)
            h = jnp.where(eq, hist[rank_c], 0)
            return packed.sum(), h.sum()

        timed("mid_full", mid_full, xs_s_d, ot_s_d, keys_d, hist_d)

    # ---- sorts with reduction outputs ----
    hi_d = (xs_d >> jnp.uint64(32)).astype(jnp.uint32)
    lo_d = xs_d.astype(jnp.uint32)

    if want("sort"):
        s_u64_2 = jax.jit(lambda a, b: tuple(
            x.sum() for x in jax.lax.sort((a, b), num_keys=2, is_stable=False)))
        timed("sort_u64_2op", s_u64_2, xs_d, ot_d)

        s_u32_3k2 = jax.jit(lambda a, b, c: tuple(
            x.sum() for x in jax.lax.sort((a, b, c), num_keys=2,
                                          is_stable=False)))
        timed("sort_u32_3op_k2", s_u32_3k2, hi_d, lo_d, ot_d)

        s_u32_3k3 = jax.jit(lambda a, b, c: tuple(
            x.sum() for x in jax.lax.sort((a, b, c), num_keys=3,
                                          is_stable=False)))
        timed("sort_u32_3op_k3", s_u32_3k3, hi_d, lo_d, ot_d)

        # unsort shape: key i32, 2 payload i32
        pk_d = jnp.asarray(np.minimum(np.arange(NL, dtype=np.int32), U - 1))
        s_i32_3k1 = jax.jit(lambda a, b, c: tuple(
            x.sum() for x in jax.lax.sort((a, b, c), num_keys=1,
                                          is_stable=False)))
        timed("sort_i32_3op_k1_unsort", s_i32_3k1, ot_s_d, pk_d, pk_d)

        s_i32_2k1 = jax.jit(lambda a, b: tuple(
            x.sum() for x in jax.lax.sort((a, b), num_keys=1,
                                          is_stable=False)))
        timed("sort_i32_2op_k1", s_i32_2k1, ot_s_d, pk_d)

        s_u64_1 = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1,
                                                 is_stable=False)[0].sum())
        timed("sort_u64_1op", s_u64_1, xs_d)

    # ---- pass-2 scatter variants at LB shapes ----
    if want("scatter"):
        LB = 1 << 20
        T = dev.g_total_len
        rng = np.random.default_rng(0)
        cell_h = rng.integers(0, (T + 1) * 4, LB, dtype=np.int32)
        nlane_h = rng.integers(1, 1000, LB, dtype=np.int32)
        fwd_h = rng.integers(0, 2, LB, dtype=np.int32)
        cell_d, nlane_d, fwd_d = (jnp.asarray(a)
                                  for a in (cell_h, nlane_h, fwd_h))
        row_len = (T + 1) * 4

        @jax.jit
        def scatter_current(cell, nlane, fwd):
            flat = jnp.zeros(4 * row_len, jnp.int32)
            dt = jnp.where(fwd == 1, 0, row_len) + cell
            ct = jnp.where(fwd == 1, 2 * row_len, 3 * row_len) + cell
            flat = flat.at[dt].max(nlane)
            flat = flat.at[ct].add(1)
            return flat.sum()

        timed("p2_scatter_maxadd_current", scatter_current,
              cell_d, nlane_d, fwd_d)

        @jax.jit
        def scatter_sortseg(cell, nlane, fwd):
            # one sort by target cell, then segment max/count via sorted
            # scatters (indices_are_sorted): trades 2 random scatters for
            # 1 sort + 2 sorted scatters
            tgt = jnp.where(fwd == 1, 0, row_len) + cell
            tgt_s, n_s = jax.lax.sort((tgt, nlane), num_keys=1,
                                      is_stable=False)
            flat = jnp.zeros(4 * row_len, jnp.int32)
            flat = flat.at[tgt_s].max(n_s, indices_are_sorted=True)
            flat = flat.at[tgt_s + 2 * row_len].add(
                1, indices_are_sorted=True)
            return flat.sum()

        timed("p2_scatter_sortseg", scatter_sortseg, cell_d, nlane_d, fwd_d)

        @jax.jit
        def scatter_sorted_direct(cell, nlane):
            # ceiling: sorted-indices scatter (is the flag even honored?)
            cs = jnp.sort(cell)
            flat = jnp.zeros(4 * row_len, jnp.int32)
            flat = flat.at[cs].add(1, indices_are_sorted=True)
            return flat.sum()

        timed("p2_scatter_sorted_add", scatter_sorted_direct, cell_d, nlane_d)


if __name__ == "__main__":
    main()

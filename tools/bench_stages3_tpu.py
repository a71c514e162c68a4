"""Internal perf tool round 3: CUMULATIVE composition of the pass-1
tally_save body. The round-1/2 stage tools measured pieces in isolation
(each paying its own ~36 ms relay dispatch, some poisoned by full-array
transfers) and their sum (~45 ms compute) misses the measured
anchor_tally_save (~185 ms) by ~140 ms. Here each stage ADDS one piece to
the previous jit body with a reduction output, so consecutive deltas
localize the real cost even under relay-latency drift.

Also A/Bs the u32-split merge probe (sort (hi, lo, ot) num_keys=3 +
split-key monotone eq gathers) against the current u64 sort + u64 cummax.

Usage: python tools/bench_stages3_tpu.py [filter ...]  (TPU; run alone)
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
    only = list(sys.argv[1:])

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
    from bronko_tpu.ops.map import classify_tallies, tally_save_jit

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
    G = dev.num_genomes
    print(json.dumps({"B": B, "U": U, "J": J, "lanes": NL, "G": G}),
          flush=True)

    km0 = kj[0]
    ct0 = cj[0]
    keys_d = dev.keys
    offs_d = dev.offsets
    hist_d = dev.hist

    if want("anchor"):
        def full_tally():
            tj = jnp.zeros((G, 3), jnp.int32)
            tj, lt, st, h = tally_save_jit(kj, cj, keys_d, offs_d, hist_d,
                                           tj, mcfg)
            return (tj,)

        timed("anchor_tally_save", full_tally)

    # ---- cumulative composition (reduction outputs everywhere) ----
    def front(km):
        canon, is_rc = canonical(km, k, jnp)
        q = assign_buckets(canon, k, jnp)[:, pos]
        return q, canon, is_rc

    if want("c1"):
        timed("c1_front", jax.jit(lambda km: front(km)[0].sum()), km0)

    def merged(km, keys):
        q, _, _ = front(km)
        xs = jnp.concatenate([keys, q.reshape(N2)])
        ot = jnp.concatenate([jnp.zeros(U, jnp.int32),
                              1 + jnp.arange(N2, dtype=jnp.int32)])
        xs_s, ot_s = jax.lax.sort((xs, ot), num_keys=2, is_stable=False)
        return xs_s, ot_s

    if want("c2"):
        timed("c2_front_sort", jax.jit(
            lambda km, keys: merged(km, keys)[1].sum()), km0, keys_d)

    def with_eq(km, keys):
        xs_s, ot_s = merged(km, keys)
        is_key = ot_s == 0
        rank = jnp.cumsum(is_key.astype(jnp.int32)) - 1
        rank_c = jnp.maximum(rank, 0)
        prop = jax.lax.cummax(jnp.where(is_key, xs_s, jnp.zeros((), xs_s.dtype)))
        eq = (prop == xs_s) & (rank >= 0)
        return eq, rank_c, ot_s

    if want("c3"):
        timed("c3_plus_eq_cummax", jax.jit(
            lambda km, keys: with_eq(km, keys)[0].sum()), km0, keys_d)

    def with_payload(km, keys, hist, offs):
        eq, rank_c, ot_s = with_eq(km, keys)
        h = jnp.where(eq, hist[rank_c], 0)
        st = jnp.where(eq, offs[:U][rank_c], 0)
        return h, st, ot_s

    if want("c4"):
        timed("c4_plus_payload", jax.jit(
            lambda km, keys, hist, offs:
            sum(x.sum() for x in with_payload(km, keys, hist, offs)[:2])),
            km0, keys_d, hist_d, offs_d)

    def with_unsort(km, keys, hist, offs):
        h, st, ot_s = with_payload(km, keys, hist, offs)
        ordk = jnp.where(ot_s == 0, jnp.int32(2**31 - 1), ot_s)
        _, h_q, st_q = jax.lax.sort((ordk, h, st), num_keys=1,
                                    is_stable=False)
        return h_q[:N2], st_q[:N2]

    if want("c5"):
        timed("c5_plus_unsort", jax.jit(
            lambda km, keys, hist, offs:
            sum(x.sum() for x in with_unsort(km, keys, hist, offs))),
            km0, keys_d, hist_d, offs_d)

    def full_body(km, ct, keys, hist, offs):
        h_q, st_q = with_unsort(km, keys, hist, offs)
        h = jnp.where((ct > 0)[:, None], h_q.reshape(B, J), 0)
        from bronko_tpu.ops.map import _hist_hits
        hits = _hist_hits(h, G)
        tl = classify_tallies(hits, ct > 0, J)
        lt = hits.sum(axis=0, dtype=jnp.int64)
        return tl, lt, st_q.sum()

    if want("c6"):
        timed("c6_full_nosave", jax.jit(
            lambda km, ct, keys, hist, offs:
            full_body(km, ct, keys, hist, offs)[0]),
            km0, ct0, keys_d, hist_d, offs_d)

    if want("c7"):
        # c6 + MATERIALIZED (B, J) artifacts (what the save path keeps)
        def body_save(km, ct, keys, hist, offs):
            h_q, st_q = with_unsort(km, keys, hist, offs)
            h = jnp.where((ct > 0)[:, None], h_q.reshape(B, J), 0)
            from bronko_tpu.ops.map import _hist_hits
            hits = _hist_hits(h, G)
            tl = classify_tallies(hits, ct > 0, J)
            return tl, h, st_q.reshape(B, J)

        fn = jax.jit(body_save)

        def run(km, ct, keys, hist, offs):
            tl, h, st = fn(km, ct, keys, hist, offs)
            return (tl,)

        timed("c7_full_saved", run, km0, ct0, keys_d, hist_d, offs_d)

    # ---- payload-pickup alternatives ----
    def with_payload_cummax(km, keys, hist, offs):
        """Segmented propagate: payloads ride a packed (rank+1)<<32 | val
        int64 cummax from key rows to their query runs — rank is
        non-decreasing so the max always carries the LAST key row's
        payload; queries contribute 0 and never dominate."""
        xs_s, ot_s = merged(km, keys)
        is_key = ot_s == 0
        rank = jnp.cumsum(is_key.astype(jnp.int32)) - 1
        prop = jax.lax.cummax(jnp.where(is_key, xs_s, jnp.zeros((), xs_s.dtype)))
        eq = (prop == xs_s) & (rank >= 0)
        r1 = (rank + 1).astype(jnp.int64) << 32

        def pick(col_on_keys):
            packed = jnp.where(is_key, r1 | col_on_keys.astype(jnp.int64),
                               jnp.int64(0))
            return jax.lax.cummax(packed).astype(jnp.int32)

        # hist/offs values must be expanded onto key rows first: key rows
        # appear in `keys` order within the sorted stream, so the n-th key
        # row carries hist[n] — scatter by rank on key rows
        hcol = jnp.where(is_key, hist[jnp.maximum(rank, 0)], 0)
        scol = jnp.where(is_key, offs[:U][jnp.maximum(rank, 0)], 0)
        h = jnp.where(eq, pick(hcol), 0)
        st = jnp.where(eq, pick(scol), 0)
        return h, st, ot_s

    if want("c4b"):
        # NOTE: still does the two gathers to place values on key rows —
        # this variant only tests whether the PROPAGATION could replace
        # them if values arrived as sort payload operands; see c4d
        timed("c4b_payload_cummax_plus_gather", jax.jit(
            lambda km, keys, hist, offs:
            sum(x.sum() for x in with_payload_cummax(km, keys, hist, offs)[:2])),
            km0, keys_d, hist_d, offs_d)

    def with_payload_sortops(km, keys, hist, offs):
        """Payloads enter the MERGE SORT as extra operands (key rows carry
        them, query rows carry 0), then segment-propagate via packed
        cummax — zero post-sort gathers."""
        q, _, _ = front(km)
        xs = jnp.concatenate([keys, q.reshape(N2)])
        ot = jnp.concatenate([jnp.zeros(U, jnp.int32),
                              1 + jnp.arange(N2, dtype=jnp.int32)])
        hc = jnp.concatenate([hist, jnp.zeros(N2, hist.dtype)])
        sc = jnp.concatenate([offs[:U], jnp.zeros(N2, jnp.int32)])
        xs_s, ot_s, h_s, s_s = jax.lax.sort((xs, ot, hc, sc), num_keys=2,
                                            is_stable=False)
        is_key = ot_s == 0
        rank = jnp.cumsum(is_key.astype(jnp.int32)) - 1
        prop = jax.lax.cummax(jnp.where(is_key, xs_s, jnp.zeros((), xs_s.dtype)))
        eq = (prop == xs_s) & (rank >= 0)
        r1 = (rank + 1).astype(jnp.int64) << 32

        def pick(col):
            packed = jnp.where(is_key, r1 | col.astype(jnp.int64),
                               jnp.int64(0))
            return jax.lax.cummax(packed).astype(jnp.int32)

        h = jnp.where(eq, pick(h_s), 0)
        st = jnp.where(eq, pick(s_s), 0)
        return h, st, ot_s

    if want("c4d"):
        timed("c4d_payload_sortops_cummax", jax.jit(
            lambda km, keys, hist, offs:
            sum(x.sum() for x in with_payload_sortops(km, keys, hist, offs)[:2])),
            km0, keys_d, hist_d, offs_d)

    def with_payload_sorted_get(km, keys, hist, offs):
        eq, rank_c, ot_s = with_eq(km, keys)
        hv = hist.at[rank_c].get(indices_are_sorted=True,
                                 mode="promise_in_bounds")
        sv = offs[:U].at[rank_c].get(indices_are_sorted=True,
                                     mode="promise_in_bounds")
        return jnp.where(eq, hv, 0), jnp.where(eq, sv, 0), ot_s

    if want("c4c"):
        timed("c4c_payload_sorted_get", jax.jit(
            lambda km, keys, hist, offs:
            sum(x.sum() for x in
                with_payload_sorted_get(km, keys, hist, offs)[:2])),
            km0, keys_d, hist_d, offs_d)

    # ---- scan-wrapper overhead isolation ----
    if want("c8"):
        def body_save2(km, ct, keys, hist, offs):
            h_q, st_q = with_unsort(km, keys, hist, offs)
            h = jnp.where((ct > 0)[:, None], h_q.reshape(B, J), 0)
            from bronko_tpu.ops.map import _hist_hits
            hits = _hist_hits(h, G)
            tl = classify_tallies(hits, ct > 0, J)
            return tl, h, st_q.reshape(B, J)

        def scanned(kj2, cj2, keys, hist, offs, unroll):
            def body(tl, batch):
                km, ct = batch
                t, h, st = body_save2(km, ct, keys, hist, offs)
                return tl + t, (h, st)

            tl, (h_all, st_all) = jax.lax.scan(
                body, jnp.zeros((G, 3), jnp.int32), (kj2, cj2),
                unroll=unroll)
            return tl, h_all, st_all

        fs = jax.jit(lambda kj2, cj2, keys, hist, offs: scanned(
            kj2, cj2, keys, hist, offs, 1))
        fu = jax.jit(lambda kj2, cj2, keys, hist, offs: scanned(
            kj2, cj2, keys, hist, offs, True))

        def run_s(*a):
            tl, h, st = fs(*a)
            return (tl,)

        def run_u(*a):
            tl, h, st = fu(*a)
            return (tl,)

        timed("c8_saved_scan1", run_s, kj, cj, keys_d, hist_d, offs_d)
        timed("c8u_saved_scan1_unroll", run_u, kj, cj, keys_d, hist_d, offs_d)

    # ---- u32-split variant of the whole probe ----
    def merged32(km, keys):
        q, _, _ = front(km)
        xs = jnp.concatenate([keys, q.reshape(N2)])
        hi = (xs >> jnp.uint64(32)).astype(jnp.uint32)
        lo = xs.astype(jnp.uint32)
        ot = jnp.concatenate([jnp.zeros(U, jnp.int32),
                              1 + jnp.arange(N2, dtype=jnp.int32)])
        return jax.lax.sort((hi, lo, ot), num_keys=3, is_stable=False)

    if want("s2"):
        timed("s2_front_sort_u32", jax.jit(
            lambda km, keys: merged32(km, keys)[2].sum()), km0, keys_d)

    def with_eq32(km, keys):
        hi_s, lo_s, ot_s = merged32(km, keys)
        is_key = ot_s == 0
        rank = jnp.cumsum(is_key.astype(jnp.int32)) - 1
        rank_c = jnp.maximum(rank, 0)
        khi = (keys >> jnp.uint64(32)).astype(jnp.uint32)
        klo = keys.astype(jnp.uint32)
        eq = (khi[rank_c] == hi_s) & (klo[rank_c] == lo_s) & (rank >= 0)
        return eq, rank_c, ot_s

    if want("s3"):
        timed("s3_plus_eq_splitgather", jax.jit(
            lambda km, keys: with_eq32(km, keys)[0].sum()), km0, keys_d)

    def full32(km, ct, keys, hist, offs):
        eq, rank_c, ot_s = with_eq32(km, keys)
        h = jnp.where(eq, hist[rank_c], 0)
        st = jnp.where(eq, offs[:U][rank_c], 0)
        ordk = jnp.where(ot_s == 0, jnp.int32(2**31 - 1), ot_s)
        _, h_q, st_q = jax.lax.sort((ordk, h, st), num_keys=1,
                                    is_stable=False)
        h2 = jnp.where((ct > 0)[:, None], h_q[:N2].reshape(B, J), 0)
        from bronko_tpu.ops.map import _hist_hits
        hits = _hist_hits(h2, G)
        tl = classify_tallies(hits, ct > 0, J)
        return tl, h2, st_q[:N2].reshape(B, J)

    if want("s6"):
        fn32 = jax.jit(full32)

        def run32(km, ct, keys, hist, offs):
            tl, h, st = fn32(km, ct, keys, hist, offs)
            return (tl,)

        timed("s6_full_saved_u32", run32, km0, ct0, keys_d, hist_d, offs_d)

        # cross-check vs the current production path
        tj = jnp.zeros((G, 3), jnp.int32)
        tj, lt, st_all, h_all = tally_save_jit(kj, cj, keys_d, offs_d,
                                               hist_d, tj, mcfg)
        tl32, h32, st32 = fn32(km0, ct0, keys_d, hist_d, offs_d)
        ok_t = bool(np.array_equal(np.asarray(tj), np.asarray(tl32)))
        ok_h = bool(np.array_equal(np.asarray(h_all[0]), np.asarray(h32)))
        ok_s = bool(np.array_equal(np.asarray(st_all[0]), np.asarray(st32)))
        print(json.dumps({"u32_equal": {"tallies": ok_t, "h": ok_h,
                                        "start": ok_s}}), flush=True)


if __name__ == "__main__":
    main()

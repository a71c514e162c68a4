"""Amortized A/B of routed-row variants (the reliable instrument: R*D rows
scanned in ONE dispatch, so per-row times resolve to ~0.3 ms even through
the relay's ~35 ms sync jitter).

Variants:
  full      — the product routed row (route + probe + unroute + pass 2)
  tally     — no pass 2 (isolates pass-2 cost)
  noroute   — grouping sort + dest compare + slot machinery replaced by a
              straight placement (WRONG results, same lane counts: isolates
              the route-block cost)
  slack120  — full row with C at 1.20x instead of 1.35x

CAVEAT: this harness hardwires ov_r=0 (it times shapes, not validity),
so a slack row reporting overflow=0 does NOT prove the budget is safe —
route_budget_exact measured the bench sample's true worst group at
11521-12160 lanes at D=16, above the slack112 row's C=11520. Use the
product's exact budget for correctness; use this tool for timing only.

Usage: python tools/bench_routed_ab.py [D] [R] [mode]
  mode: 'all' (default — full ablation + slack sweep, ~11 compiles) or
        'slack' (full-row slack sweep only, ~5 compiles; each compile is
        minutes through the serving relay, so use this to answer just the
        budget question)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main() -> None:
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    mode = sys.argv[3] if len(sys.argv) > 3 else "all"

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
    W = kj1.shape[1]
    s1 = split_index(index, 1)
    keys_r, hist_r, starts_r, bounds = route_split(s1, D)
    bd = jnp.asarray(bounds[0])
    Bl = W // D
    J = len(mcfg.positions)
    N2l = Bl * J
    G = dev.num_genomes
    kjr = jnp.tile(jnp.reshape(kj1, (Bl, D)).T, (R, 1))
    cjr = jnp.tile(jnp.reshape(cj1, (Bl, D)).T, (R, 1))
    krr = jnp.tile(jnp.asarray(keys_r[:, 0]), (R, 1))
    hrr = jnp.tile(jnp.asarray(hist_r[:, 0]), (R, 1))
    srr = jnp.tile(jnp.asarray(starts_r[:, 0]), (R, 1))
    print(f"platform={jax.devices()[0].platform} D={D} R={R} Bl={Bl} "
          f"N2l={N2l}", flush=True)

    def make_tally(C, noroute=False, save=True, ablate=()):
        """ablate: subset of {'scatter','gather','dest','sort'} — replace
        that piece with a cost-shape-neutral stand-in (WRONG results)."""
        def body(carry, row):
            tl, lt, ov = carry
            km, ct, kch, hch, sch = row
            q, _, _ = _bucket_q(km, cfg=mcfg)
            qf = q.reshape(N2l)
            lane = jnp.arange(N2l, dtype=jnp.int32)
            if noroute:
                buf = jnp.zeros(D * C, jnp.uint64).at[:N2l].set(qf)
                ord_s = lane
                slot = lane
                ov_r = jnp.int32(0)
            else:
                valid = jnp.repeat(ct > 0, J)
                if "dest" in ablate:
                    dest = lane & (D - 1)
                else:
                    dest = jnp.sum((qf[:, None] >= bd[None, 1:]).astype(
                        jnp.int32), axis=1)
                    dest = jnp.where(valid, dest, D)
                sh = max((N2l - 1).bit_length(), 1)
                ckey = (dest << sh) | lane
                if "sort" in ablate:
                    ckey_s, q_s = ckey, qf
                else:
                    ckey_s, q_s = jax.lax.sort((ckey, qf), num_keys=1,
                                               is_stable=False)
                dest_s = (ckey_s >> sh).astype(jnp.int32)
                ord_s = (ckey_s & ((1 << sh) - 1)).astype(jnp.int32)
                cnts = jnp.sum((dest[:, None] == jnp.arange(
                    D, dtype=jnp.int32)[None, :]).astype(jnp.int32), axis=0)
                starts = jnp.concatenate(
                    [jnp.zeros(1, jnp.int32),
                     jnp.cumsum(cnts, dtype=jnp.int32)])
                pos = lane - starts[jnp.minimum(dest_s, D)]
                ov_r = jnp.int32(0)
                slot = dest_s * C + jnp.minimum(pos, C - 1)
                if "scatter" in ablate:
                    buf = jnp.zeros(D * C, jnp.uint64).at[:N2l].set(q_s)
                elif "oldscatter" in ablate:
                    buf = jnp.zeros(D * C, jnp.uint64).at[slot].set(
                        q_s, mode="drop", indices_are_sorted=True)
                elif "place32" in ablate:
                    i_all = jnp.arange(D * C, dtype=jnp.int32)
                    d_of = i_all // C
                    i_of = i_all - d_of * C
                    gidx = starts[d_of] + jnp.minimum(i_of, cnts[d_of])
                    gidx = jnp.minimum(gidx, N2l - 1)
                    qs32 = jax.lax.bitcast_convert_type(q_s, jnp.uint32)
                    lo = qs32[:, 0].at[gidx].get(mode="clip",
                                                 indices_are_sorted=True)
                    hi = qs32[:, 1].at[gidx].get(mode="clip",
                                                 indices_are_sorted=True)
                    vals = jax.lax.bitcast_convert_type(
                        jnp.stack([lo, hi], axis=-1), jnp.uint64)
                    buf = jnp.where(i_of < cnts[d_of], vals,
                                    jnp.zeros((), jnp.uint64))
                else:
                    buf = _route_place(q_s, (starts, cnts), D, C)
            got = _merge_probe(buf, kch, (hch, sch))
            if "gather" in ablate and not noroute:
                got = [v[:N2l] for v in got]
                out = jax.lax.sort((ord_s,) + tuple(got), num_keys=1,
                                   is_stable=False)
                vals = [o.reshape(Bl, J) for o in out[1:]]
            else:
                # production path (grouped DMA de-group) when the route
                # machinery ran; the noroute ablation keeps the gather
                # fallback (its slot is a plain iota, no groups exist)
                if noroute:
                    vals = _unroute(list(got), slot, ord_s, Bl, J)
                else:
                    vals = _unroute(list(got), slot, ord_s, Bl, J,
                                    groups=(starts, cnts), C=C)
            h = jnp.where((ct > 0)[:, None], vals[0], 0)
            hits = _hist_hits(h, G)
            tl = tl + classify_tallies(hits, ct > 0, J)
            lt = jnp.maximum(lt, hits.sum(axis=0, dtype=jnp.int64))
            ys = (vals[1], h) if save else ()
            return (tl, lt, ov | ov_r), ys

        @jax.jit
        def run(kjr, cjr, krr, hrr, srr):
            init = (jnp.zeros((G, 3), jnp.int32),
                    jnp.zeros(G, jnp.int64), jnp.int32(0))
            return jax.lax.scan(body, init, (kjr, cjr, krr, hrr, srr))

        return run

    def budget_C(slack_num, slack_den):
        C = -(-(N2l * slack_num // slack_den) // D)
        return max(128, min(N2l, (C + 127) & ~127))

    from dataclasses import replace

    def time_variant(name, C, noroute=False, with_p2=True, ablate=()):
        run = make_tally(C, noroute=noroute, save=with_p2, ablate=ablate)
        best_t = float("inf")
        for rep in range(4):
            t0 = time.time()
            (tj, lt, ov), ys = run(kjr, cjr, krr, hrr, srr)
            if with_p2:
                st_all, h_all = ys
                tallies = np.asarray(tj).astype(np.int64)
                best = (pick_best_genome(tallies, dev) if not noroute else 0)
                exact_row = max(int(np.asarray(lt)[best]), 1024)
                gcfg = replace(mcfg, total_len=dev.g_total_len,
                               max_bucket=dev.g_max_bucket,
                               lane_budget=_lane_class(exact_row, floor=1024))
                post = (dev.postings_local32
                        if dev.postings_local32 is not None
                        else dev.postings)
                pl0 = jnp.zeros((4, gcfg.total_len + 1, 4), jnp.int32)
                pileup, _ov2 = pileup_from_saved_jit(
                    kjr, cjr, st_all, h_all, post, pl0, jnp.int32(best),
                    jnp.int32(int(dev.file_bases[best])), gcfg)
                np.asarray(pileup[0, :8])
            else:
                np.asarray(tj)
            if rep:
                best_t = min(best_t, time.time() - t0)
        ovf = int(np.asarray(ov))
        print(f"{name:12s} C={C:6d} per_row={best_t / (R * D) * 1e3:7.2f} ms"
              f"  overflow={ovf}", flush=True)
        return best_t / (R * D)

    C0 = budget_C(27, 20)
    if mode == "all":
        t_tally = time_variant("tally-only", C0, with_p2=False)
        t_old = time_variant("oldscatter", C0, with_p2=False,
                             ablate=("oldscatter",))
        print(f"  gather-place win ~{(t_old - t_tally) * 1e3:.2f} ms/row",
              flush=True)
        for abl in ("scatter", "gather", "dest", "sort"):
            t = time_variant(f"no-{abl}", C0, with_p2=False, ablate=(abl,))
            print(f"  {abl} cost ~{(t_tally - t) * 1e3:.2f} ms/row",
                  flush=True)
        t_p32 = time_variant("place32", C0, with_p2=False,
                             ablate=("place32",))
        print(f"  u32-pair place win ~{(t_tally - t_p32) * 1e3:.2f} ms/row",
              flush=True)
        t_norte = time_variant("noroute", C0, noroute=True, with_p2=False)
        print(f"route cost   ~{(t_tally - t_norte) * 1e3:.2f} ms/row")
    t_full = time_variant("full+p2", C0)
    print(f"full row     ~{t_full * 1e3:.2f} ms/row")
    # slack sweep: the per-(src,dst) budget C scales every D*C-sized part
    # (place gather, all_to_all transit, probe lanes, return gathers);
    # overflow=1 marks a slack the bench sample already trips
    for num, den in ((5, 4), (6, 5), (23, 20), (9, 8), (23, 16)):
        Cs = budget_C(num, den)
        if Cs == C0:
            continue
        t = time_variant(f"slack{num * 100 // den}", Cs)
        print(f"  slack {num}/{den} full row {t * 1e3:.2f} ms/row "
              f"(vs {t_full * 1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()

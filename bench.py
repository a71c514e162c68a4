"""Benchmark: end-to-end reads/sec/chip on a deep-coverage SARS-CoV-2 sample.

Builds a 4-genome SARS-CoV-2 index (real sequences from the reference
fixtures when available, synthetic otherwise), generates a deep-coverage
FASTQ with planted variants (cached), runs the full call pipeline
(count -> map -> select -> call -> VCF), and prints ONE JSON line:

  {"metric": "reads_per_sec_per_chip", "value": N, "unit": "reads/s",
   "vs_baseline": r, "detail": {...}}

vs_baseline is MEASURED: the identical pipeline is first run in a separate
process on the host CPU (XLA CPU backend, same code, same input, same
warm-cache discipline), and vs_baseline = tpu_reads_per_sec /
host_reads_per_sec. The reference publishes no numeric baseline
(BASELINE.md), so the fair stand-in is this pipeline on the CPU the TPU is
being compared against.

detail carries the round-2 perf accounting (VERDICT r1 item 2):
  * stage times: count_s (host C++), tally_s / pileup_s (device, forced via
    np.asarray — block_until_ready under-reports through the axon relay),
    call_s (host f64 caller);
  * roofline: the map stages' irreducible work — the pass-1 merge-probe's
    two sorts of (U index keys + B*J bucket queries) lanes priced at the
    2-operand u64 sort ceiling, plus the random-access lanes (pass-2
    posting expansion x 4 accesses/lane: posting gather, fold-table
    gather, depth scatter-max, count scatter-add) priced at the
    random-gather ceiling — vs achieved device time -> roofline_pct.
    Pass 1 contributes NO random-access term since the payload pickup
    moved inside the merge sort (sort-operand + packed-cummax propagation,
    tools/bench_stages3_tpu.py c4d; the floor prices what the access
    pattern irreducibly does, and pass 1 now touches HBM only through its
    sorts). Both ceilings are MEASURED IN-SESSION at the bench's own lane
    counts (_measure_ceilings): the floor drifts with relay/compiler
    versions;
  * detail also carries the chip's live sort/gather ns-per-lane so rounds
    remain comparable even as the floor moves;
  * scaling: (a) a real-chip shard proxy — per-device map time on 1/D
    slices of the workload measured on the TPU, sync-amortized
    (_tpu_scale_sweep) — and (b) a CPU-mesh proxy (subprocess, 8 virtual
    devices) running the product ShardedMapper at 1 vs 8 devices;
    efficiency = t1 / (8 * t8), core-bound past the host's 4 cores.

Run modes (internal): `bench.py --host-baseline` and `bench.py
--scale-proxy` are the subprocess entry points; both print one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache")
REF_FIXTURES = "/root/reference/test_data/4_sarscov2"
N_READS = 300_000
READ_LEN = 150
GATHER_NS_PER_LANE = 23.0  # fallback only — the roofline uses live-measured
SORT_NS_PER_LANE = 16.0    # ceilings (_measure_ceilings): the relay-era
                           # constants drifted 16 -> 9.9 ns/lane/sort across
                           # one outage (tools/bench_probe_tpu.py)


def _ensure_data():
    os.makedirs(CACHE, exist_ok=True)
    genome_paths = []
    if os.path.isdir(REF_FIXTURES):
        genome_paths = sorted(
            os.path.join(REF_FIXTURES, f)
            for f in os.listdir(REF_FIXTURES)
            if f.endswith(".fasta")
        )
    sys.path.insert(0, REPO)
    from tests.make_synthetic import make_genome, make_sample, write_fasta, write_fastq

    rng = np.random.default_rng(2024)
    if not genome_paths:
        for g in range(4):
            p = os.path.join(CACHE, f"synth{g}.fasta")
            if not os.path.exists(p):
                write_fasta(p, f"synth{g}", make_genome(rng, 29_900))
            genome_paths.append(p)

    # three DISTINCT samples (different read draws + planted variants) so
    # batch mode measures a real cohort, not a page-cache-warm re-read of
    # one file; identical N_READS/depth keeps batch shapes (and therefore
    # compiled executables) shared across samples
    fastqs = []
    from bronko_tpu.io.fasta import read_fasta

    genome = read_fasta(genome_paths[0])[0].seq.upper()
    L = len(genome)
    depth = N_READS * READ_LEN // L
    for s in range(3):
        fastq = os.path.join(CACHE, f"deep_{N_READS}_s{s}.fastq.gz")
        fastqs.append(fastq)
        if os.path.exists(fastq):
            continue
        majors = {int(p): 0.9 for p in rng.integers(1000, L - 1000, 8)}
        minors = {int(p): float(f) for p, f in zip(
            rng.integers(1000, L - 1000, 12), 0.05 + 0.2 * rng.random(12))}
        reads, _ = make_sample(
            genome, rng, read_len=READ_LEN, depth=depth,
            major_positions=majors, minor_positions=minors, error_rate=0.003,
        )
        write_fastq(fastq, reads[:N_READS])
    return genome_paths, fastqs


def _single_sample_run(index, dev, cfg, fastq):
    """One full single-sample pipeline pass with per-stage forced timings.

    Returns a dict of stage timings plus the lane/byte accounting needed
    for the roofline figures."""
    import jax.numpy as jnp

    from bronko_tpu.call.engine import (
        _prepare_batches, call_sample_variants, count_sample,
        pick_best_genome, run_pileup_saved,
    )
    from bronko_tpu.ops.map import tally_save_jit

    mcfg = dev.map_config(cfg.n_fixed, cfg.use_full_kmer)
    J = len(mcfg.positions)

    t_start = time.time()
    kmers, counts, cstats = count_sample(fastq, cfg, index.k)
    t_count = time.time()

    kj, cj = _prepare_batches(kmers, counts, cfg.batch_size)
    h2d_bytes = kj.size * 8 + cj.size * 4
    # force the upload OUT of the tally stage: ~2 MB through the axon
    # relay costs ~100 ms and is NOT device map work (the cohort pipeline
    # overlaps it with host counting; the roofline prices device compute).
    # Forced via np.asarray of slices — block_until_ready under-reports
    # through the relay (CLAUDE.md)
    np.asarray(kj[0, :8])
    np.asarray(cj[0, :8])
    t_h2d = time.time()
    tj = jnp.zeros((dev.num_genomes, 3), jnp.int32)
    tj, lane_tot, ii_all, h_all = tally_save_jit(
        kj, cj, dev.keys, dev.offsets, dev.hist, tj, mcfg)
    tallies = np.asarray(tj).astype(np.int64)  # forces pass-1 completion
    t_tally = time.time()

    best = pick_best_genome(tallies, dev)
    pileup = run_pileup_saved(kj, cj, (ii_all, h_all), dev, best, mcfg,
                              n_kmers=kmers.shape[0],
                              exact_lanes=int(np.asarray(lane_tot)[best]))
    # force pass-2 completion with a small transfer (full pileup moves later)
    np.asarray(pileup[0, :8])
    t_pileup = time.time()

    records, stats, _ = call_sample_variants(index, dev, cfg, best, pileup)
    t_call = time.time()

    # FUSED production path (samples 2+ of a cohort): both passes + device
    # genome selection in ONE dispatch with the rolling static budget —
    # this is what the roofline prices (map_fused_jit); best-of-3
    from dataclasses import replace

    from bronko_tpu.call.engine import _pass2_budget
    from bronko_tpu.ops.map import map_fused_jit

    import jax as _jax

    if _jax.default_backend() == "cpu":
        # host-baseline subprocess: the fused figure only feeds the TPU
        # roofline -- skip its extra compile + 4 full map replays
        return dict(
            reads=cstats.total_reads,
            unique=cstats.unique_counted_kmers,
            n_variants=len(records),
            count_s=t_count - t_start,
            h2d_s=t_h2d - t_count,
            fused_map_s=-1.0,
            tally_s=t_tally - t_h2d,
            pileup_s=t_pileup - t_tally,
            call_s=t_call - t_pileup,
            total_s=t_call - t_start,
            probe_lanes=cstats.unique_counted_kmers * J,
            scatter_lanes=int(np.asarray(pileup[2:].sum())),
            sort_lanes=kj.shape[0] * int(dev.keys.shape[0]) + kj.size * J,
            h2d_bytes=h2d_bytes,
        )

    exact = int(np.asarray(lane_tot)[best])
    budget = _pass2_budget(kj, mcfg, None, exact * 5 // 4 + 1024)
    gcfg = replace(mcfg, total_len=dev.g_total_len,
                   max_bucket=dev.g_max_bucket, lane_budget=budget)
    glen2 = jnp.asarray(2 * np.asarray(dev.genome_lens, np.int64))
    fbases = jnp.asarray(np.asarray(dev.file_bases, np.int32))
    post = (dev.postings_local32 if dev.postings_local32 is not None
            else dev.postings)
    fused_map_s = float("inf")
    for rep in range(4):  # rep 0 compiles
        t0f = time.time()
        tj0 = jnp.zeros((dev.num_genomes, 3), jnp.int32)
        outf = map_fused_jit(kj, cj, dev.keys, dev.offsets, dev.hist, post,
                             tj0, glen2, fbases, mcfg, gcfg)
        # ONE forced transfer: p16 depends on pileup <- best <- tallies,
        # so a slice of it awaits the WHOLE program; a second np.asarray
        # costs a full extra relay RTT (~10-25 ms) that is transfer
        # latency, not device map work (r5 ledger: it masqueraded as a
        # ~25 ms fused-vs-stage-sum overhead)
        np.asarray(outf[8][0, :8])
        if rep:
            fused_map_s = min(fused_map_s, time.time() - t0f)
    assert not int(np.asarray(outf[6])), "fused bench budget overflow"

    # pass-2 scatter lanes = total (kmer, posting) events = count-plane mass
    lanes2 = int(np.asarray(pileup[2:].sum()))
    return dict(
        reads=cstats.total_reads,
        unique=cstats.unique_counted_kmers,
        n_variants=len(records),
        count_s=t_count - t_start,
        h2d_s=t_h2d - t_count,
        fused_map_s=fused_map_s,
        tally_s=t_tally - t_h2d,
        pileup_s=t_pileup - t_tally,
        call_s=t_call - t_pileup,
        total_s=t_call - t_start,
        probe_lanes=cstats.unique_counted_kmers * J,
        scatter_lanes=lanes2,
        # per scanned batch the merge probe sorts (U keys + B*J queries)
        sort_lanes=kj.shape[0] * int(dev.keys.shape[0]) + kj.size * J,
        h2d_bytes=h2d_bytes,
        # live device handles for the per-op ledger (_roofline_ledger);
        # popped before serialization
        _handles=dict(kj=kj, cj=cj, mcfg=mcfg, gcfg=gcfg, best=best,
                      saved=(ii_all, h_all), exact=exact),
    )


def _measure_ceilings(sort_lanes: int, gather_lanes: int) -> tuple[float, float, bool]:
    """Measure THIS session's sort and random-gather ceilings at the bench's
    own lane counts. The roofline used to cite constants measured in an
    earlier session, but the achievable floor drifts with the serving
    relay / compiler version (observed 16 -> 9.9 ns/lane/sort across one
    relay outage) — denominating achieved time in a stale floor misreports
    the roofline %. Falls back to the documented constants on failure."""
    import jax
    import jax.numpy as jnp

    try:
        rng = np.random.default_rng(0)
        # the probe's irreducible op: a 2-operand u64 merge sort
        xs = jnp.asarray(rng.integers(0, 2**63, size=sort_lanes, dtype=np.uint64))
        ot = jnp.arange(sort_lanes, dtype=jnp.int32)
        sort2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2,
                                                  is_stable=False))
        ts = []
        for _ in range(4):  # lap 0 compiles
            t0 = time.time()
            out = sort2(xs, ot)
            np.asarray(out[0][:4])  # forced: block_until_ready under-reports
            ts.append(time.time() - t0)
        sort_ns = min(ts[1:]) / sort_lanes * 1e9

        # random HBM gather at the map passes' access count
        U = 1 << 20
        tbl = jnp.asarray(rng.integers(0, 1 << 30, size=U, dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, U, size=max(gather_lanes, 1),
                                       dtype=np.int32))
        gfn = jax.jit(lambda t, i: t[i])
        ts = []
        for _ in range(4):
            t0 = time.time()
            r = gfn(tbl, idx)
            np.asarray(r[:4])
            ts.append(time.time() - t0)
        gather_ns = min(ts[1:]) / max(gather_lanes, 1) * 1e9
        return round(sort_ns, 2), round(gather_ns, 2), True
    except Exception as e:  # noqa: BLE001
        print(f"# ceiling measurement failed ({e!r}); using fallback constants",
              file=sys.stderr)
        return SORT_NS_PER_LANE, GATHER_NS_PER_LANE, False


def _roofline_ledger(dev, handles, fused_map_s: float, gather_ns: float,
                     budget_s: float = 900.0) -> dict | None:
    """Per-op ledger of the fused map's device time (VERDICT r4 item 1:
    two rounds flat at ~67% roofline — account for the residual op by op
    or prove each component at its measured ceiling).

    Method: CUMULATIVE composition (tools/bench_stages3_tpu.py's
    methodology — isolated pieces each pay their own ~35 ms relay
    dispatch and don't sum to the anchor): stage i's jit performs stages
    0..i of the REAL pass bodies (ops/map.py _tally_save_body /
    _pileup_from_saved_body inlined op-for-op) and reduces everything
    produced so far (so XLA cannot dead-code-eliminate prior stages);
    consecutive deltas attribute wall time to single ops even under
    relay-latency drift. Each delta is then priced against an
    op-appropriate MEASURED ceiling:

      * sorts: a pure lax.sort of the same operand tuple at the same
        lane count (compiled alone);
      * random gathers/scatters: lanes x the session gather ceiling;
      * scan ops (cumsum/cummax): a pure cummax at the same lanes;
      * elementwise stages: estimated HBM bytes / measured stream BW.

    x = measured_delta / floor; ~1.0 means at-ceiling, the biggest x is
    the next optimization target. Ledger entries are ms per fused-map
    dispatch (nb=1 bench shape)."""
    import jax
    import jax.numpy as jnp

    from bronko_tpu.ops.map import (
        _bucket_q, _expand_lanes, _fold_pc, _hist_hits, _saved_lens_prefix,
        classify_tallies,
    )

    t_ledger0 = time.time()
    km = handles["kj"][0]
    ct = handles["cj"][0]
    mcfg, gcfg = handles["mcfg"], handles["gcfg"]
    best = int(handles["best"])
    start_d, h_d = handles["saved"]
    start0, h0 = start_d[0], h_d[0]
    keys, hist, offsets = dev.keys, dev.hist, dev.offsets
    post = (dev.postings_local32 if dev.postings_local32 is not None
            else dev.postings)
    B = int(km.shape[0])
    J = len(mcfg.positions)
    U = int(keys.shape[0])
    N2 = B * J
    LB = int(gcfg.lane_budget)
    G = mcfg.num_genomes
    T = int(gcfg.total_len)
    fbase = jnp.int32(int(dev.file_bases[best]))
    best_j = jnp.int32(best)
    k = mcfg.k

    def timed(fn, args, reps=3):
        f = jax.jit(fn)
        ts = []
        for _ in range(reps + 1):   # lap 0 compiles
            t0 = time.time()
            r = f(*args)
            np.asarray(r)           # forced transfer (relay under-reports)
            ts.append(time.time() - t0)
        return min(ts[1:])

    # per-dispatch overhead at this epoch: every stage jit pays ONE of
    # these; cumulative deltas cancel it except in each pass's FIRST
    # stage, and every pure-op ceiling includes it — both corrected below
    disp_s = timed(lambda a: a.sum(), (jnp.zeros(8, jnp.int32),))

    # ---------- pass 1: probe + histogram tally (sortops narrow path) ----
    def p1(stage):
        def fn(km, ct, keys, hist, offsets):
            q, _canon, _isrc = _bucket_q(km, cfg=mcfg)
            if stage == 0:                       # bucket_q
                return q.astype(jnp.uint32).sum()
            Bq = q.size
            xs = jnp.concatenate([keys, q.reshape(Bq)])
            ot = jnp.concatenate(
                [jnp.arange(U, dtype=jnp.int32) - jnp.int32(U),
                 1 + jnp.arange(Bq, dtype=jnp.int32)])
            kcols = []
            for p in (hist, offsets[:U]):
                if p.dtype.itemsize == 8:
                    cu = p.astype(jnp.uint64)
                    kcols.append(cu.astype(jnp.uint32))
                    kcols.append((cu >> jnp.uint64(32)).astype(jnp.uint32))
                else:
                    kcols.append(p.astype(jnp.uint32))
            qpad = jnp.zeros(Bq, jnp.uint32)
            ops = jax.lax.sort(
                (xs, ot) + tuple(jnp.concatenate([c, qpad]) for c in kcols),
                num_keys=2, is_stable=False)
            if stage == 1:                       # merge sort
                # consume EVERY output so XLA materializes the whole
                # sort here rather than deferring columns to later deltas
                return (ops[0].astype(jnp.uint32).sum() + ops[1].sum()
                        + sum(c.sum() for c in ops[2:]))
            xs_s, ot_s = ops[0], ops[1]
            is_key = ot_s < 0
            prop = jax.lax.cummax(jnp.where(is_key, xs_s,
                                            jnp.zeros((), xs.dtype)))
            pos1 = (jnp.arange(xs.shape[0], dtype=jnp.int32)
                    + jnp.int32(1)).astype(jnp.int64) << 32
            cols = []
            seen_key = None
            for c_s in ops[2:]:
                packed = jnp.where(is_key, pos1 | c_s.astype(jnp.int64),
                                   jnp.int64(0))
                vp = jax.lax.cummax(packed)
                if seen_key is None:
                    seen_key = vp != 0
                    eq = (prop == xs_s) & seen_key
                cols.append(jnp.where(eq, vp.astype(jnp.uint32),
                                      jnp.uint32(0)))
            if stage == 2:                       # payload pickup cummaxes
                return sum(c.sum() for c in cols) + eq.sum()
            ordk = jnp.where(is_key, jnp.int32(2**31 - 1), ot_s)
            out = jax.lax.sort((ordk, *cols), num_keys=1, is_stable=False)
            taken = [c[:Bq].reshape(q.shape) for c in out[1:]]
            if stage == 3:                       # unsort
                return sum(c.sum() for c in taken) + out[0].sum()
            if hist.dtype.itemsize == 8:
                h2 = (taken[0].astype(jnp.uint64)
                      | (taken[1].astype(jnp.uint64) << jnp.uint64(32))
                      ).astype(hist.dtype)
                start2 = taken[2].astype(jnp.int32)
            else:
                h2 = taken[0].astype(hist.dtype)
                start2 = taken[1].astype(jnp.int32)
            valid = (ct > 0)[:, None]
            h2 = jnp.where(valid, h2, jnp.zeros((), h2.dtype))
            hits = _hist_hits(h2, G)
            tl = classify_tallies(hits, ct > 0, J)
            lt = hits.sum(axis=0, dtype=jnp.int64)
            return tl.sum() + lt.sum() + start2.sum()        # full pass 1
        return fn

    # ---------- pass 2: fold + expand + gather + decode + scatter --------
    def p2(stage):
        def fn(km, ct, start, h, post):
            pc = _fold_pc(km, ct, cfg=gcfg)
            if stage == 0:                       # fold_pc
                return pc.sum()
            lens, prefix = _saved_lens_prefix(h, best_j)
            startf = (start + prefix).reshape(N2).astype(jnp.int32)
            lensf = lens.reshape(N2)
            if stage == 1:                       # lens_prefix
                return pc.sum() + startf.sum() + lensf.sum()
            own_c, pidx_s, lane_valid, total = _expand_lanes(startf, lensf, LB)
            if stage == 2:                       # expand_lanes
                return pc.sum() + own_c.sum() + pidx_s.sum() + total
            pv = post[pidx_s]
            if stage == 3:                       # posting gather (random)
                return pc.sum() + pv.sum() + own_c.sum()
            # decode (inlined from _scatter_lanes, minus the scatters)
            if pv.dtype == jnp.int32:
                g = pv >> 6
                m = pv & 63
            else:
                g = (pv >> 22).astype(jnp.int32) - fbase
                m = (pv & 0x3FFFFF).astype(jnp.int32)
            idx = m & 31
            is_canon = (m >> 5) & 1
            b = own_c // J
            v = pc[b * k + idx]                  # fold-table gather (random)
            base = jnp.where(is_canon == 1, (v >> 2) & 3, v & 3)
            fwd = (is_canon == ((v >> 4) & 1))
            n_lane = v >> 5
            pos = jnp.where(lane_valid, g, T)
            cell = pos * 4 + base
            row_len = (T + 1) * 4
            from bronko_tpu.ops.map import (
                PLANE_CNT_FWD, PLANE_CNT_REV, PLANE_DEPTH_FWD,
                PLANE_DEPTH_REV,
            )
            depth_target = jnp.where(fwd, PLANE_DEPTH_FWD * row_len,
                                     PLANE_DEPTH_REV * row_len) + cell
            cnt_target = jnp.where(fwd, PLANE_CNT_FWD * row_len,
                                   PLANE_CNT_REV * row_len) + cell
            if stage == 4:                       # fold gather + decode
                return (depth_target.sum() + cnt_target.sum()
                        + n_lane.sum())
            flat = jnp.zeros(4 * row_len, jnp.int32)
            flat = flat.at[depth_target].max(jnp.where(lane_valid, n_lane, 0))
            flat = flat.at[cnt_target].add(lane_valid.astype(jnp.int32))
            return flat.sum()                    # scatters (full pass 2)
        return fn

    # ---------- op-appropriate ceilings ---------------------------------
    rng = np.random.default_rng(7)
    SL = U + N2

    def pure_sort_ceiling(dtypes, num_keys):
        arrs = []
        for dt in dtypes:
            if dt == np.uint64:
                arrs.append(jnp.asarray(rng.integers(0, 2**63, SL,
                                                     dtype=np.uint64)))
            elif dt == np.int32:
                arrs.append(jnp.asarray(rng.integers(-2**31, 2**31 - 1, SL,
                                                     dtype=np.int64)
                                        .astype(np.int32)))
            else:
                arrs.append(jnp.asarray(rng.integers(0, 2**32, SL,
                                                     dtype=np.uint64)
                                        .astype(np.uint32)))

        def fn(*a):
            out = jax.lax.sort(a, num_keys=num_keys, is_stable=False)
            # POSITION-WEIGHTED sums: a plain sum over any sorted column
            # is permutation-invariant, so XLA can delete the sort
            # (observed: a "pure" single-key i32 sort measuring 0.1 ms)
            w = jnp.arange(SL, dtype=jnp.int64)
            return sum((o.astype(jnp.int64) * w).sum() for o in out)
        return timed(fn, arrs)

    n_pay = 2 if hist.dtype.itemsize == 4 else 3
    # pure-op ceilings pay their own dispatch; subtract it so floors
    # compare against the dispatch-cancelled stage deltas
    dd = disp_s

    sort1_pure = max(pure_sort_ceiling([np.uint64, np.int32]
                                       + [np.uint32] * n_pay, 2) - dd, 1e-4)
    sortu_pure = max(pure_sort_ceiling([np.int32] + [np.uint32] * n_pay, 1)
                     - dd, 1e-4)
    x64 = jnp.asarray(rng.integers(0, 2**62, SL, dtype=np.int64))
    cummax_pure = max(timed(lambda a: jax.lax.cummax(a).sum(), (x64,)) - dd,
                      1e-4)
    big = jnp.asarray(rng.integers(0, 2**31, 16 << 20, dtype=np.int32))
    bw_s = max(timed(lambda a: (a + 1).sum(), (big,)) - dd, 1e-4)
    bw_ns_per_byte = bw_s / (2 * 4 * (16 << 20)) * 1e9  # read + write
    flatN = 4 * (T + 1) * 4
    sidx = jnp.asarray(rng.integers(0, flatN, LB, dtype=np.int32))
    sval = jnp.asarray(rng.integers(0, 1000, LB, dtype=np.int32))
    scat_pure = max(timed(
        lambda i, v: jnp.zeros(flatN, jnp.int32).at[i].add(v).sum(),
        (sidx, sval)) - dd, 1e-4)
    # expand's irreducible op: TWO single-key i64 sorts with one payload
    # at N2 + LB lanes (the merge + its unsort) — measured directly so
    # the floor tracks the radix lowering, position-weighted so the sort
    # can't be DCE'd
    EL = N2 + LB
    ek = jnp.asarray(rng.integers(0, 2**62, EL, dtype=np.int64))
    ep = jnp.asarray(rng.integers(0, 2**32, EL, dtype=np.uint64)
                     .astype(np.uint32))
    we = jnp.arange(EL, dtype=jnp.int64)

    def esort(a, b):
        out = jax.lax.sort((a, b), num_keys=1, is_stable=False)
        return sum((o.astype(jnp.int64) * we).sum() for o in out)
    expand_sort_pure = max(timed(esort, (ek, ep)) - dd, 1e-4)

    def ew_floor_ms(bytes_moved):
        return bytes_moved * bw_ns_per_byte * 1e-6

    p1_floors = {
        # unpack (B,k) i32 + revcomp + J u64 queries out
        "bucket_q": ew_floor_ms(B * k * 4 * 3 + N2 * 8),
        "merge_sort": sort1_pure * 1e3,
        "pickup_cummax": (1 + n_pay) * cummax_pure * 1e3,
        "unsort": sortu_pure * 1e3,
        # (B,J) hist -> (B,G) hits -> tallies: ~4 passes over (B,J)
        "hist_classify": ew_floor_ms(N2 * hist.dtype.itemsize * 4),
    }
    p2_floors = {
        "fold_pc": ew_floor_ms(B * k * 4 * 3),
        "lens_prefix": ew_floor_ms(N2 * (h0.dtype.itemsize + 8)),
        # two single-key radix sorts (merge + unsort) + the packed cummax
        # + cumsum, all at N2+LB lanes
        "expand_lanes": (2 * expand_sort_pure
                         + 2 * cummax_pure / SL * (N2 + LB)) * 1e3,
        "posting_gather": LB * gather_ns * 1e-6,
        "fold_gather_decode": LB * gather_ns * 1e-6 + ew_floor_ms(LB * 16),
        "scatters": 2 * LB * gather_ns * 1e-6,
    }

    out = {"method": "cumulative deltas (dispatch-cancelled) vs "
                     "dispatch-corrected per-op measured ceilings",
           "dispatch_ms": round(disp_s * 1e3, 2),
           "shapes": {"B": B, "J": J, "U": U, "LB": LB, "T": T,
                      "sort_lanes": SL},
           "ceilings": {
               "sort_merge_pure_ms": round(sort1_pure * 1e3, 2),
               "sort_unsort_pure_ms": round(sortu_pure * 1e3, 2),
               "cummax_pure_ms": round(cummax_pure * 1e3, 2),
               "scatter_add_pure_ms": round(scat_pure * 1e3, 2),
               "expand_sort_pure_ms": round(expand_sort_pure * 1e3, 2),
               "stream_bw_GBps": round(1.0 / bw_ns_per_byte, 1),
               "gather_ns": gather_ns,
           },
           "pass1": {}, "pass2": {}, "truncated": False}

    p1_names = ["bucket_q", "merge_sort", "pickup_cummax", "unsort",
                "hist_classify"]
    p2_names = ["fold_pc", "lens_prefix", "expand_lanes", "posting_gather",
                "fold_gather_decode", "scatters"]
    def run_pass(names, floors, builder, args, key):
        # prev starts at disp_s: each pass's first stage pays one
        # dispatch that later deltas cancel — without this the first op
        # absorbs ~an entire dispatch of phantom cost
        prev = disp_s
        for i, name in enumerate(names):
            if time.time() - t_ledger0 > budget_s:
                out["truncated"] = True
                break
            cum = timed(builder(i), args)
            d = max(cum - prev, 0.0)
            fl = floors[name]
            out[key][name] = {
                "ms": round(d * 1e3, 2), "floor_ms": round(fl, 2),
                "x": round(d * 1e3 / fl, 2) if fl > 0 else None,
                "cum_ms": round(cum * 1e3, 2)}
            prev = max(cum, prev)
        return prev - disp_s

    p1_total = run_pass(p1_names, p1_floors, p1,
                        (km, ct, keys, hist, offsets), "pass1")
    p2_total = run_pass(p2_names, p2_floors, p2,
                        (km, ct, start0, h0, post), "pass2")
    out["pass1_total_ms"] = round(p1_total * 1e3, 2)
    out["pass2_total_ms"] = round(p2_total * 1e3, 2)
    out["stages_sum_ms"] = round((p1_total + p2_total) * 1e3, 2)
    out["fused_measured_ms"] = round(fused_map_s * 1e3, 2)
    # re-measure the REAL fused dispatch in THIS epoch (the headline
    # fused_map_s was measured minutes earlier; relay wall drifts +/-30%
    # and an epoch-mismatched fused-vs-sum misattributes drift as fusion
    # overhead)
    try:
        from bronko_tpu.ops.map import map_fused_jit

        kjh, cjh = handles["kj"], handles["cj"]
        glen2 = jnp.asarray(2 * np.asarray(dev.genome_lens, np.int64))
        fbases = jnp.asarray(np.asarray(dev.file_bases, np.int32))
        ts = []
        for _ in range(3):
            tj0 = jnp.zeros((dev.num_genomes, 3), jnp.int32)
            t0 = time.time()
            outf = map_fused_jit(kjh, cjh, keys, offsets, hist, post, tj0,
                                 glen2, fbases, mcfg, gcfg)
            # one transfer forces the whole program (see _single_sample_run)
            np.asarray(outf[8][0, :8])
            ts.append(time.time() - t0)
        fused_now = min(ts[1:])
        out["fused_now_ms"] = round(fused_now * 1e3, 2)
        # fused = pass1 + pass2 + ONE dispatch + cross-pass fusion;
        # after dispatch cancellation this is the fusion/overhead term
        out["fused_vs_sum_ms"] = round(
            (fused_now - disp_s - p1_total - p2_total) * 1e3, 2)
    except Exception as e:  # noqa: BLE001
        print(f"# ledger fused re-measure failed: {e!r}", file=sys.stderr)
        out["fused_vs_sum_ms"] = round(
            (fused_map_s - disp_s - p1_total - p2_total) * 1e3, 2)
    out["ledger_wall_s"] = round(time.time() - t_ledger0, 1)
    return out


def _tpu_scale_sweep(index, dev, cfg, fastq, full_map_s: float) -> dict | None:
    """Shard-scaling proxy measured ON THE REAL CHIP (the CPU-mesh proxy is
    core-bound past 4 virtual devices and lower-bounds true scaling).

    The product engine has TWO data-parallel layouts:
      * batch-granular (multi-batch samples): each device maps WHOLE
        batches — per-device work is compute-identical to single-chip, so
        throughput scaling is limited only by collectives (<2% analytic,
        docs/design.md) and batch-count granularity. This is the
        production cohort mode and the basis of the >=80%-efficiency
        claim.
      * intra-batch (single-batch samples): each device probes a B/D
        slice of the one batch, paying the per-batch fixed cost (the
        merge probe re-sorts the U index keys per shard) every time.
    One chip measures both: the per-ROW map time at row widths W and W/D,
    where the W/D rows come from RESHAPING the real batch (no padding
    distortion), sync cost amortized over R repeated rows scanned in one
    dispatch. intra_batch_efficiency(D) = t_row(W) / (D * t_row(W/D)) —
    its decay is exactly the measured fixed-sort term that motivates the
    batch-granular layout.

    BRONKO_BENCH_SCALE=0 skips (two extra executable shapes ≈ minutes of
    relay compile)."""
    if os.environ.get("BRONKO_BENCH_SCALE", "1").strip().lower() in (
            "0", "false", "no", "off"):
        return None
    try:
        import jax.numpy as jnp

        from bronko_tpu.call.engine import (
            _prepare_batches, count_sample, pick_best_genome, run_pileup_saved,
        )
        from bronko_tpu.ops.map import tally_save_jit

        mcfg = dev.map_config(cfg.n_fixed, cfg.use_full_kmer)
        kmers, counts, _ = count_sample(fastq, cfg, index.k)
        kj1, cj1 = _prepare_batches(kmers, counts, cfg.batch_size,
                                    multiple=16)
        if kj1.shape[0] != 1:
            return None  # sweep assumes the bench sample fits one batch
        W = kj1.shape[1]

        def per_row_map_s(D: int, R: int) -> float:
            """Map time per (W/D)-wide row: the real batch reshaped into
            D shard rows, tiled R times, scanned in ONE dispatch (syncs
            amortized; residual sync cost biases efficiency DOWN)."""
            kj = jnp.tile(jnp.reshape(kj1, (D, W // D)), (R, 1))
            cj = jnp.tile(jnp.reshape(cj1, (D, W // D)), (R, 1))
            best_t = float("inf")
            for rep in range(3):  # rep 0 compiles the (R*D, W/D) shapes
                t0 = time.time()
                tj = jnp.zeros((dev.num_genomes, 3), jnp.int32)
                tj, lane_tot, ii_all, h_all = tally_save_jit(
                    kj, cj, dev.keys, dev.offsets, dev.hist, tj, mcfg)
                tallies = np.asarray(tj).astype(np.int64)
                best = pick_best_genome(tallies, dev)
                pileup = run_pileup_saved(
                    kj, cj, (ii_all, h_all), dev, best, mcfg,
                    n_kmers=kmers.shape[0] // D,
                    exact_lanes=int(np.asarray(lane_tot)[best]))
                np.asarray(pileup[0, :8])
                if rep:
                    best_t = min(best_t, time.time() - t0)
            return best_t / (R * D)

        def per_row_routed_map_s(D: int, R: int) -> float:
            """ROUTED-layout per-device work measured on one chip: each
            scan row plays one device of a Dx1 routed mesh — its (W/D)-
            k-mer slice pays the local dest-grouping sort, the merge probe
            runs against ONE U/D-row key chunk (rows cycle over the D
            chunks, so aggregate probe work matches the real mesh), the
            return-trip unsort restores lane order, and pass 2 expands the
            slice's saved artifacts at a 1/D lane budget via the REAL
            product executable (pileup_from_saved_jit — identical to what
            make_routed_pileup_scan runs per device). all_to_all transit
            (~8 B/query over ICI) is not measurable single-chip and is
            excluded (analytically sub-ms per step; docs/design.md)."""
            import jax

            from bronko_tpu.ops.map import (
                _bucket_q, _hist_hits, _merge_probe, classify_tallies,
                pileup_from_saved_jit,
            )
            from bronko_tpu.parallel.pipeline import (
                _route_group, _route_place, _unroute, route_split,
                split_index,
            )

            s1 = split_index(index, 1)
            keys_r, hist_r, starts_r, bounds = route_split(s1, D)
            bd = jnp.asarray(bounds[0])
            Bl = W // D
            J = len(mcfg.positions)
            N2l = Bl * J
            from bronko_tpu.parallel.pipeline import route_budget_exact

            # EXACT quantized budget on the placed layout — the same C
            # selection the --mesh engine makes (route_budget_exact)
            kp = np.reshape(np.asarray(kj1), (1, Bl, D)).transpose(
                0, 2, 1).reshape(1, W)
            cp = np.reshape(np.asarray(cj1), (1, Bl, D)).transpose(
                0, 2, 1).reshape(1, W)
            C = route_budget_exact(kp, cp, mcfg, bounds, D)
            G = dev.num_genomes
            # STRIDED rows (row d = kj1[d::D]), matching the engine's
            # place_batches deinterleave: contiguous slices of the value-
            # sorted k-mer array concentrate queries on few key chunks
            # (measured 7.7x the equal share at D=16 — BENCH_r03's routed
            # rows were empty because that skew blew the routing budget)
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
                    # narrow sort-operand pickup, matching what a REAL
                    # Dx1 device runs (nb=1, no scan); this proxy's
                    # scan+ys shape compiles fine (unlike
                    # _tally_save_body's, see the sortops gating note)
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

            from bronko_tpu.call.engine import _lane_class

            best_t = float("inf")
            for rep in range(3):
                t0 = time.time()
                tj, lt, ov_r, st_all, h_all = tally_rows(
                    kjr, cjr, krr, hrr, srr)
                tallies = np.asarray(tj).astype(np.int64)
                msg = "routed proxy routing budget overflow"
                assert not int(np.asarray(ov_r)), msg
                best = pick_best_genome(tallies, dev)
                # per-ROW exact budget (max over rows), like the routed
                # engine's lane_totals/D sizing — an inflated budget makes
                # pass 2 pay phantom lanes and poisons the proxy
                exact_row = int(np.asarray(lt)[best])
                gcfg = replace(
                    mcfg, total_len=dev.g_total_len,
                    max_bucket=dev.g_max_bucket,
                    lane_budget=_lane_class(exact_row, floor=1024))
                post = (dev.postings_local32
                        if dev.postings_local32 is not None
                        else dev.postings)
                pl0 = jnp.zeros((4, gcfg.total_len + 1, 4), jnp.int32)
                pileup, ov = pileup_from_saved_jit(
                    kjr, cjr, st_all, h_all, post, pl0, jnp.int32(best),
                    jnp.int32(int(dev.file_bases[best])), gcfg)
                assert not int(ov), "routed proxy pass-2 budget overflow"
                np.asarray(pileup[0, :8])
                if rep:
                    best_t = min(best_t, time.time() - t0)
            return best_t / (R * D), C

        per_row_s = {1: per_row_map_s(1, 4)}
        routed_s = {}
        routed_ici = {}
        routed_errs = {}
        # D=2 anchors the LOW end of the routed-vs-B-split crossover —
        # _routed_wins' 0.15 constant was two-point-calibrated (D=4,
        # D=16; ADVICE r4) and D=2 is where B-split should win
        for D in (2, 4, 16):
            per_row_s[D] = per_row_map_s(D, 4)
            # one retry: relay contention transiently fails dispatches
            # (BENCH_r03 shipped empty routed rows from exactly this)
            for attempt in (0, 1):
                try:
                    routed_s[D], C_used = per_row_routed_map_s(D, 4)
                    # analytic ICI transit the single-chip proxy cannot
                    # measure: D*C u64 queries out + 8 B/query of payload
                    # (hist word + CSR start) back, per device per row
                    routed_ici[D] = {
                        "bytes_per_device": D * C_used * 16,
                        "ms_at_100GBps": round(
                            D * C_used * 16 / 100e9 * 1e3, 3),
                    }
                    routed_errs.pop(D, None)
                    break
                except Exception as e:  # noqa: BLE001
                    routed_errs[D] = repr(e)[:160]
                    print(f"# routed proxy D={D} attempt {attempt} "
                          f"failed: {e!r}", file=sys.stderr)
        return {
            "kind": "real_chip_shard_proxy",
            "note": ("per-shard-row map time measured on the TPU (real "
                     "batch reshaped, sync-amortized); batch-granular DP "
                     "executes whole rows per device, so its per-device "
                     "compute equals the D=1 row exactly and efficiency "
                     "is collective-bound (<2% analytic); 'routed' rows "
                     "measure the hash-range routed layout (key table "
                     "partitioned over 'data', queries travel via "
                     "all_to_all) that the --mesh engine uses for "
                     "single-batch samples"),
            "per_row_map_s": {str(d): round(t, 4)
                              for d, t in per_row_s.items()},
            "intra_batch_efficiency": {
                str(d): round(per_row_s[1] / (d * t), 3)
                for d, t in per_row_s.items() if d > 1},
            "per_row_routed_map_s": {str(d): round(t, 4)
                                     for d, t in routed_s.items()},
            "routed_intra_batch_efficiency": {
                str(d): round(per_row_s[1] / (d * t), 3)
                for d, t in routed_s.items()},
            # the proxy prices collectives at ZERO; this is the exact
            # transit volume and its analytic cost on ~100 GB/s ICI —
            # sub-ms against the multi-ms rows, so the superlinear
            # efficiencies survive the collective term on real hardware
            "routed_ici_analytic": {str(d): v
                                    for d, v in routed_ici.items()},
            **({"routed_proxy_errors":
                {str(d): m for d, m in routed_errs.items()}}
               if routed_errs else {}),
            "batch_granular_efficiency": "compute-identical per device; "
                                         "limited by <2% collectives + "
                                         "nb % D granularity",
            "sample_map_s_unreplicated": round(full_map_s, 4),
        }
    except Exception as e:  # noqa: BLE001
        print(f"# tpu scale sweep failed: {e!r}", file=sys.stderr)
        return None


def _pipeline_main():
    """Shared body for the in-process TPU run and the --host-baseline run."""
    genome_paths, fastqs = _ensure_data()
    fastq = fastqs[0]

    import bronko_tpu  # noqa: F401
    import jax

    from bronko_tpu.call.engine import run_call
    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index

    platform = jax.devices()[0].platform
    cfg = CallConfig(db="bench", reads=[fastq], output=os.path.join(CACHE, "out"))
    os.makedirs(cfg.output, exist_ok=True)

    t0 = time.time()
    index = build_index(cfg.kmer, genome_paths)
    dev = build_device_index(index)
    build_s = time.time() - t0

    assert dev.hist is not None and dev.fid_grouped, "bench expects a small panel"

    warm = _single_sample_run(index, dev, cfg, fastq)  # compile warmup
    # steady state, best-of-3 by total_s: relay latency drifts +/-30%
    # run-to-run, and a single draw misreports the per-stage times
    r = min((_single_sample_run(index, dev, cfg, fastq) for _ in range(3)),
            key=lambda d: d["total_s"])

    # production batch mode: host counting of sample i+1 overlaps device
    # mapping of sample i (run_call's prefetch pipeline) over a FIFTEEN-
    # sample cohort — three distinct samples (different reads + planted
    # variants) x five file copies each, so the pipeline runs FILLED for
    # nearly the whole cohort and the headline captures the steady-state
    # throughput (VERDICT r2 item 2: the 15-sample cohort is what the
    # roadmap's 795k reads/s figure measures; a 3-sample run pays the
    # first sample's un-hidden host count across a third of its samples —
    # 500k vs 795k sustained). Copies repeat content but not work:
    # counting/mapping recompute per file, and the host baseline
    # subprocess runs the identical 15-sample discipline, so the ratio
    # stays like-for-like. Measured BEFORE the streamed runs: streaming's
    # per-partition donated buffers fragment HBM through the serving
    # relay and were observed to slow subsequent batch allocations.
    import shutil

    cohort = []
    for c in range(5):
        for s, fq_i in enumerate(fastqs):
            p = os.path.join(CACHE, f"bcohort_{c}_{s}.fastq.gz")
            if not os.path.exists(p):
                shutil.copy(fq_i, p)
            cohort.append(p)
    n_batch = len(cohort)
    bcfg = CallConfig(genomes=None, db="bench", reads=cohort,
                      output=os.path.join(CACHE, "out_batch"))
    batch_s = float("inf")
    for _ in range(4):  # best-of-4 damps host/relay contention noise
        t0 = time.time()
        summaries = run_call(bcfg, index, dev)
        batch_s = min(batch_s, time.time() - t0)

    # single-sample e2e: classic vs streamed run_call, INTERLEAVED
    # (relay wall time drifts +/-30%; alternation keeps the A/B
    # in-epoch — VERDICT r4 item 2: the latency-proxy gate once left an
    # 18% faster streamed path on the table). The measured pair is then
    # SAVED as this host's outcome calibration so the engine's auto gate
    # picks by measured wall time, and a final auto-gated run records
    # what a user actually gets.
    from bronko_tpu.call.engine import _can_stream, save_stream_calibration

    scfg = CallConfig(db="bench", reads=[fastq],
                      output=os.path.join(CACHE, "out_stream"))

    def _timed_run(**env):
        saved = {k: os.environ.pop(k, None)
                 for k in ("BRONKO_STREAM", "BRONKO_NO_STREAM")}
        os.environ.update(env)
        try:
            t0 = time.time()
            run_call(scfg, index, dev)
            return time.time() - t0
        finally:
            for k in ("BRONKO_STREAM", "BRONKO_NO_STREAM"):
                os.environ.pop(k, None)
                if saved.get(k) is not None:
                    os.environ[k] = saved[k]

    _timed_run(BRONKO_NO_STREAM="1")   # warm classic-path compiles
    _timed_run(BRONKO_STREAM="1")      # warm streamed-path compiles
    classic_e2e_s = stream_s = float("inf")
    for _ in range(3):
        classic_e2e_s = min(classic_e2e_s, _timed_run(BRONKO_NO_STREAM="1"))
        stream_s = min(stream_s, _timed_run(BRONKO_STREAM="1"))
    save_stream_calibration(classic_e2e_s, stream_s)
    gate_streams = _can_stream(scfg, dev, None)
    gated_s = _timed_run()             # what the auto gate now delivers
    batch_reads = r["reads"] * len(summaries)
    reads_per_sec = batch_reads / batch_s

    # roofline: price the probe's two merge sorts at the sort ceiling and
    # every random device access at the gather ceiling — both measured NOW,
    # on this chip, at these lane counts (TPU only; the CPU subprocesses
    # never report a roofline, so skip the extra compiles there)
    # the roofline prices the FUSED production path (one dispatch for both
    # passes + device genome selection — what cohort samples 2+ run);
    # tally_s/pileup_s report the exact two-pass split for stage insight
    map_s = (min(r["tally_s"] + r["pileup_s"], r["fused_map_s"])
             if r["fused_map_s"] > 0 else r["tally_s"] + r["pileup_s"])
    # pass 1's payload pickup rides the merge sort itself (no per-query
    # random access anymore); pass 2 pays 4 random accesses per posting
    # lane (posting gather, fold-table gather, depth max, count add)
    random_accesses = 4 * r["scatter_lanes"]
    sort_lanes = r["sort_lanes"]
    if platform == "cpu":
        sort_ns, gather_ns, measured = SORT_NS_PER_LANE, GATHER_NS_PER_LANE, False
    else:
        sort_ns, gather_ns, measured = _measure_ceilings(sort_lanes,
                                                         random_accesses)
    sort_sol_s = 2 * sort_lanes * sort_ns * 1e-9
    sol_s = sort_sol_s + random_accesses * gather_ns * 1e-9
    roofline_pct = 100.0 * sol_s / map_s if map_s > 0 else 0.0

    # per-op ledger of the fused map residual (VERDICT r4 item 1) —
    # cumulative stage deltas priced against measured op ceilings
    handles = r.pop("_handles", None)
    warm.pop("_handles", None)
    ledger = None
    if platform != "cpu" and handles is not None and os.environ.get(
            "BRONKO_BENCH_LEDGER", "1").strip().lower() not in (
            "0", "false", "no", "off"):
        try:
            ledger = _roofline_ledger(dev, handles, r["fused_map_s"],
                                      gather_ns)
        except Exception as e:  # noqa: BLE001
            print(f"# roofline ledger failed: {e!r}", file=sys.stderr)
    handles = None

    scale_tpu = None
    if platform != "cpu":
        scale_tpu = _tpu_scale_sweep(index, dev, cfg, fastq, map_s)

    out = dict(
        platform=platform,
        build_s=round(build_s, 2),
        warm_total_s=round(warm["total_s"], 2),
        reads=r["reads"],
        unique_kmers=r["unique"],
        n_variants=r["n_variants"],
        single=dict(
            count_s=round(r["count_s"], 3),
            h2d_s=round(r["h2d_s"], 3),
            tally_s=round(r["tally_s"], 3),
            pileup_s=round(r["pileup_s"], 3),
            fused_map_s=round(r["fused_map_s"], 3),
            call_s=round(r["call_s"], 3),
            total_s=round(r["total_s"], 3),
            reads_per_sec=round(r["reads"] / r["total_s"], 1),
            # interleaved e2e A/B (run_call wall times) + the auto-gated
            # outcome: gated_total_s is the user-visible single-sample
            # number and must track min(classic, streamed) within noise
            e2e_classic_s=round(classic_e2e_s, 3),
            streamed_total_s=round(stream_s, 3),
            streamed_reads_per_sec=round(r["reads"] / stream_s, 1),
            gated_total_s=round(gated_s, 3),
            gated_reads_per_sec=round(r["reads"] / gated_s, 1),
            gate_decision="streamed" if gate_streams else "classic",
        ),
        batch=dict(
            n=n_batch, best_s=round(batch_s, 2),
            reads_per_sec=round(reads_per_sec, 1),
        ),
        roofline=dict(
            probe_lanes=r["probe_lanes"],
            scatter_lanes=r["scatter_lanes"],
            sort_lanes=sort_lanes,
            random_accesses=random_accesses,
            gather_ns_per_lane=gather_ns,
            sort_ns_per_lane=sort_ns,
            ceilings="measured this session" if measured
                     else "fallback constants (measurement unavailable)",
            sort_speed_of_light_s=round(sort_sol_s, 4),
            speed_of_light_s=round(sol_s, 4),
            device_map_s=round(map_s, 4),
            roofline_pct=round(roofline_pct, 1),
            residual_ns_by_op=ledger,
        ),
        h2d_bytes=r["h2d_bytes"],
        scale_tpu=scale_tpu,
    )
    return out


def ledger_mode() -> None:
    """Standalone per-op ledger run (TPU): single-sample pipeline for the
    device handles, then _roofline_ledger only — iterating on the ledger
    without paying the cohort/scale phases."""
    genome_paths, fastqs = _ensure_data()
    fastq = fastqs[0]

    import bronko_tpu  # noqa: F401

    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index

    cfg = CallConfig(db="bench", reads=[fastq],
                     output=os.path.join(CACHE, "out"))
    os.makedirs(cfg.output, exist_ok=True)
    index = build_index(cfg.kmer, genome_paths)
    dev = build_device_index(index)
    r = _single_sample_run(index, dev, cfg, fastq)
    handles = r.pop("_handles", None)
    if handles is None:
        print("# --ledger needs the TPU backend (the CPU run skips the "
              "fused path and returns no device handles)", file=sys.stderr)
        raise SystemExit(1)
    _, gather_ns, _ = _measure_ceilings(r["sort_lanes"],
                                        4 * r["scatter_lanes"])
    led = _roofline_ledger(dev, handles, r["fused_map_s"], gather_ns)
    print(json.dumps({"fused_map_s": r["fused_map_s"],
                      "ledger": led}, indent=1))


def host_baseline_mode() -> None:
    out = _pipeline_main()
    print(json.dumps({"host_reads_per_sec": out["batch"]["reads_per_sec"],
                      "host_single_reads_per_sec": out["single"]["reads_per_sec"],
                      "platform": out["platform"]}))


def scale_proxy_mode() -> None:
    """CPU-mesh scaling proxy: the product ShardedMapper (tally + pileup)
    at 1 vs 8 virtual devices on the same counted k-mer workload."""
    genome_paths, fastqs = _ensure_data()
    fastq = fastqs[0]

    import bronko_tpu  # noqa: F401
    import jax

    from bronko_tpu.call.engine import (
        ShardedMapper, _prepare_batches, count_sample, pick_best_genome,
    )
    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index

    n_dev = len(jax.devices())
    index = build_index(21, genome_paths)
    dev = build_device_index(index)
    cfg = CallConfig(db="bench", reads=[fastq], output=os.path.join(CACHE, "out_scale"))
    kmers, counts, cstats = count_sample(fastq, cfg, index.k)
    kj, cj = _prepare_batches(kmers, counts, cfg.batch_size)
    mcfg = dev.map_config(cfg.n_fixed, cfg.use_full_kmer)

    def timed(mesh: str, force_bsplit: bool = False) -> float:
        scfg = CallConfig(db="bench", reads=[fastq], mesh=mesh,
                          output=cfg.output, batch_size=cfg.batch_size)
        mapper = ShardedMapper(index, scfg, dev)
        if force_bsplit:
            mapper._routed_wins = lambda kj: False
        best = None
        t_best = float("inf")
        for _ in range(3):  # first run compiles; best-of damps noise
            t0 = time.time()
            tallies = mapper.run_tallies(kj, cj)
            best = pick_best_genome(tallies, dev)
            pl = mapper.run_pileup(kj, cj, dev, best, mcfg, n_kmers=kmers.shape[0])
            np.asarray(pl[0, :8])
            t_best = min(t_best, time.time() - t0)
        return t_best

    n_cores = os.cpu_count() or 1
    t1 = timed("1x1")
    curve = {1: t1}
    curve_bs = {1: t1}
    n = 2
    while n <= n_dev:
        # the engine's own layout choice (routed since r4 on these
        # single-batch shapes) AND forced B-split: routed's grouping /
        # routing / unroute machinery is ABSOLUTE extra work that pays
        # only on real parallel hardware — on core-shared virtual
        # devices it reads as a regression (BENCH_r03 0.583 ->
        # BENCH_r04 0.408 was exactly the routed layout landing, not a
        # perf loss; r3's number was B-split)
        curve[n] = timed(f"{n}x1")
        curve_bs[n] = timed(f"{n}x1", force_bsplit=True)
        n *= 2
    # virtual CPU devices share the host cores: points past n_cores are
    # core-bound LOWER bounds on true ICI scaling, so the headline
    # efficiency is read at min(n_dev, n_cores) devices over the best
    # layout at that point
    n_eff = max(n for n in curve if n <= max(1, n_cores))
    t_eff = min(curve[n_eff], curve_bs[n_eff])
    print(json.dumps({
        "devices": n_dev,
        "cores": n_cores,
        "kmers": int(kmers.shape[0]),
        "map_s": {str(n): round(t, 3) for n, t in curve.items()},
        "map_s_bsplit": {str(n): round(t, 3) for n, t in curve_bs.items()},
        "speedup": {str(n): round(t1 / t, 2) for n, t in curve.items() if n > 1},
        "efficiency_at_cores": round(t1 / (n_eff * t_eff), 3),
        "efficiency_note": (
            f"virtual devices share {n_cores} host cores; points past "
            "the core count lower-bound true multi-chip scaling; "
            "map_s is the engine's own layout choice (routed on these "
            "shapes since r4 — extra absolute work that only pays on "
            "real parallel hardware), map_s_bsplit forces the r3-era "
            "B-split layout for round-over-round comparability"),
    }))


def _run_subprocess(args: list[str], env_extra: dict[str, str], timeout: int):
    env = dict(os.environ, **env_extra)
    r = subprocess.run([sys.executable, os.path.abspath(__file__), *args],
                       capture_output=True, text=True, timeout=timeout, env=env)
    if r.returncode != 0:
        print(f"# subprocess {args} failed:\n{r.stderr[-2000:]}", file=sys.stderr)
        return None
    try:
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception:  # noqa: BLE001
        print(f"# subprocess {args} emitted no JSON:\n{r.stdout[-500:]}",
              file=sys.stderr)
        return None


def _arm_watchdog() -> None:
    """The serving relay can hang indefinitely (observed: even a trivial
    device op blocked >4 h). If the whole bench exceeds the deadline,
    emit a parseable failure record instead of hanging the round driver.
    BRONKO_BENCH_TIMEOUT (seconds) overrides; 0 disables."""
    import threading

    try:
        deadline = float(os.environ.get("BRONKO_BENCH_TIMEOUT", "2700"))
    except ValueError:
        deadline = 2700.0
    if deadline <= 0:
        return

    def _fire():
        print("# bench watchdog fired: TPU relay unresponsive", file=sys.stderr)
        print(json.dumps({
            "metric": "reads_per_sec_per_chip",
            "value": 0,
            "unit": "reads/s",
            "vs_baseline": 0,
            "detail": {"error": f"bench exceeded {deadline:.0f}s — TPU "
                                "relay unreachable or hung; no measurement"},
        }), flush=True)
        os._exit(2)

    t = threading.Timer(deadline, _fire)
    t.daemon = True
    t.start()


def main() -> None:
    _arm_watchdog()
    # Subprocesses run FIRST and sequentially: only one process may hold the
    # TPU, and concurrent CPU+TPU python processes can wedge the axon relay
    # (CLAUDE.md). Both pin JAX to the host CPU.
    _ensure_data()  # generate fixtures once, before any timing
    host = _run_subprocess(
        ["--host-baseline"],
        {"BRONKO_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu"},
        timeout=3600,
    )
    scale = _run_subprocess(
        ["--scale-proxy"],
        {"BRONKO_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu",
         "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "") +
                       " --xla_force_host_platform_device_count=8").strip()},
        timeout=3600,
    )

    out = _pipeline_main()
    reads_per_sec = out["batch"]["reads_per_sec"]

    host_rps = host["host_reads_per_sec"] if host else None
    vs_baseline = round(reads_per_sec / host_rps, 3) if host_rps else None

    print(
        f"# platform={out['platform']} build={out['build_s']}s warm={out['warm_total_s']}s "
        f"single: count={out['single']['count_s']}s tally={out['single']['tally_s']}s "
        f"pileup={out['single']['pileup_s']}s call={out['single']['call_s']}s "
        f"({out['single']['reads_per_sec']:.0f} reads/s) | batch x{out['batch']['n']}: "
        f"{out['batch']['best_s']}s ({reads_per_sec:.0f} reads/s) | "
        f"host-baseline={host_rps} reads/s | roofline={out['roofline']['roofline_pct']}% | "
        f"tpu-scale={out['scale_tpu']} | scale-proxy={scale}",
        file=sys.stderr,
    )
    full_detail = {
        "kind": "bench_full_detail",
        "baseline": {
            "kind": "measured_host_cpu_same_pipeline",
            "host_reads_per_sec": host_rps,
            "host_single_reads_per_sec":
                host.get("host_single_reads_per_sec") if host else None,
        },
        "single_sample": out["single"],
        "batch": out["batch"],
        "stage_device_times_s": {
            "tally": out["single"]["tally_s"],
            "pileup": out["single"]["pileup_s"],
        },
        "roofline": out["roofline"],
        "h2d_bytes": out["h2d_bytes"],
        "scaling_tpu_shard_proxy": out["scale_tpu"],  # real-chip per-device
        # share timings; the strongest single-chip scaling evidence
        "scaling_proxy_cpu_mesh": scale,  # CAVEAT: virtual CPU devices share the
        # host cores, so this lower-bounds true ICI scaling
        "reads": out["reads"],
        "unique_kmers": out["unique_kmers"],
        "n_variants": out["n_variants"],
    }
    # Full detail: its own stdout line + a repo file. The round driver
    # captures only the LAST 2000 chars of output and json-parses the
    # last LINE — round 3's headline was lost (BENCH_r03 parsed=null)
    # because the detail dict pushed the final line past that buffer.
    print(json.dumps(full_detail), flush=True)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json"), "w") as f:
            json.dump(full_detail, f, indent=1)
    except OSError:
        pass

    sc = out["scale_tpu"] or {}
    roof = out["roofline"]
    compact = {
        "metric": "reads_per_sec_per_chip",
        "value": reads_per_sec,
        "unit": "reads/s",
        "vs_baseline": vs_baseline,
        "detail": {
            "host_baseline_reads_per_sec": host_rps,
            "batch": out["batch"],
            "single_total_s": out["single"]["gated_total_s"],
            "single_reads_per_sec": out["single"]["gated_reads_per_sec"],
            "single_gate": out["single"]["gate_decision"],
            "single_instrumented_s": out["single"]["total_s"],
            "stages_s": {k: out["single"].get(f"{k}_s") for k in
                         ("count", "h2d", "tally", "pileup", "fused_map",
                          "call")},
            "roofline_pct": roof.get("roofline_pct"),
            "speed_of_light_s": roof.get("speed_of_light_s"),
            "device_map_s": roof.get("device_map_s"),
            "intra_batch_efficiency": sc.get("intra_batch_efficiency"),
            "routed_intra_batch_efficiency":
                sc.get("routed_intra_batch_efficiency"),
            "reads": out["reads"],
            "unique_kmers": out["unique_kmers"],
            "n_variants": out["n_variants"],
            "full_detail": "previous stdout line + BENCH_DETAIL.json",
        },
    }
    line = json.dumps(compact)
    if len(line) > 1800:  # hard guard: never outgrow the driver tail again
        compact["detail"] = {"truncated": "see BENCH_DETAIL.json",
                             "roofline_pct": roof.get("roofline_pct")}
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    if "--host-baseline" in sys.argv:
        host_baseline_mode()
    elif "--scale-proxy" in sys.argv:
        scale_proxy_mode()
    elif "--ledger" in sys.argv:
        ledger_mode()
    else:
        main()

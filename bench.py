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
        np.asarray(outf[0])
        np.asarray(outf[5][0, :8])
        assert not int(np.asarray(outf[6])), "fused bench budget overflow"
        if rep:
            fused_map_s = min(fused_map_s, time.time() - t0f)

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
                    vals = _unroute(list(got), slot, ord_s, Bl, J)
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
            return best_t / (R * D)

        per_row_s = {1: per_row_map_s(1, 4)}
        routed_s = {}
        routed_errs = {}
        for D in (4, 16):
            per_row_s[D] = per_row_map_s(D, 4)
            # one retry: relay contention transiently fails dispatches
            # (BENCH_r03 shipped empty routed rows from exactly this)
            for attempt in (0, 1):
                try:
                    routed_s[D] = per_row_routed_map_s(D, 4)
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

    # streamed single-sample latency: partitioned count->tally overlap
    scfg = CallConfig(db="bench", reads=[fastq],
                      output=os.path.join(CACHE, "out_stream"))
    run_call(scfg, index, dev)  # warm
    stream_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        run_call(scfg, index, dev)
        stream_s = min(stream_s, time.time() - t0)
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
            streamed_total_s=round(stream_s, 3),
            streamed_reads_per_sec=round(r["reads"] / stream_s, 1),
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
        ),
        h2d_bytes=r["h2d_bytes"],
        scale_tpu=scale_tpu,
    )
    return out


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

    def timed(mesh: str) -> float:
        scfg = CallConfig(db="bench", reads=[fastq], mesh=mesh,
                          output=cfg.output, batch_size=cfg.batch_size)
        mapper = ShardedMapper(index, scfg, dev)
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
    n = 2
    while n <= n_dev:
        curve[n] = timed(f"{n}x1")
        n *= 2
    # virtual CPU devices share the host cores: points past n_cores are
    # core-bound LOWER bounds on true ICI scaling, so the headline
    # efficiency is read at min(n_dev, n_cores) devices
    n_eff = max(n for n in curve if n <= max(1, n_cores))
    print(json.dumps({
        "devices": n_dev,
        "cores": n_cores,
        "kmers": int(kmers.shape[0]),
        "map_s": {str(n): round(t, 3) for n, t in curve.items()},
        "speedup": {str(n): round(t1 / t, 2) for n, t in curve.items() if n > 1},
        "efficiency_at_cores": round(t1 / (n_eff * curve[n_eff]), 3),
        "efficiency_note": (
            f"virtual devices share {n_cores} host cores; points past "
            "the core count lower-bound true multi-chip scaling"),
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
            "single_total_s": out["single"]["total_s"],
            "single_reads_per_sec": out["single"]["reads_per_sec"],
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
    else:
        main()

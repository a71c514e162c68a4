"""Micro-bench of _expand_lanes variants at bench shapes (TPU; run alone).

The round-5 per-op ledger attributes ~33 ms of the fused map to
_expand_lanes (vs a ~5 ms scan floor) — the largest single line item.
This tool decomposes it (cumulative stages, dispatch-cancelled) and
times alternative own_c derivations:

  v0  current: sorted scatter-max marks + cummax
  v1  jnp.searchsorted(excl, lanes, side='right', method='sort') - 1
  v2  manual merge: single-key radix-friendly sort of packed
      (value << 1 | is_query) + cumsum rank

Usage: python tools/bench_expand_tpu.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main() -> None:
    genome_paths, fastqs = bench._ensure_data()
    fastq = fastqs[0]

    import jax
    import jax.numpy as jnp

    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index

    cfg = CallConfig(db="bench", reads=[fastq],
                     output=os.path.join(bench.CACHE, "out_expand"))
    os.makedirs(cfg.output, exist_ok=True)
    index = build_index(cfg.kmer, genome_paths)
    dev = build_device_index(index)
    r = bench._single_sample_run(index, dev, cfg, fastq)
    h = r.pop("_handles")
    mcfg, gcfg = h["mcfg"], h["gcfg"]
    best = int(h["best"])
    km, ct = h["kj"][0], h["cj"][0]
    start0, h0 = h["saved"][0][0], h["saved"][1][0]

    from bronko_tpu.ops.map import _saved_lens_prefix

    J = len(mcfg.positions)
    B = int(km.shape[0])
    N2 = B * J
    LB = int(gcfg.lane_budget)

    @jax.jit
    def mk_inputs(start, hh):
        lens, prefix = _saved_lens_prefix(hh, jnp.int32(best))
        startf = (start + prefix).reshape(N2).astype(jnp.int32)
        lensf = lens.reshape(N2)
        return startf, lensf

    startf, lensf = mk_inputs(start0, h0)
    startf.block_until_ready()

    def timed(fn, args, reps=4):
        f = jax.jit(fn)
        ts = []
        for _ in range(reps + 1):
            t0 = time.time()
            out = f(*args)
            np.asarray(out)
            ts.append(time.time() - t0)
        return min(ts[1:])

    disp = timed(lambda a: a.sum(), (jnp.zeros(8, jnp.int32),))

    lane_ids = None  # built inside jits

    # ---- cumulative decomposition of the current v0 ----
    def v0_stage(stage):
        def fn(startf, lensf):
            cum = jnp.cumsum(lensf, dtype=jnp.int32)
            total = jnp.sum(lensf.astype(jnp.int64))
            excl = cum - lensf
            diff = startf - excl
            if stage == 0:
                return excl.sum() + diff.sum() + total
            rows = jnp.arange(N2, dtype=jnp.int32)
            marks = jnp.full(LB + 1, -1, jnp.int32).at[
                jnp.minimum(excl, LB)].max(rows, indices_are_sorted=True,
                                           mode="drop")
            if stage == 1:
                return marks.sum() + diff.sum() + total
            own_c = jnp.maximum(jax.lax.cummax(marks[:LB]), 0)
            if stage == 2:
                return own_c.sum() + diff.sum() + total
            li = jnp.arange(LB, dtype=jnp.int32)
            lane_valid = li < jnp.minimum(total, LB)
            pidx = jnp.where(lane_valid, li + diff[own_c], 0)
            return own_c.sum() + pidx.sum() + lane_valid.sum() + total
        return fn

    res = {"dispatch_ms": round(disp * 1e3, 2),
           "shapes": {"N2": N2, "LB": LB}}
    names = ["cumsum_diff", "marks_scatter", "cummax", "pidx_gather"]
    prev = disp
    for i, nm in enumerate(names):
        cum_t = timed(v0_stage(i), (startf, lensf))
        res[f"v0_{nm}_ms"] = round(max(cum_t - prev, 0) * 1e3, 2)
        prev = max(cum_t, prev)
    res["v0_total_ms"] = round((prev - disp) * 1e3, 2)

    # ---- v1: searchsorted(method='sort') ----
    def v1(startf, lensf):
        cum = jnp.cumsum(lensf, dtype=jnp.int32)
        total = jnp.sum(lensf.astype(jnp.int64))
        excl = cum - lensf
        diff = startf - excl
        li = jnp.arange(LB, dtype=jnp.int32)
        own_c = (jnp.searchsorted(excl, li, side="right",
                                  method="sort").astype(jnp.int32) - 1)
        own_c = jnp.maximum(own_c, 0)
        lane_valid = li < jnp.minimum(total, LB)
        pidx = jnp.where(lane_valid, li + diff[own_c], 0)
        return own_c.sum() + pidx.sum() + lane_valid.sum() + total

    res["v1_searchsorted_ms"] = round(
        max(timed(v1, (startf, lensf)) - disp, 0) * 1e3, 2)

    # ---- v2: manual merge via packed single-key sort ----
    def v2(startf, lensf):
        cum = jnp.cumsum(lensf, dtype=jnp.int32)
        total = jnp.sum(lensf.astype(jnp.int64))
        excl = cum - lensf
        diff = startf - excl
        li = jnp.arange(LB, dtype=jnp.int32)
        # pack (value << 1 | is_query): keys (excl) before equal queries
        # is wrong for side='right' — queries must come AFTER equal keys,
        # so keys get bit 0, queries bit 1
        xs = jnp.concatenate([
            (excl.astype(jnp.int64) << 1),
            (li.astype(jnp.int64) << 1) | 1,
        ])
        xs_s = jax.lax.sort(xs, is_stable=False)
        is_key = (xs_s & 1) == 0
        rank = jnp.cumsum(is_key.astype(jnp.int32)) - 1
        # unsort queries: their payload is rank; restore by ordinal
        ordq = jnp.where(is_key, jnp.int32(2**31 - 1),
                         (xs_s >> 1).astype(jnp.int32))
        out = jax.lax.sort((ordq, rank), num_keys=1, is_stable=False)
        own_c = jnp.maximum(out[1][:LB], 0)
        lane_valid = li < jnp.minimum(total, LB)
        pidx = jnp.where(lane_valid, li + diff[own_c], 0)
        return own_c.sum() + pidx.sum() + lane_valid.sum() + total

    res["v2_merge_sort_ms"] = round(
        max(timed(v2, (startf, lensf)) - disp, 0) * 1e3, 2)

    # ---- v3: merge with diff as sort operand (no random gather at all;
    # own_c = propagated rank, diff propagated via packed cummax) ----
    SH = max(int(np.int64(max(N2, LB) - 1)).bit_length(), 1)

    def v3(startf, lensf):
        # single-key merge: (value << (SH+1)) | (is_query << SH) | ordinal
        # — the ordinal tiebreak makes equal-excl key rows (zero-length
        # runs) deterministic so the packed cummax propagates the LAST
        # row's diff, matching v0's scatter-max-of-row-index rule
        cum = jnp.cumsum(lensf, dtype=jnp.int32)
        total = jnp.sum(lensf.astype(jnp.int64))
        excl = cum - lensf
        diff = startf - excl
        li = jnp.arange(LB, dtype=jnp.int32)
        rows = jnp.arange(N2, dtype=jnp.int32)
        xs = jnp.concatenate([
            (excl.astype(jnp.int64) << (SH + 1)) | rows.astype(jnp.int64),
            (li.astype(jnp.int64) << (SH + 1)) | (jnp.int64(1) << SH)
            | li.astype(jnp.int64),
        ])
        dv = jnp.concatenate([
            jax.lax.bitcast_convert_type(diff, jnp.uint32),
            jnp.zeros(LB, jnp.uint32),
        ])
        xs_s, dv_s = jax.lax.sort((xs, dv), num_keys=1, is_stable=False)
        is_key = ((xs_s >> SH) & 1) == 0
        rank = jnp.cumsum(is_key.astype(jnp.int32)) - 1
        packed = jnp.where(
            is_key,
            ((rank + 1).astype(jnp.int64) << 32) | dv_s.astype(jnp.int64),
            jnp.int64(0))
        dprop = jax.lax.cummax(packed).astype(jnp.uint32)
        ordq = jnp.where(is_key, jnp.int32(2**31 - 1),
                         (xs_s & ((jnp.int64(1) << SH) - 1))
                         .astype(jnp.int32))
        out = jax.lax.sort((ordq, rank, dprop), num_keys=1,
                           is_stable=False)
        own_c = jnp.maximum(out[1][:LB], 0)
        dq = jax.lax.bitcast_convert_type(out[2][:LB], jnp.int32)
        lane_valid = li < jnp.minimum(total, LB)
        pidx = jnp.where(lane_valid, li + dq, 0)
        return own_c.sum() + pidx.sum() + lane_valid.sum() + total

    res["v3_operand_merge_ms"] = round(
        max(timed(v3, (startf, lensf)) - disp, 0) * 1e3, 2)

    # ELEMENTWISE equality of own_c/pidx against the v0 scatter form —
    # scalar-sum comparison could pass on compensating per-lane errors.
    # (v2/v3's derivations are additionally pinned by the 40-trial fuzz
    # in tests/test_map.py::test_expand_lanes_merge_equals_scatter.)
    def _base(startf, lensf):
        cum = jnp.cumsum(lensf, dtype=jnp.int32)
        total = jnp.sum(lensf.astype(jnp.int64))
        excl = cum - lensf
        diff = startf - excl
        li = jnp.arange(LB, dtype=jnp.int32)
        lv = li < jnp.minimum(total, LB)
        return excl, diff, li, lv

    @jax.jit
    def v0_arrays(startf, lensf):
        excl, diff, li, lv = _base(startf, lensf)
        rows = jnp.arange(N2, dtype=jnp.int32)
        marks = jnp.full(LB + 1, -1, jnp.int32).at[
            jnp.minimum(excl, LB)].max(rows, indices_are_sorted=True,
                                       mode="drop")
        own = jnp.maximum(jax.lax.cummax(marks[:LB]), 0)
        return own, jnp.where(lv, li + diff[own], 0)

    @jax.jit
    def v1_arrays(startf, lensf):
        excl, diff, li, lv = _base(startf, lensf)
        own = jnp.maximum(jnp.searchsorted(
            excl, li, side="right", method="sort").astype(jnp.int32) - 1, 0)
        return own, jnp.where(lv, li + diff[own], 0)

    @jax.jit
    def v3_arrays(startf, lensf):
        excl, diff, li, lv = _base(startf, lensf)
        rows = jnp.arange(N2, dtype=jnp.int32)
        xs = jnp.concatenate([
            (excl.astype(jnp.int64) << (SH + 1)) | rows.astype(jnp.int64),
            (li.astype(jnp.int64) << (SH + 1)) | (jnp.int64(1) << SH)
            | li.astype(jnp.int64),
        ])
        dv = jnp.concatenate([
            jax.lax.bitcast_convert_type(diff, jnp.uint32),
            jnp.zeros(LB, jnp.uint32),
        ])
        xs_s, dv_s = jax.lax.sort((xs, dv), num_keys=1, is_stable=False)
        is_key = ((xs_s >> SH) & 1) == 0
        rank = jnp.cumsum(is_key.astype(jnp.int32)) - 1
        packed = jnp.where(
            is_key,
            ((rank + 1).astype(jnp.int64) << 32) | dv_s.astype(jnp.int64),
            jnp.int64(0))
        dprop = jax.lax.cummax(packed).astype(jnp.uint32)
        ordq = jnp.where(is_key, jnp.int32(2**31 - 1),
                         (xs_s & ((jnp.int64(1) << SH) - 1))
                         .astype(jnp.int32))
        out = jax.lax.sort((ordq, rank, dprop), num_keys=1,
                           is_stable=False)
        own = jnp.maximum(out[1][:LB], 0)
        dq = jax.lax.bitcast_convert_type(out[2][:LB], jnp.int32)
        return own, jnp.where(lv, li + dq, 0)

    o0, p0 = (np.asarray(x) for x in v0_arrays(startf, lensf))
    o1, p1 = (np.asarray(x) for x in v1_arrays(startf, lensf))
    o3, p3 = (np.asarray(x) for x in v3_arrays(startf, lensf))
    res["v1_equal_v0"] = bool((o0 == o1).all() and (p0 == p1).all())
    res["v3_equal_v0"] = bool((o0 == o3).all() and (p0 == p3).all())

    # pure ceilings in this epoch
    rng = np.random.default_rng(3)
    big32 = jnp.asarray(rng.integers(0, 2**31, N2 + LB, dtype=np.int64))
    wv = jnp.arange(N2 + LB, dtype=jnp.int64)
    # position-weighted: a plain .sum() of a sorted array is permutation-
    # invariant and lets XLA delete the sort entirely
    res["pure_i64_sort_ms"] = round(max(timed(
        lambda a: (jax.lax.sort(a, is_stable=False) * wv).sum(), (big32,))
        - disp, 0) * 1e3, 2)
    res["pure_cumsum_ms"] = round(max(timed(
        lambda a: jnp.cumsum(a.astype(jnp.int32)).sum(), (big32,))
        - disp, 0) * 1e3, 2)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

"""Bisect the flat-join mapper's stages on the real 4-genome index."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bronko_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from bronko_tpu.index.build import build_index
from bronko_tpu.index.layout import build_device_index
from bronko_tpu.ops.buckets import assign_buckets
from bronko_tpu.ops.codec import canonical, pack_kmer, seq_bytes_to_bits


def bench(name, fn, *args, reps=3):
    jfn = jax.jit(lambda *a: jax.tree_util.tree_map(
        lambda x: jnp.sum(x.astype(jnp.int64)) if hasattr(x, "astype") else x, fn(*a)))
    out = jfn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t = time.time()
        out = jfn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf)
        ts.append(time.time() - t)
    print(f"{name}: {min(ts)*1000:.0f}ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    k = 21
    paths = sorted(
        os.path.join("/root/reference/test_data/4_sarscov2", f)
        for f in os.listdir("/root/reference/test_data/4_sarscov2")
        if f.endswith(".fasta"))
    index = build_index(k, paths)
    dev = build_device_index(index)
    cfg = dev.map_config(2, False)
    print(f"platform={jax.devices()[0].platform} lane_factor={cfg.lane_factor}", flush=True)

    B = 131072
    J = len(cfg.positions)
    N2 = B * J
    LB = B * J * cfg.lane_factor
    T = cfg.total_len
    U = dev.keys.shape[0]
    js = np.asarray(cfg.positions)
    keys, offsets, postings = dev.keys, dev.offsets, dev.postings

    bits = seq_bytes_to_bits(index.files[0].sequences[0].seq)
    starts = rng.integers(0, len(bits) - k + 1, size=B)
    kmers = jnp.asarray(pack_kmer(np.stack([bits[s:s + k] for s in starts]), k))
    counts = jnp.asarray(rng.integers(3, 100, size=B).astype(np.int32))

    def s1_buckets(km):
        canon, rc = canonical(km, k, jnp)
        return assign_buckets(canon, k, jnp)[:, js]

    bench("s1 buckets", s1_buckets, kmers)
    q = jax.jit(s1_buckets)(kmers)

    def s2_search(q):
        ii = jnp.searchsorted(keys, q, method="sort")
        ii_c = jnp.minimum(ii, U - 1).astype(jnp.int32)
        return ii_c, (keys[ii_c] == q)

    bench("s2 searchsorted", s2_search, q)
    ii_c, hit = jax.jit(s2_search)(q)

    def s3_runlen(ii_c, hit):
        startf = offsets[ii_c].reshape(N2)
        endf = offsets[ii_c + 1].reshape(N2)
        lens = jnp.where(hit.reshape(N2), endf - startf, 0)
        cum = jnp.cumsum(lens, dtype=jnp.int32)
        excl = cum - lens
        lane_ids = jnp.arange(LB, dtype=jnp.int32)
        own = jnp.searchsorted(cum, lane_ids, side="right", method="sort")
        own_c = jnp.minimum(own, N2 - 1).astype(jnp.int32)
        lane_valid = lane_ids < jnp.minimum(cum[-1], LB)
        pofs = lane_ids - excl[own_c]
        pidx = jnp.where(lane_valid, startf[own_c] + pofs, 0)
        return own_c, pidx, lane_valid

    bench("s3 run-length expand", s3_runlen, ii_c, hit)
    own_c, pidx, lane_valid = jax.jit(s3_runlen)(ii_c, hit)

    def s4_gather(own_c, pidx, lane_valid):
        post = postings[pidx]
        g = (post >> 22).astype(jnp.int32)
        m = (post & 0x3FFFFF).astype(jnp.int32)
        return g, m

    bench("s4 posting gather", s4_gather, own_c, pidx, lane_valid)
    g, m = jax.jit(s4_gather)(own_c, pidx, lane_valid)

    canon_, rc_ = canonical(kmers, k, jnp)
    shifts = jnp.uint64(2) * jnp.arange(k - 1, -1, -1, dtype=jnp.uint64)
    bases = ((canon_[:, None] >> shifts) & jnp.uint64(3)).astype(jnp.int32)

    def s5_base(own_c, g, m, lane_valid):
        idx = m & 31
        is_canon = (m >> 5) & 1
        b = own_c // J
        bases_flat = bases.reshape(B * k)
        base_nc = bases_flat[b * k + idx]
        base_c = 3 - bases_flat[b * k + (k - 1 - idx)]
        base = jnp.where(is_canon == 1, base_c, base_nc)
        fwd = (is_canon == rc_[b].astype(jnp.int32))
        cell = jnp.where(lane_valid, g, T) * 4 + base
        return cell, fwd

    bench("s5 base/cell", s5_base, own_c, g, m, lane_valid)
    cell, fwd = jax.jit(s5_base)(own_c, g, m, lane_valid)
    n_lane = counts[own_c // J]

    row_len = (T + 1) * 4

    def s6_scatters(cell, fwd, n_lane, lane_valid):
        flat = jnp.zeros(4 * row_len, jnp.int32)
        dt = jnp.where(fwd, 0, row_len) + cell
        ct = jnp.where(fwd, 2 * row_len, 3 * row_len) + cell
        flat = flat.at[dt].max(jnp.where(lane_valid, n_lane, 0))
        flat = flat.at[ct].add(lane_valid.astype(jnp.int32))
        return flat

    bench("s6 pileup scatters", s6_scatters, cell, fwd, n_lane, lane_valid)

    fid = m >> 6

    def s7_hits(own_c, fid, lane_valid):
        b = own_c // J
        return jnp.zeros((B, cfg.num_genomes), jnp.int32).at[b, fid].add(
            lane_valid.astype(jnp.int32), mode="drop")

    bench("s7 hits scatter", s7_hits, own_c, fid, lane_valid)


if __name__ == "__main__":
    main()

"""Stage-by-stage profile of the mapper on the current platform."""

import sys
import time

import numpy as np

import bronko_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def bench(name, fn, *args, reps=3):
    jfn = jax.jit(fn)
    t0 = time.time()
    jax.block_until_ready(jfn(*args))
    t1 = time.time()
    ts = []
    for _ in range(reps):
        t = time.time()
        jax.block_until_ready(jfn(*args))
        ts.append(time.time() - t)
    print(f"{name}: compile={t1 - t0:.1f}s steady={min(ts)*1000:.1f}ms", flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    k = 21
    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform} B={B}", flush=True)

    import tempfile
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index
    from bronko_tpu.ops.buckets import assign_buckets
    from bronko_tpu.ops.codec import canonical, pack_kmer, seq_bytes_to_bits
    from tests.make_synthetic import make_genome

    tmp = tempfile.mkdtemp()
    base = make_genome(rng, 29900)
    paths = []
    for g in range(4):
        gen = bytearray(base)
        for p in rng.integers(0, len(base), 300):
            gen[p] = b"ACGT"[rng.integers(4)]
        p_ = f"{tmp}/g{g}.fasta"
        with open(p_, "w") as fh:
            fh.write(f">s{g}\n{bytes(gen).decode()}\n")
        paths.append(p_)
    index = build_index(k, paths)
    dev = build_device_index(index)
    cfg = dev.map_config(2, False)
    E, T, U = cfg.max_bucket, cfg.total_len, dev.keys.shape[0]
    J = len(cfg.positions)
    print(f"U={U} E={E} T={T} J={J}", flush=True)

    bits = seq_bytes_to_bits(index.files[0].sequences[0].seq)
    starts = rng.integers(0, len(bits) - k + 1, size=B)
    kmers = jnp.asarray(pack_kmer(np.stack([bits[s:s + k] for s in starts]), k))
    counts = jnp.asarray(rng.integers(3, 100, size=B).astype(np.int32))
    keys, offsets, gpos, pmeta = dev.keys, dev.offsets, dev.gpos, dev.pmeta

    js = np.asarray(cfg.positions)

    def stage_buckets(km):
        canon, rc = canonical(km, k, jnp)
        return assign_buckets(canon, k, jnp)[:, js], rc

    bench("buckets+canon", stage_buckets, kmers)

    q, _ = jax.jit(stage_buckets)(kmers)

    def stage_search(q):
        ii = jnp.searchsorted(keys, q)
        ii_c = jnp.minimum(ii, U - 1).astype(jnp.int32)
        return ii_c, keys[ii_c] == q

    bench("searchsorted", stage_search, q)
    ii_c, hit = jax.jit(stage_search)(q)

    def stage_expand(ii_c, hit):
        start = offsets[ii_c]
        end = offsets[ii_c + 1]
        lane = jnp.arange(E, dtype=jnp.int32)
        pidx = start[..., None] + lane
        pvalid = (pidx < end[..., None]) & hit[..., None]
        pidx_s = jnp.where(pvalid, pidx, 0)
        return gpos[pidx_s], pmeta[pidx_s], pvalid

    bench("expand+gather", stage_expand, ii_c, hit)
    g, m, pvalid = jax.jit(stage_expand)(ii_c, hit)

    cell = jnp.where(pvalid, g, T) * 4 + (m & 3)
    nval = jnp.broadcast_to(counts[:, None, None], cell.shape)

    def stage_scatter_add(cell):
        flat = jnp.zeros((T + 1) * 4, jnp.int32)
        return flat.at[cell.reshape(-1)].add(1)

    bench("pileup scatter-add", stage_scatter_add, cell)

    def stage_scatter_max(cell, nval):
        flat = jnp.zeros((T + 1) * 4, jnp.int32)
        return flat.at[cell.reshape(-1)].max(nval.reshape(-1))

    bench("pileup scatter-max", stage_scatter_max, cell, nval)

    fid = m >> 6

    def stage_hits(fid, pvalid):
        b_idx = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None, None], fid.shape)
        return jnp.zeros((B, cfg.num_genomes), jnp.int32).at[
            b_idx.reshape(-1), fid.reshape(-1)
        ].add(pvalid.reshape(-1).astype(jnp.int32), mode="drop")

    bench("hits scatter", stage_hits, fid, pvalid)

    # sort-based aggregation alternative for the pileup
    def stage_sortagg(cell, nval):
        c = cell.reshape(-1)
        n = nval.reshape(-1)
        order = jnp.argsort(c)
        cs = c[order]
        ns = n[order]
        is_new = jnp.concatenate([jnp.ones(1, bool), cs[1:] != cs[:-1]])
        seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        N = cs.shape[0]
        # segment add via cumsum-diff, segment max via cummax trick
        csum = jnp.cumsum(jnp.ones_like(ns))
        return cs, seg, csum

    bench("sort-agg (sort+cumsum)", stage_sortagg, cell, nval)


if __name__ == "__main__":
    main()

"""Scatter alternatives + transfer bandwidth on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bronko_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def bench(name, fn, *args, reps=3):
    jfn = jax.jit(fn)
    out = jfn(*args)
    for x in jax.tree_util.tree_leaves(out):
        np.asarray(x.ravel()[-1:])
    ts = []
    for _ in range(reps):
        t = time.time()
        out = jfn(*args)
        for x in jax.tree_util.tree_leaves(out):
            np.asarray(x.ravel()[-1:])
        ts.append(time.time() - t)
    print(f"{name}: {min(ts)*1000:.0f}ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform}", flush=True)
    N = 9_100_000
    T = 480_000

    targets = jnp.asarray(np.sort(rng.integers(0, T, size=N)).astype(np.int32))
    vals = jnp.asarray(rng.integers(1, 100, size=N).astype(np.int32))

    bench("scatter-add 9.1M (sorted dup idx)",
          lambda t, v: jnp.zeros(T, jnp.int32).at[t].add(v), targets, vals)

    uniq = jnp.asarray(np.arange(T, dtype=np.int32))
    uvals = jnp.asarray(rng.integers(0, 100, size=T).astype(np.int32))
    bench("scatter-set 480k unique sorted",
          lambda t, v: jnp.zeros(T, jnp.int32).at[t].set(v, unique_indices=True),
          uniq, uvals)
    bench("scatter-add 480k unique sorted",
          lambda t, v: jnp.zeros(T, jnp.int32).at[t].add(v, unique_indices=True),
          uniq, uvals)

    some = jnp.asarray(np.sort(rng.choice(T, size=200_000, replace=False)).astype(np.int32))
    svals = jnp.asarray(rng.integers(0, 100, size=200_000).astype(np.int32))
    bench("scatter-add 200k unique sorted (sparse)",
          lambda t, v: jnp.zeros(T, jnp.int32).at[t].add(v, unique_indices=True),
          some, svals)

    # hits via one-hot reduction (B, J*E) lanes, G genomes
    B, LANES, G = 131_072, 64, 4
    fid = jnp.asarray(rng.integers(0, G, size=(B, LANES)).astype(np.int32))
    pvalid = jnp.asarray(rng.random((B, LANES)) < 0.3)

    def hits_onehot(fid, pvalid):
        eq = (fid[..., None] == jnp.arange(G, dtype=jnp.int32)) & pvalid[..., None]
        return eq.sum(axis=1, dtype=jnp.int32)

    bench("hits one-hot reduce G=4", hits_onehot, fid, pvalid)

    G2 = 128
    fid2 = jnp.asarray(rng.integers(0, G2, size=(B, LANES)).astype(np.int32))

    def hits_onehot2(fid, pvalid):
        eq = (fid[..., None] == jnp.arange(G2, dtype=jnp.int32)) & pvalid[..., None]
        return eq.sum(axis=1, dtype=jnp.int32)

    bench("hits one-hot reduce G=128", hits_onehot2, fid2, pvalid)

    # segmented-aggregation: sort (cell,n) then boundary/segment ops
    cells = jnp.asarray(rng.integers(0, T, size=N).astype(np.int32))

    def sortagg(cells, vals):
        ck, vk = jax.lax.sort((cells, vals), num_keys=2)  # n asc within cell
        idx = jnp.arange(N, dtype=jnp.int32)
        is_new = jnp.concatenate([jnp.ones(1, bool), ck[1:] != ck[:-1]])
        b = jnp.where(is_new, idx, N)
        nxt = jax.lax.cummin(b[::-1])[::-1]          # next boundary >= i
        nxt_after = jnp.concatenate([nxt[1:], jnp.asarray([N], jnp.int32)])
        seg_count = (nxt_after - idx)                # valid at boundaries
        seg_max = vk[jnp.minimum(nxt_after - 1, N - 1)]
        # compact boundaries to front with a stable sort on ~is_new
        keyc = (~is_new).astype(jnp.int32)
        _, uc, um, ucell = jax.lax.sort((keyc, seg_count, seg_max, ck), num_keys=1)
        return uc, um, ucell

    bench("sort-agg full (sort+cummin+compact)", sortagg, cells, vals)

    # device->host transfer
    big = jnp.asarray(rng.integers(0, 1 << 40, size=N, dtype=np.uint64))
    np.asarray(big.ravel()[-1:])
    t0 = time.time()
    h = np.asarray(big)
    dt = time.time() - t0
    print(f"device->host 73MB: {dt*1000:.0f}ms ({73/dt:.0f} MB/s)", flush=True)


if __name__ == "__main__":
    main()

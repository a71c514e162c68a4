"""Count-stage piece-wise profile with forced materialization."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bronko_tpu  # noqa: F401
import jax
import jax.numpy as jnp

SENTINEL = jnp.uint64(0xFFFFFFFFFFFFFFFF)


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
    k = 21
    R, L = 65536, 160
    W = L - k + 1
    print(f"platform={jax.devices()[0].platform} R={R} L={L}", flush=True)
    codes = jnp.asarray(rng.integers(0, 4, size=(R, L)).astype(np.uint8))
    lengths = jnp.asarray(np.full(R, 150, np.int32))

    def pack_u64(codes, lengths):
        c64 = codes.astype(jnp.uint64)
        acc = jnp.zeros((R, W), jnp.uint64)
        for t in range(k):
            acc = (acc << jnp.uint64(2)) | (c64[:, t:t + W] & jnp.uint64(3))
        return acc

    bench("pack u64 loop", pack_u64, codes, lengths)

    def pack_i32pair(codes, lengths):
        c32 = codes.astype(jnp.uint32)
        split = k - 16  # last 16 bases -> lo, first k-16 -> hi
        hi = jnp.zeros((R, W), jnp.uint32)
        for t in range(split):
            hi = (hi << jnp.uint32(2)) | (c32[:, t:t + W] & jnp.uint32(3))
        lo = jnp.zeros((R, W), jnp.uint32)
        for t in range(split, k):
            lo = (lo << jnp.uint32(2)) | (c32[:, t:t + W] & jnp.uint32(3))
        return hi, lo

    bench("pack i32 pair loop", pack_i32pair, codes, lengths)

    def validity(codes, lengths):
        bad = (codes >= 4).astype(jnp.int32)
        badps = jnp.concatenate([jnp.zeros((R, 1), jnp.int32), jnp.cumsum(bad, axis=1)], axis=1)
        nbad = badps[:, k:] - badps[:, :W]
        in_read = jnp.arange(W, dtype=jnp.int32)[None, :] + k <= lengths[:, None]
        return (nbad == 0) & in_read

    bench("validity", validity, codes, lengths)

    N = R * W
    flat = jnp.asarray(rng.integers(0, 1 << 42, size=N, dtype=np.uint64))
    bench("sort u64 9.1M", jax.jit(jnp.sort), flat)

    hi32 = jnp.asarray(rng.integers(0, 1 << 10, size=N, dtype=np.int32))
    lo32 = jnp.asarray(rng.integers(0, 1 << 31, size=N, dtype=np.int32))

    def sort2(hi, lo):
        return jax.lax.sort((hi, lo), num_keys=2)

    bench("sort 2-key i32 9.1M", sort2, hi32, lo32)

    s = jnp.sort(flat)

    def compact_scatter(s):
        is_new = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
        seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        ucounts = jnp.zeros(N, jnp.int32).at[seg].add(1)
        ukmers = jnp.full(N, SENTINEL, jnp.uint64).at[seg].set(s, mode="drop")
        return ukmers, ucounts

    bench("compact via scatter", compact_scatter, s)

    def compact_gather(s):
        is_new = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
        ranks = jnp.cumsum(is_new.astype(jnp.int32))  # 1-based rank per element
        # position of r-th boundary via searchsorted into the monotone ranks
        pos = jnp.searchsorted(ranks, jnp.arange(1, N + 1, dtype=jnp.int32), method="sort")
        posc = jnp.minimum(pos, N - 1)
        ukmers = s[posc]
        nxt = jnp.concatenate([pos[1:], jnp.asarray([N])])
        ucounts = (nxt - pos).astype(jnp.int32)
        return ukmers, ucounts

    bench("compact via gather/searchsorted", compact_gather, s)


if __name__ == "__main__":
    main()

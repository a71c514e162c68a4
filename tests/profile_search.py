"""searchsorted strategies on TPU: scan vs sort vs unrolled binary search."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bronko_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def bench(name, fn, *args, reps=5):
    # reduce to a scalar inside jit and fetch it: under the axon relay,
    # block_until_ready may resolve before remote execution completes
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.int64)))
    np.asarray(jfn(*args))
    ts = []
    for _ in range(reps):
        t = time.time()
        np.asarray(jfn(*args))
        ts.append(time.time() - t)
    print(f"{name}: {min(ts)*1000:.1f}ms", flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    U = 977_451
    B, J = 131_072, 16
    keys = np.sort(rng.integers(0, 1 << 44, size=U, dtype=np.uint64))
    q = rng.integers(0, 1 << 44, size=(B, J), dtype=np.uint64)
    keysj = jnp.asarray(keys)
    qj = jnp.asarray(q)

    bench("searchsorted scan (default)",
          lambda k, x: jnp.searchsorted(k, x), keysj, qj)
    bench("searchsorted sort",
          lambda k, x: jnp.searchsorted(k, x, method="sort"), keysj, qj)

    def unrolled(k, x):
        n = k.shape[0]
        depth = int(np.ceil(np.log2(n + 1)))
        lo = jnp.zeros(x.shape, jnp.int32)
        hi = jnp.full(x.shape, n, jnp.int32)
        for _ in range(depth):
            mid = (lo + hi) >> 1
            pred = k[jnp.minimum(mid, n - 1)] < x
            lo = jnp.where(pred, mid + 1, lo)
            hi = jnp.where(pred, hi, mid)
        return lo

    bench("unrolled binary search", unrolled, keysj, qj)

    # mix-hash radix probe
    def mix64(z):
        z = z.astype(jnp.uint64)
        z = (z ^ (z >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
        return z ^ (z >> jnp.uint64(31))

    bits = 21
    mixed = np.asarray(mix64(jnp.asarray(keys)))
    order = np.argsort(mixed, kind="stable")
    mix_sorted = mixed[order]
    keys_by_mix = keys[order]
    parts = (mix_sorted >> np.uint64(64 - bits)).astype(np.int64)
    radix_off = np.searchsorted(parts, np.arange((1 << bits) + 1)).astype(np.int32)
    pmax = int(np.max(np.diff(radix_off)))
    print(f"radix: {1 << bits} partitions, pmax={pmax}", flush=True)

    km = jnp.asarray(keys_by_mix)
    ro = jnp.asarray(radix_off)

    def radix_probe(x):
        m = mix64(x)
        part = (m >> jnp.uint64(64 - bits)).astype(jnp.int32)
        lo = ro[part]
        hi = ro[part + 1]
        row = jnp.full(x.shape, -1, jnp.int32)
        for step in range(pmax):
            cand = lo + step
            ok = cand < hi
            ck = km[jnp.where(ok, cand, 0)]
            row = jnp.where(ok & (ck == x) & (row < 0), cand, row)
        return row

    bench(f"mix-radix probe (pmax={pmax})", radix_probe, qj)


if __name__ == "__main__":
    main()

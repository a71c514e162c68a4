"""Gather micro-benchmarks: u64 vs int32 HBM gathers, and a Pallas
VMEM-resident gather kernel feasibility check."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bronko_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def bench(name, fn, *args, reps=5):
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(*args))
    ts = []
    for _ in range(reps):
        t = time.time()
        jax.block_until_ready(jfn(*args))
        ts.append(time.time() - t)
    print(f"{name}: {min(ts)*1000:.1f}ms", flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    U = 1 << 20
    N = 1 << 21

    tbl64 = jnp.asarray(rng.integers(0, 1 << 60, size=U, dtype=np.uint64))
    tbl32 = jnp.asarray(rng.integers(0, 1 << 30, size=U, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, U, size=N, dtype=np.int32))

    bench("gather u64 (2M from 1M)", lambda t, i: t[i], tbl64, idx)
    bench("gather i32 (2M from 1M)", lambda t, i: t[i], tbl32, idx)
    bench("gather i32 x20 seq", lambda t, i: _chain(t, i, 20), tbl32, idx)

    # pallas: VMEM-resident table gather
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        TILE = 4096

        def kernel(tbl_ref, idx_ref, out_ref):
            out_ref[:] = tbl_ref[idx_ref[:]]

        def pallas_gather(tbl, i):
            return pl.pallas_call(
                kernel,
                grid=(N // TILE,),
                in_specs=[
                    pl.BlockSpec((U,), lambda g: (0,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE,), lambda g: (g,), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TILE,), lambda g: (g,), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N,), tbl.dtype),
            )(tbl, i)

        bench("pallas vmem gather i32", pallas_gather, tbl32, idx)
    except Exception as e:  # noqa: BLE001
        print("pallas gather failed:", repr(e)[:300], flush=True)


def _chain(t, i, n):
    acc = i
    for _ in range(n):
        acc = t[(acc + i) & (t.shape[0] - 1)]
    return acc


if __name__ == "__main__":
    main()

"""Pallas TPU kernel: fused k-mer window-pack + validity.

Turns a (R, L) base-code matrix into per-window packed k-mers and a
validity mask in one VMEM pass — the first stage of the device counter
(ops/count.py). The XLA path materializes k sliding-slice intermediates in
HBM; this kernel keeps the whole tile resident in VMEM and emits the packed
words once.

TPU vector lanes are 32-bit (no int64 in Mosaic), so the 2k-bit word is
built as two int32 planes: hi = the first k-16 bases, lo = the last 16
bases; the caller combines them into uint64 with one fused XLA op.
Requires 16 < k <= 31 (always true: k in [15,31]; k=15 uses lo-only via
the hi plane holding 0 — handled by splitting at max(k-16, 0)).

Falls back to the XLA path automatically when Pallas/TPU is unavailable
(ops/count.py chooses at trace time).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pack_kernel(codes_ref, lengths_ref, hi_ref, lo_ref, valid_ref, *, k: int, W: int):
    codes = codes_ref[:].astype(jnp.int32)          # (TILE, L)
    lengths = lengths_ref[:]                        # (TILE, 1)
    split = max(k - 16, 0)

    hi = jnp.zeros_like(codes[:, :W])
    for t in range(split):
        hi = (hi << 2) | (codes[:, t:t + W] & 3)
    lo = jnp.zeros_like(codes[:, :W])
    for t in range(split, k):
        lo = (lo << 2) | (codes[:, t:t + W] & 3)

    bad = jnp.zeros_like(codes[:, :W], dtype=jnp.bool_)
    for t in range(k):
        bad = bad | (codes[:, t:t + W] >= 4)

    col = jax.lax.broadcasted_iota(jnp.int32, (codes.shape[0], W), 1)
    in_read = (col + k) <= lengths
    hi_ref[:] = hi
    lo_ref[:] = lo
    valid_ref[:] = (~bad) & in_read


@functools.partial(jax.jit, static_argnames=("k",))
def pack_windows_pallas(codes, lengths, k: int):
    """(R, L) uint8 codes -> (R, W) uint64 kmers + (R, W) bool validity."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R0, L = codes.shape
    W = L - k + 1
    TILE = min(R0, 128)
    R = -(-R0 // TILE) * TILE
    if R != R0:
        codes = jnp.concatenate(
            [codes, jnp.full((R - R0, L), 4, codes.dtype)], axis=0)
        lengths = jnp.concatenate(
            [lengths, jnp.zeros(R - R0, lengths.dtype)], axis=0)

    # x64 mode leaks i64 index types into the Mosaic kernel; trace it in
    # 32-bit scope (all kernel dtypes are 32-bit anyway)
    with jax.enable_x64(False):
        hi, lo, valid = pl.pallas_call(
            functools.partial(_pack_kernel, k=k, W=W),
            grid=(R // TILE,),
            in_specs=[
                pl.BlockSpec((TILE, L), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((TILE, W), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, W), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, W), lambda g: (g, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((R, W), jnp.int32),
                jax.ShapeDtypeStruct((R, W), jnp.int32),
                jax.ShapeDtypeStruct((R, W), jnp.bool_),
            ),
        )(codes, lengths.reshape(R, 1))

    split = max(k - 16, 0)
    # bitcast: lo can fill all 32 bits (16 bases) — plain astype would
    # sign-extend negative int32 into the high word
    hi_u = jax.lax.bitcast_convert_type(hi, jnp.uint32).astype(jnp.uint64)
    lo_u = jax.lax.bitcast_convert_type(lo, jnp.uint32).astype(jnp.uint64)
    kmers = (hi_u << jnp.uint64(2 * (k - split))) | lo_u
    return kmers[:R0], valid[:R0]

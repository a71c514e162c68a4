"""Pallas TPU kernel: fused canonicalize + bucket-hash for the mapper probe.

The probe front end (ops/map.py:_probe) computes, per read k-mer: the
reverse complement, the canonical form (lcb.rs:97-104 semantics), and the
J filtered bucket ids (lcb.rs:1-45 semantics, closed forms as in
ops/buckets.py). In XLA this is ~60 elementwise u64 ops that materialize
dozens of (B, k) uint64 intermediates in HBM — measured ~50 ms per 128k
batch on TPU, ~1000x the output's own HBM write cost. This kernel keeps
everything in VMEM/registers and writes only the outputs once.

TPU vector lanes are 32-bit (no int64 in Mosaic), so every u64 quantity
lives as a (hi, lo) uint32 pair:
  * add/sub carry-emulate (compare-based carry/borrow);
  * all shifts in the bucket math are STATIC (2*(k-1-i)) and even, so a
    2-bit base never straddles the 32-bit boundary and every u64
    constant/shift splits at trace time;
  * the only multiplies are small-vector x small-constant
    (base*weight <= 90, num_a*base <= 93 — both < 2^7), so u64 products
    reduce to a u32 multiply plus a static shift split;
  * u64 wrap-around (relevant near k=31 where mu_0 exceeds 2^63, matching
    the reference's release-mode u64 wrap) falls out of u32 wrap + carry.

Oracle parity: tests/test_pallas_buckets.py runs this kernel in interpret
mode against ops/codec.canonical + ops/buckets.assign_buckets on random
k-mers for every supported k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _u32(x: int):
    return jnp.uint32(x & 0xFFFFFFFF)


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(jnp.uint32)
    return ah + bh + carry, lo


def _sub64(ah, al, bh, bl):
    borrow = (al < bl).astype(jnp.uint32)
    return ah - bh - borrow, al - bl


def _shl64_small(v, s: int):
    """(small uint32 vector) << static s -> (hi, lo), u64 wrap semantics."""
    zero = jnp.zeros_like(v)
    if s == 0:
        return zero, v
    if s >= 64:
        return zero, zero
    if s >= 32:
        return v << (s - 32), zero
    # v is < 2^7 everywhere this is called, so the spill into hi is exact
    return v >> (32 - s), v << s


def _canonical_u32(fhi, flo, k: int):
    """Reverse complement + canonicalization on (hi, lo) uint32 planes.

    revcomp (lcb.rs:76-85): k steps of extract-low-base, complement,
    shift-in; top bits stay zero (only k shifts from zero). canonical =
    min(fwd, rc), is_rc = fwd >= rc (u64 unsigned compare)."""
    rc_hi = jnp.zeros_like(fhi)
    rc_lo = jnp.zeros_like(flo)
    for i in range(k):
        bp = 2 * i
        base = ((flo >> bp) if bp < 32 else (fhi >> (bp - 32))) & _u32(3)
        rc_hi = (rc_hi << 2) | (rc_lo >> 30)
        rc_lo = (rc_lo << 2) | (base ^ _u32(3))
    is_rc = (fhi > rc_hi) | ((fhi == rc_hi) & (flo >= rc_lo))
    chi = jnp.where(is_rc, rc_hi, fhi)
    clo = jnp.where(is_rc, rc_lo, flo)
    return chi, clo, is_rc


def _bucket_kernel(hi_ref, lo_ref, qhi_ref, qlo_ref, chi_ref, clo_ref,
                   rc_ref, *, k: int, positions: tuple[int, ...]):
    fhi = hi_ref[:]
    flo = lo_ref[:]
    chi, clo, is_rc = _canonical_u32(fhi, flo, k)

    # bucket math (ops/buckets.py closed forms): one pass accumulates
    # sum_mu and the exclusive 'A'-prefix count, saving the per-position
    # pieces needed by the J outputs.
    smh = jnp.zeros_like(fhi)
    sml = jnp.zeros_like(flo)
    num_a = jnp.zeros_like(flo)
    keep = set(positions)
    saved = {}
    for i in range(k):
        shift = 2 * (k - 1 - i)
        w = k - 1 - i
        base = ((clo >> shift) if shift < 32 else (chi >> (shift - 32))) & _u32(3)
        # val_i = canon & (2^shift - 1)
        if shift >= 32:
            vh = chi & _u32((1 << (shift - 32)) - 1)
            vl = clo
        else:
            vh = jnp.zeros_like(chi)
            vl = clo & _u32((1 << shift) - 1)
        # mu_i = base != 0 ? p + (base*w) << (shift-2) : val_i
        if shift >= 2 and w > 0:
            th, tl = _shl64_small(base * _u32(w), shift - 2)
        else:
            th = tl = jnp.zeros_like(base)
        ph = (1 << (shift - 32)) if shift >= 32 else 0
        pl_ = (1 << shift) if shift < 32 else 0
        tl2 = tl + _u32(pl_)
        th2 = th + _u32(ph) + (tl2 < tl).astype(jnp.uint32)
        nz = base != 0
        muh = jnp.where(nz, th2, vh)
        mul_ = jnp.where(nz, tl2, vl)
        smh, sml = _add64(smh, sml, muh, mul_)
        if i in keep:
            saved[i] = (muh, mul_, vh, vl, base, num_a)  # num_a EXCLUSIVE
        num_a = num_a + (base == 0).astype(jnp.uint32)

    # bucket_i = sum_mu - mu_i + val_i - num_a_i*cur_i + 1 + num_a_i
    for j, i in enumerate(positions):
        muh, mul_, vh, vl, base, na = saved[i]
        shift = 2 * (k - 1 - i)
        bh, bl = _sub64(smh, sml, muh, mul_)
        bh, bl = _add64(bh, bl, vh, vl)
        nch, ncl = _shl64_small(na * base, shift)  # na*base <= 93 < 2^7
        bh, bl = _sub64(bh, bl, nch, ncl)
        bh, bl = _add64(bh, bl, jnp.zeros_like(na), na + _u32(1))
        qhi_ref[j] = bh
        qlo_ref[j] = bl

    chi_ref[:] = chi
    clo_ref[:] = clo
    rc_ref[:] = is_rc


@functools.partial(jax.jit, static_argnames=("k", "positions"))
def bucket_queries_pallas(kmers, k: int, positions: tuple[int, ...]):
    """(B,) uint64 k-mers -> (q (B,J) uint64, canon (B,) uint64, is_rc (B,) bool).

    q[:, j] is the bucket id at wildcard position positions[j] of the
    canonical k-mer — exactly assign_buckets(...)[:, positions].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = kmers.shape[0]
    J = len(positions)
    C = 128
    TILE = 8
    n = TILE * C
    Bp = -(-B // n) * n
    kp = (jnp.concatenate([kmers, jnp.zeros(Bp - B, kmers.dtype)])
          if Bp != B else kmers)
    R = Bp // C
    hi = (kp >> jnp.uint64(32)).astype(jnp.uint32).reshape(R, C)
    lo = kp.astype(jnp.uint32).reshape(R, C)

    # x64 mode leaks i64 index types into Mosaic; all kernel dtypes are
    # 32-bit, so trace in 32-bit scope (same pattern as pallas_pack.py)
    with jax.enable_x64(False):
        qhi, qlo, chi, clo, is_rc = pl.pallas_call(
            functools.partial(_bucket_kernel, k=k, positions=tuple(positions)),
            grid=(R // TILE,),
            in_specs=[
                pl.BlockSpec((TILE, C), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, C), lambda g: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((J, TILE, C), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((J, TILE, C), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, C), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, C), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, C), lambda g: (g, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((J, R, C), jnp.uint32),
                jax.ShapeDtypeStruct((J, R, C), jnp.uint32),
                jax.ShapeDtypeStruct((R, C), jnp.uint32),
                jax.ShapeDtypeStruct((R, C), jnp.uint32),
                jax.ShapeDtypeStruct((R, C), jnp.bool_),
            ),
        )(hi, lo)

    q = ((qhi.astype(jnp.uint64) << jnp.uint64(32)) | qlo.astype(jnp.uint64))
    q = q.reshape(J, Bp)[:, :B].T                        # (B, J)
    canon = ((chi.astype(jnp.uint64) << jnp.uint64(32))
             | clo.astype(jnp.uint64)).reshape(Bp)[:B]
    return q, canon, is_rc.reshape(Bp)[:B]


def _fold_kernel(hi_ref, lo_ref, cnt_ref, out_ref, *, k: int):
    fhi = hi_ref[:]
    flo = lo_ref[:]
    chi, clo, is_rc = _canonical_u32(fhi, flo, k)
    head = ((is_rc.astype(jnp.int32) << 4)
            | (cnt_ref[:] << 5))                          # rc flag + count
    for i in range(k):
        shift = 2 * (k - 1 - i)                           # base i (leftmost=0)
        base = ((clo >> shift) if shift < 32 else (chi >> (shift - 32))) & _u32(3)
        shift_m = 2 * i                                   # base k-1-i
        basem = ((clo >> shift_m) if shift_m < 32
                 else (chi >> (shift_m - 32))) & _u32(3)
        out_ref[i] = (base | ((_u32(3) - basem) << 2)).astype(jnp.int32) | head


@functools.partial(jax.jit, static_argnames=("k",))
def fold_table_pallas(kmers, counts, k: int):
    """(B,) uint64 k-mers + (B,) int32 counts -> (B*k,) int32 fold table.

    Bit-identical to ops/map._fold_table(canonical(kmers)) — the
    per-(kmer, position) packed record of non-canonical base (bits 0-1),
    mirrored complement (2-3), rc flag (4), and count (5+) — computed
    entirely in VMEM (the XLA path materializes (B, k) uint64 base/mirror
    intermediates in HBM)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = kmers.shape[0]
    C = 128
    TILE = 8
    n = TILE * C
    Bp = -(-B // n) * n
    if Bp != B:
        kmers = jnp.concatenate([kmers, jnp.zeros(Bp - B, kmers.dtype)])
        counts = jnp.concatenate([counts, jnp.zeros(Bp - B, counts.dtype)])
    R = Bp // C
    hi = (kmers >> jnp.uint64(32)).astype(jnp.uint32).reshape(R, C)
    lo = kmers.astype(jnp.uint32).reshape(R, C)
    cnt = counts.astype(jnp.int32).reshape(R, C)

    with jax.enable_x64(False):
        pc = pl.pallas_call(
            functools.partial(_fold_kernel, k=k),
            grid=(R // TILE,),
            in_specs=[
                pl.BlockSpec((TILE, C), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, C), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, C), lambda g: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((k, TILE, C), lambda g: (0, g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k, R, C), jnp.int32),
        )(hi, lo, cnt)

    return pc.reshape(k, Bp)[:, :B].T.reshape(B * k)

"""Oracle parity for the fused Pallas canonicalize+bucket kernel.

Runs the Mosaic kernel in interpret mode on CPU against the reference-
anchored XLA implementations (ops/codec.canonical golden-anchored via
lcb.rs:97-104 semantics; ops/buckets.assign_buckets golden-anchored via the
lcb.rs:147-154 unit vectors)."""

from __future__ import annotations

import functools
from unittest import mock

import numpy as np
import pytest

from bronko_tpu.ops.buckets import assign_buckets, filtered_bucket_positions
from bronko_tpu.ops.codec import canonical


def _run_kernel_interpret(kmers, k, positions):
    from jax.experimental import pallas as pl

    from bronko_tpu.ops import pallas_buckets

    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        return pallas_buckets.bucket_queries_pallas(kmers, k, tuple(positions))


@pytest.mark.parametrize("k", [15, 21, 31])
def test_kernel_matches_xla(k):
    rng = np.random.default_rng(7 + k)
    B = 300  # not a multiple of the 8x128 tile: exercises padding
    kmers = rng.integers(0, 1 << (2 * k), size=B, dtype=np.uint64)
    positions = tuple(filtered_bucket_positions(k, 3, False))

    q_p, canon_p, is_rc_p = _run_kernel_interpret(kmers, k, positions)

    canon_x, is_rc_x = canonical(kmers, k, np)
    q_x = assign_buckets(canon_x, k, np)[:, np.asarray(positions)]

    np.testing.assert_array_equal(np.asarray(is_rc_p), is_rc_x)
    np.testing.assert_array_equal(np.asarray(canon_p), canon_x)
    np.testing.assert_array_equal(np.asarray(q_p), q_x)


def test_kernel_u64_wrap_at_k31():
    """Near-all-T k=31 k-mers push mu_0 past 2^63: wrap must bit-match."""
    k = 31
    # canonical form of all-T is all-A; use high-value canonicals directly
    rng = np.random.default_rng(99)
    base = (np.uint64(1) << np.uint64(62)) - np.uint64(1)
    kmers = base - rng.integers(0, 1 << 20, size=1024, dtype=np.uint64)
    positions = tuple(filtered_bucket_positions(k, 3, False))

    q_p, canon_p, _ = _run_kernel_interpret(kmers, k, positions)
    canon_x, _ = canonical(kmers, k, np)
    with np.errstate(over="ignore"):
        q_x = assign_buckets(canon_x, k, np)[:, np.asarray(positions)]
    np.testing.assert_array_equal(np.asarray(canon_p), canon_x)
    np.testing.assert_array_equal(np.asarray(q_p), q_x)


@pytest.mark.parametrize("k", [15, 21, 31])
def test_fold_kernel_matches_xla(k):
    from jax.experimental import pallas as pl

    from bronko_tpu.ops import pallas_buckets
    from bronko_tpu.ops.map import _fold_table

    rng = np.random.default_rng(13 + k)
    B = 300
    kmers = rng.integers(0, 1 << (2 * k), size=B, dtype=np.uint64)
    counts = rng.integers(0, 1_000_000, size=B, dtype=np.int32)

    canon, is_rc = canonical(kmers, k, np)
    want = np.asarray(_fold_table(canon, is_rc, counts, k))

    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        got = np.asarray(pallas_buckets.fold_table_pallas(kmers, counts, k))
    np.testing.assert_array_equal(got, want)


def test_probe_integration_matches_xla_path():
    """tally_hist with cfg.use_pallas (interpret mode) == the XLA path."""
    import dataclasses

    from jax.experimental import pallas as pl

    from bronko_tpu.ops import map as m

    rng = np.random.default_rng(11)
    k = 15
    B, U, G = 256, 64, 4
    keys = np.sort(rng.choice(1 << 30, size=U, replace=False).astype(np.uint64))
    offsets = np.zeros(U + 1, np.int32)
    hist = rng.integers(0, 1 << 16, size=U, dtype=np.int64)
    kmers = rng.integers(0, 1 << (2 * k), size=B, dtype=np.uint64)
    counts = rng.integers(0, 3, size=B, dtype=np.int32)
    cfg = m.MapConfig(k=k, positions=tuple(range(3, 11)), max_bucket=8,
                      num_genomes=G, total_len=100)

    base = np.asarray(m.tally_hist(kmers, counts, keys, hist, cfg=cfg))
    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        cfg_p = dataclasses.replace(cfg, use_pallas=True)
        got = np.asarray(m.tally_hist(kmers, counts, keys, hist,
                                      cfg=cfg_p))
    np.testing.assert_array_equal(got, base)


def test_kernel_full_kmer_positions():
    """--use-full-kmer keeps all k positions (J = k)."""
    k = 15
    rng = np.random.default_rng(3)
    kmers = rng.integers(0, 1 << (2 * k), size=256, dtype=np.uint64)
    positions = tuple(range(k))
    q_p, canon_p, is_rc_p = _run_kernel_interpret(kmers, k, positions)
    canon_x, is_rc_x = canonical(kmers, k, np)
    q_x = assign_buckets(canon_x, k, np)
    np.testing.assert_array_equal(np.asarray(q_p), q_x)

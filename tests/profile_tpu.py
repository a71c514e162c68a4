"""Micro-profile of the hot device ops on the current default platform.

Usage: python tests/profile_tpu.py [R L B]
Prints per-op compile and steady times. Run with BRONKO_PLATFORM=cpu for the
CPU comparison.
"""

import sys
import time

import numpy as np

import bronko_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def bench(name, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    t1 = time.time()
    ts = []
    for _ in range(reps):
        t = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t)
    print(f"{name}: compile+run={t1 - t0:.2f}s steady={min(ts):.3f}s", flush=True)
    return min(ts)


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 131072
    k = 21
    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform} R={R} L={L} B={B}", flush=True)

    from bronko_tpu.ops.count import extract_and_count_chunk

    codes = rng.integers(0, 4, size=(R, L)).astype(np.uint8)
    lengths = np.full(R, L - 10, np.int32)
    n_kmers = R * (L - k + 1)
    t = bench("count_chunk", lambda c, l: extract_and_count_chunk(c, l, k),
              jnp.asarray(codes), jnp.asarray(lengths))
    print(f"  -> {n_kmers / t / 1e6:.1f} Mkmers/s,"
          f" {n_kmers / (L - k + 1) / t:.0f} reads/s", flush=True)

    # pieces
    flat = jnp.asarray(rng.integers(0, 1 << 42, size=n_kmers, dtype=np.uint64))
    bench("  sort_u64", jax.jit(jnp.sort), flat)
    srt = jnp.sort(flat)
    idx32 = jnp.asarray(rng.integers(0, n_kmers, size=n_kmers, dtype=np.int32))

    def scatter_add(s, i):
        return jnp.zeros(s.shape[0], jnp.int32).at[i].add(1)

    bench("  scatter_add", jax.jit(scatter_add), srt, idx32)

    def seg_scan(s):
        is_new = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
        return jnp.cumsum(is_new.astype(jnp.int32))

    bench("  cumsum", jax.jit(seg_scan), srt)

    # map batch on a 4-genome SARS-scale index
    from tests.make_synthetic import make_genome
    import tempfile
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index
    from bronko_tpu.ops.map import map_batch_jit

    tmp = tempfile.mkdtemp()
    paths = []
    base = make_genome(rng, 29900)
    for g in range(4):
        gen = bytearray(base)
        for p in rng.integers(0, len(base), 300):  # ~1% divergence
            gen[p] = b"ACGT"[rng.integers(4)]
        p_ = f"{tmp}/g{g}.fasta"
        with open(p_, "w") as fh:
            fh.write(f">s{g}\n{bytes(gen).decode()}\n")
        paths.append(p_)
    index = build_index(k, paths)
    dev = build_device_index(index)
    print(f"index: {index.num_postings} postings, {index.num_buckets} buckets, "
          f"E={index.max_postings_per_bucket}", flush=True)
    cfg = dev.map_config(2, False)

    from bronko_tpu.ops.codec import pack_kmer, seq_bytes_to_bits
    bits = seq_bytes_to_bits(index.files[0].sequences[0].seq)
    starts = rng.integers(0, len(bits) - k + 1, size=B)
    kmers = pack_kmer(np.stack([bits[s:s + k] for s in starts]), k)
    counts = rng.integers(3, 100, size=B).astype(np.int32)
    pileup = jnp.zeros((4, dev.total_len + 1, 4), jnp.int32)
    tallies = jnp.zeros((dev.num_genomes, 3), jnp.int32)

    t = bench("map_batch", lambda *a: map_batch_jit(*a, cfg),
              jnp.asarray(kmers), jnp.asarray(counts), dev.keys, dev.offsets,
              dev.gpos, dev.pmeta, pileup, tallies)
    print(f"  -> {B / t / 1e6:.2f} Mkmers/s mapped", flush=True)


if __name__ == "__main__":
    main()

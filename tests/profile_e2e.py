"""End-to-end hot-path profile with forced materialization (axon-safe).

Measures count_chunk and map_batch steady-state on the current platform at
bench-realistic shapes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bronko_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def sync(tree):
    """Force remote materialization by fetching a tiny reduction."""
    leaves = jax.tree_util.tree_leaves(tree)
    for x in leaves:
        if hasattr(x, "sum"):
            np.asarray(x.ravel()[-1:])
    return tree


def main():
    rng = np.random.default_rng(0)
    k = 21
    print(f"platform={jax.devices()[0].platform}", flush=True)

    # ---- counting ----
    from bronko_tpu.ops.count import extract_and_count_chunk

    R, L = 65536, 160
    codes = rng.integers(0, 4, size=(R, L)).astype(np.uint8)
    lengths = np.full(R, 150, np.int32)
    cj, lj = jnp.asarray(codes), jnp.asarray(lengths)

    t0 = time.time()
    sync(extract_and_count_chunk(cj, lj, k))
    t1 = time.time()
    ts = []
    for _ in range(3):
        t = time.time()
        sync(extract_and_count_chunk(cj, lj, k))
        ts.append(time.time() - t)
    n_kmers = R * (L - k + 1)
    t_count = min(ts)
    print(f"count_chunk: compile={t1-t0:.1f}s steady={t_count:.3f}s "
          f"({n_kmers/t_count/1e6:.1f} Mkmers/s, {R/t_count:.0f} reads/s)", flush=True)

    # ---- mapping ----
    import tempfile
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index
    from bronko_tpu.ops.codec import pack_kmer, seq_bytes_to_bits
    from bronko_tpu.ops.map import map_batch_jit
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
    B = 131072
    bits = seq_bytes_to_bits(index.files[0].sequences[0].seq)
    starts = rng.integers(0, len(bits) - k + 1, size=B)
    kmers = jnp.asarray(pack_kmer(np.stack([bits[s:s + k] for s in starts]), k))
    counts = jnp.asarray(rng.integers(3, 100, size=B).astype(np.int32))

    def run_map():
        pileup = jnp.zeros((4, dev.total_len + 1, 4), jnp.int32)
        tallies = jnp.zeros((dev.num_genomes, 3), jnp.int32)
        return map_batch_jit(kmers, counts, dev.keys, dev.offsets,
                             dev.postings, pileup, tallies, cfg)

    t0 = time.time()
    sync(run_map())
    t1 = time.time()
    ts = []
    for _ in range(3):
        t = time.time()
        sync(run_map())
        ts.append(time.time() - t)
    t_map = min(ts)
    print(f"map_batch:   compile={t1-t0:.1f}s steady={t_map:.3f}s "
          f"({B/t_map/1e6:.2f} Mkmers/s)", flush=True)


if __name__ == "__main__":
    main()

"""Internal perf tool: measure the host->device k-mer upload cost on the
real TPU and evaluate mitigations.

Variants:
  * upload_raw     — jnp.asarray of the (nb, B) u64 kmers + i32 counts
  * tally_dev      — tally_save_jit with inputs already on device
  * tally_host     — tally_save_jit handed host numpy (upload inside)
  * upload_packed  — bit-packed payload (2k bits/kmer + 20-bit counts in
                     one u32 stream) + on-device unpack to (kj, cj)

Prints one JSON line per measurement. Usage: run alone (holds the TPU).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def pack_payload(kb: np.ndarray, cb: np.ndarray, k: int) -> np.ndarray:
    """Host-side bit-pack: per kmer, 2k bits of key + 20 bits of count,
    concatenated little-endian into a u32 stream."""
    bits = 2 * k + 20
    n = kb.size
    total_bits = n * bits
    words = -(-total_bits // 64) + 1
    buf = np.zeros(words, np.uint64)
    vals_lo = kb.reshape(-1).astype(np.uint64)
    cnts = cb.reshape(-1).astype(np.uint64) & np.uint64((1 << 20) - 1)
    # value = key | count << 2k  (bits <= 62+20 > 64, so split the write)
    starts = np.arange(n, dtype=np.uint64) * np.uint64(bits)
    w0 = (starts >> np.uint64(6)).astype(np.int64)
    off = (starts & np.uint64(63)).astype(np.uint64)
    # write key (2k bits) then count (20 bits) with up-to-3-word spills
    def scatter_bits(val, nbits, starts):
        w0 = (starts >> np.uint64(6)).astype(np.int64)
        off = starts & np.uint64(63)
        lo = val << off
        np.bitwise_or.at(buf, w0, lo)
        rem = np.uint64(64) - off
        spill = rem < np.uint64(nbits)
        hi = np.where(spill, val >> rem.clip(max=np.uint64(63)), 0).astype(np.uint64)
        np.bitwise_or.at(buf, w0 + 1, np.where(spill, hi, 0).astype(np.uint64))
    scatter_bits(vals_lo, 2 * k, starts)
    scatter_bits(cnts, 20, starts + np.uint64(2 * k))
    return buf.view(np.uint32)


def main() -> None:
    import bench

    genome_paths, fastq = bench._ensure_data()
    fastq = fastq[0]  # _ensure_data returns the 3-sample cohort

    import jax
    import jax.numpy as jnp

    from bronko_tpu.call.engine import _prepare_batches, count_sample
    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index
    from bronko_tpu.ops.map import tally_save_jit

    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    cfg = CallConfig(db="bench", reads=[fastq], output="/tmp/bench_h2d_out")
    os.makedirs(cfg.output, exist_ok=True)
    k = cfg.kmer
    index = build_index(k, genome_paths)
    dev = build_device_index(index)
    kmers, counts, _ = count_sample(fastq, cfg, index.k)
    kb, cb = _prepare_batches(kmers, counts, cfg.batch_size, upload=False)
    mcfg = dev.map_config(cfg.n_fixed, cfg.use_full_kmer)
    nbytes = kb.nbytes + cb.nbytes
    print(json.dumps({"kmers": int(kmers.shape[0]), "shape": list(kb.shape),
                      "payload_mb": round(nbytes / 1e6, 3)}), flush=True)

    def timed(fn, n=4):
        ts = []
        out = None
        for _ in range(n):
            t0 = time.time()
            out = fn()
            ts.append(round(time.time() - t0, 4))
        return min(ts[1:]), ts, out

    # 1. raw upload, forced by a scalar reduce read-back
    @jax.jit
    def _touch(a, b):
        return a.sum() + b.sum().astype(jnp.uint64)

    def up_raw():
        kj = jnp.asarray(kb)
        cj = jnp.asarray(cb)
        return int(np.asarray(_touch(kj, cj)))

    best, ts, _ = timed(up_raw)
    print(json.dumps({"upload_raw_s": best, "all": ts,
                      "mb_s": round(nbytes / 1e6 / best, 1)}), flush=True)

    # 2. tally with device-resident inputs
    kj_d = jnp.asarray(kb)
    cj_d = jnp.asarray(cb)

    def tally_dev():
        tj = jnp.zeros((dev.num_genomes, 3), jnp.int32)
        tj, lt, ii, h = tally_save_jit(kj_d, cj_d, dev.keys, dev.offsets,
                                       dev.hist, tj, mcfg)
        return np.asarray(tj)

    best, ts, tal_d = timed(tally_dev)
    print(json.dumps({"tally_dev_s": best, "all": ts,
                      "sum": int(tal_d.sum())}), flush=True)

    # 3. tally handed host arrays (upload inside the timed region)
    def tally_host():
        kj = jnp.asarray(kb)
        cj = jnp.asarray(cb)
        tj = jnp.zeros((dev.num_genomes, 3), jnp.int32)
        tj, lt, ii, h = tally_save_jit(kj, cj, dev.keys, dev.offsets,
                                       dev.hist, tj, mcfg)
        return np.asarray(tj)

    best, ts, tal_h = timed(tally_host)
    print(json.dumps({"tally_host_s": best, "all": ts,
                      "equal": bool((tal_d == tal_h).all())}), flush=True)

    # 4. packed upload + on-device unpack
    packed = pack_payload(kb, cb, k)
    bits = 2 * k + 20
    nb, B = kb.shape

    @jax.jit
    def unpack(p32):
        p = p32.view(jnp.uint64) if hasattr(p32, "view") else p32
        p = jax.lax.bitcast_convert_type(
            p32.reshape(-1, 2), jnp.uint64).reshape(-1)
        n = nb * B
        starts = jnp.arange(n, dtype=jnp.uint64) * jnp.uint64(bits)
        w0 = (starts >> jnp.uint64(6)).astype(jnp.int32)
        off = starts & jnp.uint64(63)
        lo = p[w0] >> off
        rem = jnp.uint64(64) - off
        hi = jnp.where(rem < jnp.uint64(64), p[w0 + 1] << rem, jnp.uint64(0))
        word = lo | jnp.where(off > 0, hi, jnp.uint64(0))
        key = word & jnp.uint64((1 << (2 * k)) - 1)
        # count straddles: rebuild from the 82-bit window via a second read
        cstart = starts + jnp.uint64(2 * k)
        cw0 = (cstart >> jnp.uint64(6)).astype(jnp.int32)
        coff = cstart & jnp.uint64(63)
        clo = p[cw0] >> coff
        crem = jnp.uint64(64) - coff
        chi = jnp.where(crem < jnp.uint64(64), p[cw0 + 1] << crem, jnp.uint64(0))
        cnt = (clo | jnp.where(coff > 0, chi, jnp.uint64(0))) & jnp.uint64((1 << 20) - 1)
        return key.reshape(nb, B), cnt.astype(jnp.int32).reshape(nb, B)

    def up_packed():
        pj = jnp.asarray(packed)
        kju, cju = unpack(pj)
        return int(np.asarray(_touch(kju, cju)))

    ref = int(np.asarray(_touch(kj_d, cj_d)))
    best, ts, got = timed(up_packed)
    print(json.dumps({"upload_packed_s": best, "all": ts,
                      "packed_mb": round(packed.nbytes / 1e6, 3),
                      "equal": got == ref}), flush=True)


if __name__ == "__main__":
    main()

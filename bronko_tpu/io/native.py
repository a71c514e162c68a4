"""ctypes bindings for the native (C++) host components.

The shared library is compiled on demand with the baked-in toolchain (g++ +
zlib); all callers fall back to the pure-Python implementations when the
library is unavailable, so nothing hard-depends on it.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("bronko")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libbronko_io.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception as e:  # noqa: BLE001
        log.debug("native build failed: %s", e)
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # Always invoke make: it is a ~20ms no-op when the .so is newer than
        # every source (the Makefile lists them as prerequisites), and it
        # rebuilds after source edits instead of silently loading a stale
        # binary. If make fails but an older .so exists, still try it.
        if not _build() and not os.path.exists(_SO_PATH):
            return None
        if not os.path.exists(_SO_PATH):
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:
            log.debug("native load failed: %s", e)
            return None
        lib.bronko_fastq_open.restype = ctypes.c_void_p
        lib.bronko_fastq_open.argtypes = [ctypes.c_char_p]
        lib.bronko_fastq_close.argtypes = [ctypes.c_void_p]
        lib.bronko_fastq_total_reads.restype = ctypes.c_int64
        lib.bronko_fastq_total_reads.argtypes = [ctypes.c_void_p]
        lib.bronko_fastq_read_chunk.restype = ctypes.c_int64
        lib.bronko_fastq_read_chunk.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.bronko_noise_scan.restype = None
        lib.bronko_noise_scan.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        lib.bronko_counter_create.restype = ctypes.c_void_p
        lib.bronko_counter_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.bronko_counter_destroy.argtypes = [ctypes.c_void_p]
        lib.bronko_counter_count_fastq.restype = ctypes.c_int
        lib.bronko_counter_count_fastq.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        for fn in ("total_reads", "total_kmers", "unique"):
            f = getattr(lib, f"bronko_counter_{fn}")
            f.restype = ctypes.c_int64
            f.argtypes = [ctypes.c_void_p]
        lib.bronko_counter_finalize.restype = ctypes.c_int64
        lib.bronko_counter_finalize.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32]
        lib.bronko_counter_finalize_part.restype = ctypes.c_int64
        lib.bronko_counter_finalize_part.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint32,
            ctypes.c_uint32]
        lib.bronko_counter_extract.restype = None
        lib.bronko_counter_extract.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
        ]
        lib.bronko_read_inflate.restype = ctypes.c_void_p
        lib.bronko_read_inflate.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
        lib.bronko_buffer_data.restype = ctypes.c_void_p
        lib.bronko_buffer_data.argtypes = [ctypes.c_void_p]
        lib.bronko_buffer_free.restype = None
        lib.bronko_buffer_free.argtypes = [ctypes.c_void_p]
        lib.bronko_counter_count_text.restype = ctypes.c_int
        lib.bronko_counter_count_text.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
        return _lib


class InflatedText:
    """Opaque handle to a C++-owned inflated FASTQ text buffer
    (bronko_read_inflate). `handle is None` marks fallback: the file was
    over the whole-buffer cap or the read failed — count from the path.
    `on_close` fires exactly once on the first close() (the engine uses it
    to return the buffer's bytes to its inflate-ahead budget)."""

    def __init__(self, handle, size: int, on_close=None):
        self.handle = handle
        self.size = size
        self._on_close = on_close

    def close(self):
        if self.handle is not None:
            get_lib().bronko_buffer_free(self.handle)
            self.handle = None
        if self._on_close is not None:
            cb, self._on_close = self._on_close, None
            cb()

    def __del__(self):  # backstop; the engine closes explicitly
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass


def native_read_inflate(path: str, on_close=None) -> InflatedText:
    """Read + inflate one FASTQ on the calling thread (GIL released inside
    the C call) so the engine can overlap sample i+1's single-threaded
    inflate with sample i's multi-threaded parse/count."""
    lib = get_lib()
    assert lib is not None
    size = ctypes.c_int64()
    try:
        h = lib.bronko_read_inflate(path.encode(), ctypes.byref(size))
    except Exception:  # noqa: BLE001 — fall back to the path-based count
        h = None
    return InflatedText(h, int(size.value), on_close=on_close)


def _count_into(lib, h, path: str, text: "InflatedText | None") -> None:
    """Count one file into counter handle h — from the pre-inflated text
    when available (closed here), else from the path — mapping the C
    return codes to exceptions. ONE copy for the batch and streaming
    counters so their selection/error semantics cannot drift."""
    if text is not None and text.handle is not None:
        try:
            rc = lib.bronko_counter_count_text(
                h, lib.bronko_buffer_data(text.handle), text.size)
        finally:
            text.close()
    else:
        rc = lib.bronko_counter_count_fastq(h, path.encode())
    if rc == -1:
        raise OSError(f"cannot open {path}")
    if rc != 0:
        raise ValueError(f"malformed FASTQ: {path}")


def native_count_fastq(path: str, k: int, min_count: int, count_cap: int,
                       threads: int = 4, text: InflatedText | None = None):
    """Count a FASTQ file's k-mers entirely in C++ (multithreaded pipeline).

    Returns (kmers u64 sorted, counts int64, stats dict). Matches KMC -b
    -ci<min> -cs<cap> semantics like ops/count.KmerCounter.

    `threads` is the TOTAL thread budget. The C++ side picks the split:
    whole-buffer front end (one-shot libdeflate/zlib inflate, then parse+
    count on ALL threads) for ordinary files; reader + threads-1 counters
    for the streaming large-file fallback. `text` (from
    native_read_inflate) skips the read+inflate; it is closed here.
    """
    lib = get_lib()
    assert lib is not None
    h = lib.bronko_counter_create(k, max(1, threads))
    if not h:
        raise ValueError(f"k={k} outside the counter's supported range")
    try:
        _count_into(lib, h, path, text)
        n = int(lib.bronko_counter_finalize(h, min_count, count_cap))
        kmers = np.empty(n, np.uint64)
        counts = np.empty(n, np.uint32)
        if n:
            lib.bronko_counter_extract(h, kmers, counts)
        stats = dict(
            total_reads=int(lib.bronko_counter_total_reads(h)),
            total_kmers=int(lib.bronko_counter_total_kmers(h)),
            unique_kmers=int(lib.bronko_counter_unique(h)),
            unique_counted_kmers=n,
        )
        return kmers, counts.astype(np.int64), stats
    finally:
        lib.bronko_counter_destroy(h)


NATIVE_COUNT_PARTS = 4  # key-range partitions of the streaming finalize
# (power of two in [1, 8]). Fewer, larger partitions win on the serving
# relay: each partition pays a fixed h2d + dispatch latency, while the
# overlap gain (device tallies partition p during the host sort of p+1)
# saturates early; 4 keeps overlap granularity for larger samples.


def native_count_fastq_stream(paths: list[str], k: int, min_count: int,
                              count_cap: int, threads: int = 4):
    """Streaming counter: count the file(s), then yield the sorted unique
    (kmers, counts) of each key-range partition as it finalizes — the
    caller overlaps device dispatch on partition p with the host sort of
    partition p+1. Yields (kmers, counts, stats_or_None); stats arrive
    with the LAST partition. Each path gets its own counter (paired mates
    are separate k-mer streams, matching the reference's two KMC runs).
    For paired inputs, mate i+1's single-threaded inflate runs on a helper
    thread while mate i parses/counts (bounded: <= 2 buffers live)."""
    from concurrent.futures import ThreadPoolExecutor

    lib = get_lib()
    assert lib is not None
    with ThreadPoolExecutor(max_workers=1) as pool:
        # inflate-ahead bounded to ONE file beyond the current: path 0
        # inflates inline (inside its count) while path 1 prefetches;
        # thereafter path i+1 submits just before path i counts — at most
        # one live text buffer plus one in flight, regardless of
        # len(paths) (an upfront submit-all would let the worker inflate
        # the whole list while path 0 still counts)
        next_tf = (pool.submit(native_read_inflate, paths[1])
                   if len(paths) > 1 else None)
        try:
            for i, path in enumerate(paths):
                if i == 0:
                    text = None
                else:
                    text = next_tf.result()
                    next_tf = (pool.submit(native_read_inflate, paths[i + 1])
                               if i + 1 < len(paths) else None)
                h = lib.bronko_counter_create(k, max(1, threads))
                if not h:
                    raise ValueError(
                        f"k={k} outside the counter's supported range")
                try:
                    _count_into(lib, h, path, text)
                    unique_counted = 0
                    for part in range(NATIVE_COUNT_PARTS):
                        n = int(lib.bronko_counter_finalize_part(
                            h, part, NATIVE_COUNT_PARTS, min_count, count_cap))
                        kmers = np.empty(n, np.uint64)
                        counts = np.empty(n, np.uint32)
                        if n:
                            lib.bronko_counter_extract(h, kmers, counts)
                        unique_counted += n
                        stats = None
                        if part == NATIVE_COUNT_PARTS - 1:
                            stats = dict(
                                total_reads=int(
                                    lib.bronko_counter_total_reads(h)),
                                total_kmers=int(
                                    lib.bronko_counter_total_kmers(h)),
                                unique_kmers=int(lib.bronko_counter_unique(h)),
                                unique_counted_kmers=unique_counted,
                            )
                        yield kmers, counts.astype(np.int64), stats
                finally:
                    lib.bronko_counter_destroy(h)
        finally:
            # if _count_into raised for path i (or the consumer abandoned
            # the generator), path i+1's in-flight prefetch would otherwise
            # hold its native buffer until process exit — resolve and close
            # it before propagating
            if next_tf is not None:
                try:
                    next_tf.result().close()
                except Exception:  # noqa: BLE001 — prefetch itself failed
                    pass


def native_read_fastq_chunks(path: str, chunk_reads: int, max_len: int = 512):
    """Yield (codes, lengths, n_reads) like io.fastq.read_fastq_chunks but
    decoded by the C++ reader. Rows beyond n_reads stay padding (code 4)."""
    lib = get_lib()
    assert lib is not None
    h = lib.bronko_fastq_open(path.encode())
    if not h:
        raise OSError(f"cannot open {path}")
    try:
        while True:
            codes = np.empty((chunk_reads, max_len), np.uint8)
            lengths = np.zeros(chunk_reads, np.int32)
            n = lib.bronko_fastq_read_chunk(h, codes, lengths, chunk_reads, max_len)
            if n < 0:
                raise ValueError(f"malformed FASTQ: {path}")
            if n == 0:
                break
            yield codes, lengths, int(n)
            if n < chunk_reads:
                break
    finally:
        lib.bronko_fastq_close(h)


def native_noise_scan(freqs: np.ndarray, taus: np.ndarray) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    L = freqs.shape[0]
    out = np.zeros((L, 3), np.float64)
    lib.bronko_noise_scan(np.ascontiguousarray(freqs, np.float64), L,
                          np.ascontiguousarray(taus, np.float64), taus.shape[0], out)
    return out

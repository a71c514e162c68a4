"""Parallel gzip inflate (native/gz_parallel.cpp): byte-exactness against
Python's gzip on FASTQ-shaped and adversarial streams, plus fallback
behavior (stored blocks, multi-member, tiny, corrupt inputs).

The decoder is speculative (pugz-style): these tests force it on
(BRONKO_PARALLEL_GZ=1, size floor 0) and assert via the run counter that
the parallel path actually executed rather than silently falling back."""

from __future__ import annotations

import ctypes
import gzip
import os
import zlib

import numpy as np
import pytest

from bronko_tpu.io.native import get_lib, native_read_inflate

lib = get_lib()
pytestmark = pytest.mark.skipif(lib is None, reason="native lib unavailable")
if lib is not None:
    lib.bronko_gz_parallel_runs.restype = ctypes.c_int64


@pytest.fixture(autouse=True)
def _force_parallel(monkeypatch):
    monkeypatch.setenv("BRONKO_PARALLEL_GZ", "1")
    monkeypatch.setenv("BRONKO_PARALLEL_GZ_MIN", "0")


def _fastq_text(n_reads: int, seed: int = 0) -> bytes:
    """FASTQ-shaped text: reads drawn from one small genome (the real
    workload's redundancy profile — long matches, persistent marker
    propagation across speculation chunks) with constant quality."""
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, 30_000)
    bases = np.frombuffer(b"ACGT", np.uint8)
    recs = []
    for i in range(n_reads):
        p = int(rng.integers(0, len(genome) - 150))
        seq = bases[genome[p:p + 150]].tobytes().decode()
        recs.append(f"@read{i}\n{seq}\n+\n{'I' * 150}\n")
    return "".join(recs).encode()


def _inflate(path: str) -> tuple[bytes | None, int]:
    """(inflated bytes or None on failure, parallel-run delta)."""
    r0 = lib.bronko_gz_parallel_runs()
    buf = native_read_inflate(path)
    try:
        if buf.handle is None:
            return None, lib.bronko_gz_parallel_runs() - r0
        data = ctypes.string_at(lib.bronko_buffer_data(buf.handle), buf.size)
        return data, lib.bronko_gz_parallel_runs() - r0
    finally:
        buf.close()


@pytest.fixture(scope="module")
def fastq_text() -> bytes:
    return _fastq_text(120_000)  # ~36 MB text


@pytest.mark.parametrize("level", [1, 6, 9])
def test_parallel_path_byte_exact(tmp_path, fastq_text, level):
    path = str(tmp_path / f"l{level}.fastq.gz")
    with open(path, "wb") as f:
        f.write(gzip.compress(fastq_text, level))
    data, ran = _inflate(path)
    assert data == fastq_text
    assert ran == 1, "expected the parallel path to engage"


def test_incompressible_data(tmp_path):
    """Random bytes: mostly stored blocks -> no dynamic anchors -> serial
    fallback, still byte-exact."""
    raw = np.random.default_rng(1).integers(0, 256, 8 << 20,
                                            dtype=np.uint8).tobytes()
    path = str(tmp_path / "rand.bin.gz")
    with open(path, "wb") as f:
        f.write(gzip.compress(raw, 6))
    data, _ran = _inflate(path)
    assert data == raw  # fallback or not, bytes must match


def test_multi_member_falls_back(tmp_path, fastq_text):
    half = len(fastq_text) // 2
    path = str(tmp_path / "multi.fastq.gz")
    with open(path, "wb") as f:
        f.write(gzip.compress(fastq_text[:half], 1))
        f.write(gzip.compress(fastq_text[half:], 1))
    data, ran = _inflate(path)
    assert data == fastq_text
    assert ran == 0, "multi-member must take the serial path"


def test_tiny_file_falls_back(tmp_path):
    text = b"@r\nACGT\n+\nIIII\n"
    path = str(tmp_path / "tiny.fastq.gz")
    with open(path, "wb") as f:
        f.write(gzip.compress(text, 6))
    data, ran = _inflate(path)
    assert data == text
    assert ran == 0


def test_corrupt_stream_fails_cleanly(tmp_path, fastq_text):
    blob = bytearray(gzip.compress(fastq_text[: 8 << 20], 1))
    blob[len(blob) // 2] ^= 0xFF  # flip a payload byte
    path = str(tmp_path / "corrupt.fastq.gz")
    with open(path, "wb") as f:
        f.write(bytes(blob))
    data, _ran = _inflate(path)
    # both paths must reject it (the parallel path via decode error or CRC)
    assert data is None


def test_truncated_crc_rejected(tmp_path, fastq_text):
    """A wrong footer CRC must fail the parallel path's verification (and
    the serial one's)."""
    blob = bytearray(gzip.compress(fastq_text[: 8 << 20], 1))
    blob[-5] ^= 0x01  # corrupt the stored CRC32
    path = str(tmp_path / "badcrc.fastq.gz")
    with open(path, "wb") as f:
        f.write(bytes(blob))
    r0 = lib.bronko_gz_parallel_runs()
    buf = native_read_inflate(path)
    try:
        # libdeflate's serial one-shot reports the member corrupt; either
        # way the PARALLEL path must not have claimed success
        assert lib.bronko_gz_parallel_runs() - r0 == 0
    finally:
        buf.close()


def test_counter_end_to_end_with_parallel_inflate(tmp_path, fastq_text):
    """The k-mer counter over a parallel-inflated file equals the counter
    over the identical uncompressed file."""
    from bronko_tpu.io.native import native_count_fastq

    gz = str(tmp_path / "s.fastq.gz")
    with open(gz, "wb") as f:
        f.write(gzip.compress(fastq_text, 1))
    plain = str(tmp_path / "s.fastq")
    with open(plain, "wb") as f:
        f.write(fastq_text)
    r0 = lib.bronko_gz_parallel_runs()
    k1, c1, s1 = native_count_fastq(gz, 21, 3, 1_000_000, threads=4)
    assert lib.bronko_gz_parallel_runs() - r0 == 1
    k2, c2, s2 = native_count_fastq(plain, 21, 3, 1_000_000, threads=4)
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_array_equal(c1, c2)
    assert s1 == s2


def test_static_huffman_blocks(tmp_path):
    """Z_FIXED forces static-Huffman (btype=1) blocks. The fixed DISTANCE
    code is 32 five-bit codes (RFC 1951 3.2.6) — a 30-entry table is an
    incomplete code; building it wrong silently aborted every parallel
    attempt containing a static block. The stream still needs dynamic
    blocks for anchors, so interleave: chunk 0 decodes from the true
    start and must chew through the static-block prefix."""
    text = _fastq_text(100_000, seed=4)
    half = len(text) // 2
    co = zlib.compressobj(6, zlib.DEFLATED, 31, 8, zlib.Z_FIXED)
    part_fixed = co.compress(text[:half]) + co.flush()
    path = str(tmp_path / "fixed.fastq.gz")
    with open(path, "wb") as f:  # member 1: static blocks only
        f.write(part_fixed)
        f.write(gzip.compress(text[half:], 6))
    # multi-member -> serial path; proves serial-equality baseline
    data, _ = _inflate(path)
    assert data == text

    # single member, all static blocks: no dynamic anchors exist, so the
    # parallel path must cleanly fall back — byte-exact either way
    path2 = str(tmp_path / "fixed_only.fastq.gz")
    co = zlib.compressobj(6, zlib.DEFLATED, 31, 8, zlib.Z_FIXED)
    with open(path2, "wb") as f:
        f.write(co.compress(text) + co.flush())
    data2, _ = _inflate(path2)
    assert data2 == text


def test_static_blocks_on_parallel_path(tmp_path, fastq_text):
    """Regression for the 30-vs-32-entry fixed distance code: a crafted
    single-member gzip whose stream STARTS with static-Huffman blocks
    (Z_FIXED, sync-flushed, no BFINAL) and continues with a large dynamic
    region. Chunk boundaries land in the dynamic region (anchors exist),
    so the parallel path engages — and chunk 0 must decode the static
    prefix correctly or the whole attempt aborts/corrupts."""
    text = fastq_text
    prefix_len = 64 << 10  # small static prefix; boundaries stay dynamic
    co1 = zlib.compressobj(6, zlib.DEFLATED, -15, 8, zlib.Z_FIXED)
    d1 = co1.compress(text[:prefix_len]) + co1.flush(zlib.Z_SYNC_FLUSH)
    co2 = zlib.compressobj(6, zlib.DEFLATED, -15, 8)
    d2 = co2.compress(text[prefix_len:]) + co2.flush()
    # (co2's fresh window never references the prefix, so the concatenated
    # raw deflate stream is valid; decoders keep one continuous window)
    import struct

    blob = (b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03" + d1 + d2 +
            struct.pack("<II", zlib.crc32(text) & 0xFFFFFFFF,
                        len(text) & 0xFFFFFFFF))
    path = str(tmp_path / "mixed.fastq.gz")
    with open(path, "wb") as f:
        f.write(blob)
    with gzip.open(path, "rb") as f:
        assert f.read() == text  # the crafted stream itself is valid
    data, ran = _inflate(path)
    assert data == text
    assert ran == 1, "parallel path should engage on the dynamic region"


def test_auto_gate_by_core_count(tmp_path, fastq_text, monkeypatch):
    """Unset BRONKO_PARALLEL_GZ = auto mode: engage only at >= 8 hardware
    threads (serial libdeflate wins below that on measured hosts)."""
    monkeypatch.delenv("BRONKO_PARALLEL_GZ", raising=False)
    path = str(tmp_path / "auto.fastq.gz")
    with open(path, "wb") as f:
        f.write(gzip.compress(fastq_text, 1))
    data, ran = _inflate(path)
    assert data == fastq_text
    if (os.cpu_count() or 1) < 8:
        assert ran == 0, "auto mode must stay serial below 8 threads"


def test_zlib_stream_level0_stored(tmp_path):
    """compresslevel=0 emits stored blocks only: no anchors, serial path,
    byte-exact."""
    text = _fastq_text(30_000, seed=3)
    path = str(tmp_path / "l0.fastq.gz")
    with open(path, "wb") as f:
        f.write(gzip.compress(text, 0))
    data, ran = _inflate(path)
    assert data == text
    assert ran == 0


@pytest.fixture(scope="module")
def gate_gz(tmp_path_factory):
    """A >=4 MB compressed body (the 2 MB/chunk floor needs 2+ chunks):
    random ACGT compresses ~2.5x at level 1, so ~20 MB raw suffices."""
    rng = np.random.default_rng(5)
    raw = rng.choice(np.frombuffer(b"ACGT", np.uint8),
                     size=20 << 20).tobytes()
    path = str(tmp_path_factory.mktemp("gate") / "gate.fastq.gz")
    with open(path, "wb") as f:
        f.write(gzip.compress(raw, 1))
    assert os.path.getsize(path) > (4 << 20) + 1024
    return path, raw


def test_auto_gate_thread_capped(gate_gz, monkeypatch):
    """The shipped AUTO default (engage only at >= 8 hardware threads)
    driven on both sides via BRONKO_PARALLEL_GZ_THREADS (VERDICT r4
    item 7: the dev host has 4 cores, so the >=8 branch of the gate was
    never executed before this harness)."""
    path, raw = gate_gz
    monkeypatch.delenv("BRONKO_PARALLEL_GZ", raising=False)   # AUTO

    monkeypatch.setenv("BRONKO_PARALLEL_GZ_THREADS", "4")     # narrow host
    data, runs = _inflate(path)
    assert runs == 0 and data == raw    # gate closed; serial path correct

    monkeypatch.setenv("BRONKO_PARALLEL_GZ_THREADS", "8")     # wide host
    data, runs = _inflate(path)
    assert runs == 1 and data == raw    # gate open; parallel + CRC-clean

    monkeypatch.setenv("BRONKO_PARALLEL_GZ_THREADS", "7")
    data, runs = _inflate(path)
    assert runs == 0 and data == raw    # boundary: 7 < 8 stays closed

    monkeypatch.setenv("BRONKO_PARALLEL_GZ", "0")             # off beats hw
    monkeypatch.setenv("BRONKO_PARALLEL_GZ_THREADS", "16")
    data, runs = _inflate(path)
    assert runs == 0 and data == raw


def test_explicit_on_bypasses_thread_gate(gate_gz, monkeypatch):
    """BRONKO_PARALLEL_GZ=1 (the fixture default) engages the parallel
    path even on a narrow host — the explicit opt-in exists exactly for
    that, and CRC verification keeps it safe anywhere."""
    path, raw = gate_gz
    monkeypatch.setenv("BRONKO_PARALLEL_GZ_THREADS", "4")
    data, runs = _inflate(path)
    assert runs == 1 and data == raw

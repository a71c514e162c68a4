"""Reference-format (bincode) .bkdb writer: round-trips, varint boundary
widths, the u8 seq_id capacity guard, and the CLI --format plumbing."""

import numpy as np
import pytest

from bronko_tpu.index.bincode_compat import (
    load_reference_bkdb, save_reference_bkdb, sniff_format,
)
from bronko_tpu.index.build import build_index
from tests.make_synthetic import make_genome, write_fasta


def _assert_index_equal(a, b):
    assert a.k == b.k
    assert np.array_equal(a.keys, b.keys)
    assert np.array_equal(a.offsets, b.offsets)
    assert np.array_equal(a.post_loc, b.post_loc)
    assert np.array_equal(a.post_meta, b.post_meta)
    assert [f.name for f in a.files] == [f.name for f in b.files]
    for fa, fb in zip(a.files, b.files):
        for sa, sb in zip(fa.sequences, fb.sequences):
            assert (sa.name, sa.length, bytes(sa.seq)) == \
                   (sb.name, sb.length, bytes(sb.seq))


def test_roundtrip_synthetic(tmp_path):
    """Genomes > 250 bp cross the u16 varint discriminant for locations;
    bucket keys are large u64 (253 discriminant) — every width exercised."""
    rng = np.random.default_rng(9)
    paths = []
    for g in range(2):
        p = str(tmp_path / f"g{g}.fasta")
        write_fasta(p, f"s{g}", make_genome(rng, 400 + 100 * g))
        paths.append(p)
    idx = build_index(21, paths)
    out = str(tmp_path / "rt")
    save_reference_bkdb(idx, out)  # .bkdb appended
    idx2 = load_reference_bkdb(out + ".bkdb")
    _assert_index_equal(idx, idx2)


def test_varint_widths(tmp_path):
    """Unit-level: the writer's varint must be the reader's inverse at the
    discriminant boundaries."""
    from bronko_tpu.index.bincode_compat import _Reader, _Writer

    vals = [0, 1, 250, 251, 255, 256, 65535, 65536, (1 << 32) - 1,
            1 << 32, (1 << 64) - 1]
    w = _Writer()
    for v in vals:
        w.varint(v)
    r = _Reader(b"".join(w.parts))
    assert [r.varint() for _ in vals] == vals


def test_seq_id_capacity_guard(tmp_path):
    """>256 sequences in one file exceeds the reference's u8 seq_id; the
    writer must refuse rather than truncate."""
    rng = np.random.default_rng(3)
    p = str(tmp_path / "many.fasta")
    with open(p, "w") as fh:
        for i in range(260):
            fh.write(f">c{i}\n{make_genome(rng, 40).decode()}\n")
    idx = build_index(21, [p])
    with pytest.raises(ValueError, match="u8"):
        save_reference_bkdb(idx, str(tmp_path / "no"))


def test_cli_build_bincode_then_call(tmp_path):
    """`build --format bincode` emits a bincode .bkdb that `call -d` (and
    the reference binary) can consume."""
    from bronko_tpu.call.engine import run_call
    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.layout import build_device_index
    from bronko_tpu.index.store import load_index
    from tests.make_synthetic import make_sample, write_fastq

    rng = np.random.default_rng(21)
    genome = make_genome(rng, 600)
    ref = str(tmp_path / "r.fasta")
    write_fasta(ref, "r1", genome)

    from bronko_tpu.cli import build_parser, run_build
    from bronko_tpu.config import BuildConfig

    args = build_parser().parse_args(
        ["build", "-g", ref, "-o", str(tmp_path / "db"),
         "--format", "bincode"])
    run_build(BuildConfig(genomes=args.genomes, kmer=args.kmer,
                          output=args.output, bkdb_format=args.bkdb_format))
    db = str(tmp_path / "db.bkdb")
    assert sniff_format(db) == "bincode"

    reads, _ = make_sample(genome, rng, read_len=100, depth=200,
                           major_positions={300: 0.9})
    fq = str(tmp_path / "s.fastq.gz")
    write_fastq(fq, reads)
    out = str(tmp_path / "out")
    idx = load_index(db, expect_k=21)
    summaries = run_call(CallConfig(db=db, reads=[fq], output=out,
                                    batch_size=4096, chunk_reads=8192),
                         idx, build_device_index(idx))
    assert summaries and summaries[0].n_perfect > 0


def test_truncated_or_garbage_bincode_rejected(tmp_path):
    """A reference-format .bkdb truncated mid-payload, or with trailing
    bytes appended, must fail loudly — a short sequence blob would load
    'successfully' and shift every downstream coordinate."""
    rng = np.random.default_rng(5)
    p = str(tmp_path / "g.fasta")
    write_fasta(p, "s", make_genome(rng, 300))
    idx = build_index(21, [p])
    out = str(tmp_path / "db")
    save_reference_bkdb(idx, out)
    blob = open(out + ".bkdb", "rb").read()

    cut = str(tmp_path / "cut.bkdb")
    with open(cut, "wb") as fh:
        fh.write(blob[:-10])  # inside the final sequence payload / k field
    with pytest.raises(ValueError):
        load_reference_bkdb(cut)

    junk = str(tmp_path / "junk.bkdb")
    with open(junk, "wb") as fh:
        fh.write(blob + b"\x00\x01\x02")
    with pytest.raises(ValueError, match="trailing"):
        load_reference_bkdb(junk)

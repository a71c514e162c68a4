"""Config validation matrix and naming-utility semantics."""

import gzip

import numpy as np
import pytest

from bronko_tpu.config import BuildConfig, CallConfig
from bronko_tpu.io.naming import check_fasta, check_fastq, clean_sample_id, file_stem


def _call(**kw):
    kw.setdefault("db", "x.bkdb")
    kw.setdefault("reads", ["r.fastq"])
    return CallConfig(**kw)


@pytest.mark.parametrize("kw", [
    dict(kmer=20), dict(kmer=13), dict(kmer=33),
    dict(min_af=1.5),
    dict(n_per_strand=21),
    dict(strand_balance_ratio=-0.1), dict(strand_balance_ratio=1.5),
    dict(variant_multiplier=0.5),
    dict(first_pairs=["a.fq"], second_pairs=[]),
    dict(counter="bogus"),
    dict(mesh="4"), dict(mesh="ax2"), dict(mesh="0x2"),
    dict(reads=["nope.txt"]),
    dict(db=None, genomes=None, reads=["r.fastq"]),
    dict(genomes=["g.fasta"]),  # both db and genomes
    dict(threads=0),
    dict(threads=100_000),  # more than available (call.rs:80-83)
])
def test_call_validate_fatal(kw):
    with pytest.raises(SystemExit):
        _call(**kw).validate()


@pytest.mark.parametrize("kw", [
    dict(),  # defaults
    dict(min_af=0.005),          # warn only
    dict(min_af=0.6),            # warn only
    dict(n_per_strand=0),        # warn only
    dict(variant_multiplier=2.5),
    dict(variant_multiplier=1.0),  # warn only (call.rs:127-128)
    dict(min_variant_depth=-1),    # warn only (call.rs:114-116)
    dict(min_depth=-1),            # warn only (call.rs:118-120)
    dict(mesh="4x2"),
])
def test_call_validate_ok(kw):
    _call(**kw).validate()


def test_build_threads_vs_available():
    with pytest.raises(SystemExit):
        BuildConfig(genomes=["x.fasta"], threads=100_000).validate()


@pytest.mark.parametrize("kw,needle", [
    (dict(min_variant_depth=-1), "Minimum variant depth set below 0"),
    (dict(min_depth=-1), "Minimum total depth for minor variant calling set below 0"),
    (dict(variant_multiplier=1.0), "set to 1.0, all variants will pass"),
])
def test_call_validate_warn_text(kw, needle, caplog):
    import logging

    with caplog.at_level(logging.WARNING, logger="bronko"):
        _call(**kw).validate()
    assert any(needle in r.message for r in caplog.records)


def test_build_validate():
    with pytest.raises(SystemExit):
        BuildConfig(genomes=["x.txt"]).validate()
    with pytest.raises(SystemExit):
        BuildConfig(genomes=["x.fasta"], kmer=14).validate()
    BuildConfig(genomes=["x.fasta"]).validate()


def test_naming_semantics():
    # util.rs:36 suffix list, longest-first, strip repeatedly
    assert clean_sample_id("/a/b/sample.fastq.gz") == "sample"
    assert clean_sample_id("rep1_R1.fq.gz") == "rep1_R1"
    assert clean_sample_id("x.fq.fq") == "x"          # trim_end_matches repeats
    assert clean_sample_id("weird.bam") == "weird"    # fallback: final ext
    assert clean_sample_id("reads.fnq.gz") == "reads."  # 'fnq.gz' has no dot
    # Rust Path::file_stem: only the last extension
    assert file_stem("genome1.fasta") == "genome1"
    assert file_stem("genome1.fasta.gz") == "genome1.fasta"
    assert check_fastq("a.fastq.gz") and not check_fastq("a.fasta")
    assert check_fasta("a.fna") and not check_fasta("a.fnq")


def test_long_read_python_fallback(tmp_path):
    """Reads longer than the native reader's row width fall back to the
    Python parser — results must match short-read handling semantics."""
    from bronko_tpu.call.engine import count_sample
    from bronko_tpu.io.native import get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(8)
    long_read = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=700))
    fq = str(tmp_path / "long.fastq.gz")
    with gzip.open(fq, "wt") as fh:
        for i in range(30):
            fh.write(f"@r{i}\n{long_read.decode()}\n+\n{'I' * len(long_read)}\n")
    cfg = CallConfig(db="x.bkdb", reads=[fq], chunk_reads=64, counter="device")
    kmers, counts, stats = count_sample(fq, cfg, 21)
    assert stats.total_reads == 30
    assert stats.total_kmers == 30 * (700 - 20)
    assert np.all(counts == 30)

    # host counter must agree
    cfg2 = CallConfig(db="x.bkdb", reads=[fq], counter="host")
    k2, c2, s2 = count_sample(fq, cfg2, 21)
    assert np.array_equal(kmers, k2) and np.array_equal(counts, c2)
    assert s2.total_kmers == stats.total_kmers


def test_repeated_multi_value_flags_append():
    """Repeated -r/-g/-1/-2 occurrences must APPEND (clap num_args=1..
    semantics, cli.rs:73-80) — argparse's default nargs='+' handling
    silently kept only the last occurrence."""
    from bronko_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args(["call", "-d", "x.bkdb", "-r", "a.fq", "-r", "b.fq",
                      "c.fq", "-o", "out"])
    assert a.reads == ["a.fq", "b.fq", "c.fq"]
    a = p.parse_args(["call", "-d", "x.bkdb", "-1", "a1.fq", "-1", "b1.fq",
                      "-2", "a2.fq", "-2", "b2.fq", "-o", "out"])
    assert a.first_pairs == ["a1.fq", "b1.fq"]
    assert a.second_pairs == ["a2.fq", "b2.fq"]
    a = p.parse_args(["build", "-g", "g1.fa", "-g", "g2.fa", "-o", "db"])
    assert a.genomes == ["g1.fa", "g2.fa"]
    # the default list must not accumulate across parses
    a = p.parse_args(["call", "-d", "x.bkdb", "-o", "out"])
    assert a.reads == [] and a.genomes is None


def test_build_requires_genomes():
    """Bare `build` must fail like the reference's arg_required_else_help
    (cli.rs:30), not write an empty index with exit 0."""
    with pytest.raises(SystemExit):
        BuildConfig(genomes=[]).validate()


def test_mesh_device_build_conflict():
    """--device-build on is silently unusable under --mesh; reject the
    contradiction instead of ignoring the explicit flag."""
    with pytest.raises(SystemExit):
        _call(mesh="2x1", device_build="on").validate()

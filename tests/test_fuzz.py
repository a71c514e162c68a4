"""Property-based fuzzing (roadmap: hypothesis-style random inputs vs oracle).

Two layers:
  * bucket-hash properties — the defining contract of assign_buckets
    (lcb.rs:1-45): bucket i is a collision-free hash of (wildcard position
    i, the k-1 bases excluding i). Checked on random k-mer pairs across the
    full odd-k domain [15, 31], plus closed-form vs scalar-transcription
    agreement (two independent implementations of the same recurrences).
  * mapper fuzz — random panels/genomes/k-mer mixes through the production
    device mapper must equal the scalar oracle transcription of
    map_kmers (call.rs:1257-1434) integer-exactly, across k, n_fixed and
    use_full_kmer.

Hypothesis drives structure + a seed; data synthesis stays NumPy-seeded so
examples shrink on structure. derandomize keeps CI stable.
"""

from __future__ import annotations

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from bronko_tpu.ops.buckets import assign_buckets
from tests.oracle.lcb_oracle import assign_buckets as oracle_buckets

ODD_K = list(range(15, 32, 2))


def _rand_kmer(rng, k: int) -> int:
    return int(rng.integers(0, 1 << (2 * k), dtype=np.uint64))


def _mutate(km: int, k: int, pos: int, rng) -> int:
    shift = 2 * (k - 1 - pos)
    old = (km >> shift) & 3
    new = (old + 1 + int(rng.integers(3))) % 4
    return (km & ~(3 << shift)) | (new << shift)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(k=st.sampled_from(ODD_K), seed=st.integers(0, 2**32 - 1))
def test_closed_form_equals_scalar_transcription(k, seed):
    """The vectorized closed forms and the scalar loop transcription are
    independent derivations of lcb.rs:1-45 — they must agree everywhere,
    including the u64 wrap-around regime at k=31."""
    rng = np.random.default_rng(seed)
    kms = np.array([_rand_kmer(rng, k) for _ in range(32)], np.uint64)
    vec = assign_buckets(kms, k)
    for i, km in enumerate(kms.tolist()):
        assert vec[i].tolist() == oracle_buckets(int(km), k)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(
    k=st.sampled_from([15, 17, 21, 25, 29]),  # below the k=31 wrap regime
    pos=st.integers(0, 30),
    seed=st.integers(0, 2**32 - 1),
)
def test_single_substitution_shares_exactly_one_bucket(k, pos, seed):
    """Pairs differing at exactly position p share bucket p and no other:
    the property that makes the index an aligner (SURVEY.md: a 1-sub read
    k-mer hits exactly one bucket, which names the variant offset)."""
    pos = pos % k
    rng = np.random.default_rng(seed)
    a = _rand_kmer(rng, k)
    b = _mutate(a, k, pos, rng)
    ba = assign_buckets(np.uint64(a), k)
    bb = assign_buckets(np.uint64(b), k)
    same = (ba == bb)
    assert bool(same[pos])
    assert int(same.sum()) == 1, (hex(a), hex(b), pos, np.nonzero(same))


@settings(max_examples=120, deadline=None, derandomize=True)
@given(k=st.sampled_from([15, 17, 21, 25, 29]), seed=st.integers(0, 2**32 - 1))
def test_multi_substitution_shares_no_bucket(k, seed):
    """Pairs differing at >=2 positions collide in no bucket."""
    rng = np.random.default_rng(seed)
    a = _rand_kmer(rng, k)
    n_mut = 2 + int(rng.integers(0, k - 1))
    positions = rng.choice(k, size=min(n_mut, k), replace=False)
    b = a
    for p in positions:
        b = _mutate(b, k, int(p), rng)
    if a == b:  # pragma: no cover — mutations never restore the base
        return
    ba = assign_buckets(np.uint64(a), k)
    bb = assign_buckets(np.uint64(b), k)
    assert not np.any(ba == bb)


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n_files=st.integers(1, 3),
    seqs_per_file=st.integers(1, 2),
    k=st.sampled_from([15, 21]),
    n_fixed=st.sampled_from([0, 2, 4]),
    use_full_kmer=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_mapper_fuzz_vs_oracle(tmp_path_factory, n_files, seqs_per_file, k,
                               n_fixed, use_full_kmer, seed):
    """Random panels x random read-kmer mixes: device tallies AND pileups
    must equal the scalar oracle integer-exactly."""
    from bronko_tpu.ops.map import (
        PLANE_CNT_FWD, PLANE_CNT_REV, PLANE_DEPTH_FWD, PLANE_DEPTH_REV,
    )
    from tests.oracle.map_oracle import build_oracle_index, map_kmers_oracle
    from tests.test_map import make_index, run_device_map, sample_kmers

    rng = np.random.default_rng(seed)
    files = []
    for f in range(n_files):
        seqs = [
            (f"s{f}_{s}",
             bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                              size=int(rng.integers(k + 4, 160)))))
            for s in range(seqs_per_file)
        ]
        files.append((f"g{f}", seqs))

    tmp_path = tmp_path_factory.mktemp("fuzz")
    index = make_index(tmp_path, files, k)
    kmer_counts = sample_kmers(rng, files, k, n_exact=60, n_mut=40, n_junk=10)

    o_maps, o_tallies = map_kmers_oracle(
        kmer_counts, build_oracle_index(k, files),
        n_fixed=n_fixed, use_full_kmer=use_full_kmer)
    dev, pileup, tallies = run_device_map(
        index, kmer_counts, n_fixed=n_fixed, use_full_kmer=use_full_kmer)

    for fid in range(n_files):
        assert tallies[fid].tolist() == o_tallies.get(fid, [0, 0, 0])
    for sl in dev.seq_slices:
        sname = files[sl.file_id][1][sl.seq_id][0]
        om = o_maps[sl.file_id][sname]
        r = slice(sl.offset, sl.offset + sl.length)
        assert np.array_equal(pileup[PLANE_DEPTH_FWD, r], om["fwd"])
        assert np.array_equal(pileup[PLANE_DEPTH_REV, r], om["rev"])
        assert np.array_equal(pileup[PLANE_CNT_FWD, r], om["fwd_cnt"])
        assert np.array_equal(pileup[PLANE_CNT_REV, r], om["rev_cnt"])


@pytest.mark.parametrize("seed", [4242, 137, 90210])
def test_caller_fuzz_f64_exact_vs_oracle(seed):
    """Random pileups (zero-depth runs, spikes, varied filter knobs) through
    the vectorized caller vs the scalar oracle — every field f64-exact."""
    from bronko_tpu.call.noise import baseline_noise
    from bronko_tpu.call.variants import CallStats, call_variants_for_seq
    from tests.oracle.variants_oracle import call_variants_oracle

    rng = np.random.default_rng(seed)
    for _ in range(4):
        L = int(rng.integers(80, 600))
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=L))
        scale = int(rng.choice([5, 60, 700]))
        fwd = rng.integers(0, scale, size=(L, 4)).astype(np.int64)
        rev = rng.integers(0, scale, size=(L, 4)).astype(np.int64)
        fc = rng.integers(0, 8, size=(L, 4)).astype(np.int64)
        rc = rng.integers(0, 8, size=(L, 4)).astype(np.int64)
        fwd[:: int(rng.integers(5, 30))] = 0
        rev[:: int(rng.integers(5, 30))] = 0
        fwd[:: int(rng.integers(11, 40)), rng.integers(4)] += scale * 50
        kwargs = dict(
            k=21, min_af=float(rng.choice([0.01, 0.03, 0.2])),
            filter_end_seq=bool(rng.integers(2)),
            strand_filter=bool(rng.integers(2)),
            no_strand_balance_filter=bool(rng.integers(2)),
            strand_balance_ratio=0.1, strand_odds_max=6.0,
            n_per_strand=2, min_depth=int(rng.choice([50, 300])),
            min_variant_depth=3, variant_multiplier=1.5,
        )
        noise = baseline_noise(fwd, rev)[:, 0]
        s1 = CallStats()
        recs = call_variants_for_seq("s", seq, fwd, rev, fc, rc, noise,
                                     stats=s1, **kwargs)
        o_recs, o_major, o_minor, o_cov, o_total, _ = call_variants_oracle(
            "s", seq, fwd, rev, fc, rc, **kwargs)
        assert (s1.num_major, s1.num_minor) == (o_major, o_minor)
        assert (s1.positions_covered, s1.total_coverage) == (o_cov, o_total)
        assert len(recs) == len(o_recs)
        for r, o in zip(recs, o_recs):
            assert (r.pos, r.ref_base, r.alt_base, r.depth) == (
                o["pos"], o["ref_base"], o["alt_base"], o["depth"])
            assert r.af == o["af"] and r.sor == o["sor"]

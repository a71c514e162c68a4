"""Golden-file regression: the full pipeline's VCF + overview on a fixed
synthetic sample must stay byte-stable across refactors.

Regenerate deliberately with:
  python tests/test_golden.py --regen
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _produce(tmp_dir: str):
    from bronko_tpu.call.engine import run_call
    from bronko_tpu.config import CallConfig
    from bronko_tpu.index.build import build_index
    from bronko_tpu.index.layout import build_device_index
    from tests.make_synthetic import make_genome, make_sample, write_fasta, write_fastq

    rng = np.random.default_rng(20260817)
    genome = make_genome(rng, 1500)
    reads, _ = make_sample(
        genome, rng, read_len=90, depth=650,
        major_positions={400: 0.93, 1100: 0.75},
        minor_positions={700: 0.15},
        error_rate=0.004,
    )
    ref = os.path.join(tmp_dir, "gref.fasta")
    fq = os.path.join(tmp_dir, "gsample.fastq.gz")
    write_fasta(ref, "golden_ref", genome)
    write_fastq(fq, reads)
    out = os.path.join(tmp_dir, "out")
    cfg = CallConfig(genomes=[ref], reads=[fq], output=out,
                     batch_size=1 << 14, chunk_reads=1 << 13)
    index = build_index(cfg.kmer, [ref])
    run_call(cfg, index, build_device_index(index))
    vcf = open(os.path.join(out, "gsample.vcf")).read()
    # strip version/path-bearing header lines so env differences don't churn
    vcf = "\n".join(
        l for l in vcf.splitlines()
        if not l.startswith(("##source", "##reference"))
    ) + "\n"
    overview = open(os.path.join(out, "bronko_overview.tsv")).read()
    # normalize the absolute sample path in the overview
    overview = overview.replace(fq, "SAMPLE")
    return vcf, overview


def test_golden_outputs(tmp_path):
    vcf, overview = _produce(str(tmp_path))
    g_vcf = open(os.path.join(GOLDEN_DIR, "gsample.vcf")).read()
    g_ov = open(os.path.join(GOLDEN_DIR, "overview.tsv")).read()
    assert vcf == g_vcf
    assert overview == g_ov


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import tempfile

        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with tempfile.TemporaryDirectory() as td:
            vcf, overview = _produce(td)
        open(os.path.join(GOLDEN_DIR, "gsample.vcf"), "w").write(vcf)
        open(os.path.join(GOLDEN_DIR, "overview.tsv"), "w").write(overview)
        print("golden files regenerated:")
        print(vcf)
        print(overview)

"""Single-sample latency A/B: streamed (partitioned count->tally overlap)
vs classic (count, then one fused dispatch), interleaved in rounds of
fresh subprocesses so relay drift hits both arms equally (same discipline
as tools/ab_tpu.py, but timing run_call on ONE sample).

Usage: python tools/ab_single_tpu.py [--rounds N]
Needs the TPU; run alone.
"""
from __future__ import annotations

import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, time
sys.path.insert(0, "@@REPO@@")
import bench
genome_paths, fastqs = bench._ensure_data()
from bronko_tpu.call.engine import run_call
from bronko_tpu.config import CallConfig
from bronko_tpu.index.build import build_index
from bronko_tpu.index.layout import build_device_index

cfg = CallConfig(db="bench", reads=[fastqs[0]],
                 output=os.path.join(bench.CACHE, "out_ab_single"))
os.makedirs(cfg.output, exist_ok=True)
index = build_index(cfg.kmer, genome_paths)
dev = build_device_index(index)
run_call(cfg, index, dev)  # warm/compile
best = float("inf")
for _ in range(3):
    t0 = time.time()
    run_call(cfg, index, dev)
    best = min(best, time.time() - t0)
print(f"BEST {best:.3f}", flush=True)
"""


def run_arm(env_extra: dict) -> float:
    env = dict(os.environ)
    env.update(env_extra)
    child = _CHILD.replace("@@REPO@@", REPO)
    out = subprocess.run([sys.executable, "-u", "-c", child], env=env,
                         capture_output=True, text=True, timeout=2400)
    for line in out.stdout.splitlines():
        if line.startswith("BEST "):
            return float(line.split()[1])
    print(out.stdout[-500:], out.stderr[-500:], file=sys.stderr)
    raise RuntimeError("arm produced no BEST line")


def main() -> None:
    rounds = 3
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    arms = {"classic": {"BRONKO_STREAM": "0"},
            "streamed": {"BRONKO_STREAM": "1"}}
    results: dict[str, list[float]] = {a: [] for a in arms}
    for r in range(rounds):
        for name, env in arms.items():
            t = run_arm(env)
            results[name].append(t)
            print(f"round {r} {name:9s} {t:.3f}s", flush=True)
    for name, ts in results.items():
        print(f"{name:9s} best={min(ts):.3f} median={statistics.median(ts):.3f}")


if __name__ == "__main__":
    main()

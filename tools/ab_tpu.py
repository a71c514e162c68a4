"""Internal perf tool: disciplined A/B of engine configurations on the TPU.

Relay-attached TPU wall times drift ±30% over tens of minutes, which
poisons within-process A/Bs (an arm measured later inherits a different
relay regime). This runner interleaves the arms in ROUNDS of fresh
subprocesses — A B A B ... — so drift hits both arms equally, and reports
per-arm best + median of the 3-sample batch wall time.

Usage:
  python tools/ab_tpu.py NAME=VAL[,NAME=VAL...] [NAME=VAL...] [--rounds N]

Each positional argument is one arm: a comma-separated env assignment list
('-' = baseline, no env). Example:

  python tools/ab_tpu.py - BRONKO_COUNT_WORKERS=2 --rounds 3

Needs the TPU; run alone.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, "@@REPO@@")
import bench
genome_paths, fastqs = bench._ensure_data()
from bronko_tpu.call.engine import run_call
from bronko_tpu.config import CallConfig
from bronko_tpu.index.build import build_index
from bronko_tpu.index.layout import build_device_index
# BRONKO_AB_COPIES repeats the 3 distinct samples N times (file copies,
# same shapes) so steady-state arms aren't dominated by pipeline
# fill/drain; default 1 keeps the historical 3-sample discipline
import shutil
copies = int(os.environ.get("BRONKO_AB_COPIES", "1"))
cohort = []
for c in range(copies):
    for s, fq in enumerate(fastqs):
        if c == 0:
            cohort.append(fq)
            continue
        p = os.path.join(bench.CACHE, f"ab_{c}_{s}.fastq.gz")
        if not os.path.exists(p):
            shutil.copy(fq, p)
        cohort.append(p)
cfg = CallConfig(db="bench", reads=cohort, output="/tmp/ab_tpu_out")
os.makedirs(cfg.output, exist_ok=True)
index = build_index(cfg.kmer, genome_paths)
dev = build_device_index(index)
ts = []
for i in range(3):  # lap 0 warms the jit cache
    t0 = time.time()
    run_call(cfg, index, dev)
    ts.append(round(time.time() - t0, 3))
print(json.dumps({"laps": ts, "best": min(ts[1:])}))
"""


def run_arm(env_spec: str, timeout: int) -> float | None:
    env = dict(os.environ)
    if env_spec != "-":
        for kv in env_spec.split(","):
            k, _, v = kv.partition("=")
            env[k.strip()] = v.strip()
    r = subprocess.run(
        [sys.executable, "-c", _CHILD_SNIPPET.replace("@@REPO@@", REPO)],
        capture_output=True, text=True, timeout=timeout, env=env)
    if r.returncode != 0:
        print(f"# arm {env_spec!r} failed:\n{r.stderr[-1500:]}", file=sys.stderr)
        return None
    try:
        return float(json.loads(r.stdout.strip().splitlines()[-1])["best"])
    except Exception:  # noqa: BLE001
        print(f"# arm {env_spec!r} emitted no JSON:\n{r.stdout[-400:]}",
              file=sys.stderr)
        return None


def main() -> None:
    args = [a for a in sys.argv[1:]]
    rounds = 3
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        del args[i:i + 2]
    arms = args or ["-"]
    results: dict[str, list[float]] = {a: [] for a in arms}
    for rnd in range(rounds):
        for arm in arms:  # interleaved: drift hits every arm each round
            best = run_arm(arm, timeout=1800)
            if best is not None:
                results[arm].append(best)
            print(json.dumps({"round": rnd, "arm": arm, "best_s": best}),
                  flush=True)
    for arm, vals in results.items():
        if vals:
            print(json.dumps({
                "arm": arm, "n": len(vals),
                "best_s": min(vals),
                "median_s": round(statistics.median(vals), 3),
            }), flush=True)


if __name__ == "__main__":
    main()

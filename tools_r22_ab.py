"""Cold-session interleaved A/B harness for round 22 (methodology per
OPTIMIZATION_r22.md: fresh JVM per sample, same warmup + noop sink as
bench.py, median of N reps per sample, interleaved A/B/A/B..., judged on
median-of-medians AND min-of-all-samples — min is the robust statistic on
this steal-ridden host).

Usage:
  python tools_r22_ab.py --queries q_minhash_lsh_pairs --rounds 6 \
      --a "" --b "TIH_MINHASH_FANOUT=0"

Each --a/--b value is a space-separated list of KEY=VALUE env overrides for
that variant (empty string = current code as-is). Results appended to
/tmp/r22_ab_results.jsonl and summarized on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

RUNNER = r"""
import json, os, statistics, sys, time
from thisishappening_spark.queries import REGISTRY
from thisishappening_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
names = sys.argv[1].split(",")
n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
spark = get_spark(app_name="tih-ab")
spark.sparkContext.setLogLevel("ERROR")
REGISTRY["q01_pricing_summary"].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
out = {}
for name in names:
    samples = []
    for _ in range(n_runs):
        start = time.perf_counter()
        df = REGISTRY[name].fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - start)
    out[name] = {"median": round(statistics.median(samples), 4),
                 "min": round(min(samples), 4), "all": [round(s, 4) for s in samples]}
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def run_sample(queries: str, env_overrides: dict[str, str]) -> dict:
    env = dict(os.environ)
    env.update(env_overrides)
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, queries],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"sample failed: rc={p.returncode}\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def parse_env(s: str) -> dict[str, str]:
    return dict(kv.split("=", 1) for kv in s.split()) if s.strip() else {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--a", default="")
    ap.add_argument("--b", default="")
    ap.add_argument("--tag", default="ab")
    args = ap.parse_args()
    env_a, env_b = parse_env(args.a), parse_env(args.b)

    results: dict[str, dict[str, list]] = {}
    for rnd in range(args.rounds):
        for side, env in (("A", env_a), ("B", env_b)):
            res = run_sample(args.queries, env)
            for q, stats in res.items():
                results.setdefault(q, {}).setdefault(side, []).append(stats)
            line = {"tag": args.tag, "round": rnd, "side": side, "env": env, "res": res}
            with open("/tmp/r22_ab_results.jsonl", "a") as f:
                f.write(json.dumps(line) + "\n")
            print(f"round {rnd} side {side}: " + " ".join(
                f"{q}={stats['median']:.3f}(min {stats['min']:.3f})"
                for q, stats in res.items()), flush=True)

    print("\n=== SUMMARY ===")
    for q, sides in results.items():
        for side in ("A", "B"):
            meds = [s["median"] for s in sides[side]]
            mins = [s["min"] for s in sides[side]]
            print(f"{q} {side}: median-of-medians={statistics.median(meds):.4f} "
                  f"min-of-all={min(mins):.4f}  medians={[round(m,3) for m in meds]}")


if __name__ == "__main__":
    main()

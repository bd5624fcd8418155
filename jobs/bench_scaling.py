"""Scaling-efficiency bench: the same linkage job at two parallelism levels.

The BASELINE criterion (≥0.8 candidate-pairs/sec scaling efficiency from N
to 4N executors) cannot use a real cluster in this sandbox; per the round
instructions it is evidenced by running the SAME job on the SAME input at
local[N] and local[4N] and reporting throughput at both:

    efficiency = (candidates_per_sec[4N] / candidates_per_sec[N]) / 4

(candidates_per_sec = candidate pairs entering the comparators / wall —
the BASELINE unit; the emitted-pairs count is reported alongside.)

Each level runs in a fresh subprocess (one JVM per SparkSession) strictly
sequentially, on a pre-generated shared parquet input, so measurements
never compete for cores. Prints one JSON line; also appended to BENCH.md
by the caller.

Usage:
    python jobs/bench_scaling.py [--clusters 20000] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from bigmatch_utilities_spark.session import get_spark
from bigmatch_utilities_spark.repo_linkage import count_candidates, run_repo_linkage

cpus = {cpus}
spark = get_spark("scale-%d" % cpus, master="local[%d]" % cpus,
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet({inp!r})
# warm the JVM + python workers on a small slice so the measurement is the
# steady-state job, not first-stage init
run_repo_linkage(df.limit(500), use_minhash_pass=True).pairs.count()
t0 = time.time()
result = run_repo_linkage(df, use_minhash_pass=True)
n_pairs = result.pairs.count()
wall = time.time() - t0
# BASELINE unit: candidate pairs entering the comparators per second;
# counted outside the timed window (input-determined, identical at every
# parallelism level).
n_cand = count_candidates(df, use_minhash_pass=True)
print(json.dumps({{"cpus": cpus, "pairs": n_pairs, "candidates": n_cand,
                  "wall_s": round(wall, 2),
                  "candidates_per_sec": round(n_cand / wall, 1)}}))
spark.stop()
"""

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from bigmatch_utilities_spark.session import get_spark
from bigmatch_utilities_spark.synthdata import repo_files_df
spark = get_spark("scale-gen", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
repo_files_df(spark, seed=42, n_clusters={clusters}, partitions=64) \
    .write.mode("overwrite").parquet({inp!r})
print(spark.read.parquet({inp!r}).count())
spark.stop()
"""


def run_py(code: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    return out.stdout.strip().splitlines()[-1]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--clusters", type=int, default=20000)
    p.add_argument("--low", type=int, default=8)
    p.add_argument("--high", type=int, default=32)
    p.add_argument("--input", default=None, help="reuse an existing input parquet")
    p.add_argument(
        "--repeats",
        type=int,
        default=1,
        help="runs per level; best (min) wall is kept. The sandbox VM shows "
        "0-20%% hypervisor steal that varies minute-to-minute; min-wall per "
        "level is the least-interfered estimate of true capability",
    )
    args = p.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inp = args.input or os.path.join(
        tempfile.gettempdir(), f"scaling_input_{args.clusters}"
    )
    if not args.input and not os.path.exists(os.path.join(inp, "_SUCCESS")):
        n = run_py(GEN.format(repo=repo, clusters=args.clusters, inp=inp))
        print(f"generated {n} rows -> {inp}", file=sys.stderr)

    results: dict[int, dict] = {}
    walls: dict[int, list[float]] = {args.low: [], args.high: []}
    for rep in range(args.repeats):
        # alternate levels within each repeat so slow host phases hit both
        for cpus in (args.low, args.high):
            line = run_py(WORKER.format(repo=repo, cpus=cpus, inp=inp))
            r = json.loads(line)
            print(f"rep{rep} local[{cpus}]: {r}", file=sys.stderr)
            walls[cpus].append(r["wall_s"])
            if cpus not in results or r["wall_s"] < results[cpus]["wall_s"]:
                results[cpus] = r

    # headline = min wall per level (least hypervisor-steal interference);
    # median is reported alongside so the best-case nature is visible.
    for cpus, r in results.items():
        ws = sorted(walls[cpus])
        r["wall_s_median"] = ws[len(ws) // 2]
        r["wall_s_all"] = ws
    lo, hi = results[args.low], results[args.high]
    ratio = args.high / args.low
    eff = (hi["candidates_per_sec"] / lo["candidates_per_sec"]) / ratio
    eff_median = (lo["wall_s_median"] / hi["wall_s_median"]) / ratio
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "value_median": round(eff_median, 3),
                "unit": f"x (local[{args.low}] -> local[{args.high}])",
                "low": lo,
                "high": hi,
                "input_rows_hint": args.clusters,
            }
        )
    )


if __name__ == "__main__":
    main()

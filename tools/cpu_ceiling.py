"""Same-day hardware-ceiling probe for scaling measurements.

The sandbox VM's hypervisor steal fluctuates hour-to-hour; on bad days the
box cannot scale even embarrassingly parallel pure-CPU work 4->16 at the
efficiency the BASELINE criterion asks of the Spark job. This probe spins
N independent CPU-bound processes (no Spark, no IPC, no memory pressure)
and reports aggregate throughput + the 4->16 scaling ratio — the ceiling
any job measurement that day should be normalized against.

Usage:
    python tools/cpu_ceiling.py                    # 4->16 (default)
    python tools/cpu_ceiling.py --low 8 --high 32  # match the job's levels
Protocol: run this BEFORE a scaling measurement; only trust (or attempt)
the expensive Spark scaling run when the ceiling itself is ~1.0 — and
probe at the SAME two parallelism levels the job will use (the 8->32 leg
crosses the box's ~16 physical cores into SMT, where the burner ceiling
itself drops; a job can never beat the burner).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _burn(q, seconds: float) -> None:
    t_end = time.time() + seconds
    n = 0
    x = 1.0001
    while time.time() < t_end:
        for _ in range(10000):
            x = x * 1.0000001 % 1e6
        n += 1
    q.put(n)


def measure(procs: int, seconds: float = 5.0) -> int:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_burn, args=(q, seconds)) for _ in range(procs)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in ps)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--low", type=int, default=4)
    p.add_argument("--high", type=int, default=16)
    args = p.parse_args()
    out = {str(n): measure(n) for n in (args.low, args.high)}
    eff = (out[str(args.high)] / out[str(args.low)]) / (args.high / args.low)
    print(
        json.dumps(
            {
                "metric": f"cpu_ceiling_{args.low}_to_{args.high}",
                "value": round(eff, 3),
                "unit": "x (pure-CPU burner, no Spark)",
                "iters": out,
            }
        )
    )


if __name__ == "__main__":
    main()

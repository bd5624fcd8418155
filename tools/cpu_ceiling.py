"""Same-day hardware-ceiling probe for scaling measurements.

The sandbox VM's hypervisor steal fluctuates hour-to-hour; on bad days the
box cannot scale even embarrassingly parallel pure-CPU work 4->16 at the
efficiency the BASELINE criterion asks of the Spark job. This probe spins
N independent CPU-bound processes (no Spark, no IPC, no memory pressure)
and reports aggregate throughput + the 4->16 scaling ratio — the ceiling
any job measurement that day should be normalized against.

Usage:
    python tools/cpu_ceiling.py            # prints one JSON line
Protocol: run this BEFORE a scaling measurement; only trust (or attempt)
the expensive Spark scaling run when the ceiling itself is ~1.0.
"""

from __future__ import annotations

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
    out = {str(n): measure(n) for n in (4, 16)}
    eff = (out["16"] / out["4"]) / 4
    print(
        json.dumps(
            {
                "metric": "cpu_ceiling_4_to_16",
                "value": round(eff, 3),
                "unit": "x (pure-CPU burner, no Spark)",
                "iters": out,
            }
        )
    )


if __name__ == "__main__":
    main()

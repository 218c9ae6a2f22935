"""Hypervisor core-delivery calibration for the scaling protocol.

The sandbox's 32 vCPUs are not 32 deliverable cores: under load the
hypervisor steals cycles, and the loss is a function of how many cores
are busy. The scaling pair (N vs 4N cores) is only meaningful if BOTH
levels sit inside the linear-delivery region — otherwise the pair
measures the hypervisor's oversubscription, not the engine
(BENCH/PLANS.md round 4; BENCH/BASELINE.md protocol note).

Method: for each level n, spawn n identical pure-CPU busy-loop
processes, each pinned to its own core with sched_setaffinity, and
count loop iterations inside a fixed wall window. Per-process slowdown
is rate(1 pinned proc) / mean rate(n pinned procs); effective cores =
n / slowdown. Run on an idle box; prints one JSON line.

Usage: python3 tools/calibrate_cores.py [levels...]   (default 1 4 8 16 24 32)
"""

import json
import multiprocessing as mp
import os
import sys
import time

WINDOW_S = 6.0


def _busy(core: int, out, idx: int) -> None:
    os.sched_setaffinity(0, {core})
    # tight integer loop — no allocation, no syscalls inside the window
    end = time.perf_counter() + WINDOW_S
    n = 0
    x = 1
    while time.perf_counter() < end:
        for _ in range(10000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 1
    out[idx] = n


def measure(n_procs: int) -> float:
    """Mean per-process loop rate with n_procs pinned busy loops."""
    out = mp.Array("d", n_procs)
    procs = [mp.Process(target=_busy, args=(i, out, i))
             for i in range(n_procs)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    rates = list(out)
    return sum(rates) / len(rates)


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16, 24, 32]
    if os.getloadavg()[0] > 1.5:
        print("calibration needs an idle box (load1="
              f"{os.getloadavg()[0]:.1f})", file=sys.stderr)
        sys.exit(2)
    base = measure(1)
    rows = []
    for n in levels:
        r = measure(n) if n > 1 else base
        slowdown = base / r if r else float("inf")
        rows.append({"busy_cores": n,
                     "slowdown_per_proc": round(slowdown, 3),
                     "effective_cores": round(n / slowdown, 2)})
    print(json.dumps({"window_s": WINDOW_S, "levels": rows}))


if __name__ == "__main__":
    main()

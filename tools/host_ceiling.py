"""No-Spark host-scaling control: pure-ALU spin across N processes.

Measures the HOST's parallel-scaling ceiling (oversubscription / SMT /
co-tenant steal) independent of any engine code: an embarrassingly-parallel
integer loop with zero memory traffic. If this control's N→4N efficiency is
low, no workload on this machine can do better at that pair — recorded next
to the engine's scaling numbers so host noise is attributable.

Usage: python tools/host_ceiling.py [--levels 8,32] [--iters 40000000]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _spin(n: int) -> int:
    acc = 0
    for i in range(n):
        acc ^= i * 2654435761 & 0xFFFFFFFF
    return acc


def run_level(procs: int, iters: int) -> float:
    """Total iterations/sec with `procs` workers each spinning `iters`."""
    t0 = time.time()
    with mp.Pool(procs) as pool:
        pool.map(_spin, [iters] * procs)
    dt = time.time() - t0
    return procs * iters / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--iters", type=int, default=40_000_000)
    args = ap.parse_args()
    levels = tuple(int(x) for x in args.levels.split(","))
    out = {"iters_per_proc": args.iters, "runs": {}}
    for p in levels:
        best = max(run_level(p, args.iters) for _ in range(2))
        out["runs"][p] = round(best / 1e6, 2)  # M iters/sec
        print(f"{p} procs: {best/1e6:.1f} M iters/s", flush=True)
    for lo, hi in zip(levels, levels[1:]):
        out[f"efficiency_{lo}_to_{hi}"] = round(
            out["runs"][hi] / out["runs"][lo] / (hi / lo), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Pure-Python multiprocessing control for the scaling evidence.

Runs the frozen oracle (no Spark, no JVM) over a deterministic synthetic
turn stream with a process Pool at each requested parallelism level.
This isolates the HOST's parallel capacity from everything Spark-side:
if this control scales N -> 4N but the Spark job does not, the gap is
in the JVM feed path / local deployment, not in the engine's per-turn
work (which is embarrassingly parallel).

Usage: python BENCH/mp_control.py [--convs 4000] [--levels 2,8,32]
Prints one JSON line with per-level throughput and N->4N efficiencies.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def extract_conv(conv_idx: int) -> int:
    from batukh_spark import synth
    from batukh_spark.oracle.extract import extract
    n = synth.turns_in_conv(conv_idx)
    for ti in range(n):
        t = synth.make_turn(conv_idx, ti)
        extract(t["text"], role=t["role"], tool=t["tool"])
    return n


def run_level(procs: int, convs: int) -> dict:
    t0 = time.time()
    with mp.Pool(procs) as pool:
        turns = sum(pool.map(extract_conv, range(convs), chunksize=8))
    wall = time.time() - t0
    return {"procs": procs, "turns": turns, "wall_s": round(wall, 2),
            "turns_per_sec": round(turns / wall, 1),
            "loadavg_after": round(os.getloadavg()[0], 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=4000)
    ap.add_argument("--levels", default="2,8,32")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    res = {}
    for p in levels:
        r = run_level(p, args.convs)
        res[p] = r
        print(f"procs={p}: {r['turns_per_sec']} turns/s "
              f"({r['wall_s']}s)", file=sys.stderr)
    effs = {f"{lo}_to_{lo*4}": round(
        res[lo * 4]["turns_per_sec"] / res[lo]["turns_per_sec"] / 4, 3)
        for lo in levels if lo * 4 in res}
    print(json.dumps({"metric": "mp_oracle_scaling",
                      "levels": {str(p): res[p] for p in levels},
                      "efficiency": effs}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Host memory-bandwidth scaling probe (companion to the spin probe).

The spin probe measures per-core COMPUTE capacity (cache-resident loop);
this measures aggregate DRAM bandwidth: each process streams over a
buffer far larger than LLC (numpy copy = read + write). Reported GB/s is
the sum across processes. Comparing N vs 4N processes gives the HOST's
bandwidth scaling envelope — the hard ceiling for any data-movement-bound
pipeline phase (parquet scan/write, Arrow transfer, array merge) on this
box, independent of engine design.

Usage: python BENCH/bandwidth_probe.py [procs ...]   (default: 1 4 16)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

BUF_MB = 64
SECONDS = 3.0


def stream(q):
    # np.zeros pre-touches the pages: this VM backs guest memory lazily, and
    # first-touch fault cost would otherwise dominate (measured 0.01 GB/s on
    # untouched buffers vs 36 GB/s touched — a host artifact, not bandwidth)
    a = np.zeros(BUF_MB * 131072)
    b = np.zeros(BUF_MB * 131072)
    np.copyto(b, a)  # warm
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < SECONDS:
        np.copyto(b, a)
        n += 1
    q.put((n, time.perf_counter() - t0))


def run(procs: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=stream, args=(q,)) for _ in range(procs)]
    for p in ps:
        p.start()
    res = [q.get() for _ in ps]
    for p in ps:
        p.join()
    # copy = 1 read + 1 write of BUF_MB per iteration, per process
    return round(sum(n * BUF_MB * 2 / 1024.0 / dt for n, dt in res), 2)


def main() -> None:
    procs = [int(x) for x in sys.argv[1:]] or [1, 4, 16]
    out = {str(p): run(p) for p in procs}
    if "4" in out and "16" in out and out["4"]:
        out["scaling_16_over_4"] = round(out["16"] / out["4"], 3)
    print(json.dumps({"aggregate_gb_per_sec": out, "buf_mb": BUF_MB}))


if __name__ == "__main__":
    main()

"""Two-parallelism scaling measurement (BASELINE.json north rule).

Runs the core pipeline — synth web pages -> geocode -> cell encode ->
dominance merge -> tile build -> LoD pyramid -> polygon query — at the
parallelism given by --cores, printing one JSON line with wall-clock and
rows/sec. The driver script (run_scaling.sh) launches this twice via
spark-submit --py-files (local[8] vs local[32] — the sandbox proxy for N vs
4N executors) and reports scaling efficiency.

The workload is sized (default 4M pages) so task work dominates scheduling:
that is the regime the 100 TB deployment lives in, and the regime the
efficiency bar is meaningful for.
"""

from __future__ import annotations

import argparse
import json
import time


def _cpu_probe(procs: int, seconds: float = 3.0) -> float:
    """Per-core spin throughput (Mloops/s/core) measured with ``procs``
    concurrent spinners — records the host's ACTUAL capacity in this leg's
    time window (the hypervisor throttles sustained load invisibly to guest
    steal counters; see BENCH/BASELINE.md). Evidence, not correction."""
    import multiprocessing as mp
    import time as _t

    def spin(q):
        t_end = _t.perf_counter() + seconds
        n = 0
        while _t.perf_counter() < t_end:
            for _ in range(100_000):
                pass
            n += 1
        q.put(n)

    q = mp.Queue()
    ps = [mp.Process(target=spin, args=(q,)) for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return round(total * 0.1 / seconds / procs, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--pages", type=int, default=4_000_000)
    args = ap.parse_args()

    probe_before = _cpu_probe(args.cores)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName(f"qt-scaling-{args.cores}")
        # FIXED partition count for every leg: identical physical plan, only
        # executor parallelism differs (the cluster analogue: partitioning is
        # a property of the data layout, not of how many executors show up)
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from aardvark_geometry_quadtree_spark.operators.build import build_tiles
    from aardvark_geometry_quadtree_spark.operators.merge import Dominance, merge_samples
    from aardvark_geometry_quadtree_spark.operators.pyramid import build_pyramid
    from aardvark_geometry_quadtree_spark.operators.query import inside_polygon
    from aardvark_geometry_quadtree_spark.sources.webpages import (
        geocode,
        pages_to_samples,
        synth_webpages,
    )

    jvm_pid = spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()

    def jvm_cpu_sec() -> float:
        """Driver-JVM process CPU seconds via /proc (executors run inside it
        in local mode) — separates 'engine did more total work' from 'host
        denied CPU': constant cpu-sec across parallelism = perfectly
        parallelizable plan; low cpu/(wall*cores) utilization = host
        throttle, not engine."""
        with open(f"/proc/{jvm_pid}/stat") as f:
            parts = f.read().split()
        return (int(parts[13]) + int(parts[14])) / 100.0  # utime+stime, ticks

    cpu0 = jvm_cpu_sec()
    t0 = time.perf_counter()
    rows = 0
    phases: dict[str, float] = {}

    def mark(name: str, t_start: float) -> None:
        phases[name] = round(time.perf_counter() - t_start, 2)

    t = time.perf_counter()
    # two independent "crawls" (disjoint page-id ranges), each ingested and
    # cell-aggregated on its own — no shared upstream, no artificial
    # materialization barrier between them
    half = args.pages // 2
    crawl1 = synth_webpages(spark, half, nsites=5000, skew=1.2, seed=42)
    crawl2 = synth_webpages(spark, half, nsites=5000, skew=1.2, seed=1042)
    s1 = pages_to_samples(geocode(crawl1, extent=4096.0), e=0).drop("n_pages")
    s2 = pages_to_samples(geocode(crawl2, extent=4096.0), e=0).drop("n_pages")
    # merged with dominance (the engine's write path); exponent hints select
    # the single-shuffle same-resolution plan
    merged = merge_samples(
        s1, s2, Dominance.MoreDetailedOrFirst, layers=["height"],
        first_exponents=[0], second_exponents=[0],
    )
    merged = merged.localCheckpoint()  # persisted build output feeds 3 consumers
    rows += merged.count()
    mark("merge", t)

    t = time.perf_counter()
    tiles = build_tiles(merged, split=8, layers=["height"])
    rows += tiles.count()
    mark("tiles", t)

    t = time.perf_counter()
    # per-level Catalyst pyramid: at this density (~14M cells, levels shrink
    # a true 4x) the JVM hash-agg chain beats the Arrow round-trip of the
    # blocked kernel; build_pyramid_blocked is for sparse/overhead-bound
    # inputs (see bench.py)
    pyr = build_pyramid(merged, levels=5, layers=["height"], include_base=False)
    rows += pyr.count()
    mark("pyramid", t)

    t = time.perf_counter()
    poly = [(100.0, 100.0), (3600.0, 400.0), (3000.0, 3500.0), (400.0, 3000.0)]
    rows += inside_polygon(merged, poly).count()
    mark("polygon", t)

    wall = time.perf_counter() - t0
    cpu = jvm_cpu_sec() - cpu0
    probe_after = _cpu_probe(args.cores)
    print(
        json.dumps(
            {
                "cores": args.cores,
                "pages": args.pages,
                "rows": rows,
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(rows / wall, 1),
                "phases": phases,
                "probe_mloops_per_core": [probe_before, probe_after],
                "jvm_cpu_sec": round(cpu, 1),
                "cpu_utilization": round(cpu / (wall * args.cores), 3),
            }
        )
    )


if __name__ == "__main__":
    main()

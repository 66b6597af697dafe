"""Single-phase micro-benchmark for GC/config A-B experiments (run
interleaved; the host throttles in waves, so only paired comparisons are
valid). Phases: setup (write pages once), ingest, merge. Prints one JSON
line with the phase wall, JVM cpu, and spin probes."""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")
from BENCH.scaling import _cpu_probe  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--pages", type=int, default=24_000_000)
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--extent", type=float, default=8192.0)
    ap.add_argument("--phase", required=True, choices=["setup", "ingest", "merge", "pyramid"])
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    p0 = _cpu_probe(args.cores, 2.0)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName(f"qt-phase-{args.phase}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from aardvark_geometry_quadtree_spark.operators.blocks import (
        merge_blocks, pyramid_blocks, save_blocks_bucketed)
    from aardvark_geometry_quadtree_spark.sources.webpages import (
        geocode, pages_to_blocks, synth_webpages)

    jvm_pid = spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()

    def cpu() -> float:
        with open(f"/proc/{jvm_pid}/stat") as f:
            parts = f.read().split()
        return (int(parts[13]) + int(parts[14])) / 100.0

    spark.range(args.cores * 4, numPartitions=args.cores * 4).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    c0, t0 = cpu(), time.perf_counter()
    if args.phase == "setup":
        half = args.pages // 2
        for i, seed in ((1, 42), (2, 1042)):
            synth_webpages(spark, half, nsites=5000, skew=1.2, seed=seed).write.mode(
                "overwrite").parquet(f"/dev/shm/qtp/pages_{i}")
    elif args.phase == "ingest":
        for i in (1, 2):
            pages = spark.read.parquet(f"/dev/shm/qtp/pages_{i}")
            blk = pages_to_blocks(geocode(pages, extent=args.extent), e=0, bits=args.bits)
            save_blocks_bucketed(blk.drop("n_pages", "n_pages_mask"), f"crawl{i}_blk")
    elif args.phase == "merge":
        m = merge_blocks(spark.table("crawl1_blk"), spark.table("crawl2_blk"),
                         "more_detailed_or_first", layers=["height"])
        save_blocks_bucketed(m, "merged_blk")
        spark.table("merged_blk").agg(F.sum("n_samples")).collect()
    elif args.phase == "pyramid":
        pyramid_blocks(spark.table("merged_blk"), levels=5, layers=["height"]).agg(
            F.sum("n_samples")).collect()
    wall = time.perf_counter() - t0
    dc = cpu() - c0
    p1 = _cpu_probe(args.cores, 2.0)
    print(json.dumps({"tag": args.tag, "phase": args.phase, "cores": args.cores,
                      "wall": round(wall, 2), "cpu": round(dc, 1),
                      "probes": [p0, p1]}))


if __name__ == "__main__":
    main()

"""Extra benchmarks (guide §1.4): time individual bench queries in isolation,
with the same count() forcing as the frozen bench.py, or with a noop sink
(SPARK_GRAFT_SINK=noop) to force every column. Not part of the driver's
measurement — bench.py is frozen; numbers here are cited in
OPTIMIZATION_r06.md.

Usage: [SPARK_GRAFT_SF_DIR=...] python bench_extra.py [reps] [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sink = os.environ.get("SPARK_GRAFT_SINK", "count")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:]

    import __spark_entry__ as E
    from aardvark_geometry_quadtree_spark.session import get_spark
    from tools.capture_plans import _ingest_blocks_narrow, _ingest_tile_build, _pyramid_l6

    spark = get_spark(app_name="qt-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, int(cpus)))
    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).count()

    qs = E.queries()
    qs["ingest_blocks_narrow"] = _ingest_blocks_narrow
    qs["ingest_tile_build"] = _ingest_tile_build
    qs["pyramid_l6"] = _pyramid_l6
    if not names:
        names = ["lsh_pairs", "jaccard_pairs", "simhash", "minhash"]

    times: dict[str, list[float]] = {n: [] for n in names}
    rows: dict[str, int] = {}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            if sink == "noop":
                df.write.format("noop").mode("overwrite").save()
                rows[name] = -1
            else:
                rows[name] = df.count()
            times[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {n: {"min": min(t), "samples": t, "rows": rows[n]} for n, t in times.items()}
    print(json.dumps({"sf_dir": sf_dir, "cpus": int(cpus), "sink": sink, "queries": out}))


if __name__ == "__main__":
    main()

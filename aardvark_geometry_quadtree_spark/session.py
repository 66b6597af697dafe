"""SparkSession factory tuned for this engine.

Local-mode settings follow the public Spark tuning guide: shuffle
partitions sized to cores (not the 200 default), AQE on (runtime
coalesce + skew-join splitting), Arrow on for pandas-UDF kernels.
On a real cluster the same builder applies — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "aardvark_geometry_quadtree_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default ``*``).
    ``shuffle_partitions`` defaults to the parallelism level so small-scale
    runs don't pay 200-partition scheduling overhead; at 100 TB this knob
    is instead sized so that shuffle partitions stay ~128-512 MB.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.index("[") + 1 : -1] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # shuffle/spill on tmpfs when available: on this host, 32 concurrent
        # shuffle writers on the VM's ext4 disk spend >50% CPU in-kernel
        # (212s -> 19.5s on the 4M-page merge). On a real cluster this maps
        # to fast local SSDs / disaggregated shuffle.
        .config(
            "spark.local.dir",
            "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
        )
        # G1 (the Java 17 default) anti-scales past ~8 mutator threads on
        # this virtualized host (pure-CPU md5 probe: 50.7s -> 8.0s at
        # local[32] with ParallelGC). Startup-time option: only effective
        # when this builder launches the JVM (python-launched sessions);
        # spark-submit callers must pass it as a submit-time --conf.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # scan-split sizing: the default openCostInBytes (4 MB) makes
        # maxSplitBytes = max(4MB, totalBytes/minPartitionNum), so any table
        # under ~4MB*cores scans in a handful of partitions — the bench's
        # 5.7 MB documents table scanned as TWO splits and every
        # text-pipeline kernel ran on 2 of 32 cores. 128 KB restores the
        # bytes-per-core floor for small tables while leaving large-scan
        # behavior untouched (splits are still capped by maxPartitionBytes,
        # and at 100 TB totalBytes/cores >> openCost so the value never
        # binds; guide §6). Overridable via extra_conf.
        .config("spark.sql.files.openCostInBytes", str(128 * 1024))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""One-off: cross-exponent merge at crawl scale — block path vs sample path.

Stages crawl A as e0 blocks and crawl B as an e1 block pyramid level (the
reference's central mixed-resolution scenario: two crawls at different
resolutions), then times:
  - merge_blocks_mixed (anchor-kernel block path, one repartition), vs
  - merge_samples (ancestor-key equi-joins + fragment kernel) over the
    unpacked row sets of the same inputs.
Both outputs are forced with an occupied-cell count; the block path's
count comes from n_samples, the sample path's from count(*). Equality of
the two totals is asserted (weak differential at scale; exact parity is
oracle-checked at sf0.01 by the driver contract).
"""
import argparse, json, time

ap = argparse.ArgumentParser()
ap.add_argument("--pages", type=int, default=12_000_000)
ap.add_argument("--cores", type=int, default=16)
ap.add_argument("--bits", type=int, default=8)
ap.add_argument("--extent", type=float, default=8192.0)
args = ap.parse_args()

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master(f"local[{args.cores}]")
    .appName("qt-mixed-merge-bench")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.local.dir", "/dev/shm/spark-local")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(args.cores * 4, numPartitions=args.cores * 4).mapInPandas(lambda it: it, "id long").count()

from aardvark_geometry_quadtree_spark.operators.blocks import (
    merge_blocks_mixed, pyramid_blocks, unpack_blocks)
from aardvark_geometry_quadtree_spark.operators.merge import merge_samples
from aardvark_geometry_quadtree_spark.sources.webpages import (
    geocode, pages_to_blocks, synth_webpages)

half = args.pages // 2
blk_a = pages_to_blocks(
    geocode(synth_webpages(spark, half, nsites=5000, skew=1.2, seed=42), extent=args.extent),
    e=0, bits=args.bits,
).drop("n_pages", "n_pages_mask").localCheckpoint()
blk_b1 = pyramid_blocks(
    pages_to_blocks(
        geocode(synth_webpages(spark, half, nsites=5000, skew=1.2, seed=1042), extent=args.extent),
        e=0, bits=args.bits,
    ).drop("n_pages", "n_pages_mask"),
    levels=1,
).localCheckpoint()
# pyramid halves w; repack to the shared bits grid for the constant-width
# merge contract (one pack shuffle — the staging step a lake would persist)
from aardvark_geometry_quadtree_spark.operators.blocks import pack_blocks
blk_b1 = pack_blocks(
    unpack_blocks(blk_b1, layer_types={"height": "double"}), bits=args.bits
).localCheckpoint()

t0 = time.perf_counter()
m = merge_blocks_mixed(blk_a, blk_b1, "more_detailed_or_first",
                       first_exponents=[0], second_exponents=[1])
n_block = m.agg(F.sum("n_samples")).collect()[0][0]
t_block = round(time.perf_counter() - t0, 2)

sa = unpack_blocks(blk_a, layer_types={"height": "double"}).localCheckpoint()
sb = unpack_blocks(blk_b1, layer_types={"height": "double"}).localCheckpoint()
t0 = time.perf_counter()
ms = merge_samples(sa, sb, "more_detailed_or_first", layers=["height"],
                   first_exponents=[0], second_exponents=[1])
n_sample = ms.count()
t_sample = round(time.perf_counter() - t0, 2)

assert n_block == n_sample, (n_block, n_sample)
print(json.dumps({
    "pages": args.pages, "cores": args.cores, "bits": args.bits,
    "extent": args.extent, "rows_out": n_block,
    "block_path_sec": t_block, "sample_path_sec": t_sample,
    "speedup": round(t_sample / t_block, 2),
}))

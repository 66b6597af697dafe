"""Per-round benchmark: headline engine queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "rows": {name: n},
   "throughput_rows_per_sec": ...}

The workload is the reference merge/query suite re-expressed over the
synthetic corpus (BASELINE.md protocol): geocode -> tile build -> LoD
pyramid -> dominance merge -> spatial joins, plus the training-data ops
(dedup/LSH, similarity, text stats). Each query is forced with a count()
(no driver-side materialization beyond the scalar).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0

    import __spark_entry__ as E
    from aardvark_geometry_quadtree_spark.session import get_spark
    from aardvark_geometry_quadtree_spark.operators.build import build_tiles
    from aardvark_geometry_quadtree_spark.operators.pyramid import build_pyramid
    from aardvark_geometry_quadtree_spark.sources.webpages import (
        geocode,
        pages_to_samples,
        synth_webpages,
    )

    spark = get_spark(
        app_name="qt-bench", master=f"local[{cpus}]", shuffle_partitions=max(8, int(cpus))
    )

    n_pages = max(200_000, int(2_000_000 * sf))

    def bench_ingest_tile(spark, _sf_dir):
        pages = synth_webpages(spark, n_pages, nsites=2000, skew=1.5)
        s = pages_to_samples(geocode(pages, extent=4096.0), e=0)
        return build_tiles(s.drop("n_pages"), split=8, layers=["height"])

    def bench_pyramid(spark, _sf_dir):
        pages = synth_webpages(spark, n_pages, nsites=2000, skew=1.5)
        s = pages_to_samples(geocode(pages, extent=4096.0), e=0).drop("n_pages")
        return build_pyramid(s, levels=6, layers=["height"])

    workload = {
        "ingest_tile_build": bench_ingest_tile,
        "pyramid_l6": bench_pyramid,
        "cell_encode": E.q_cell_encode,
        "inside_polygon": E.q_inside_polygon,
        "near_line": E.q_near_line,
        "merge_dominance": E.q_merge_dominance,
        "merge_mixed_res": E.q_merge_mixed_res,
        "knn": E.q_knn,
        "lod_cut": E.q_lod_cut,
        "exact_dups": E.q_exact_dups,
        "lsh_pairs": E.q_lsh_pairs,
        "jaccard_pairs": E.q_jaccard_pairs,
        "simhash": E.q_simhash,
        "cosine_topk": E.q_cosine_topk,
        "ann_topk": E.q_ann_topk,
        "multimodal_features": E.q_multimodal_features,
    }

    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in workload.items():
        t0 = time.perf_counter()
        rows[name] = fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    total_rows = sum(rows.values())
    print(
        json.dumps(
            {
                "metric": "quadtree merge/query suite wall-clock (tiles+join rows forced)",
                "value": total,
                "unit": "sec",
                "queries": times,
                "rows": rows,
                "sf": sf,
                "cpus": int(cpus),
                "n_pages_synth": n_pages,
                "throughput_rows_per_sec": round(total_rows / total, 1) if total else None,
            }
        )
    )


if __name__ == "__main__":
    main()

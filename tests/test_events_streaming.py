"""Streaming: watermark drop semantics + applyInPandasWithState cumulative
state across micro-batches (task-mandated streaming surface; file source
with maxFilesPerTrigger=1 gives deterministic one-file-per-micro-batch)."""

import time
from datetime import datetime

import pytest


def _write_events(spark, src_dir, seq, rows):
    """Write one parquet FILE directly under src_dir (flat layout — subdirs
    would trigger partition discovery and collapse into one micro-batch),
    named and mtime-ordered so the file stream processes it as batch ``seq``."""
    import glob
    import os
    import shutil

    df = spark.createDataFrame(
        [(i, datetime(2024, 1, 1, h, m), uid, "click", float(v), "{}")
         for i, (h, m, uid, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    tmp = f"{src_dir}__tmp{seq}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(src_dir, exist_ok=True)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    dst = os.path.join(src_dir, f"{seq:06d}.parquet")
    shutil.copyfile(part, dst)
    os.utime(dst, (1700000000 + seq * 10, 1700000000 + seq * 10))
    shutil.rmtree(tmp)


def _run_stream(spark, src_dir, build, checkpoint, out_name, output_mode):
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(out_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {out_name}")


def test_watermark_drops_late_events(spark, tmp_path):
    from aardvark_geometry_quadtree_spark.streaming.events_stream import windowed_cell_counts

    src = str(tmp_path / "src")
    # batch 1: windows [01:00,02:00) x2 events, [02:00,03:00) x2
    _write_events(spark, src, 1, [(1, 10, 7, 1.0), (1, 20, 7, 2.0),
                                  (2, 10, 7, 3.0), (2, 25, 7, 4.0)])
    # batch 2: on-time 03:20 event; advances the watermark to 03:05
    # (the watermark a batch FILTERS with is the one committed at the end
    # of the batch before it, so the drop is only guaranteed one batch on)
    _write_events(spark, src, 2, [(3, 20, 7, 5.0)])
    # batch 3: a LATE event at 01:30 — its window closed at the 03:05
    # watermark, so it must be dropped; the 04:30 row advances the
    # watermark to 04:15, finalizing [03:00,04:00)
    _write_events(spark, src, 3, [(1, 30, 7, 99.0), (4, 30, 7, 7.0)])

    out = _run_stream(
        spark, src, lambda s: windowed_cell_counts(s, "15 minutes", "1 hour"),
        str(tmp_path / "ck1"), "win_counts", "append",
    )
    rows = {(r.win_start.hour, r.n_events, r.avg_value) for r in out.collect()}
    # append mode: each window exactly once; the late 99.0 appears NOWHERE
    # ([01:00,02:00) stays 2 events avg 1.5 and is never re-emitted)
    assert rows == {(1, 2, 1.5), (2, 2, 3.5), (3, 1, 5.0)}


def test_stateful_cell_stats_accumulates_across_batches(spark, tmp_path):
    from aardvark_geometry_quadtree_spark.streaming.events_stream import (
        geocode_events, stateful_cell_stats)

    src = str(tmp_path / "src2")
    # two users = two cells; state must persist across the two micro-batches
    _write_events(spark, src, 1, [(1, 0, 7, 1.0), (1, 5, 7, 2.0), (1, 9, 8, 10.0)])
    _write_events(spark, src, 2, [(2, 0, 7, 3.0), (2, 5, 8, 20.0)])

    out = _run_stream(
        spark, src, stateful_cell_stats,
        str(tmp_path / "ck2"), "cell_stats", "update",
    )
    # update mode appends one row per touched cell per batch; the LAST row
    # per cell carries the cumulative state
    pdf = out.toPandas()
    last = {}
    for _, r in pdf.iterrows():
        last[(r["cx"], r["cy"])] = (r["n_events"], r["mean_value"], r["max_value"])
    ev = spark.createDataFrame(
        [(7,), (8,)], "user_id long"
    ).selectExpr("(user_id*73) % 997 - 498 as cx", "(user_id*179) % 991 - 495 as cy")
    cells = {(r.cx, r.cy): uid for r, uid in zip(ev.collect(), [7, 8])}
    inv = {v: k for k, v in cells.items()}
    assert last[inv[7]] == (3, 2.0, 3.0)     # values 1,2,3
    assert last[inv[8]] == (2, 15.0, 20.0)   # values 10,20
    # two batches -> user 7's cell emitted twice (cumulative 2 then 3)
    u7 = pdf[(pdf.cx == inv[7][0]) & (pdf.cy == inv[7][1])].sort_values("n_events")
    assert list(u7["n_events"]) == [2, 3]
    _ = time

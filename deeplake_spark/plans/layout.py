"""Physical layout utilities: bucketing for co-located joins, salting
for skew — the partitioning levers SURVEY §4.1 assigns to deployment
(reference counterpart: chunk layout + PG planner join strategies are
fixed by the engines; on Spark the layout is ours to choose).

At 100 TB the orders⋈lineitem shuffle dominates TPC-H-style plans;
bucketing both fact tables on the join key at write time removes that
exchange entirely (Catalyst recognizes compatible bucketed relations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table_name: str, bucket_cols: list[str],
                   n_buckets: int = 32, sort_cols: list[str] | None = None) -> None:
    """Persist as a bucketed (optionally sorted) catalog table. Joins
    and aggregations keyed on `bucket_cols` between tables bucketed the
    same way run shuffle-free."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def salted_join(skewed: DataFrame, other: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-buster: spread each hot key of the skewed side over
    `n_salts` sub-keys and replicate the other side across all salts
    (explode), so no single reducer owns a hot key. Use when AQE's
    skew-join split isn't available/enough. Output columns = skewed ⋈
    other minus helper columns."""
    salted_big = skewed.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(replicated, on=[key, "__salt"], how=how).drop("__salt")


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Attach a Z-order (Morton) key over `cols` as column ``__z``.

    Each column is min/max-normalized into a ``bits``-bit bucket (the
    1-row min/max aggregate broadcasts — no sort, no sampling pass),
    then the bucket bits are interleaved so rows close in EVERY
    dimension get close keys. Built as one parsed expression
    (bits × n_cols shift/or terms — the CLAUDE.md trap-12 convention).

    Interleaving width is capped so the key fits a signed 64-bit long.
    """
    k = len(cols)
    if k == 0:
        raise ValueError("zorder_key needs at least one column")
    bits = min(bits, 62 // k)
    top = (1 << bits) - 1
    stats = df.agg(*[
        f for c in cols
        for f in (F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
                  F.max(F.col(c).cast("double")).alias(f"__mx_{c}"))
    ])
    with_buckets = df.crossJoin(F.broadcast(stats)).select(
        "*",
        *[
            F.least(
                F.lit(top),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col(c).cast("double") - F.col(f"__mn_{c}"))
                        / F.nullif(F.col(f"__mx_{c}") - F.col(f"__mn_{c}"),
                                   F.lit(0.0))
                        * top
                    ),
                ),
            ).alias(f"__zb{i}")
            for i, c in enumerate(cols)
        ],
    )
    z_terms = " + ".join(
        f"(shiftleft(shiftright(coalesce(__zb{i}, 0), {j}) & 1, {j * k + i}))"
        for j in range(bits) for i in range(k))
    return (
        with_buckets.select(
            "*", F.expr(f"({z_terms})").cast("long").alias("__z"))
        .drop(*[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols],
              *[f"__zb{i}" for i in range(k)])
    )


def zorder_layout(df: DataFrame, cols: list[str],
                  target_files: int | None = None,
                  bits: int = 16) -> DataFrame:
    """Cluster rows by Z-order for write: range-partition on the Morton
    key (parallel range sort — each output file covers one contiguous
    key range, i.e. roughly a hypercube of the value space) and sort
    within partitions, so every file's per-column min/max footer range
    is narrow in ALL `cols` at once. A lexicographic ORDER BY only
    narrows the leading column; Z-order is what makes file-skipping
    work for multi-dimensional predicates at 100 TB.
    """
    n = target_files or max(
        4, df.sparkSession.sparkContext.defaultParallelism // 4)
    return (
        zorder_key(df, cols, bits)
        .repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )

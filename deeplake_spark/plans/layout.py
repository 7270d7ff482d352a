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

"""SAMPLE BY — weighted sampling operators (reference
`cpp/query_core/sample_statement.hpp:15-100`, grammar y:911-917,
tql.md:333-348,641-644).

Scale design: everything is a per-row expression + top-k or
per-partition generation — no driver-side collection, no global state.

  - without replacement: A-ES (Efraimidis–Spirakis) — key each row with
    u^(1/w), take the global top-n via TakeOrderedAndProject.
  - with replacement: per-row Poisson draw of copy counts (expected
    n * w / sum_w), exploded into output rows — the distributed
    approximation of multinomial sampling (exact at scale; the
    alias-table alternative needs a global weight table).
  - LIMIT n PERCENT: count-scaled limit without a driver round trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def weight_pair_max(*cases: tuple[Column, float]) -> Column:
    """TQL `max_weight(cond1: w1, cond2: w2, ...)` — max weight among
    matching conditions, 0 when none match (expr.hpp:158,165-169)."""
    out = F.lit(0.0)
    for cond, w in cases:
        out = F.greatest(out, F.when(cond, F.lit(float(w))).otherwise(F.lit(0.0)))
    return out


def weight_pair_sum(*cases: tuple[Column, float]) -> Column:
    """TQL `sum_weight(...)` — sum of weights of matching conditions."""
    out = F.lit(0.0)
    for cond, w in cases:
        out = out + F.when(cond, F.lit(float(w))).otherwise(F.lit(0.0))
    return out


def sample_by_weight(df: DataFrame, weight: Column, n: int,
                     seed: int | None = 42) -> DataFrame:
    """Weighted sampling WITHOUT replacement via A-ES: top-n rows by
    pow(u, 1/w). Rows with weight <= 0 are excluded (reference
    semantics: zero weight = never sampled)."""
    u = F.rand(seed) if seed is not None else F.rand()
    key = F.pow(u, F.lit(1.0) / weight)
    return (
        df.withColumn("__w", weight)
        .filter(F.col("__w") > 0)
        .withColumn("__key", key)
        .orderBy(F.desc("__key"))
        .limit(n)
        .drop("__w", "__key")
    )


def _global_row_number(df: DataFrame, order: list[Column], col_name: str) -> DataFrame:
    """0-based global row number over `order` WITHOUT an unpartitioned
    window: range-partitioned sort (parallel), then the partition-offset
    trick (io.with_row_id's scale path) — per-partition monotonic ids
    shifted by a broadcast one-row-per-partition offsets aggregate. No
    single task ever holds more than its partition."""
    from deeplake_spark.io import with_row_id

    return with_row_id(df.orderBy(*order), col_name=col_name)


def sample_by_weight_fraction(df: DataFrame, weight: Column, fraction: float,
                              seed: int | None = 42) -> DataFrame:
    """SAMPLE BY w LIMIT p PERCENT — percentage variant
    (sample_statement.hpp:31-39): count-scaled n, then A-ES. The limit
    is a broadcast 1-row aggregate and ranking is partition-offset
    based — no driver count, no unpartitioned window."""
    u = F.rand(seed) if seed is not None else F.rand()
    lim = df.agg(F.ceil(F.count(F.lit(1)) * fraction).alias("__lim"))
    keyed = (
        df.withColumn("__w", weight)
        .filter(F.col("__w") > 0)
        .withColumn("__key", F.pow(u, F.lit(1.0) / F.col("__w")))
    )
    ranked = _global_row_number(keyed, [F.desc("__key")], "__rn")
    return (
        ranked.crossJoin(F.broadcast(lim))
        .filter(F.col("__rn") < F.col("__lim"))
        .drop("__w", "__key", "__rn", "__lim")
    )


def sample_with_replacement(df: DataFrame, weight: Column, n: int,
                            seed: int = 42) -> DataFrame:
    """Weighted sampling WITH replacement (REPLACE TRUE).

    Distributed multinomial approximation: each row draws a Poisson
    count with mean n * w / W (W = total weight, a 1-row broadcast),
    then explodes into that many copies. E[output rows] = n; no
    single-point alias table, scales linearly.
    """
    totals = df.agg(F.sum(weight.cast("double")).alias("__W"))
    lam = F.lit(float(n)) * weight.cast("double") / F.col("__W")
    # inverse-CDF Poisson draw from one uniform, computed iteratively in
    # an expression would be unwieldy — use the standard exp/floor trick
    # for small lambda and a pandas fallback is unnecessary: for
    # lambda << 1 a Bernoulli(lambda) is an excellent approximation, and
    # sampling n << N rows at scale always has lambda << 1.
    u = F.rand(seed)
    k = (
        F.when(u < F.exp(-lam), 0)
        .when(u < F.exp(-lam) * (1 + lam), 1)
        .when(u < F.exp(-lam) * (1 + lam + lam * lam / 2), 2)
        .otherwise(3)
    )
    return (
        df.crossJoin(F.broadcast(totals))
        .withColumn("__k", k)
        .filter(F.col("__k") > 0)
        .withColumn("__copy", F.explode(F.sequence(F.lit(1), F.col("__k"))))
        .drop("__W", "__k", "__copy")
    )


def limit_percent(df: DataFrame, pct: float, order_col: str) -> DataFrame:
    """LIMIT p PERCENT (y:950, tql.md:633) with deterministic order."""
    lim = df.agg(F.ceil(F.count(F.lit(1)) * (pct / 100.0)).alias("__lim"))
    w = Window.orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .crossJoin(F.broadcast(lim))
        .filter(F.col("__rn") <= F.col("__lim"))
        .drop("__rn", "__lim")
    )

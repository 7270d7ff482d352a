"""Query registry — the single source of truth consumed by
``__spark_entry__.py`` (driver correctness gate) and ``bench.py``.
All but a handful of queries carry exact DuckDB oracles (the exceptions
are index-routed rankings whose result depends on trained cells —
``load_all()`` reports the live counts).

Every implemented operator from SURVEY.md §2 registers here as:
  - a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-first plan)
  - an optional DuckDB oracle SQL string over the same parquet tables
    (omitted only for genuinely non-SQL-expressible ops; the driver then
    records a weaker rows-only check).

Column names are aliased identically on both sides — the driver's compare
sorts columns by name before hashing values.

Float discipline (oracle exactness): double sums are computed as
``CAST(expr AS DECIMAL(38,6))`` sums on BOTH sides, which makes the
aggregation exact and order-independent; ratios/averages are rounded to 6
decimals on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a query implementation + its oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY)."""
    from deeplake_spark.queries import (  # noqa: F401
        dedup_ops,
        relational,
        restructure_ops,
        text_ops,
        vector_ops,
    )

    return REGISTRY

"""Plan introspection — the reference's `explain_query` returns text +
structured plan (`cpp/tql/explain_query_result.hpp:10-32`,
`python/deeplake/__init__.pyi:606-611`); here the physical plan comes
from Catalyst and we add structured extraction of the properties that
matter for scale review: pushed filters, scanned columns, join
strategies, shuffle (Exchange) count, codegen coverage.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    text: str
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    joins: list[str] = field(default_factory=list)
    n_exchanges: int = 0
    n_broadcasts: int = 0
    wholestage_codegen: bool = False
    top_k: bool = False

    def to_dict(self) -> dict:
        return {
            "pushed_filters": self.pushed_filters,
            "read_schemas": self.read_schemas,
            "joins": self.joins,
            "n_exchanges": self.n_exchanges,
            "n_broadcasts": self.n_broadcasts,
            "wholestage_codegen": self.wholestage_codegen,
            "top_k": self.top_k,
        }


def explain_query(df: DataFrame) -> PlanReport:
    """Structured physical-plan report (ds.explain_query analog)."""
    text = df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    report = PlanReport(text=text)
    report.pushed_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    report.read_schemas = re.findall(r"ReadSchema: (\S+)", text)
    report.joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)", text
    )
    # count numbered plan nodes only — the formatted output repeats each
    # node in the tree sketch and the details section
    report.n_exchanges = len(re.findall(r"\(\d+\) Exchange", text))
    report.n_broadcasts = len(re.findall(r"\(\d+\) BroadcastExchange", text))
    # formatted mode marks codegen stages with a `*` tree prefix;
    # simple mode uses "[codegen id : N]" / WholeStageCodegen nodes
    report.wholestage_codegen = (
        "WholeStageCodegen" in text
        or "codegen id" in text
        or re.search(r"(?m)^[\s+:\-]*\* \w", text) is not None
    )
    report.top_k = "TakeOrderedAndProject" in text
    return report


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a predicate reached the parquet scan (PushedFilters)."""
    rep = explain_query(df)
    joined = " | ".join(rep.pushed_filters)
    assert fragment in joined, f"filter {fragment!r} not pushed; got: {joined}\n{rep.text[:2000]}"


def assert_pruned_columns(df: DataFrame, table_cols: set[str], allowed: set[str]) -> None:
    """Assert the scan reads only `allowed` columns of the table."""
    rep = explain_query(df)
    for schema in rep.read_schemas:
        read = set(re.findall(r"(\w+):", schema))
        extra = (read & table_cols) - allowed
        assert not extra, f"scan reads unpruned columns {extra}: {schema}"

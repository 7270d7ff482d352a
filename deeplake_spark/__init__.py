"""deeplake_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Deep Lake v4 (activeloopai/deeplake).

Architecture: everything is expressed as Spark DataFrame / SQL plans so
Catalyst + Tungsten handle optimization (pushdown, pruning, join strategy,
whole-stage codegen, AQE). Python touches data only through Arrow-batched
pandas UDFs, and only where built-in expressions genuinely cannot express
the semantics (tensor decode, MAXSIM late interaction).

Layout:
  session      — SparkSession factory tuned for the local[32] test harness
  io           — table loaders for the driver test data, row-id assignment
  functions/   — TQL scalar/array/vector/text function library (Column exprs)
  operators/   — dedup, similarity search, restructuring, sampling
  queries/     — the registry consumed by __spark_entry__ (query + oracle)
  tql/         — TQL dialect front-end: parser + translator to DataFrame ops
"""

from deeplake_spark.session import get_spark
from deeplake_spark.io import load_tables, with_row_id
from deeplake_spark.dataset import (
    Branch,
    Branches,
    BranchView,
    BranchesView,
    Client,
    Column,
    ColumnDefinition,
    ColumnDefinitionView,
    ColumnView,
    Dataset,
    History,
    IndexBuildConfig,
    IndexingMode,
    MergeConflictError,
    Metadata,
    Random,
    ReadOnlyMetadata,
    Row,
    RowRange,
    RowRangeView,
    RowView,
    Schema,
    SchemaView,
    Tag,
    Tags,
    TagView,
    TagsView,
    TelemetryClient,
    Version,
    client,
    random,
    telemetry_client,
    convert,
    connect,
    copy,
    create,
    create_async,
    delete,
    delete_async,
    disconnect,
    exists,
    exists_async,
    explain_query,
    from_coco,
    from_csv,
    from_jsonl,
    from_parquet,
    like,
    link,
    link_async,
    open,
    open_async,
    open_read_only,
    open_read_only_async,
    prepare_query,
    query,
    query_async,
    replay_log,
)
from deeplake_spark.views import DatasetView  # noqa: F401
from deeplake_spark.exceptions import *  # noqa: F401,F403  (reference taxonomy)
from deeplake_spark import exceptions as exceptions  # noqa: F401
from deeplake_spark import types  # noqa: F401
from deeplake_spark import tql  # noqa: F401
from deeplake_spark import formats  # noqa: F401
from deeplake_spark import core  # noqa: F401
from deeplake_spark import schemas  # noqa: F401
from deeplake_spark import storage  # noqa: F401
from deeplake_spark.tql import Executor  # noqa: F401
from deeplake_spark.types import QuantizationType  # noqa: F401
from deeplake_spark.plans.stats import ColumnStatistics  # noqa: F401
from deeplake_spark.plans.explain import PlanReport  # noqa: F401
from deeplake_spark.operators.similarity import SearchConfig  # noqa: F401
from deeplake_spark.streaming.feed import Future, FutureVoid  # noqa: F401
from deeplake_spark.core import Array  # noqa: F401  (nd-array cell handle)

#: reference name for the structured explain report
ExplainQueryResult = PlanReport

__version__ = "0.1.0"

__all__ = [
    "get_spark", "load_tables", "with_row_id", "__version__",
    "Dataset", "MergeConflictError", "create", "open", "open_read_only",
    "Branch", "Branches", "BranchView", "BranchesView",
    "Tag", "Tags", "TagView", "TagsView",
    "Schema", "SchemaView", "ColumnDefinition", "ColumnDefinitionView",
    "Column", "ColumnView", "Row", "RowView", "RowRange", "RowRangeView",
    "Version", "History", "Metadata", "ReadOnlyMetadata",
    "IndexingMode", "IndexBuildConfig", "QuantizationType",
    "SearchConfig", "ColumnStatistics", "ExplainQueryResult",
    "Future", "FutureVoid", "Executor", "Array",
    "Client", "TelemetryClient", "client", "telemetry_client",
    "Random", "random",
    "copy", "like", "convert", "delete", "exists", "from_parquet",
    "from_csv", "from_coco", "from_jsonl", "query", "query_async", "prepare_query",
    "explain_query", "create_async", "open_async",
    "open_read_only_async", "delete_async", "exists_async",
    "types", "tql", "core", "schemas", "storage", "formats",
] + list(exceptions.__all__)

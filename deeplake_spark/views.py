"""DatasetView: chainable query results.

Reference surface: `DatasetView` (python/deeplake/__init__.pyi:2279-2620)
— `ds.query()` returns a view that can itself be queried, offset/slice/
column-indexed, iterated, fed to pytorch/tensorflow, summarized, or
tagged. Here a view is a thin shell over a Spark DataFrame: chaining
composes logical plans (one Catalyst optimization over the WHOLE chain
— a chained filter still pushes down to the scan), nothing executes
until an action. Unknown attributes delegate to the DataFrame so the
view is a drop-in anywhere a DataFrame is expected.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from deeplake_spark.dataset import Dataset

_ROW_ID = "_row_id"


class DatasetView:
    """Lazy view over query results (reference __init__.pyi:2279).

    `indexes` is the owning dataset's rewrite table: chained queries
    keep index acceleration (posting/ANN semijoins intersect the view's
    surviving `_row_id`s — set semantics make that exact) as long as the
    row-id column survives the projection.
    """

    def __init__(self, df: DataFrame, indexes: dict | None = None,
                 dataset: "Dataset | None" = None,
                 lineage: list | None = None) -> None:
        self._df = df
        self._indexes = indexes or {}
        self._dataset = dataset
        #: (text, params) chain from the owning dataset — what makes the
        #: view PICKLABLE (reference views ship to dataloader workers):
        #: pickle carries the recipe, unpickle re-opens + re-queries.
        #: None for views not born from ds.query (slices of raw frames).
        self._lineage = lineage

    # ------------------------------------------------------------ core

    @property
    def df(self) -> DataFrame:
        """The underlying Spark DataFrame (escape hatch)."""
        return self._df

    def __getattr__(self, name: str):
        # delegate everything else (collect/count/show/columns/explain/
        # toPandas/...) to the DataFrame — views are DataFrame drop-ins
        if name == "_df":  # not yet bound (unpickling/copy) — no recursion
            raise AttributeError(name)
        return getattr(self._df, name)

    def query(self, text: str, params: list | None = None) -> "DatasetView":
        """Query the view's rows (DatasetView.query, __init__.pyi:2438):
        composes into one logical plan, re-optimized end-to-end."""
        from deeplake_spark.tql import query as tql_query

        idx = self._indexes if _ROW_ID in self._df.columns else None
        out = tql_query(text, spark=self._df.sparkSession, default=self._df,
                        params=params, indexes=idx)
        lineage = (self._lineage + [(text, params)]
                   if self._lineage is not None else None)
        return DatasetView(out, indexes=idx, dataset=self._dataset,
                           lineage=lineage)

    def query_async(self, text: str, params: list | None = None):
        from deeplake_spark.streaming.feed import query_async as _qa

        return _qa(self.query, text, params)

    def explain_query(self, text: str, params: list | None = None):
        from deeplake_spark.plans.explain import explain_query as _explain

        return _explain(self.query(text, params).df)

    def prepare_query(self, text: str):
        from deeplake_spark import tql as _tql

        idx = self._indexes if _ROW_ID in self._df.columns else None
        return _tql.prepare(text, spark=self._df.sparkSession,
                            default=self._df, indexes=idx)

    # ----------------------------------------------------- row addressing

    def _offsets(self) -> DataFrame:
        """View rows keyed by offset: `_row_id` where it survived, else
        a computed offset in the view's own order (range sort +
        partition offset — no global window, CLAUDE.md trap 7)."""
        if _ROW_ID in self._df.columns:
            return self._df.withColumn("__offset", F.col(_ROW_ID))
        from deeplake_spark import io

        return io.with_row_id(self._df, col_name="__offset")

    def __getitem__(self, i):
        off = self._offsets()
        if isinstance(i, int):
            row = off.filter(F.col("__offset") == i).drop("__offset").head()
            if row is None:
                raise IndexError(i)
            from deeplake_spark.dataset import RowView

            return RowView(row.asDict())
        if isinstance(i, slice):
            start = i.start or 0
            stop = i.stop if i.stop is not None else 1 << 62
            out = off.filter((F.col("__offset") >= start) & (F.col("__offset") < stop))
            if i.step and i.step != 1:
                out = out.filter((F.col("__offset") - start) % i.step == 0)
            return DatasetView(out.orderBy("__offset").drop("__offset"),
                               indexes=self._indexes, dataset=self._dataset)
        if isinstance(i, str):
            # reference DatasetView[str] -> ColumnView; offset-keyed so
            # col[3] addresses the view's own row order
            from deeplake_spark.dataset import ColumnView

            return ColumnView(
                off.orderBy("__offset").select(i, "__offset"),
                i, ds=self._dataset, offset_col="__offset")
        if isinstance(i, (list, tuple)):
            out = off.filter(F.col("__offset").isin(list(i)))
            return DatasetView(out.orderBy("__offset").drop("__offset"),
                               indexes=self._indexes, dataset=self._dataset)
        raise TypeError(type(i))

    def __iter__(self):
        """Iterator[RowView] (reference DatasetView.__iter__) — streams
        partitions, never a full collect."""
        from deeplake_spark.dataset import RowView

        ordered = self._offsets().orderBy("__offset").drop("__offset")
        return (RowView(r.asDict())
                for r in ordered.toLocalIterator(prefetchPartitions=True))

    def __len__(self) -> int:
        return self._df.count()

    def __repr__(self) -> str:
        return f"DatasetView(columns={self._df.columns})"

    # -------------------------------------------------------- conveniences

    @property
    def schema(self):
        return self._df.schema

    def summary(self):
        return self._df.summary()

    def to_csv(self, out_path: str) -> None:
        self._offsets().orderBy("__offset").drop("__offset").write.mode(
            "overwrite").option("header", True).csv(out_path)

    def tag(self, name: str, message: str = "") -> None:
        """Tag the version this view was computed against
        (DatasetView.tag, __init__.pyi:2470) — needs an owning dataset."""
        if self._dataset is None:
            from deeplake_spark.dataset import DatasetError

            raise DatasetError("view is not backed by a dataset; cannot tag")
        self._dataset.tag(name, message=message)

    def batches(self, batch_size: int, drop_last: bool = False):
        ordered = self._offsets().orderBy("__offset").drop("__offset")
        buf = []
        for row in ordered.toLocalIterator(prefetchPartitions=True):
            buf.append(row)
            if len(buf) == batch_size:
                yield buf
                buf = []
        if buf and not drop_last:
            yield buf

    def pytorch(self, transform=None, batch_size: int = 32):
        from deeplake_spark.streaming.feed import pytorch as _pt

        return _pt(self._offsets().orderBy("__offset").drop("__offset"),
                   transform, batch_size)

    def tensorflow(self, batch_size: int = 32):
        from deeplake_spark.streaming.feed import tensorflow as _tf

        return _tf(self._offsets().orderBy("__offset").drop("__offset"),
                   batch_size)


    # ------------------------------------------------------- pickling

    def __getstate__(self):
        """reference DatasetView.__getstate__/__setstate__: views born
        from ds.query pickle as (dataset path/branch/version, query
        chain) — the recipe, not the rows — so dataloader workers can
        ship a view across processes and re-bind locally."""
        if self._lineage is None or self._dataset is None:
            raise TypeError(
                "only views created by Dataset.query/DatasetView.query "
                "are picklable (this one wraps a raw DataFrame)")
        ds = self._dataset
        return {"path": ds.path, "branch": ds.current_branch,
                "version": ds.version, "lineage": self._lineage}

    def __setstate__(self, state) -> None:
        from deeplake_spark.dataset import Dataset
        from deeplake_spark.session import get_spark

        ds = Dataset(get_spark(), state["path"], version=state["version"],
                     branch=state["branch"], read_only=True)
        view = None
        for text, params in state["lineage"]:
            view = (ds.query(text, params) if view is None
                    else view.query(text, params))
        self._df = view._df
        self._indexes = view._indexes
        self._dataset = ds
        self._lineage = list(state["lineage"])

"""Training-feed delivery: the reference's actual "streaming" surface
(`ds.pytorch()` python/deeplake/_torch.py:11-29, `ds.tensorflow()`
`_tensorflow.py`, `ds.batches` __init__.pyi:2594-2619, async prefetch
cpp/bifrost/async_prefetcher.hpp).

Spark mapping: partition-prefetched `toLocalIterator` for single-node
consumption; `foreachPartition`-style distributed feeding is the
cluster path. Torch/TF are gated behind import-try (not in this image).
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


def iter_rows(df: DataFrame, order_col: str | None = "_row_id") -> Iterator:
    """Ordered row iterator with partition prefetch (bifrost's
    async_prefetcher analog is the prefetchPartitions flag)."""
    out = df.orderBy(order_col) if order_col and order_col in df.columns else df
    return out.toLocalIterator(prefetchPartitions=True)


def iter_batches(df: DataFrame, batch_size: int, drop_last: bool = False,
                 transform: Callable | None = None) -> Iterator[list]:
    buf: list = []
    for row in iter_rows(df):
        buf.append(transform(row) if transform else row)
        if len(buf) == batch_size:
            yield buf
            buf = []
    if buf and not drop_last:
        yield buf


class AsyncPrefetcher:
    """Background-thread batch prefetcher (async-data-loader pattern,
    reference docs/guide/deep-learning/async-data-loader.md): the
    consumer overlaps training compute with Spark-side fetch."""

    def __init__(self, batches: Iterator, depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: BaseException | None = None
        self._thread = threading.Thread(target=self._pump, args=(batches,), daemon=True)
        self._thread.start()

    def _pump(self, batches: Iterator) -> None:
        # a producer-side failure (executor loss, Py4J error) must
        # reach the CONSUMER — swallowing it here presented a failed
        # job as a clean end-of-stream, and a training loop would
        # finish an epoch on silently truncated data (r15 streaming
        # review). The exception is stored and re-raised in __iter__.
        try:
            for b in batches:
                self._q.put(b)
        except BaseException as exc:  # noqa: BLE001 - re-raised consumer-side
            self._err = exc
        finally:
            self._q.put(self._done)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                if self._err is not None:
                    raise self._err
                return
            yield item


def pytorch(df: DataFrame, transform: Callable | None = None, batch_size: int = 32):
    """ds.pytorch(transform) (__init__.pyi:2551): returns a torch
    IterableDataset when torch is installed, else a plain iterator.
    CONTRACT in BOTH lanes (r15 streaming review — the torch lane used
    to yield single rows while the fallback yielded lists, flipping
    element shape on an environment difference): iteration yields
    LISTS of ``batch_size`` (optionally transformed) rows, last batch
    possibly short. Wrap in a DataLoader with batch_size=None to keep
    these batches, or use iter_rows for per-sample access."""
    try:
        import torch

        class _DLIterable(torch.utils.data.IterableDataset):  # pragma: no cover
            def __iter__(self):
                return iter_batches(df, batch_size, transform=transform)

        return _DLIterable()
    except ImportError:
        return AsyncPrefetcher(iter_batches(df, batch_size, transform=transform))


def _tf_signature(tf, schema):
    """Per-column tf.TensorSpec dict from a Spark schema — scalars and
    1-D numeric arrays; anything else raises with the fix (select the
    supported columns first) instead of letting from_generator fail
    opaquely (r15 streaming review: output_types=None ALWAYS raised
    whenever tf was importable, so the tf branch had never worked)."""
    from pyspark.sql import types as T

    scalar = {T.LongType: tf.int64, T.IntegerType: tf.int32,
              T.ShortType: tf.int32, T.ByteType: tf.int32,
              T.DoubleType: tf.float64, T.FloatType: tf.float32,
              T.StringType: tf.string, T.BooleanType: tf.bool,
              T.BinaryType: tf.string}
    sig = {}
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, T.ArrayType) and type(dt.elementType) in scalar \
                and not isinstance(dt.elementType, T.ArrayType):
            sig[f.name] = tf.TensorSpec(shape=[None],
                                        dtype=scalar[type(dt.elementType)])
        elif type(dt) in scalar:
            sig[f.name] = tf.TensorSpec(shape=[], dtype=scalar[type(dt)])
        else:
            raise ValueError(
                f"tensorflow(): column {f.name!r} has unsupported type "
                f"{dt.simpleString()} — select scalar / 1-D numeric "
                "array columns first")
    return sig


def tensorflow(df: DataFrame, batch_size: int = 32):
    """ds.tensorflow() (__init__.pyi:2524) — tf.data.Dataset when tf is
    installed (element = dict of per-column tensors, signature derived
    from the Spark schema), else the plain prefetching iterator."""
    try:
        import tensorflow as tf
    except ImportError:
        return AsyncPrefetcher(iter_batches(df, batch_size))

    sig = _tf_signature(tf, df.schema)

    def gen():
        for r in iter_rows(df):
            d = r.asDict()
            out = {}
            for k in sig:
                v = d[k]
                if v is None:
                    if sig[k].dtype == tf.string:
                        v = ""
                    else:
                        # fail CLEARLY at the offending row — tf.data
                        # would otherwise die mid-epoch with an opaque
                        # 'None values not supported' (r15 diff review)
                        raise ValueError(
                            f"tensorflow(): NULL in non-string column "
                            f"{k!r} — fillna()/filter nulls before "
                            "feeding")
                out[k] = v
            yield out

    return tf.data.Dataset.from_generator(gen, output_signature=sig)


import concurrent.futures as _cf

_ASYNC_POOL: _cf.ThreadPoolExecutor | None = None


class Future(_cf.Future):
    """reference Future (__init__.pyi:172-280): adds the reference's
    is_completed()/wait() spellings on top of concurrent.futures
    semantics (result/cancel/add_done_callback/await)."""

    def is_completed(self) -> bool:
        return self.done()

    def wait(self):
        self.result()

    def __await__(self):  # `await ds.query_async(...)`
        import asyncio

        return asyncio.wrap_future(self).__await__()


class FutureVoid(Future):
    """reference FutureVoid: a Future whose result is None."""


def query_async(fn, *args, **kwargs):
    """Async query surface (`*_async`, Future/FutureVoid —
    __init__.pyi:172-416): Spark actions on a shared thread pool,
    surfaced as the reference Future type."""
    global _ASYNC_POOL
    if _ASYNC_POOL is None:
        _ASYNC_POOL = _cf.ThreadPoolExecutor(
            max_workers=8, thread_name_prefix="dls-async")
    fut: Future = Future()

    def run():
        if not fut.set_running_or_notify_cancel():
            return
        try:
            fut.set_result(fn(*args, **kwargs))
        except BaseException as exc:  # noqa: BLE001 - future carries it
            fut.set_exception(exc)

    _ASYNC_POOL.submit(run)
    return fut

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
        self._thread = threading.Thread(target=self._pump, args=(batches,), daemon=True)
        self._thread.start()

    def _pump(self, batches: Iterator) -> None:
        try:
            for b in batches:
                self._q.put(b)
        finally:
            self._q.put(self._done)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                return
            yield item


def pytorch(df: DataFrame, transform: Callable | None = None, batch_size: int = 32):
    """ds.pytorch(transform) (__init__.pyi:2551): returns a torch
    IterableDataset when torch is installed, else a plain iterator with
    identical semantics (import-gated — torch is not in this image)."""
    try:
        import torch

        class _DLIterable(torch.utils.data.IterableDataset):  # pragma: no cover
            def __iter__(self):
                return iter_rows(df) if transform is None else (
                    transform(r) for r in iter_rows(df)
                )

        return _DLIterable()
    except ImportError:
        return AsyncPrefetcher(iter_batches(df, batch_size, transform=transform))


def tensorflow(df: DataFrame, batch_size: int = 32):
    """ds.tensorflow() (__init__.pyi:2524) — tf.data.Dataset when tf is
    installed, else the plain prefetching iterator."""
    try:  # pragma: no cover
        import tensorflow as tf

        def gen():
            for r in iter_rows(df):
                yield r.asDict()

        return tf.data.Dataset.from_generator(gen, output_types=None)
    except ImportError:
        return AsyncPrefetcher(iter_batches(df, batch_size))


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

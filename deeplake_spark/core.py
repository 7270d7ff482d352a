"""Core value types (reference `python/deeplake/core.pyi`): the
handles query results use for JSON-ish dict cells, row-index mappings,
and raw buffers. Thin, stdlib-backed equivalents — Spark rows carry
plain Python values, so these exist to give reference-typed code the
exact names and methods it expects.
"""

from __future__ import annotations

import typing

__all__ = ["Array", "Dict", "IndexMapping64", "MemoryBuffer"]


class Dict(dict):
    """reference core.Dict (core.pyi:12-50): mapping access to a JSON
    cell. A dict subclass: equality with plain dicts, keys/items/len,
    plus to_dict(convert_numpy_to_list)."""

    def to_dict(self, convert_numpy_to_list: bool = False) -> dict:
        if not convert_numpy_to_list:
            return dict(self)

        def conv(v):
            try:
                import numpy as np

                if isinstance(v, np.ndarray):
                    return v.tolist()
            except ImportError:  # pragma: no cover
                pass
            if isinstance(v, dict):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, list):
                return [conv(x) for x in v]
            return v

        return {k: conv(v) for k, v in self.items()}


class IndexMapping64:
    """reference core.IndexMapping64 (core.pyi:54+): an int64 row-index
    mapping (`icm::index_mapping_t`, SURVEY §1.1) — the offsets a view
    addresses into its source. Backed by any int sequence."""

    def __init__(self, indices: typing.Sequence[int]):
        self._idx = list(int(i) for i in indices)

    def __getitem__(self, index: int) -> int:
        return self._idx[index]

    def __iter__(self) -> typing.Iterator[int]:
        return iter(self._idx)

    def __len__(self) -> int:
        return len(self._idx)

    def __getstate__(self) -> tuple:
        return (self._idx,)

    def __setstate__(self, state: tuple) -> None:
        self._idx = list(state[0])

    def __repr__(self) -> str:
        return f"IndexMapping64({self._idx!r})"


class MemoryBuffer(bytes):
    """reference core.MemoryBuffer: a raw byte buffer. bytes subclass —
    every consumer of the reference type accepts the buffer protocol."""


class Array:
    """reference top-level Array (__init__.pyi): a lazily-sliceable
    nd-array cell handle with dtype/shape. Numpy-backed here — Spark
    returns array cells as nested lists, which this wraps."""

    def __init__(self, values, dtype: str | None = None):
        import numpy as np

        self._a = np.asarray(values, dtype=dtype)

    @property
    def dtype(self) -> str:
        return str(self._a.dtype)

    @property
    def shape(self) -> tuple:
        return tuple(self._a.shape)

    def __getitem__(self, i):
        out = self._a[i]
        return Array(out) if getattr(out, "ndim", 0) else out

    def __len__(self) -> int:
        return len(self._a)

    def __array__(self, dtype=None):
        import numpy as np

        return np.asarray(self._a, dtype=dtype)

    def __eq__(self, other):
        import numpy as np

        return np.array_equal(self._a, np.asarray(other))

    def __repr__(self) -> str:
        return f"Array(shape={self.shape}, dtype={self.dtype})"

    __str__ = __repr__

"""Per-row tensor/array reductions and predicates (TQL scalar context).

Reference: per-cell reductions reduce over a cell's nd-array, not over
rows — `cpp/nd/functions.hpp` (SUM :95, AVG :149, PROD :103, AMIN :87,
AMAX :79, ANY/ALL/ALL_STRICT :39-63, NONZERO :23), statistics
`cpp/nd/statistics.hpp:8-35`, logical `cpp/nd/logical.hpp:14-18`,
`docs/docs/advanced/tql.md:435-487`.

All are Column expressions over ArrayType — JVM-side, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(arr: Column) -> Column:
    if isinstance(arr, str):
        return F.expr(f"transform({arr}, x -> cast(x as double))")
    return F.transform(arr, lambda x: x.cast("double"))


def asum(arr: Column | str) -> Column:
    """SUM(cell_array) — cpp/nd/functions.hpp:95. A str argument is a
    SQL fragment; the reduction builds as one parsed expr (trap 12)."""
    if isinstance(arr, str):
        return F.expr(f"aggregate(transform({arr}, x -> cast(x as double)), "
                      "cast(0.0 as double), (a, x) -> a + x)")
    return F.aggregate(_dbl(arr), F.lit(0.0), lambda a, x: a + x)


def aprod(arr: Column) -> Column:
    """PROD(cell_array) — cpp/nd/functions.hpp:103."""
    return F.aggregate(_dbl(arr), F.lit(1.0), lambda a, x: a * x)


def aavg(arr: Column) -> Column:
    """AVG/MEAN(cell_array) — cpp/nd/functions.hpp:149."""
    return F.when(F.size(arr) > 0, asum(arr) / F.size(arr))


def amin(arr: Column) -> Column:
    """AMIN — cpp/nd/functions.hpp:87."""
    return F.array_min(arr)


def amax(arr: Column) -> Column:
    """AMAX — cpp/nd/functions.hpp:79."""
    return F.array_max(arr)


def astdev(arr: Column) -> Column:
    """STDEV (population) — cpp/nd/statistics.hpp:24."""
    n = F.size(arr)
    mean = aavg(arr)
    var = F.when(
        n > 0,
        F.aggregate(_dbl(arr), F.lit(0.0), lambda a, x: a + (x - mean) * (x - mean)) / n,
    )
    return F.sqrt(var)


def amedian(arr: Column) -> Column:
    """MEDIAN — cpp/nd/statistics.hpp:30 (midpoint for even length)."""
    s = F.array_sort(_dbl(arr))
    n = F.size(s)
    mid = (n / 2).cast("int")
    odd = F.element_at(s, mid + 1)
    even = (F.element_at(s, mid) + F.element_at(s, mid + 1)) / 2.0
    return F.when(n == 0, F.lit(None).cast("double")).when(n % 2 == 1, odd).otherwise(even)


def any_(cond_arr: Column) -> Column:
    """ANY(bool_array): true if any element true; false on empty —
    cpp/nd/functions.hpp:39."""
    return F.exists(cond_arr, lambda x: x)


def all_(cond_arr: Column) -> Column:
    """ALL(bool_array): vacuously true on empty — cpp/nd/functions.hpp:47."""
    return F.forall(cond_arr, lambda x: x)


def all_strict(cond_arr: Column) -> Column:
    """ALL_STRICT: like ALL but false on empty — cpp/nd/functions.hpp:55,
    tql.md:435-451 (the documented ALL vs ALL_STRICT distinction)."""
    return all_(cond_arr) & (F.size(cond_arr) > 0)


def logical_and(a: Column, b: Column) -> Column:
    """Elementwise LOGICAL_AND — cpp/nd/logical.hpp:14."""
    return F.zip_with(a, b, lambda x, y: x & y)


def logical_or(a: Column, b: Column) -> Column:
    """Elementwise LOGICAL_OR — cpp/nd/logical.hpp:16."""
    return F.zip_with(a, b, lambda x, y: x | y)


def nonzero_count(arr: Column) -> Column:
    """Count of nonzero elements (1-D NONZERO cardinality) —
    cpp/nd/functions.hpp:23, tql.md:419-423."""
    return F.size(F.filter(arr, lambda x: x != 0))


def nonzero_indices(arr: Column) -> Column:
    """Indices (0-based) of nonzero elements."""
    pairs = F.zip_with(
        arr, F.sequence(F.lit(0), F.size(arr) - 1), lambda x, i: F.struct(x.alias("v"), i.alias("i"))
    )
    return F.transform(F.filter(pairs, lambda p: p["v"] != 0), lambda p: p["i"])


def flat(arr2d: Column) -> Column:
    """FLAT — cpp/nd/functions.hpp:127."""
    return F.flatten(arr2d)


def shape2d(arr2d: Column) -> Column:
    """SHAPE of a rectangular 2-D cell (tql.md:408-412); variable-shape
    tensors carry a `shape` sibling column instead (SURVEY §1.4)."""
    return F.array(
        F.size(arr2d).cast("int"),
        F.coalesce(F.size(F.element_at(arr2d, 1)), F.lit(0)).cast("int"),
    )


def _array_slice_sql(arr: str, start: int | None, stop: int | None,
                     step: int = 1) -> str:
    """SQL-fragment twin of `array_slice` for str array / int bounds —
    one F.expr instead of ~40 py4j round trips (trap 12); the parsed
    tree mirrors the Column build node-for-node."""
    n = f"size({arr})"
    if step > 0:
        start_c = str(0 if start is None else int(start))
        stop_c = str(2**31 - 1 if stop is None else int(stop))
        start_n = (f"CASE WHEN {start_c} < 0 THEN greatest({n} + {start_c}, 0) "
                   f"ELSE least({start_c}, {n}) END")
        stop_n = (f"CASE WHEN {stop_c} < 0 THEN greatest({n} + {stop_c}, 0) "
                  f"ELSE least({stop_c}, {n}) END")
        idx = f"sequence({start_n} + 1, {stop_n}, {int(step)})"
        return (f"CASE WHEN {stop_n} > {start_n} THEN "
                f"transform(filter({idx}, i -> i <= {n}), "
                f"i -> element_at({arr}, cast(i as int))) "
                f"ELSE slice({arr}, 1, 0) END")
    if start is None:
        start_n = f"{n} - 1"
    else:
        start_c = str(int(start))
        start_n = (f"least(CASE WHEN {start_c} < 0 THEN {n} + {start_c} "
                   f"ELSE {start_c} END, {n} - 1)")
    if stop is None:
        stop_n = "-1"
    else:
        stop_c = str(int(stop))
        stop_n = (f"greatest(least(CASE WHEN {stop_c} < 0 THEN {n} + {stop_c} "
                  f"ELSE {stop_c} END, {n} - 1), -1)")
    idx0 = f"sequence({start_n}, {stop_n} + 1, {int(step)})"
    return (f"CASE WHEN ({start_n} >= 0) AND ({start_n} >= {stop_n} + 1) THEN "
            f"transform({idx0}, i -> element_at({arr}, cast((i + 1) as int))) "
            f"ELSE slice({arr}, 1, 0) END")


def array_slice(arr: Column | str, start: Column | int | None,
                stop: Column | int | None, step: int = 1) -> Column:
    """Python-style slice col[start:stop:step] with 0-based indexing
    (reference cpp/query_core/expr.hpp:303-318). Negative indexing is
    resolved against the array length (icm/parse_negative_index.hpp).
    `start`/`stop` None take python's STEP-SIGN-dependent defaults
    (a[::-1] reverses; r15 review: the old fixed 0/MAX defaults made
    every negative-step slice an illegal-sequence crash or an empty
    array); `step` must be a python int."""
    if step == 0:
        raise ValueError("slice step cannot be zero")
    if isinstance(arr, str) and not isinstance(start, Column) \
            and not isinstance(stop, Column):
        # SQL-fragment path: whole slice as ONE parsed expr (trap 12);
        # tree identical to the Column build below (canon-pinned)
        return F.expr(_array_slice_sql(arr, start, stop, step))
    n = F.size(arr)
    if step > 0:
        start_c = F.lit(0 if start is None else start) \
            if not isinstance(start, Column) else start
        stop_c = F.lit(2**31 - 1 if stop is None else stop) \
            if not isinstance(stop, Column) else stop
        start_n = F.when(start_c < 0, F.greatest(n + start_c, F.lit(0))) \
            .otherwise(F.least(start_c, n))
        stop_n = F.when(stop_c < 0, F.greatest(n + stop_c, F.lit(0))) \
            .otherwise(F.least(stop_c, n))
        idx = F.sequence(start_n + 1, stop_n, F.lit(step))  # 1-based
        return F.when(
            stop_n > start_n,
            F.transform(
                F.filter(idx, lambda i: i <= n),
                lambda i: F.element_at(arr, i.cast("int"))
            ),
        ).otherwise(F.slice(arr, 1, 0))
    # negative step — python slice.indices() semantics: defaults run
    # from the last element down THROUGH index 0; resolved bounds
    # clamp to [-1, n-1]; emitted indices are start_n, start_n+step,
    # ... strictly greater than stop_n
    if start is None:
        start_n = n - 1
    else:
        start_c = F.lit(start) if not isinstance(start, Column) else start
        start_n = F.least(F.when(start_c < 0, n + start_c)
                          .otherwise(start_c), n - 1)
    if stop is None:
        stop_n = F.lit(-1)
    else:
        stop_c = F.lit(stop) if not isinstance(stop, Column) else stop
        stop_n = F.greatest(
            F.least(F.when(stop_c < 0, n + stop_c).otherwise(stop_c),
                    n - 1),
            F.lit(-1))
    idx0 = F.sequence(start_n, stop_n + 1, F.lit(step))  # 0-based desc
    return F.when(
        (start_n >= F.lit(0)) & (start_n >= stop_n + 1),
        F.transform(idx0, lambda i: F.element_at(arr, (i + 1).cast("int"))),
    ).otherwise(F.slice(arr, 1, 0))


def map_at_depth(col: Column, depth: int, fn) -> Column:
    """Apply `fn` to every element `depth` levels inside a nested array
    — the lowering for multi-dim subscripts (expr.hpp:303-318):
    boxes[:, 0] is map_at_depth(boxes, 1, x -> x[0]). depth 0 is a
    direct call; each level nests one F.transform (JVM HOF, no Python
    in the hot path)."""
    if depth <= 0:
        return fn(col)
    return F.transform(col, lambda x: map_at_depth(x, depth - 1, fn))


def map_at_depth_sql(arr: str, depth: int, fn_sql) -> str:
    """SQL-fragment twin of `map_at_depth` (trap 12): `fn_sql` maps an
    expression STRING to an expression string; each depth level nests
    one `transform` with a uniquely-named lambda variable. One parsed
    expr instead of ~5 py4j round trips per nesting level — the TQL
    multi-dim subscript lowering measured ~1,100 py4j calls per
    translate through the Column spelling (r16)."""
    if depth <= 0:
        return fn_sql(arr)
    v = f"__md{depth}"
    return (f"transform({arr}, {v} -> "
            f"{map_at_depth_sql(v, depth - 1, fn_sql)})")


def element_sql(arr: str, index: int) -> str:
    """SQL-fragment twin of `element` (0-based + negative-from-end)."""
    if index >= 0:
        return f"get({arr}, {int(index)})"
    return f"element_at({arr}, {int(index)})"


def zip_at_depth(a: Column, b: Column, depth: int, fn) -> Column:
    """Element-wise combine of two equally-nested arrays `depth` levels
    deep — the lowering for nd binary broadcasting (a == b, a + b on
    tensors): nested zip_with HOFs, JVM-side."""
    if depth <= 0:
        return fn(a, b)
    if depth == 1:
        return F.zip_with(a, b, lambda x, y: fn(x, y))
    return F.zip_with(a, b, lambda x, y: zip_at_depth(x, y, depth - 1, fn))


def element(arr: Column, index: int) -> Column:
    """col[i] with 0-based + negative indexing (expr.hpp:255-269)."""
    if index >= 0:
        return F.get(arr, index)  # 0-based, null when OOB
    return F.element_at(arr, index)  # negative = from end, 1-based API


def bincount(arr: Column, nbins: int) -> Column:
    """BINCOUNT for small non-negative int cells —
    cpp/nd/statistics.hpp:8."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(nbins - 1)),
        lambda b: F.size(F.filter(arr, lambda x: x == b)),
    )


def histogram(arr: Column, lo: float, hi: float, nbins: int) -> Column:
    """HISTOGRAM with equal-width bins over [lo, hi) —
    cpp/nd/statistics.hpp:11."""
    width = (hi - lo) / nbins
    return F.transform(
        F.sequence(F.lit(0), F.lit(nbins - 1)),
        lambda b: F.size(
            F.filter(
                _dbl(arr),
                lambda x: (x >= lo + b * width) & (x < lo + (b + F.lit(1)) * width),
            )
        ),
    )


def transpose2d(arr2d: Column) -> Column:
    """TRANSPOSE of a rectangular 2-D cell (cpp/nd/functions.hpp:141):
    out[j][i] = in[i][j], pure expression (no UDF)."""
    n_cols = F.coalesce(F.size(F.element_at(arr2d, 1)), F.lit(0))
    return F.transform(
        F.sequence(F.lit(1), n_cols),
        lambda j: F.transform(arr2d, lambda row: F.element_at(row, j.cast("int"))),
    )

"""Vector / embedding functions (TQL built-ins, SURVEY §2.9).

Reference semantics: `COSINE_SIMILARITY`, `DOT`, `L1_NORM/L2_NORM/
LINF_NORM`, `HAMMING_DISTANCE`, `MAXSIM` — reference
`cpp/nd/norm.hpp:20-56`, `cpp/nd/functions.hpp:136`,
`docs/docs/advanced/tql.md:93-136`.

All 1-D functions are pure Column expressions built from higher-order
functions (`zip_with`/`aggregate`/`transform`), so they run inside
whole-stage codegen on the JVM — no Python in the hot path and they
vectorize over a 1000-executor scan exactly like built-ins.

Accumulation discipline: elements are cast to DOUBLE before arithmetic
and folded sequentially (Spark's `aggregate` is a left fold), which
makes results deterministic and lets the DuckDB oracle reproduce them
bit-for-bit with the same double left-fold.

MAXSIM operates on per-row matrices (array<array<float>>) — that is
genuinely beyond HOF ergonomics, so it is an Arrow-batched pandas UDF
(the reference's own `is_batch` fast path, `cpp/tql/tql.hpp:179-204`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


# --- SQL-fragment twins -------------------------------------------------
# Every 1-D function below accepts Column | str: a str is a SQL
# fragment (column name or sub-expression) and the whole expression
# builds as ONE F.expr — ~1 py4j round trip instead of ~10-40 for the
# chained-Column/lambda build (CLAUDE.md trap 12; construction is a
# DRIVER cost paid per bench-timed q.fn call). The parsed tree is
# IDENTICAL to the Column build (canonical-optimized-plan equality
# pinned in tests/test_functions.py::test_vector_sql_twins_match), so
# plan shape, codegen and results cannot drift between the two paths.

def _to_double_sql(arr: str) -> str:
    return f"transform({arr}, x -> cast(x as double))"


def _dot_sql(a: str, b: str) -> str:
    return (f"aggregate(zip_with({_to_double_sql(a)}, {_to_double_sql(b)}, "
            "(x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)")


def _l1_norm_sql(a: str) -> str:
    return (f"aggregate({_to_double_sql(a)}, cast(0.0 as double), "
            "(acc, x) -> acc + abs(x))")


def _l2_norm_sq_sql(a: str) -> str:
    return (f"aggregate({_to_double_sql(a)}, cast(0.0 as double), "
            "(acc, x) -> acc + x * x)")


def _l2_norm_sql(a: str) -> str:
    return f"sqrt({_l2_norm_sq_sql(a)})"


def _linf_norm_sql(a: str) -> str:
    return (f"aggregate({_to_double_sql(a)}, cast(0.0 as double), "
            "(acc, x) -> greatest(acc, abs(x)))")


def _cosine_similarity_sql(a: str, b: str) -> str:
    return (f"{_dot_sql(a, b)} / nullif({_l2_norm_sql(a)} * "
            f"{_l2_norm_sql(b)}, cast(0.0 as double))")


def _hamming_distance_sql(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, "
            "(x, y) -> cast(x != y as bigint)), cast(0 as bigint), "
            "(acc, x) -> acc + x)")


def _sign_bits_sql(a: str) -> str:
    return f"transform({a}, x -> cast(x >= 0 as int))"


def literal_vec_sql(vec) -> str:
    """SQL fragment for a literal double array — one parse instead of
    ~2 py4j round trips per element (a 64-dim query vector costs ~130
    calls as F.array(*[F.lit(x) ...]))."""
    vals = [float(v) for v in vec]
    if any(v != v or v in (float("inf"), float("-inf")) for v in vals):
        raise ValueError("non-finite value in literal vector")
    return "array(" + ", ".join(f"cast({v!r} as double)" for v in vals) + ")"


def _to_double(arr: Column) -> Column:
    if isinstance(arr, str):
        return F.expr(_to_double_sql(arr))
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """DOT(a, b) — reference cpp/nd/functions.hpp:136."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b))
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l1_norm(a: Column | str) -> Column:
    """L1_NORM — reference cpp/nd/norm.hpp:20."""
    if isinstance(a, str):
        return F.expr(_l1_norm_sql(a))
    return F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + F.abs(x))


def l2_norm_sq(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(_l2_norm_sq_sql(a))
    return F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + x * x)


def l2_norm(a: Column | str) -> Column:
    """L2_NORM — reference cpp/nd/norm.hpp:25."""
    if isinstance(a, str):
        return F.expr(_l2_norm_sql(a))
    return F.sqrt(l2_norm_sq(a))


def linf_norm(a: Column | str) -> Column:
    """LINF_NORM — reference cpp/nd/norm.hpp:30."""
    if isinstance(a, str):
        return F.expr(_linf_norm_sql(a))
    return F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """COSINE_SIMILARITY — reference cpp/nd/norm.hpp:35, tql.md:93-96.

    dot/(||a||*||b||), all double. NULL-safe via nullif on zero norms
    (ANSI mode would otherwise raise divide-by-zero).
    """
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_cosine_similarity_sql(a, b))
    denom = l2_norm(a) * l2_norm(b)
    return dot(a, b) / F.nullif(denom, F.lit(0.0))


def hamming_distance(a: Column | str, b: Column | str) -> Column:
    """HAMMING_DISTANCE — element-wise inequality count (cpp/nd/norm.hpp:40)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_hamming_distance_sql(a, b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x != y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sign_bits(a: Column | str) -> Column:
    """Binary quantization: sign bit per dimension (reference
    `nd::quantize`, cpp/nd/norm.hpp:50; types.pyi BinaryQuantization)."""
    if isinstance(a, str):
        return F.expr(_sign_bits_sql(a))
    return F.transform(a, lambda x: (x >= 0).cast("int"))


def maxsim_pandas():
    """MAXSIM(doc_matrix, query_matrix) — ColBERT late interaction
    (reference cpp/nd/norm.hpp:42-49, tql.md:114-136).

    sum over query rows of (max over doc rows of cosine similarity).
    Returns an Arrow-batched pandas UDF: per-row matrices are ragged
    numpy, which HOF expressions cannot express efficiently.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def maxsim(doc: pd.Series, query: pd.Series) -> pd.Series:
        out = np.empty(len(doc))
        for i, (d, q) in enumerate(zip(doc, query)):
            dm = np.asarray([np.asarray(r, dtype=np.float64) for r in d])
            qm = np.asarray([np.asarray(r, dtype=np.float64) for r in q])
            if dm.size == 0 or qm.size == 0:
                out[i] = 0.0
                continue
            dn = dm / np.maximum(np.linalg.norm(dm, axis=1, keepdims=True), 1e-30)
            qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
            out[i] = (qn @ dn.T).max(axis=1).sum()
        return pd.Series(out)

    return maxsim


def maxsim_pandas_const(query_matrix):
    """MAXSIM against a FIXED query matrix captured in the UDF closure.

    The two-column form with a literal query side pays twice: one
    codegen constant per matrix cell (a 4x64 query is a 256-node
    expression tree to compile) and a per-row Arrow transfer of the
    identical matrix. Closing over the normalized numpy matrix makes
    the UDF unary — the query ships once per executor with the
    serialized function."""
    from pyspark.sql.functions import pandas_udf

    qm = np.asarray(query_matrix, dtype=np.float64)
    qn = (qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
          if qm.size else qm)

    @pandas_udf("double")
    def maxsim1(doc: pd.Series) -> pd.Series:
        out = np.empty(len(doc))
        for i, d in enumerate(doc):
            dm = np.asarray([np.asarray(r, dtype=np.float64) for r in d])
            if dm.size == 0 or qn.size == 0:
                out[i] = 0.0
                continue
            dn = dm / np.maximum(np.linalg.norm(dm, axis=1, keepdims=True), 1e-30)
            out[i] = (qn @ dn.T).max(axis=1).sum()
        return pd.Series(out)

    return maxsim1


def route_clusters_pandas(centroids, cluster_ids, eff_nprobe: int):
    """Per-query IVF coarse routing against a FIXED centroid matrix
    captured in the UDF closure (the maxsim_pandas_const convention):
    array of the ``eff_nprobe`` nearest cluster ids by squared L2,
    ties by cluster id ascending — the exact ranking `ivf_search`
    computes driver-side, with the same numpy ops.

    This is the vectorized twin of the retired interpreted SQL-fold
    routing spelling: that expression evaluated O(n_clusters * dim)
    lambda steps PER QUERY ROW (fine for a handful of queries;
    measured ~26 s for a 2k-query batch at nlist=160 and linear in
    nlist from there — the round-13 knn-ladder finding), while this
    UDF routes the same batch in well under a second and is flat to
    1k+ clusters. One spelling serves both the batch and streaming
    lanes (their equivalence is test-pinned). The closure carries only
    numpy data + universally-importable libs (CLAUDE.md trap 23)."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray([list(c) for c in centroids], dtype=np.float64)
    cids = np.asarray([int(c) for c in cluster_ids], dtype=np.int64)
    npb = int(eff_nprobe)

    @pandas_udf("array<int>")
    def route(qv: pd.Series) -> pd.Series:
        out = []
        for v in qv:
            if v is None:  # null query vector routes nowhere (the old
                out.append([])  # SQL spelling's explode-of-null drop)
                continue
            q = np.asarray(v, dtype=np.float64)
            d2 = ((C - q) ** 2).sum(axis=1)
            sel = np.lexsort((cids, d2))[:npb]
            out.append([int(x) for x in cids[sel]])
        return pd.Series(out)

    return route


def pq_encode_pandas(codebooks: list):
    """Product-quantization encoder closing over the codebooks
    ([m][ksub][sub_dim] floats): Arrow-batched, vectorized argmin per
    subspace. Encode is the build/ingest path — an executor-parallel
    linear scan, never run at query time (the probe is a pure JVM ADC
    expression over the stored codes)."""
    from pyspark.sql.functions import pandas_udf

    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    sub_dim = cbs[0].shape[1]

    @pandas_udf("struct<code: array<int>, anorm: double>")
    def encode(vecs: pd.Series) -> pd.DataFrame:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        n = mat.shape[0]
        codes = np.empty((n, len(cbs)), dtype=np.int32)
        anorm = np.zeros(n)
        for j, cb in enumerate(cbs):
            sub = mat[:, j * sub_dim:(j + 1) * sub_dim]
            # ||x - c||^2 argmin == argmin(||c||^2 - 2 x.c)
            d = (cb * cb).sum(axis=1)[None, :] - 2.0 * (sub @ cb.T)
            codes[:, j] = d.argmin(axis=1)
            anorm += (cb[codes[:, j]] * cb[codes[:, j]]).sum(axis=1)
        return pd.DataFrame({"code": list(codes), "anorm": anorm})

    return encode

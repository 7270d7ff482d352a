"""TQL built-in function library (SURVEY §2.9) as Spark Column exprs.

`TQL_FUNCTIONS` is the case-insensitive registry the TQL translator
binds against (reference registry upper-cases names —
cpp/query_core/expr.hpp:549-561).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from deeplake_spark.functions import arrays, text, vector
from deeplake_spark.functions.arrays import (
    aavg,
    all_,
    all_strict,
    amax,
    amedian,
    amin,
    any_,
    aprod,
    astdev,
    asum,
    bincount,
    element,
    flat,
    histogram,
    logical_and,
    logical_or,
    nonzero_count,
    nonzero_indices,
    shape2d,
    transpose2d,
)
from deeplake_spark.functions.text import (
    contains_keyword,
    fingerprint,
    glob_like,
    glob_to_rlike,
    predict_lang,
    quality_score,
    token_count,
    tokenize,
    word_shingles,
)
from deeplake_spark.functions.vector import (
    cosine_similarity,
    dot,
    hamming_distance,
    l1_norm,
    l2_norm,
    linf_norm,
    maxsim_pandas,
    maxsim_pandas_const,
    sign_bits,
)

#: TQL name (upper) → callable producing a Column. Unary/binary arity
#: mirrors the reference's nd function registry.
TQL_FUNCTIONS = {
    "SUM": asum,
    "AVG": aavg,
    "MEAN": aavg,
    "PROD": aprod,
    "AMIN": amin,
    "AMAX": amax,
    "STDEV": astdev,
    "MEDIAN": amedian,
    "ANY": any_,
    "ALL": all_,
    "ALL_STRICT": all_strict,
    "LOGICAL_AND": logical_and,
    "LOGICAL_OR": logical_or,
    "NONZERO": nonzero_indices,
    "FLAT": flat,
    "TRANSPOSE": transpose2d,
    "SHAPE": shape2d,
    "SQRT": F.sqrt,
    "ABS": F.abs,
    "COSINE_SIMILARITY": cosine_similarity,
    "DOT": dot,
    "L1_NORM": l1_norm,
    "L2_NORM": l2_norm,
    "LINF_NORM": linf_norm,
    "HAMMING_DISTANCE": hamming_distance,
    # exact ColBERT late interaction (nd/norm.hpp:42-56, tql.md:114-136);
    # ORDER BY MAXSIM ... LIMIT k with a registered pooled index routes
    # through the 2-stage index probe instead (translator._try_ann_route)
    "MAXSIM": lambda doc, qm: maxsim_pandas()(doc, qm),
    "KEYS": F.json_object_keys,
    "RANDOM": F.rand,
}

__all__ = [
    "TQL_FUNCTIONS",
    "arrays",
    "text",
    "vector",
    # array
    "asum", "aavg", "aprod", "amin", "amax", "astdev", "amedian",
    "any_", "all_", "all_strict", "logical_and", "logical_or",
    "nonzero_count", "nonzero_indices", "flat", "shape2d", "element", "transpose2d",
    "bincount", "histogram",
    # text
    "tokenize", "token_count", "word_shingles", "predict_lang",
    "quality_score", "fingerprint", "contains_keyword", "glob_like",
    "glob_to_rlike",
    # vector
    "cosine_similarity", "dot", "l1_norm", "l2_norm", "linf_norm",
    "hamming_distance", "maxsim_pandas", "maxsim_pandas_const", "sign_bits",
]

"""Property-based tests (hypothesis): TQL dialect primitives checked
against independent reference implementations — glob translation vs
fnmatch, python-slice semantics vs Python, lexer/parser robustness
(random input either parses or raises TQLSyntaxError, never crashes)."""

from __future__ import annotations

import fnmatch
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from deeplake_spark.functions.text import glob_to_rlike
from deeplake_spark.tql.lexer import TQLSyntaxError
from deeplake_spark.tql.parser import parse_query

_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=20
)


@given(pattern=_text, value=_text)
@settings(max_examples=300, deadline=None)
def test_glob_matches_fnmatch(pattern, value):
    """Our glob→regex translation must agree with fnmatch for patterns
    without character classes (TQL glob has only * and ?)."""
    if "[" in pattern or "]" in pattern:
        return  # TQL glob has no [] classes; fnmatch treats them specially
    rx = glob_to_rlike(pattern)
    ours = re.fullmatch(rx[1:-1], value) is not None  # strip our ^$ anchors
    theirs = fnmatch.fnmatchcase(value, pattern)
    assert ours == theirs, (pattern, value, rx)


@given(
    arr=st.lists(st.integers(-100, 100), max_size=12),
    start=st.integers(-15, 15),
    stop=st.integers(-15, 15),
)
@settings(max_examples=60, deadline=None)
def test_array_slice_matches_python(spark_global, arr, start, stop):
    """col[a:b] must equal Python list slicing (step=1)."""
    from pyspark.sql import functions as F

    from deeplake_spark.functions.arrays import array_slice

    spark = spark_global
    df = spark.createDataFrame([(arr,)], "a: array<int>")
    got = df.select(array_slice(F.col("a"), start, stop).alias("s")).head().s
    assert list(got) == arr[start:stop], (arr, start, stop)


@given(q=st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_parser_never_crashes(q):
    """Arbitrary input: parse_query either succeeds or raises
    TQLSyntaxError/ValueError — never an unhandled exception."""
    try:
        parse_query(q)
    except (TQLSyntaxError, ValueError):
        pass


@given(
    toks=st.lists(st.sampled_from(["a", "bb", "ccc", "dd"]), min_size=0, max_size=10),
    n=st.integers(1, 4),
)
@settings(max_examples=40, deadline=None)
def test_shingles_match_python(spark_global, toks, n):
    from pyspark.sql import functions as F

    from deeplake_spark.functions.text import word_shingles

    spark = spark_global
    df = spark.createDataFrame([(toks,)], "t: array<string>")
    got = list(df.select(word_shingles(F.col("t"), n).alias("s")).head().s)
    expected = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    assert got == expected, (toks, n)

"""Every registered query with an oracle must match DuckDB exactly —
this is a local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from deeplake_spark.queries import load_all
from tests.oracle import assert_matches_oracle

REGISTRY = load_all()
WITH_ORACLE = [name for name, q in sorted(REGISTRY.items()) if q.oracle]
ROWS_ONLY = [name for name, q in sorted(REGISTRY.items()) if q.oracle is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    q = REGISTRY[name]
    assert_matches_oracle(q.fn(spark, sf_dir), q.oracle, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

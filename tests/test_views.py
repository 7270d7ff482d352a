"""DatasetView chaining (reference __init__.pyi:2279-2620):
ds.query() results are themselves queryable, sliceable, iterable, and
remain DataFrame drop-ins for everything else."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from deeplake_spark import DatasetView
from deeplake_spark import dataset as dl
from deeplake_spark import types as dt


@pytest.fixture(scope="module")
def ds(spark):
    with tempfile.TemporaryDirectory() as d:
        ds = dl.create(d + "/ds", spark, schema={
            "text": dt.Text(), "score": dt.Generic("float64"),
        })
        ds.append([{"text": f"doc {i} {'spark' if i % 2 else 'flink'}",
                    "score": float(i)} for i in range(10)])
        ds.commit("seed")
        yield ds


def test_query_returns_chainable_view(ds):
    v1 = ds.query("SELECT text, score WHERE score >= 2")
    assert isinstance(v1, DatasetView)
    v2 = v1.query("SELECT text, score WHERE CONTAINS(text, 'spark') ORDER BY score")
    assert isinstance(v2, DatasetView)
    assert [r.score for r in v2.collect()] == [3.0, 5.0, 7.0, 9.0]
    # one composed plan: the chained filters both reach the same scan
    assert len(v2) == 4


def test_view_is_dataframe_dropin(ds):
    v = ds.query("SELECT text, score WHERE score < 3")
    assert v.count() == 3  # delegated DataFrame method
    assert set(v.columns) == {"text", "score", "_row_id"} or set(v.columns) == {"text", "score"}
    assert v.schema == v.df.schema


def test_view_offset_slice_column_access(ds):
    v = ds.query("SELECT text, score ORDER BY score")
    row = v[0]
    assert row.score == 0.0
    sub = v[2:5]
    assert [r.score for r in sub.collect()] == [2.0, 3.0, 4.0]
    picked = v[[1, 4]]
    assert sorted(r.score for r in picked.collect()) == [1.0, 4.0]
    col = v["score"]
    assert [r.score for r in col.collect()][:3] == [0.0, 1.0, 2.0]
    with pytest.raises(IndexError):
        v[99]


def test_view_without_row_id_uses_view_order(ds):
    # a view that lost _row_id: offsets follow the view's own order
    v = DatasetView(ds.query("SELECT score ORDER BY score DESC").df.select("score"))
    assert "_row_id" not in v.columns
    assert v[0].score == 9.0 and len(v) == 10
    assert [r.score for r in v][:3] == [9.0, 8.0, 7.0]


def test_view_iter_and_batches(ds):
    v = ds.query("SELECT score WHERE score < 4 ORDER BY score")
    assert [r.score for r in v] == [0.0, 1.0, 2.0, 3.0]
    b = list(v.batches(3))
    assert [len(x) for x in b] == [3, 1]
    assert list(v.batches(3, drop_last=True))[0][0].score == 0.0


def test_view_tag_and_summary(ds):
    v = ds.query("SELECT text WHERE score > 8")
    v.tag("from-view")
    assert "from-view" in ds.tags()
    assert v.summary() is not None
    bare = DatasetView(v.df)
    with pytest.raises(dl.DatasetError):
        bare.tag("nope")


def test_chained_view_keeps_index_acceleration(ds, spark):
    from deeplake_spark.operators.indexes import MAX_SELECTIVITY_KEY

    ds.create_index("text", "inverted")
    # 'spark' hits half this tiny fixture — lift the selectivity gate;
    # this test pins CHAINING, the gate has its own tests
    spark.conf.set(MAX_SELECTIVITY_KEY, "1.0")
    try:
        v = ds.query("SELECT text, score, _row_id WHERE score >= 0")
        routed = v.query("SELECT text WHERE CONTAINS(text, 'spark')")
        plan = routed.df._jdf.queryExecution().optimizedPlan().toString()
        # posting-list semijoin present => rewrite survived the chain
        assert "LeftSemi" in plan
        assert routed.count() == 5
    finally:
        spark.conf.unset(MAX_SELECTIVITY_KEY)
        ds.drop_index("text")


def test_view_pickles_as_recipe(ds):
    """reference DatasetView.__getstate__/__setstate__: a chained view
    pickles as (dataset ref, query chain) and re-binds on unpickle —
    same rows, no collected data inside the pickle. Raw-frame views
    refuse with a clear error."""
    import pickle

    v = ds.query("SELECT text, score WHERE score >= 2").query(
        "SELECT text, score WHERE CONTAINS(text, 'spark') ORDER BY score")
    blob = pickle.dumps(v)
    assert len(blob) < 2000                    # a recipe, not rows
    v2 = pickle.loads(blob)
    assert [r.score for r in v2.collect()] == [r.score for r in v.collect()]
    assert v2._dataset.read_only               # workers get read-only binds

    raw = DatasetView(ds.query("SELECT score").df.select("score"))
    with pytest.raises(TypeError):
        pickle.dumps(raw)

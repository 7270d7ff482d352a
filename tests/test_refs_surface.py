"""Reference handle-object surface: Branch/Branches (__init__.pyi:
883-1060), Tag/Tags (1062-1204), Schema/ColumnDefinition (1231-1262,
4070+). The dict payloads keep the engine's historical return shapes
(tests elsewhere compare against plain dicts) while ``[name]`` upgrades
to reference-shaped handles."""

import pickle

import pytest
from pyspark.sql import types as T

import deeplake_spark as dl


@pytest.fixture()
def ds(spark, tmp_path):
    d = dl.create(str(tmp_path / "refds"), spark=spark)
    d.add_column("text", "text")
    d.append([{"text": "alpha"}, {"text": "beta"}])
    d.commit("init")
    return d


def test_branches_collection(ds):
    ds.branch("dev")
    br = ds.branches()
    assert br == {"main": ds.version, "dev": ds.version}  # dict payload
    assert set(br.names()) == {"main", "dev"}
    handle = br["dev"]
    assert isinstance(handle, dl.Branch)
    assert handle.name == handle.id == "dev"
    assert handle.version == ds.version
    assert handle.timestamp is not None
    opened = handle.open()
    assert opened.current_branch == "dev" and len(opened) == 2
    handle.rename("feature")
    assert "feature" in ds.branches() and "dev" not in ds.branches()
    ds.branches()["feature"].delete()
    assert "feature" not in ds.branches()
    with pytest.raises(dl.BranchNotFoundError):
        ds.branches()["nope"]


def test_rename_branch_guards(ds):
    with pytest.raises(dl.DatasetError):
        ds.rename_branch("main", "trunk")
    ds.branch("a")
    ds.branch("b")
    with pytest.raises(dl.BranchExistsError):
        ds.rename_branch("a", "b")
    with pytest.raises(dl.BranchNotFoundError):
        ds.rename_branch("zzz", "w")


def test_tags_collection(ds):
    ds.tag("v1", "first release")
    tags = ds.tags()
    assert "v1" in tags and tags.names() == ["v1"]
    t = tags["v1"]
    assert isinstance(t, dl.Tag)
    assert t.name == t.id == "v1"
    assert t.message == "first release"
    assert t.version == ds.version
    assert t.timestamp is not None
    assert len(t.open()) == 2  # read-only view at the tagged version
    t.rename("release")
    assert "release" in ds.tags() and "v1" not in ds.tags()
    ds.tags()["release"].delete()
    assert ds.tags() == {}


def test_schema_columns_and_equality(ds):
    sch = ds.schema
    assert isinstance(sch, dl.Schema) and isinstance(sch, T.StructType)
    names = [c.name for c in sch.columns]
    assert names == [f.name for f in sch.fields] and "text" in names
    col = [c for c in sch.columns if c.name == "text"][0]
    assert isinstance(col, dl.ColumnDefinition)
    assert col.dtype == T.StringType()
    # equality ignores the dataset binding, both directions
    plain = T.StructType(list(sch.fields))
    assert sch == plain and plain == sch
    other = dl.open(ds.path, spark=ds.spark)
    assert ds.schema == other.schema
    # pickling degrades to a plain StructType (no SparkSession dragged in)
    assert pickle.loads(pickle.dumps(sch)) == plain


def test_column_definition_drop_rename(ds):
    ds.add_column("extra", "int64")
    [c] = [c for c in ds.schema.columns if c.name == "extra"]
    c.rename("renamed")
    assert "renamed" in [f.name for f in ds.schema.fields]
    [c2] = [c for c in ds.schema.columns if c.name == "renamed"]
    c2.drop()
    assert "renamed" not in [f.name for f in ds.schema.fields]

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


def test_row_handles_and_iteration(ds):
    """Reference Row/RowView shape (__init__.pyi:1951-2283): ds[i] is a
    mutable Row (getitem/attr/to_dict/row_id/async accessors), writes
    stage through ds.update, and Dataset/DatasetView iterate row
    handles in offset order."""
    from deeplake_spark.dataset import Row, RowView

    row = ds[0]
    assert isinstance(row, Row)
    assert row.row_id == 0 and row["text"] == "alpha" == row.text
    assert row.to_dict() == {"text": "alpha"}          # no _row_id
    assert row.asDict()["_row_id"] == 0                # legacy spelling
    assert row.get_bytes("text") == b"alpha"
    assert row.get_async("text").result() == "alpha"

    row["text"] = "alpha2"                              # staged write
    assert ds[0]["text"] == "alpha2"                    # read-your-write
    ds.commit("edit")
    assert dl.open(ds.path, spark=ds.spark)[0].text == "alpha2"

    texts = [r.text for r in ds]                        # Dataset.__iter__
    assert texts == ["alpha2", "beta"]
    assert all(isinstance(r, Row) for r in ds)

    view = ds.query("SELECT * ORDER BY text")
    vrows = list(view)
    assert all(isinstance(r, RowView) for r in vrows)
    assert [r.text for r in vrows] == ["alpha2", "beta"]
    assert not hasattr(vrows[0], "__setitem__") or not isinstance(
        vrows[0], Row)                                  # views stay read-only


def test_auto_commit_time_based(ds):
    """auto_commit_enabled (__init__.pyi:3036-3050): staged mutations
    older than the interval commit at the next write; disabled leaves
    everything staged for the explicit commit."""
    v0 = ds.version
    ds.auto_commit_interval_s = 0.0                     # fire immediately
    ds.append([{"text": "c"}])
    ds.append([{"text": "d"}])                          # triggers the check
    assert ds.version > v0                              # auto-committed
    assert ds._staged_files == []

    ds.auto_commit_enabled = False
    v1 = ds.version
    ds.append([{"text": "e"}])
    ds.append([{"text": "f"}])
    assert ds.version == v1 and ds._staged_files        # still staged
    ds.commit("manual")
    assert ds.version > v1


def test_column_handles(ds):
    """Reference Column/ColumnView shape (__init__.pyi:1391-1800):
    offset addressing, batch load/update, async/bytes accessors, bound
    index management, and DataFrame delegation for legacy callers."""
    from deeplake_spark.dataset import Column

    col = ds["text"]
    assert isinstance(col, Column) and col.name == "text"
    assert len(col) == len(ds)
    first = col[0]
    assert col[0:2] == [first, col[1]]
    assert col[[1, 0]] == [col[1], first]          # list keeps asked order
    assert col.load_batch(0, 2) == col[0:2]
    assert col.get_bytes(0) == str(first).encode()
    assert col.get_async(0).result() == first
    assert col.columns == ["text", "_row_id"]      # legacy delegation

    col[0] = "patched"                             # staged cell update
    assert ds["text"][0] == "patched"
    col.update_batch(0, ["a0", "a1"])
    ds.commit("col edits")
    assert dl.open(ds.path, spark=ds.spark)["text"][0:2] == ["a0", "a1"]

    assert col.indexes == []
    col.create_index("inverted")
    assert ds["text"].indexes == ["inverted"]
    ds["text"].drop_index()
    assert ds["text"].indexes == []

    import pytest as _pytest

    with _pytest.raises(KeyError):
        ds["nope"]

    view = ds.query("SELECT text ORDER BY text")
    vcol = view["text"]
    assert vcol[0] == sorted(ds["text"][0:100])[0]  # view-order offsets

    import numpy as np

    payloads = ds["text"].encode([np.zeros((2, 2, 3), dtype="uint8"), b"raw"])
    assert payloads[0].startswith(b"P6\n2 2\n255\n") and payloads[1] == b"raw"


def test_reference_export_surface_complete():
    """Every public name in the reference's package __all__
    (/root/reference/python/deeplake/__init__.pyi) resolves on
    deeplake_spark — handles, errors, config objects, submodules."""
    import re

    pyi = __import__("pathlib").Path(
        "/root/reference/python/deeplake/__init__.pyi").read_text()
    ref_all = set(re.findall(
        r'"(\w+)"', re.search(r"__all__ = \[(.*?)\]", pyi, re.S).group(1)))
    missing = sorted(n for n in ref_all
                     if not n.startswith("_") and not hasattr(dl, n))
    assert missing == [], f"reference exports missing: {missing}"


def test_parity_handles_functional(ds, spark):
    """The round-5 parity additions behave, not just import: Executor,
    Future, Metadata write-through, History, RowRange, schemas
    templates, global RNG seed, core value types."""
    import deeplake_spark as dls

    # Executor: prepared statement, callable + run_single/run_batch
    ex = dls.tql.prepare("SELECT * WHERE text == ?", spark=spark,
                         default=ds.to_df())
    assert isinstance(ex, dls.Executor)
    assert ex.get_query_string().startswith("SELECT")
    assert ex.run_single("alpha").count() == ex("alpha").count() == 1
    assert [d.count() for d in ex.run_batch([["alpha"], ["beta"]])] == [1, 1]
    fut = ex.run_single_async("alpha")
    assert isinstance(fut, dls.Future)
    assert fut.result().count() == 1 and fut.is_completed()

    # Metadata write-through + ReadOnlyMetadata guard
    ds.metadata["team"] = "data"
    assert dls.open(ds.path, spark=spark).metadata["team"] == "data"
    ro = dls.ReadOnlyMetadata({"a": 1})
    with pytest.raises(TypeError):
        ro["b"] = 2

    # History: list of versions, oldest first
    h = ds.history()
    assert isinstance(h, dls.History) and isinstance(h, list)
    assert [v.id for v in h] == sorted(v.id for v in h)

    # RowRange: iterable/indexable handle that still collect()s
    rr = ds[0:2]
    assert isinstance(rr, dls.RowRange)
    assert len(rr) == 2 and rr[0].text == ds[0].text
    assert [r.row_id for r in rr] == [0, 1]
    assert len(rr.collect()) == 2            # legacy DataFrame delegation

    # schemas templates are create()-compatible mappings
    t = dls.schemas.TextEmbeddings(8)
    assert {"id", "text_chunk", "embedding"} <= set(t)
    assert isinstance(t, dls.schemas.SchemaTemplate)

    # global seed control: same draw under the same global seed
    from deeplake_spark.operators.sampling import sample_by_weight

    from pyspark.sql import functions as F

    df = spark.range(100).select(F.col("id"), F.lit(1.0).alias("w"))
    dls.random.seed = 123
    try:
        a = {r.id for r in sample_by_weight(df, F.col("w"), 5).collect()}
        b = {r.id for r in sample_by_weight(df, F.col("w"), 5).collect()}
        assert a == b
    finally:
        dls.random.seed = None

    # core value types
    d = dls.core.Dict({"k": [1, 2]})
    assert d == {"k": [1, 2]} and d.to_dict() == {"k": [1, 2]}
    im = dls.core.IndexMapping64([3, 1, 2])
    assert list(im) == [3, 1, 2] and im[0] == 3 and len(im) == 3
    assert dls.core.MemoryBuffer(b"xy") == b"xy"
    assert dls.IndexBuildConfig.fast().build_multiplier == 0.5


def test_column_encode_jpeg(ds, spark):
    """Column.encode with a jpg-codec Image column produces real
    baseline JPEG that the decode path round-trips."""
    import numpy as np

    from deeplake_spark import types as dt
    from deeplake_spark.operators.multimodal import _decode_one

    ds.add_column("image", dt.Image("uint8", sample_compression="jpg"))
    col = ds["image"]
    img = np.clip(np.add.outer(np.arange(16) * 3, np.arange(24) * 2), 0, 255)
    img = np.stack([img, img + 10, 200 - img], axis=-1).astype("uint8")
    [payload] = col.encode([img])
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    out = _decode_one(payload, "jpg", strict=True)
    assert out.shape == img.shape
    assert float(abs(out.astype(int) - img.astype(int)).mean()) <= 4


def test_column_encode_mjpeg_avi(ds, spark):
    """Column.encode with an avi-codec Video column produces a real
    MJPEG AVI clip that the video decode path frame-samples exactly."""
    import numpy as np

    from deeplake_spark import types as dt
    from deeplake_spark.operators._jpeg import decode_baseline, encode_baseline
    from deeplake_spark.operators.multimodal import _decode_video_frames_avi

    ds.add_column("clip", dt.Video(sample_compression="avi"))
    col = ds["clip"]
    base = np.clip(np.add.outer(np.arange(16) * 3, np.arange(24) * 2), 0, 255)
    frames = [np.stack([base + 5 * t, base, 200 - base], axis=-1)
              .astype("uint8") for t in range(4)]
    [payload] = col.encode([np.stack(frames)])
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    got = _decode_video_frames_avi(payload, every_n=1)
    assert [i for i, _ in got] == [0, 1, 2, 3]
    for i, fr in got:
        want = decode_baseline(encode_baseline(frames[i], subsampling="420"))
        assert np.array_equal(fr, want)

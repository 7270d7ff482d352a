"""Reference exception-taxonomy parity (python/deeplake/__init__.pyi:
3792-3990): typed exceptions are raised at the same API sites a
reference user would catch them, every one remains catchable as the
engine's historical DatasetError, and the stdlib dual-bases hold where
this engine previously raised ValueError/NotImplementedError."""

import pytest

import deeplake_spark as dl
from deeplake_spark import exceptions as ex


@pytest.fixture()
def ds(spark, tmp_path):
    d = dl.create(str(tmp_path / "exds"), spark=spark)
    d.add_column("text", "text")
    d.add_column("n", "int64")
    d.append([{"text": "alpha", "n": 1}, {"text": "beta", "n": 2}])
    d.commit("init")
    return d


def test_every_taxonomy_member_is_dataset_error():
    for name in ex.__all__:
        cls = getattr(ex, name)
        assert issubclass(cls, ex.DatasetError), name


def test_reference_names_present_at_package_level():
    # the reference-user catch surface (pyi:3792-3990 subset that maps
    # to engine-reachable failures)
    for name in (
        "ColumnAlreadyExistsError", "ColumnDoesNotExistError",
        "EmptyColumnNameError", "InvalidColumnValueError",
        "ColumnMissingAppendValueError", "UnevenColumnsError",
        "BranchExistsError", "BranchNotFoundError",
        "CannotDeleteMainBranchError", "TagExistsError",
        "TagNotFoundError", "VersionNotFoundError",
        "IndexAlreadyExistsError", "InvalidIndexCreationError",
        "ReadOnlyDatasetModificationError", "NotFoundError",
        "LogExistsError", "LogNotexistsError", "PushError",
        "FormatNotSupportedError", "UnknownFormat", "UnknownType",
        "UnsupportedChunkCompression", "StorageProviderMissingError",
    ):
        assert hasattr(dl, name), name


def test_column_errors(ds):
    with pytest.raises(dl.ColumnAlreadyExistsError):
        ds.add_column("text", "text")
    with pytest.raises(dl.EmptyColumnNameError):
        ds.add_column("", "text")
    with pytest.raises(dl.ColumnDoesNotExistError):
        ds.remove_column("nope")
    with pytest.raises(dl.ColumnDoesNotExistError):
        ds.rename_column("nope", "x")
    with pytest.raises(dl.ColumnAlreadyExistsError):
        ds.rename_column("text", "n")
    with pytest.raises(dl.ColumnDoesNotExistError):
        ds.get_column_metadata("nope")
    with pytest.raises(dl.ColumnDoesNotExistError):
        ds.set_column_metadata("nope", {"k": 1})
    with pytest.raises(dl.UnevenColumnsError):
        ds.append({"text": ["a", "b"], "n": [1]})


def test_branch_tag_version_errors(ds, spark):
    ds.branch("dev")
    with pytest.raises(dl.BranchExistsError):
        ds.branch("dev")
    with pytest.raises(dl.BranchNotFoundError):
        dl.open(ds.path, branch="nope", spark=spark)
    with pytest.raises(dl.CannotDeleteMainBranchError):
        ds.delete_branch("main")
    ds.tag("v1")
    with pytest.raises(dl.TagExistsError):
        ds.tag("v1")
    with pytest.raises(dl.TagNotFoundError):
        ds.open_tag("nope")
    with pytest.raises(dl.TagNotFoundError):
        ds.delete_tag("nope")
    with pytest.raises(dl.VersionNotFoundError):
        ds.checkout(999)


def test_index_errors(ds):
    with pytest.raises(dl.ColumnDoesNotExistError):
        ds.create_index("nope", "inverted")
    with pytest.raises(dl.InvalidIndexCreationError):
        ds.create_index("text", "no-such-kind")
    ds.create_index("text", "inverted")
    with pytest.raises(dl.IndexAlreadyExistsError):
        ds.create_index("text", "inverted")
    ds.drop_index("text")
    ds.create_index("text", "inverted")  # works again after drop


def test_read_only_and_open_errors(ds, spark, tmp_path):
    ro = dl.open_read_only(ds.path, spark=spark)
    with pytest.raises(dl.ReadOnlyDatasetModificationError):
        ro.append([{"text": "x", "n": 3}])
    with pytest.raises(dl.NotFoundError):
        dl.open(str(tmp_path / "missing"), spark=spark)
    with pytest.raises(dl.DatasetError):  # catch-all still works
        dl.open(str(tmp_path / "missing"), spark=spark)


def test_logging_errors(ds):
    with pytest.raises(dl.LogNotexistsError):
        ds.stop_logging()
    ds.start_logging()
    with pytest.raises(dl.LogExistsError):
        ds.start_logging()
    ds.stop_logging()


def test_stdlib_dual_bases_for_legacy_pins(ds):
    # sites that raised ValueError/NotImplementedError before the
    # taxonomy keep satisfying those pins
    with pytest.raises(ValueError):
        dl.types.dtype_to_spark("not-a-dtype")
    with pytest.raises(dl.UnknownType):
        dl.types.dtype_to_spark("not-a-dtype")
    from deeplake_spark.operators.multimodal import _decode_one, _module_available

    if not _module_available("PIL"):
        with pytest.raises(NotImplementedError):
            _decode_one(b"\xff\xd8\xff\xe0fakejpeg", "jpg", strict=True)
        with pytest.raises(dl.FormatNotSupportedError):
            _decode_one(b"\xff\xd8\xff\xe0fakejpeg", "jpg", strict=True)
    with pytest.raises(ValueError):
        dl.formats.Chunk(None, "no-such-codec")
    with pytest.raises(dl.UnsupportedChunkCompression):
        dl.formats.Chunk(None, "no-such-codec")


def test_append_missing_required_column(spark, tmp_path):
    import pyspark.sql.types as T

    d = dl.create(str(tmp_path / "reqds"), spark=spark)
    schema = T.StructType([
        T.StructField("_row_id", T.LongType(), False),
        T.StructField("must", T.StringType(), False),
    ])
    d._commit_entry(schema=schema, message="schema")
    with pytest.raises(dl.ColumnMissingAppendValueError):
        d.append([{"other": 1}])

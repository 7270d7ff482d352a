"""Deeplake type system → Spark SQL types (SURVEY §1.3/§1.4).

Primitive dtypes mirror `cpp/nd/dtype.hpp:25-43` /
`python/deeplake/types.pyi:488-536`; semantic htypes mirror the
`TypeKind` enum (`types.pyi:343-385`). Each htype resolves to a Spark
`DataType` plus StructField metadata carrying the semantic kind, so a
round trip keeps ML semantics (the reference stores them as column
metadata too — heimdall/column_view.hpp:42-120).

Documented deviations (SURVEY hard-parts list): uint64 → LongType
(overflow caveat), float16/bfloat16 → FloatType (widening).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# --- primitive dtypes (types.pyi:488-536) ----------------------------------

_PRIMITIVES: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "uint8": T.ShortType(),     # widened
    "uint16": T.IntegerType(),  # widened
    "uint32": T.LongType(),     # widened
    "uint64": T.LongType(),     # overflow caveat documented
    "float16": T.FloatType(),   # widened
    "bfloat16": T.FloatType(),  # widened
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "string": T.StringType(),
    "text": T.StringType(),
    "bytes": T.BinaryType(),
    "byte": T.BinaryType(),
    "object": T.StringType(),   # JSON-encoded dict
}


def dtype_to_spark(name: str) -> T.DataType:
    try:
        return _PRIMITIVES[name.lower()]
    except KeyError:
        from deeplake_spark.exceptions import UnknownType

        raise UnknownType(f"unknown dtype {name!r}") from None


# --- semantic htypes (types.pyi:343-385) -----------------------------------


@dataclass
class DLType:
    """A deeplake column type: semantic kind + resolved Spark type +
    metadata (index hints, compression, shape constraints)."""

    kind: str
    spark_type: T.DataType
    metadata: dict = field(default_factory=dict)

    def field(self, name: str, nullable: bool = True) -> T.StructField:
        return T.StructField(name, self.spark_type, nullable, metadata={"dl": {"kind": self.kind, **self.metadata}})


def Generic(dtype: str = "float32") -> DLType:
    return DLType("generic", dtype_to_spark(dtype))


def Text(index_type: str | None = None, chunk_compression: str | None = None) -> DLType:
    """types.pyi:538-578 — Inverted/BM25/Exact index hints kept as metadata."""
    md = {}
    if index_type:
        md["index_type"] = index_type
    return DLType("text", T.StringType(), md)


def Dict(index_type: str | None = None) -> DLType:
    """Per-row arbitrary JSON (types.pyi:634-667) → JSON string column."""
    return DLType("dict", T.StringType(), {"json": True})


def Embedding(size: int | None = None, dtype: str = "float32",
              index_type: str | None = None) -> DLType:
    """types.pyi:669-705 — 1-D vector; `size` enforced on append."""
    md: dict = {}
    if size:
        md["size"] = size
    if index_type:
        md["index_type"] = index_type
    return DLType("embedding", T.ArrayType(dtype_to_spark(dtype)), md)


def Array(dtype: str, dimensions: int | None = None, shape: list[int] | None = None) -> DLType:
    """types.pyi:413-454 — nd array as nested ArrayType by rank."""
    rank = dimensions or (len(shape) if shape else 1)
    t: T.DataType = dtype_to_spark(dtype)
    for _ in range(rank):
        t = T.ArrayType(t)
    md: dict = {"rank": rank}
    if shape:
        md["shape"] = shape
    return DLType("array", t, md)


def Sequence(nested: DLType) -> DLType:
    """types.pyi:983-1009 — ordered list of any type (video = seq of images)."""
    return DLType("sequence", T.ArrayType(nested.spark_type), {"inner": nested.kind})


def Image(dtype: str = "uint8", sample_compression: str = "png") -> DLType:
    """types.pyi:1011-1036 — compressed payload + decode-on-read UDF
    (multimodal module); shape lives in a sibling column by convention."""
    return DLType("image", T.BinaryType(), {"compression": sample_compression, "dtype": dtype})


def Audio(dtype: str = "uint8", sample_compression: str = "mp3") -> DLType:
    return DLType("audio", T.BinaryType(), {"compression": sample_compression})


def Video(sample_compression: str = "mp4") -> DLType:
    return DLType("video", T.BinaryType(), {"compression": sample_compression})


def Medical(compression: str = "dcm") -> DLType:
    return DLType("medical", T.BinaryType(), {"compression": compression})


def Mesh(compression: str = "ply") -> DLType:
    return DLType("mesh", T.BinaryType(), {"compression": compression})


def BoundingBox(dtype: str = "float32", fmt: str = "ltwh", bbox_type: str = "pixel") -> DLType:
    """types.pyi:1221-1246 — Nx4 boxes + format metadata."""
    return DLType(
        "bbox", T.ArrayType(T.ArrayType(dtype_to_spark(dtype))), {"format": fmt, "bbox_type": bbox_type}
    )


def BinaryMask(sample_compression: str = "lz4") -> DLType:
    return DLType("binary_mask", T.BinaryType(), {"compression": sample_compression})


def SegmentMask(dtype: str = "uint8", sample_compression: str = "lz4") -> DLType:
    return DLType("segment_mask", T.BinaryType(), {"compression": sample_compression})


def Polygon(dtype: str = "float32") -> DLType:
    return DLType("polygon", T.ArrayType(T.ArrayType(dtype_to_spark(dtype))), {})


def Point(dimensions: int = 2, dtype: str = "float32") -> DLType:
    return DLType("point", T.ArrayType(dtype_to_spark(dtype)), {"dimensions": dimensions})


def ClassLabel(dtype: str = "int32", class_names: list[str] | None = None) -> DLType:
    """types.pyi:1122-1219 — int codes; class_names in metadata."""
    md = {"class_names": class_names} if class_names else {}
    return DLType("class_label", T.ArrayType(dtype_to_spark(dtype)), md)


def Link(inner: DLType | None = None) -> DLType:
    """types.pyi:1038-1058 — URL reference to an external blob."""
    return DLType("link", T.StringType(), {"inner": inner.kind if inner else None})


def Struct(fields: dict[str, DLType]) -> DLType:
    return DLType(
        "struct",
        T.StructType([v.field(k) for k, v in fields.items()]),
        {},
    )


def Nullable(inner: DLType) -> DLType:
    """types.pyi:1363-1367 — nullability marker (Spark fields are
    nullable by default; kept for API parity)."""
    return DLType(inner.kind, inner.spark_type, {**inner.metadata, "nullable": True})


# --- schema templates (python/deeplake/schemas.pyi:11-131) -----------------


def TextEmbeddings(embedding_size: int, quantize: bool = False) -> dict[str, DLType]:
    """schemas.pyi:19 — id/date/text/embedding template; timestamps are
    stored as uint64 in the reference (no native timestamp type)."""
    return {
        "id": Generic("uint64"),
        "date_created": Generic("uint64"),
        "text_chunk": Text(),
        "embedding": Embedding(embedding_size, index_type="clustered_quantized" if quantize else None),
    }


def COCOImages(embeddings: bool = False, objects: bool = True) -> dict[str, DLType]:
    """schemas.pyi:60-131 — COCO detection schema template."""
    schema: dict[str, DLType] = {
        "image": Image("uint8", "jpg"),
    }
    if objects:
        schema["categories"] = ClassLabel("int32")
        schema["boxes"] = BoundingBox("float32", "ltwh", "pixel")
    if embeddings:
        schema["embedding"] = Embedding(768)
    return schema


class QuantizationType:
    """reference types.QuantizationType (types.pyi): embedding index
    quantization kinds. String-valued so the engine's index_type
    metadata compares directly."""

    Binary = "binary"
    __members__ = {"Binary": Binary}


# ---------------------------------------------------------------------------
# Reference types-module surface parity (`python/deeplake/types.pyi`):
# string-valued index/type enums (the engine stores these strings in
# column metadata, so reference constants compare directly), scalar
# dtype factories, and the index wrapper classes.


class IndexType:
    """types.pyi IndexType enum — index kinds (string-valued: the
    engine's index registry stores these names)."""

    BM25 = "bm25"
    Inverted = "inverted"
    Exact = "exact"
    Clustered = "clustered"
    ClusteredQuantized = "clustered_quantized"
    PooledQuantized = "pooled_quantized"
    Attributes = "attributes"
    __members__ = {
        "BM25": BM25, "Inverted": Inverted, "Exact": Exact,
        "Clustered": Clustered, "ClusteredQuantized": ClusteredQuantized,
        "PooledQuantized": PooledQuantized, "Attributes": Attributes,
    }


#: module-level index constants (types.pyi: `BM25: IndexType.BM25` etc.)
BM25 = IndexType.BM25
Inverted = IndexType.Inverted
Exact = IndexType.Exact
Clustered = IndexType.Clustered
ClusteredQuantized = IndexType.ClusteredQuantized
PooledQuantized = IndexType.PooledQuantized
Binary = QuantizationType.Binary


class TypeKind:
    """types.pyi TypeKind enum — semantic column kinds; values match
    DLType.kind strings."""

    Generic = "generic"
    Text = "text"
    Dict = "dict"
    Embedding = "embedding"
    Sequence = "sequence"
    Image = "image"
    Audio = "audio"
    Video = "video"
    Medical = "medical"
    Mesh = "mesh"
    BoundingBox = "bounding_box"
    BinaryMask = "binary_mask"
    SegmentMask = "segment_mask"
    Polygon = "polygon"
    Point = "point"
    ClassLabel = "class_label"
    Link = "link"
    Struct = "struct"
    Nullable = "nullable"
    __members__ = {k: v for k, v in vars().items() if not k.startswith("_")}


class Index:
    """types.pyi Index — base wrapper naming an index kind."""

    def __init__(self, type):  # noqa: A002 - reference parameter name
        self.type = str(type)

    def __eq__(self, other) -> bool:
        return str(getattr(other, "type", other)) == self.type

    def __hash__(self) -> int:
        return hash(self.type)

    def __str__(self) -> str:
        return self.type

    __repr__ = __str__


class TextIndex(Index):
    """Text-column index request (inverted / bm25 / exact)."""


class JsonIndex(Index):
    """JSON-path index request."""


class NumericIndex(Index):
    """Numeric range/IN index request."""


class EmbeddingIndexType(Index):
    """Embedding index request (clustered / quantized / pq)."""


class EmbeddingsMatrixIndexType(Index):
    """Matrix-embedding (MAXSIM) index request."""


def EmbeddingIndex(type=None):  # noqa: A002 - reference parameter name
    """types.pyi EmbeddingIndex(type) → EmbeddingIndexType."""
    return EmbeddingIndexType(type or IndexType.Clustered)


def EmbeddingsMatrixIndex():
    """types.pyi EmbeddingsMatrixIndex() — the pooled MAXSIM index."""
    return EmbeddingsMatrixIndexType(IndexType.PooledQuantized)


#: reference class names for the column-type objects: DataType is the
#: pure data type, Type the full column type — one class here
DataType = DLType
Type = DLType


def _scalar(dtype: str):
    def make(index_type=None) -> DLType:
        md = {"index_type": str(index_type)} if index_type else {}
        return DLType("generic", dtype_to_spark(dtype), md)

    make.__name__ = dtype.capitalize()
    make.__doc__ = f"types.pyi scalar factory — {dtype} column."
    return make


Float16 = _scalar("float16")
Float32 = _scalar("float32")
Float64 = _scalar("float64")
Int8 = _scalar("int8")
Int16 = _scalar("int16")
Int32 = _scalar("int32")
Int64 = _scalar("int64")
UInt8 = _scalar("uint8")
UInt16 = _scalar("uint16")
UInt32 = _scalar("uint32")
UInt64 = _scalar("uint64")


def Bool() -> DLType:
    """types.pyi Bool() — boolean column."""
    return DLType("generic", T.BooleanType())


def Bytes() -> DLType:
    """types.pyi Bytes() — raw binary column."""
    return DLType("generic", T.BinaryType())

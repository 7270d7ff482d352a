"""Datafile format surface — mirrors ``deeplake.formats``.

Reference: ``python/deeplake/formats.pyi:1-22`` (``DataFormat`` base +
``Chunk(sample_compression, chunk_compression)`` factory) backed by
``cpp/deeplake_core/datafile_format.hpp:16-33`` (chunk/chunk_v1/video
variants with per-sample and per-chunk codecs).

Spark mapping: the engine stores datasets as Parquet, so the two codec
knobs map onto the two places Parquet actually compresses:

- ``chunk_compression`` — whole-datafile codec → the Parquet page/file
  codec (``spark.write.option("compression", ...)``). Parquet supports
  the same codec family the reference's chunk store does (lz4, zstd,
  gzip/deflate, snappy, brotli, none).
- ``sample_compression`` — per-value codec (png/jpeg/mp3/...) → recorded
  as column metadata; binary cells keep their native encoding and the
  multimodal decode operators (operators/multimodal.py) interpret it.
  Parquet never re-encodes the bytes, matching the reference's
  "sample stays in its source compression" behavior.
"""

from __future__ import annotations

__all__ = ["Chunk", "DataFormat"]

#: chunk-level codecs the reference accepts → Spark parquet codec names.
_PARQUET_CODECS = {
    None: None,  # engine default (snappy)
    "": None,
    "none": "uncompressed",
    "null": "uncompressed",
    "uncompressed": "uncompressed",
    "lz4": "lz4",
    "zstd": "zstd",
    "gzip": "gzip",
    "deflate": "gzip",
    "snappy": "snappy",
    "brotli": "brotli",
}


class DataFormat:
    """Base class for all datafile formats (formats.pyi:5-10)."""

    kind = "base"

    def __str__(self) -> str:  # pragma: no cover - trivial
        return self.kind

    def __repr__(self) -> str:
        return str(self)


class _ChunkFormat(DataFormat):
    kind = "chunk"

    def __init__(self, sample_compression: str | None, chunk_compression: str | None):
        sc = (sample_compression or None)
        cc = (chunk_compression or None)
        key = cc.lower() if isinstance(cc, str) else cc
        if key not in _PARQUET_CODECS:
            from deeplake_spark.exceptions import UnsupportedChunkCompression

            raise UnsupportedChunkCompression(
                f"unsupported chunk_compression {chunk_compression!r}; "
                f"one of {sorted(k for k in _PARQUET_CODECS if k)}"
            )
        self.sample_compression = sc.lower() if isinstance(sc, str) else sc
        self.chunk_compression = key

    def parquet_codec(self) -> str | None:
        """Spark parquet codec for this format, or None for engine default."""
        return _PARQUET_CODECS[self.chunk_compression]

    def to_json(self) -> dict:
        return {
            "kind": self.kind,
            "sample_compression": self.sample_compression,
            "chunk_compression": self.chunk_compression,
        }

    @classmethod
    def from_json(cls, obj: dict) -> "_ChunkFormat":
        return cls(obj.get("sample_compression"), obj.get("chunk_compression"))

    def __str__(self) -> str:
        return (f"chunk(sample_compression={self.sample_compression}, "
                f"chunk_compression={self.chunk_compression})")

    def __eq__(self, other) -> bool:
        return (isinstance(other, _ChunkFormat)
                and self.to_json() == other.to_json())


def Chunk(sample_compression: str | None = None,
          chunk_compression: str | None = None) -> DataFormat:
    """Configure a "chunk" datafile format (formats.pyi:12-22)."""
    return _ChunkFormat(sample_compression, chunk_compression)


def from_json(obj: dict | None) -> DataFormat | None:
    if not obj:
        return None
    if obj.get("kind") == "chunk":
        return _ChunkFormat.from_json(obj)
    from deeplake_spark.exceptions import UnknownFormat

    raise UnknownFormat(f"unknown data format {obj.get('kind')!r}")

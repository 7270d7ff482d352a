"""Prebuilt schema templates (reference `python/deeplake/schemas.pyi`):
`deeplake.schemas.TextEmbeddings / COCOImages / SchemaTemplate`. The
field factories live in types.py (where the engine grew them first);
this module gives them the reference's import location and wraps the
returned mapping in SchemaTemplate so the documented customization
flow (`schema["x"] = ...; schema.pop("embedding")`) round-trips.
"""

from __future__ import annotations

from deeplake_spark import types as _types

__all__ = ["TextEmbeddings", "COCOImages", "SchemaTemplate"]


class SchemaTemplate(dict):
    """reference schemas.SchemaTemplate: a mutable column-name →
    column-type mapping accepted by `create(schema=...)`. A dict
    subclass — rename via pop/insert, add/remove fields freely."""

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"SchemaTemplate({dict.__repr__(self)})"


def TextEmbeddings(embedding_size: int, quantize: bool = False) -> SchemaTemplate:
    """schemas.pyi:10-58 — embedded-text store template (id /
    chunk_index / document_id / date_created / text_chunk / embedding;
    `quantize=True` requests the quantized embedding index)."""
    t = _types.TextEmbeddings(embedding_size, quantize=quantize)
    t.setdefault("chunk_index", _types.Generic("uint16"))
    t.setdefault("document_id", _types.Generic("uint64"))
    return SchemaTemplate(t)


def COCOImages(embedding_size: int = 768, quantize: bool = False,
               objects: bool = True, keypoints: bool = False,
               stuffs: bool = False) -> SchemaTemplate:
    """schemas.pyi:60-131 — COCO image-store template; the optional
    object/keypoint/stuff field groups mirror the reference flags."""
    t = _types.COCOImages(embeddings=True, objects=objects)
    t["embedding"] = _types.Embedding(
        embedding_size,
        index_type="clustered_quantized" if quantize else None)
    t.setdefault("id", _types.Generic("uint64"))
    t.setdefault("url", _types.Text())
    if keypoints:
        t["keypoints_bbox"] = _types.BoundingBox("float32", "ltwh", "pixel")
        t["keypoints"] = _types.Array("uint32", dimensions=2)
        t["keypoints_skeleton"] = _types.Array("uint16", dimensions=2)
    if stuffs:
        t["stuffs_bbox"] = _types.BoundingBox("float32", "ltwh", "pixel")
        t["stuffs_classes"] = _types.SegmentMask("uint8")
    return SchemaTemplate(t)

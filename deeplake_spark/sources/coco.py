"""COCO ingestion: annotations JSON → columnar dataset (reference
`python/deeplake/ingestion/coco/ingest_coco.py` — images + per-image
category/bbox/mask columns from the COCO instance format).

Spark-first shape: the annotation file is read as JSON into DataFrames,
annotations are grouped per image (ordered collect), and the result is
a deeplake_spark Dataset with ClassLabel/BoundingBox-typed columns.
Image payloads stay `Link` URLs (lazy fetch) — the reference ingests
blob refs the same way; decoding is the multimodal module's job.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_coco_annotations(spark: SparkSession, annotations_path: str) -> dict[str, DataFrame]:
    """Parse a COCO instances JSON into (images, annotations, categories)
    DataFrames. The top-level file is a single JSON object, so it is
    parsed driver-side and parallelized — annotation lists are the big
    part and become distributed rows immediately."""
    with open(annotations_path) as f:
        doc = json.load(f)
    images = spark.createDataFrame(
        [
            (int(i["id"]), i.get("file_name", ""), int(i.get("width", 0)), int(i.get("height", 0)))
            for i in doc.get("images", [])
        ],
        "image_id long, file_name string, width int, height int",
    )
    annotations = spark.createDataFrame(
        [
            (
                int(a["id"]),
                int(a["image_id"]),
                int(a["category_id"]),
                [float(x) for x in a.get("bbox", [])],
                float(a.get("area", 0.0)),
                int(a.get("iscrowd", 0)),
            )
            for a in doc.get("annotations", [])
        ],
        "ann_id long, image_id long, category_id int, bbox array<float>, area double, iscrowd int",
    )
    categories = spark.createDataFrame(
        [(int(c["id"]), c.get("name", "")) for c in doc.get("categories", [])],
        "category_id int, name string",
    )
    return {"images": images, "annotations": annotations, "categories": categories}


def coco_to_rows(tables: dict[str, DataFrame]) -> DataFrame:
    """images ⋈ grouped annotations → one row per image with parallel
    `categories` / `boxes` arrays (ordered by annotation id, mirroring
    the reference's per-image tensor layout)."""
    ann = tables["annotations"]
    grouped = (
        ann.groupBy("image_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ann_id", "category_id", "bbox", "area", "iscrowd"))
            ).alias("__anns")
        )
        .select(
            "image_id",
            F.transform("__anns", lambda a: a["category_id"]).alias("categories"),
            F.transform("__anns", lambda a: a["bbox"]).alias("boxes"),
            F.transform("__anns", lambda a: a["area"]).alias("areas"),
        )
    )
    return (
        tables["images"]
        .join(grouped, "image_id", "left")
        .select(
            "image_id",
            F.col("file_name").alias("image"),  # Link htype: URL reference
            "width",
            "height",
            F.coalesce("categories", F.array().cast("array<int>")).alias("categories"),
            F.coalesce("boxes", F.array().cast("array<array<float>>")).alias("boxes"),
            F.coalesce("areas", F.array().cast("array<double>")).alias("areas"),
        )
    )


def ingest_coco(spark: SparkSession, annotations_path: str, dataset_path: str):
    """deeplake.ingest_coco equivalent: annotations → versioned Dataset
    with class-name metadata from the categories table."""
    from deeplake_spark import dataset as dl
    from deeplake_spark.io import with_row_id

    tables = read_coco_annotations(spark, annotations_path)
    rows = coco_to_rows(tables)
    rows = with_row_id(rows, order_by="image_id", col_name="_row_id")
    rows = rows.select("_row_id", *[c for c in rows.columns if c != "_row_id"])
    ds = dl.create(dataset_path, spark)
    ds._pending_schema = rows.schema
    ds._staged_files.append(ds._write_file(rows))
    ds.commit("ingest_coco " + annotations_path)
    # class_names metadata (ClassLabel semantics, types.pyi:1122-1219)
    names = [r.name for r in tables["categories"].orderBy("category_id").collect()]
    refs_entry = ds._entry
    refs_entry["metadata"]["class_names"] = names
    ds._commit_entry(message="class_names metadata")
    return ds

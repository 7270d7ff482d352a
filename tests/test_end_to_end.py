"""End-to-end pipeline: the composed user story a reference user would
run — ingest → version → index → TQL search → dedup → weighted sample →
train-feed export. Each stage feeds the next; one test, whole surface."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from deeplake_spark import dataset as dl
from deeplake_spark import tql
from deeplake_spark.io import load_table


def test_full_pipeline(spark, sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        # 1. ingest an external parquet corpus as a versioned dataset
        ds = dl.from_parquet(f"{sf_dir}/documents.parquet", tmp + "/corpus", spark)
        v1 = ds.version
        n0 = len(ds)
        assert n0 > 0

        # 2. append new docs, commit — time travel must still see v1
        ds.append([
            {"_row_id": 0, "doc_id": 10_000 + i,
             "text": f"freshly appended spark pipeline doc {i}",
             "lang": "en", "source": "ingest2", "n_chars": 40}
            for i in range(5)
        ])
        v2 = ds.commit("second ingest")
        assert len(ds) == n0 + 5
        assert len(ds.checkout(v1)) == n0

        # 3. build a text index; TQL CONTAINS routes through it
        ds.create_index("text")
        hits = ds.query("SELECT doc_id WHERE CONTAINS(text, 'pipeline') ORDER BY doc_id")
        got = [r.doc_id for r in hits.collect()]
        assert set(range(10_000, 10_005)) <= set(got)

        # 4. dedup: the appended docs are mutually near-duplicates
        from deeplake_spark.operators.dedup import jaccard_pairs

        pairs = jaccard_pairs(ds.to_df(), threshold=0.5)
        dup_ids = {r.a for r in pairs.collect()} | {r.b for r in pairs.collect()}
        assert set(range(10_000, 10_005)) <= dup_ids

        # 5. weighted sample favoring long docs
        from deeplake_spark.operators.sampling import sample_by_weight

        sample = sample_by_weight(ds.to_df(), F.col("n_chars").cast("double"), 50, seed=11)
        assert sample.count() == 50

        # 6. train-feed export: ordered batches through the prefetcher
        from deeplake_spark.streaming.feed import AsyncPrefetcher, iter_batches

        total = sum(len(b) for b in AsyncPrefetcher(iter_batches(sample, 16)))
        assert total == 50

        # 7. replicate the whole history to a linked copy
        ds.push(tmp + "/mirror")
        mirror = dl.open(tmp + "/mirror", spark)
        assert len(mirror) == n0 + 5 and mirror.version == ds.version


def test_translator_error_messages(spark, sf_dir):
    """Unknown names and malformed inputs must raise the front-end's
    typed errors (parser utilities surface, tql.hpp:134-162) — not
    opaque Py4J failures."""
    from deeplake_spark.tql import TQLTranslationError
    from deeplake_spark.tql.lexer import TQLSyntaxError

    d = load_table(spark, sf_dir, "documents")
    with pytest.raises(TQLTranslationError):
        tql.query("SELECT doc_id FROM nowhere_table")  # no spark/tables binding
    with pytest.raises(TQLTranslationError):
        tql.query("SELECT doc_id WHERE lang == ?", default=d)  # missing param
    with pytest.raises((TQLSyntaxError, ValueError)):
        tql.query("SELECT WHERE FROM", default=d)
    with pytest.raises(TQLTranslationError):
        tql.query("SELECT doc_id GROUP BY doc_id + 1", default=d)  # expr key
    with pytest.raises(TQLTranslationError):
        tql.query("SELECT doc_id", default=None)  # no bound dataset

"""Index-backed search tests: every index probe must return exactly
the same rows as the scan-based predicate it replaces (the reference's
index tests compare index vs executor paths —
py_tests/test_text_search.py style), plus save/load round trips."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from deeplake_spark.functions.text import contains_keyword
from deeplake_spark.io import load_table
from deeplake_spark.operators.indexes import (
    bm25_via_index,
    build_exact_index,
    build_inverted_index,
    build_json_index,
    build_numeric_index,
    contains_via_index,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def inv(docs):
    return build_inverted_index(docs)


def test_contains_probe_matches_scan(spark, docs, inv):
    via_index = sorted(r.doc_id for r in contains_via_index(docs, inv, "spark").collect())
    via_scan = sorted(
        r.doc_id for r in docs.filter(contains_keyword(F.col("text"), "spark")).collect()
    )
    assert via_index == via_scan and len(via_index) > 0


def test_probe_all_mode(docs, inv):
    both = sorted(r.row_id for r in inv.probe(["spark", "join"], mode="all").collect())
    scan = sorted(
        r.doc_id
        for r in docs.filter(
            contains_keyword(F.col("text"), "spark") & contains_keyword(F.col("text"), "join")
        ).collect()
    )
    assert both == scan


def test_bm25_via_index_matches_direct(spark, sf_dir, docs, inv):
    from deeplake_spark.queries.text_ops import bm25_scores

    via_index = bm25_via_index(inv, ["spark", "join", "vector"], k=15).collect()
    direct = (
        bm25_scores(docs, ["spark", "join", "vector"])
        .select(F.col("doc_id").alias("row_id"), F.round("bm25", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "row_id")
        .limit(15)
        .collect()
    )
    assert [(r.row_id, r.bm25) for r in via_index] == [(r.row_id, r.bm25) for r in direct]


def test_inverted_save_load(spark, docs, inv):
    from deeplake_spark.operators.indexes import InvertedIndex

    with tempfile.TemporaryDirectory() as d:
        inv.save(d)
        loaded = InvertedIndex.load(spark, d)
        a = sorted(r.row_id for r in loaded.probe(["spark"]).collect())
        b = sorted(r.row_id for r in inv.probe(["spark"]).collect())
        assert a == b
        # partition-pruned layout on disk: term buckets
        import os

        assert any(f.startswith("bucket=") for f in os.listdir(os.path.join(d, "postings")))


def test_numeric_index(spark, docs):
    idx = build_numeric_index(docs, "n_chars")
    got = sorted(r.row_id for r in idx.probe_between(100, 200).collect())
    exp = sorted(r.doc_id for r in docs.filter(F.col("n_chars").between(100, 200)).collect())
    assert got == exp


def test_json_index(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    idx = build_json_index(ev, "props", ["k"])
    got = sorted(r.row_id for r in idx.probe("k", 7).collect())
    exp = sorted(
        r.event_id
        for r in ev.filter(F.get_json_object("props", "$.k") == "7").collect()
    )
    assert got == exp


def test_exact_index(spark, docs):
    some_text = docs.filter(F.col("doc_id") == 3).head().text
    idx = build_exact_index(docs, "text")
    got = {r.row_id for r in idx.probe(some_text).collect()}
    exp = {r.doc_id for r in docs.filter(F.col("text") == some_text).collect()}
    assert got == exp and 3 in got


def test_dataset_create_index_and_tql_rewrite(spark, sf_dir):
    """End-to-end: ds.create_index → TQL CONTAINS routes through the
    posting semijoin and matches the scan path."""
    import tempfile

    from deeplake_spark import dataset as dl

    with tempfile.TemporaryDirectory() as d:
        ds = dl.from_parquet(f"{sf_dir}/documents.parquet", d + "/ds", spark)
        scan = {r.doc_id for r in ds.query("SELECT doc_id WHERE CONTAINS(text, 'spark')").collect()}
        ds.create_index("text", "inverted")
        via = ds.query("SELECT doc_id WHERE CONTAINS(text, 'spark')")
        assert {r.doc_id for r in via.collect()} == scan
        # plan proof: the rewrite produced a semijoin, not a tokenize scan
        from deeplake_spark.plans.explain import explain_query

        assert "Join" in explain_query(via).text
        ds.drop_index("text")
        assert {r.doc_id for r in ds.query("SELECT doc_id WHERE CONTAINS(text, 'spark')").collect()} == scan


def test_numeric_and_json_index_rewrites(spark, sf_dir):
    """Translator routes BETWEEN/IN through a numeric index and
    json_col['path'] == lit through a JSON index; results must equal
    the scan path."""
    from deeplake_spark import tql
    from deeplake_spark.operators.indexes import build_json_index, build_numeric_index

    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    nidx = build_numeric_index(docs, "n_chars", id_col="doc_id")
    jidx = build_json_index(ev, "props", ["k"], id_col="event_id")
    indexes = {
        "n_chars": ("numeric", nidx, "doc_id"),
        "props": ("json", jidx, "event_id"),
    }

    between = tql.query(
        "SELECT doc_id WHERE n_chars BETWEEN 100 AND 200", default=docs, indexes=indexes
    )
    scan_b = docs.filter(F.col("n_chars").between(100, 200))
    assert sorted(r.doc_id for r in between.collect()) == sorted(
        r.doc_id for r in scan_b.collect()
    )

    inq = tql.query(
        "SELECT doc_id WHERE n_chars IN (128, 200, 305)", default=docs, indexes=indexes
    )
    scan_i = docs.filter(F.col("n_chars").isin(128, 200, 305))
    assert inq.count() == scan_i.count()

    jq = tql.query(
        "SELECT event_id WHERE props['k'] == '7'", default=ev, indexes=indexes
    )
    scan_j = ev.filter(F.get_json_object("props", "$.k") == "7")
    assert sorted(r.event_id for r in jq.collect()) == sorted(
        r.event_id for r in scan_j.collect()
    )
    # plan proof: probes are joins, not raw filters
    from deeplake_spark.plans.explain import explain_query

    assert "Join" in explain_query(jq).text


def test_ivf_save_load_partition_pruning(spark, sf_dir):
    """Persisted IVF: cluster-partitioned layout; a probe's scan reads
    only the probed cluster partitions (partition pruning in the plan)."""
    import os
    import tempfile

    from deeplake_spark.operators.similarity import (
        SearchConfig, build_ivf, ivf_search, load_ivf, save_ivf,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = list(e.filter(F.col("vec_id") == 0).head().embedding)
    idx = build_ivf(e, n_clusters=8, seed=42)
    with tempfile.TemporaryDirectory() as d:
        save_ivf(idx, d + "/ivf")
        assert any(
            f.startswith("cluster=") for f in os.listdir(d + "/ivf/assignments")
        )
        loaded = load_ivf(spark, d + "/ivf")
        a = [r.vec_id for r in ivf_search(loaded, q, k=10, config=SearchConfig.balanced()).collect()]
        b = [r.vec_id for r in ivf_search(idx, q, k=10, config=SearchConfig.balanced()).collect()]
        assert a == b
        # partition pruning: the pruned scan's PartitionFilters hit `cluster`
        from deeplake_spark.plans.explain import explain_query

        rep = explain_query(ivf_search(loaded, q, k=10, config=SearchConfig.balanced()))
        assert "cluster" in rep.text and "PartitionFilters" in rep.text


def test_dataset_clustered_index_search(spark, sf_dir):
    import tempfile

    from deeplake_spark import dataset as dl
    from deeplake_spark.operators.similarity import SearchConfig

    with tempfile.TemporaryDirectory() as d:
        ds = dl.from_parquet(f"{sf_dir}/embeddings.parquet", d + "/ds", spark)
        q = list(ds[0].embedding)
        exact = [r._row_id for r in ds.search("embedding", q, k=10).collect()]
        ds.create_index("embedding", "clustered")
        approx = [r._row_id for r in
                  ds.search("embedding", q, k=10, config=SearchConfig.high_accuracy()).collect()]
        recall = len(set(exact) & set(approx)) / 10
        assert recall >= 0.9, f"recall {recall}"

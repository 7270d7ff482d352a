"""Docs-as-tests: every ```python block in TQL.md must execute —
adopting the reference's executable-doc-snippet strategy
(docs/docs/advanced/tql.md hidden test-context blocks, SURVEY §5.5).
The test provides the context the snippets assume (spark, dataset,
named tables), mirroring the reference's `<!-- test-context -->`."""

from __future__ import annotations

import re
import tempfile

import pytest

from deeplake_spark.io import load_table


def _python_blocks(path: str) -> list[str]:
    text = open(path).read()
    return re.findall(r"```python\n(.*?)```", text, re.S)


def test_tql_md_snippets_run(spark, sf_dir):
    blocks = _python_blocks("/root/repo/TQL.md")
    assert blocks, "TQL.md must contain python snippets"
    with tempfile.TemporaryDirectory() as tmp:
        import deeplake_spark as dls
        from deeplake_spark import dataset as dl

        # test-context: a real dataset + named tables for the snippets.
        # The index-routing snippets need embedding + doc_matrix columns
        # and query params, so the dataset is documents ⋈ embeddings.
        from pyspark.sql import functions as F

        docs = load_table(spark, sf_dir, "documents")
        emb = load_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("doc_id"), "embedding")
        src = docs.join(emb, "doc_id").withColumn(
            "doc_matrix", F.array("embedding"))
        src.write.parquet(tmp + "/src")
        ds = dl.from_parquet(tmp + "/src", tmp + "/ds", spark)
        qvec = [float(v) for v in emb.head()["embedding"]]
        ctx = {
            "dls": dls,
            "spark": spark,
            "nation_df": load_table(spark, sf_dir, "nation"),
            "region_df": load_table(spark, sf_dir, "region"),
            "qvec": qvec,
            "query_matrix": [qvec],
        }
        for block in blocks:
            # the import/get_spark/open lines are illustrative — rebind to
            # the test context instead of opening /data paths
            code = block.replace('dls.open("/data/my_dataset", spark)', "ds")
            code = code.replace("spark = dls.get_spark()", "pass")
            ctx["ds"] = ds
            exec(compile(code, "TQL.md", "exec"), ctx)  # noqa: S102


def test_readme_mentions_every_module(spark):
    """The README layout section must track the real package tree."""
    import os

    text = open("/root/repo/README.md").read()
    for mod in sorted(os.listdir("/root/repo/deeplake_spark")):
        if mod.endswith(".py") and mod != "__init__.py":
            assert mod.removesuffix(".py") in text, f"README missing {mod}"
        if os.path.isdir(f"/root/repo/deeplake_spark/{mod}") and mod != "__pycache__":
            assert mod in text, f"README missing package {mod}"


def test_driver_correctness_window_invariant():
    """The grading driver checks the first 50 queries in alphabetical
    order; d* + q* + r* must fill EXACTLY those 50 slots and every one
    must carry an oracle (CLAUDE.md driver contract). New queries
    belong in t*/v* (or later) prefixes."""
    from deeplake_spark.queries import load_all

    reg = load_all()
    names = sorted(reg)
    window = names[:50]
    assert all(n[0] in "dqr" for n in window), window
    assert not any(n[0] in "dqr" for n in names[50:]), (
        "a d*/q*/r* query fell outside the driver's 50-slot window")
    missing = [n for n in window if reg[n].oracle is None]
    assert missing == [], f"driver-window queries without oracle: {missing}"

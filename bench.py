"""Benchmark runner — executes every registered query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced end-to-end with the `noop` sink (full execution,
no driver-side materialization cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deeplake_spark import get_spark  # noqa: E402
from deeplake_spark.queries import load_all  # noqa: E402


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("deeplake-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # warmup: JVM + parquet footer caches, one tiny action
    force(registry[next(iter(registry))].fn(spark, sf_dir).limit(1))

    timings: dict[str, float] = {}
    for name, q in sorted(registry.items()):
        t0 = time.perf_counter()
        try:
            force(q.fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # keep the bench line parseable on failure
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)

    # Build-vs-probe splits for the index-backed headline numbers: the
    # in-loop v10/t13 timings pay the (memoized) index build on their
    # first call — in production the build runs at ingest
    # (create_index), so the per-query cost is the probe alone.
    # Reported additively; in-loop timings keep their cross-round
    # semantics.
    detail: dict[str, float] = {}
    if timings.get("v10_ivf_search", -1) >= 0:
        try:
            from deeplake_spark.io import load_table
            from deeplake_spark.operators.similarity import build_ivf

            t0 = time.perf_counter()
            build_ivf(load_table(spark, sf_dir, "embeddings"),
                      n_clusters=8, seed=42)
            detail["v10_ivf_build"] = round(time.perf_counter() - t0, 4)
            t0 = time.perf_counter()
            force(registry["v10_ivf_search"].fn(spark, sf_dir))  # warm memo
            detail["v10_ivf_probe"] = round(time.perf_counter() - t0, 4)
        except Exception as exc:
            print(f"bench: ivf split FAILED: {exc}", file=sys.stderr)
    if timings.get("t13_tql_bm25_topk", -1) >= 0:
        try:
            from deeplake_spark.io import load_table
            from deeplake_spark.operators.indexes import build_inverted_index

            t0 = time.perf_counter()
            build_inverted_index(load_table(spark, sf_dir, "documents"),
                                 text_col="text", id_col="doc_id"
                                 ).postings.write.format("noop").mode(
                                     "overwrite").save()
            detail["t13_inverted_build"] = round(time.perf_counter() - t0, 4)
            t0 = time.perf_counter()
            force(registry["t13_tql_bm25_topk"].fn(spark, sf_dir))  # warm memo
            detail["t13_bm25_probe"] = round(time.perf_counter() - t0, 4)
        except Exception as exc:
            print(f"bench: bm25 split FAILED: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    payload = {
        "metric": "total_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if detail:
        payload["detail"] = detail
    print(json.dumps(payload))


if __name__ == "__main__":
    main()

"""Construction-vs-execution decomposition for every registered lane.

For each query (bench-like environment: scan cache + index builds):
  1. cold: q.fn + noop force (fills codegen/persist caches)
  2. construct_warm: min-of-3 of a bare q.fn call (no action)
  3. exec_warm: min-of-2 of forcing a prebuilt DataFrame
warm total ~= construct_warm + exec_warm; the construct column is the
driver-side floor (py4j Column construction + any in-fn jobs) that
guide §1.2 step-2 work cannot touch — it needs construction-side fixes.

Usage: python tools/construct_probe.py [names...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeplake_spark import get_spark  # noqa: E402
from deeplake_spark.queries import load_all  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("deeplake-spark-construct-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    names = sys.argv[1:] or sorted(registry)
    resolved = []
    for n in names:
        hits = [k for k in registry if k == n or k.startswith(n)]
        if len(hits) != 1:
            raise SystemExit(f"ambiguous/unknown {n!r}: {hits}")
        resolved.append(hits[0])

    force(registry[next(iter(registry))].fn(spark, sf_dir).limit(1))
    from deeplake_spark.io import build_scan_cache
    from deeplake_spark.queries import text_ops, vector_ops

    build_scan_cache(spark, sf_dir)
    text_ops._inv_index(spark, sf_dir)
    vector_ops._ivf8(spark, sf_dir)
    vector_ops._quantized_index(spark, sf_dir)
    vector_ops._pq_index(spark, sf_dir)
    vector_ops._pooled_index(spark, sf_dir)

    out = {}
    import gc

    from deeplake_spark.operators.dedup import release_cached

    for i, name in enumerate(resolved):
        q = registry[name]
        spark.sparkContext.setJobDescription(f"cprobe:{name}")
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        force(df)
        cold = time.perf_counter() - t0
        cons = []
        last = None
        for _ in range(3):
            t0 = time.perf_counter()
            last = q.fn(spark, sf_dir)
            cons.append(time.perf_counter() - t0)
        execs = []
        for _ in range(2):
            t0 = time.perf_counter()
            force(last)
            execs.append(time.perf_counter() - t0)
        out[name] = {
            "cold": round(cold, 3),
            "construct": round(min(cons), 3),
            "exec": round(min(execs), 3),
        }
        print(f"{name:45s} cold={cold:6.2f} construct={min(cons):6.3f} "
              f"exec={min(execs):6.3f}", flush=True)
        spark.sparkContext.setJobDescription(None)
        if i % 10 == 9:
            release_cached()
            gc.collect()
            time.sleep(0.3)

    tot_c = sum(v["construct"] for v in out.values())
    tot_e = sum(v["exec"] for v in out.values())
    print(f"TOTAL construct={tot_c:.1f}s exec={tot_e:.1f}s", flush=True)
    with open("/tmp/construct_probe.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

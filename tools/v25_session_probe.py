"""Reproduce v25's in-bench-only slowdown (r15 opt round).

Evidence: v25 reads 1.2-1.3 s isolated but 4-16 s in EVERY full-bench
execution since the Arrow scorer landed (final1 6.7, final3 2.81,
final6 cold 7.7 / warm [5.1, 10.7] with only the post-loop resample at
1.8, final7 4.18, final8 [16.0, 8.9, 7.9]).

Protocol: one fresh session, bench-like ingest, then
  phase A: time v25 x3 (baseline, nothing ran before it)
  phase B: run a predecessor set once (like the bench roster slice
           between the last scrub and v25), time v25 x3
  phase C: gc-scrub (bench's scrub body), time v25 x3
Prints one line per timing; a control query (q21) brackets each phase.

Usage: python tools/v25_session_probe.py [pred1 pred2 ...]
       (default predecessors: v17..v24 — the bench slice after the
        i=119 scrub)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeplake_spark import get_spark  # noqa: E402
from deeplake_spark.queries import load_all  # noqa: E402


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("v25-session-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    preds = sys.argv[1:] or [
        "v17", "v18", "v19", "v20", "v21", "v22", "v23", "v24"]

    def resolve(n):
        if n in registry:
            return n
        hits = [k for k in registry if k.startswith(n)]
        assert len(hits) == 1, (n, hits)
        return hits[0]

    preds = [resolve(n) for n in preds]
    v25 = resolve("v25")
    q21 = resolve("q21")

    from deeplake_spark.io import build_scan_cache
    from deeplake_spark.queries import vector_ops

    build_scan_cache(spark, sf_dir)
    vector_ops._ivf8(spark, sf_dir)

    def timed(name, tag):
        q = registry[name]
        t0 = time.perf_counter()
        force(q.fn(spark, sf_dir))
        dt = time.perf_counter() - t0
        print(f"{tag} {name}: {dt:.3f}", flush=True)
        return dt

    # warm the lane's codegen once, untimed
    timed(v25, "A0(untimed-cold)")
    timed(q21, "A-control")
    for i in range(3):
        timed(v25, f"A{i + 1}")
    timed(q21, "A-control")

    print("--- phase B: run predecessors", preds, flush=True)
    for p in preds:
        timed(p, "B-pred")
    timed(q21, "B-control")
    for i in range(3):
        timed(v25, f"B{i + 1}")
    timed(q21, "B-control")

    print("--- phase C: bench scrub", flush=True)
    import gc

    from deeplake_spark.operators.dedup import release_cached

    release_cached()
    gc.collect()
    time.sleep(0.3)
    for i in range(3):
        timed(v25, f"C{i + 1}")
    timed(q21, "C-control")


if __name__ == "__main__":
    main()

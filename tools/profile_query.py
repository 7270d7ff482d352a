"""Per-query profiler for the optimization rounds.

Replicates bench.py's environment (scan cache + index builds), then for
each named query runs: construction-only timing (q.fn call, no action),
one cold noop-forced run, N warm runs — and optionally dumps
`.explain("formatted")` to plans/r15/<name>_<tag>.txt.

Usage:
    python tools/profile_query.py [--plans TAG] [--warm N] [--no-ingest] q1 q2 ...
    python tools/profile_query.py --top 20          # profile slowest from BENCH_FULL
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--plans", default=None,
                    help="dump explain(formatted) to plans/<dir>/<q>_<TAG>.txt")
    ap.add_argument("--plans-dir", default="r16",
                    help="subdirectory of plans/ for the dumps")
    ap.add_argument("--final", action="store_true",
                    help="ALSO dump the executed AQE final plan "
                    "(trap 18: execute via collect on the SAME "
                    "DataFrame, then read its queryExecution) to "
                    "<q>_<TAG>_final.txt — the only dump that shows "
                    "ReusedExchange / isFinalPlan=true")
    ap.add_argument("--warm", type=int, default=3)
    ap.add_argument("--no-ingest", action="store_true")
    ap.add_argument("--tables", default=None,
                    help="comma-separated scan-cache tables (A/B layouts)")
    ap.add_argument("--top", type=int, default=0,
                    help="profile the N slowest queries from BENCH_FULL.json")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("deeplake-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    names = list(args.names)
    if args.top:
        full = json.load(open(os.path.join(REPO, "BENCH_FULL.json")))
        ranked = sorted(full["queries"].items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked[: args.top]]
    # allow short prefixes (t35 -> t35_dup_window_excision)
    resolved = []
    for n in names:
        if n in registry:
            resolved.append(n)
            continue
        hits = [k for k in registry if k.startswith(n)]
        if len(hits) != 1:
            raise SystemExit(f"ambiguous/unknown query {n!r}: {hits}")
        resolved.append(hits[0])

    force(registry[next(iter(registry))].fn(spark, sf_dir).limit(1))
    if not args.no_ingest:
        from deeplake_spark.io import build_scan_cache
        from deeplake_spark.queries import text_ops, vector_ops

        t0 = time.perf_counter()
        if args.tables is not None:
            build_scan_cache(spark, sf_dir,
                             tables=tuple(t for t in args.tables.split(",")
                                          if t))
        else:
            build_scan_cache(spark, sf_dir)
        text_ops._inv_index(spark, sf_dir)
        vector_ops._ivf8(spark, sf_dir)
        vector_ops._quantized_index(spark, sf_dir)
        vector_ops._pq_index(spark, sf_dir)
        vector_ops._pooled_index(spark, sf_dir)
        print(f"ingest: {time.perf_counter() - t0:.2f}s", flush=True)

    for name in resolved:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        t_construct = time.perf_counter() - t0
        if args.plans:
            pdir = os.path.join(REPO, "plans", args.plans_dir)
            os.makedirs(pdir, exist_ok=True)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(
                    pdir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(txt)
            if args.final:
                # noop-force runs a SEPARATE QueryExecution (trap 18);
                # collect() executes THIS DataFrame's, whose
                # executedPlan then carries isFinalPlan=true and any
                # AQE ReusedExchange / AQEShuffleRead rewrites
                df.collect()
                ftxt = (df._jdf.queryExecution().executedPlan()
                        .toString())
                with open(os.path.join(
                        pdir, f"{name}_{args.plans}_final.txt"), "w") as f:
                    f.write(ftxt)
        t0 = time.perf_counter()
        force(df)
        t_cold = time.perf_counter() - t0
        warms = []
        for _ in range(args.warm):
            t0 = time.perf_counter()
            force(q.fn(spark, sf_dir))
            warms.append(round(time.perf_counter() - t0, 3))
        print(f"{name:45s} construct={t_construct:6.3f} cold={t_cold:6.3f} "
              f"warm={warms} min={min(warms):6.3f}", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()

"""Fresh-process driver simulation per .claude/skills/verify/SKILL.md."""
import importlib.util
import sys

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6f}"
            import datetime as _dt
            if isinstance(v, _dt.datetime):
                v = v.strftime("%Y-%m-%d %H:%M:%S.%f")
            elif isinstance(v, _dt.date):
                v = v.strftime("%Y-%m-%d 00:00:00.000000")
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    tz = sys.argv[1] if len(sys.argv) > 1 else "UTC"
    names = sys.argv[2:] or ["q01_pricing_summary", "r09_hourly_rollup", "t05_quality_scores"]
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.session.timeZone", tz)
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    mod = load_entry()
    df = mod.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema={[f.name for f in df.schema.fields]}")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    qs = mod.queries()
    oracles = mod.oracle_sql()
    bad = 0
    for name in names:
        sdf = qs[name](spark, SF_DIR)
        scols = sdf.columns
        srows = canon([tuple(r) for r in sdf.collect()], scols)
        if name not in oracles:
            # rows-only lane (no DuckDB spelling) — mirror the driver's
            # weaker check: the query must run and return a schema
            print(f"{name}: spark={len(srows)} rows-only (no oracle) "
                  f"cols={sorted(scols)}")
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = canon(cur.fetchall(), ocols)
        ok = sorted(scols) == sorted(ocols) and srows == orows
        print(f"{name}: spark={len(srows)} oracle={len(orows)} cols_match={sorted(scols)==sorted(ocols)} match={ok}")
        if not ok:
            bad += 1
            for a, b in list(zip(srows, orows))[:5]:
                if a != b:
                    print("  spark :", a)
                    print("  oracle:", b)
    spark.stop()
    if bad:
        sys.exit(1)
    print("OK")


if __name__ == "__main__":
    main()

"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares: row count, column names, and values (columns
sorted by name, rows sorted by all columns) — stricter than the driver's
hash compare in that it reports *where* a mismatch is.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

from deeplake_spark.io import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con.execute(sql).fetch_df()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def canon(pdf):
    """Columns sorted by name, rows sorted by stringified tuple."""
    cols = sorted(pdf.columns)
    rows = [tuple(_norm(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, float_tol: float = 0.0):
    spark_pdf = spark_df.toPandas()
    duck_pdf = run_oracle(oracle_sql, sf_dir)

    s_cols, s_rows = canon(spark_pdf)
    d_cols, d_rows = canon(duck_pdf)

    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for c, (sv, dv) in zip(s_cols, zip(sr, dr)):
            if isinstance(sv, float) and isinstance(dv, float):
                ok = (sv == dv) or (
                    float_tol > 0 and abs(sv - dv) <= float_tol * max(1.0, abs(dv))
                )
                assert ok, f"row {i} col {c}: spark={sv!r} duck={dv!r}"
            else:
                assert str(sv) == str(dv), f"row {i} col {c}: spark={sv!r} duck={dv!r}"

"""Sequence restructuring (TQL GROUP BY / UNGROUP BY / EXPAND BY),
weighted sampling (SAMPLE BY), set operations, offset addressing, JSON
access, and event-stream rollups.

TQL semantic trap (SURVEY hard-parts list): TQL `GROUP BY` packs
consecutive rows into *sequence rows* (video from frames), it is NOT
scalar aggregation — reference `cpp/query_core/group_statement.hpp:15-112`,
`heimdall_common/group_dataset.hpp:23`, tql.md:389-397. We implement it
as groupBy(keys).agg(sort_array(collect_list(struct(order, payload))))
which preserves element order; UNGROUP is posexplode
(`ungroup_statement.hpp:15-116`); EXPAND BY is a tiling generator
(`spatial_dataset.hpp:18`, tql.md:368-386).

Oracle-facing outputs stay scalar (strings/ints/doubles) — sequences
are emitted as delimiter-joined strings so value-hash comparison is
representation-stable; the nested-type round trip is tested in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deeplake_spark.io import load_table
from deeplake_spark.queries import query


@query(
    "r01_group_sequences",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
    FROM events
    WHERE user_id < 50
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="TQL GROUP BY: pack rows into ordered sequence rows "
    "(group_statement.hpp; ordered collect_list, NOT scalar agg).",
    tags=("restructure", "group"),
)
def r01(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
            ),
            lambda s: s["event_type"],
        ),
        ">",
    )
    return (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), seq.alias("seq"))
        .orderBy("user_id")
    )


@query(
    "r02_ungroup",
    oracle="""
    SELECT user_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS pos,
           event_type
    FROM events WHERE user_id < 30
    ORDER BY user_id, pos
    """,
    doc="UNGROUP BY: explode sequence rows back to element rows with "
    "position (ungroup_statement.hpp; posexplode).",
    tags=("restructure", "ungroup"),
)
def r02(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    seqs = e.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
            ),
            lambda s: s["event_type"],
        ).alias("seq")
    )
    return (
        seqs.select("user_id", F.posexplode("seq").alias("pos", "event_type"))
        .orderBy("user_id", "pos")
    )


@query(
    "r03_expand_tiles",
    oracle="""
    SELECT vec_id, CAST(r * 4 + c AS INT) AS tile_id,
           ROUND(CAST(embedding[(2*r)*8 + 2*c + 1] AS DOUBLE)
               + CAST(embedding[(2*r)*8 + 2*c + 2] AS DOUBLE)
               + CAST(embedding[(2*r+1)*8 + 2*c + 1] AS DOUBLE)
               + CAST(embedding[(2*r+1)*8 + 2*c + 2] AS DOUBLE), 6) AS tile_sum
    FROM embeddings
    CROSS JOIN generate_series(0, 3) gr(r)
    CROSS JOIN generate_series(0, 3) gc(c)
    WHERE vec_id < 20
    ORDER BY vec_id, tile_id
    """,
    doc="EXPAND BY h w: tile a 2-D cell (embedding reshaped 8x8) into "
    "2x2 patch rows — sliding-window generator (spatial_dataset.hpp, "
    "tql.md:368-386).",
    tags=("restructure", "expand"),
)
def r03(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)

    def cell(r, c):  # 1-based element_at into the flattened 8x8 grid
        return F.element_at(F.col("embedding"), r * 8 + c + 1).cast("double")

    tiles = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(3)),
            lambda r: F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda c: F.struct(
                    (r * 4 + c).cast("int").alias("tile_id"),
                    F.round(
                        F.element_at(F.col("embedding"), (2 * r) * 8 + 2 * c + 1).cast("double")
                        + F.element_at(F.col("embedding"), (2 * r) * 8 + 2 * c + 2).cast("double")
                        + F.element_at(F.col("embedding"), (2 * r + 1) * 8 + 2 * c + 1).cast("double")
                        + F.element_at(F.col("embedding"), (2 * r + 1) * 8 + 2 * c + 2).cast("double"),
                        6,
                    ).alias("tile_sum"),
                ),
            ),
        )
    )
    # explode_outer + OUTPUT filter (trap 2): plain explode infers
    # size>0 on the inlined tile expression and pushes it to the scan
    return (
        e.select("vec_id", F.explode_outer(tiles).alias("tile"))
        .filter(F.col("tile").isNotNull())
        .select("vec_id", F.col("tile.tile_id").alias("tile_id"), F.col("tile.tile_sum").alias("tile_sum"))
        .orderBy("vec_id", "tile_id")
    )


@query(
    "r04_sample_by_weight",
    oracle="""
    WITH keyed AS (
      SELECT vec_id, label,
             pow(((vec_id * 2654435761 + 12345) % 1048576 + 0.5) / 1048576.0,
                 1.0 / (label + 1)) AS k
      FROM embeddings
    )
    SELECT vec_id, label, ROUND(k, 9) AS sample_key
    FROM keyed
    ORDER BY sample_key DESC, vec_id
    LIMIT 100
    """,
    doc="SAMPLE BY weight LIMIT n without replacement — A-ES weighted "
    "reservoir (pow(u, 1/w) top-k; sample_statement.hpp:15-100). "
    "Deterministic multiplicative-hash uniform so the oracle reproduces "
    "it; production uses rand(seed).",
    tags=("sample",),
)
def r04(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    u = ((F.col("vec_id") * F.lit(2654435761) + 12345) % 1048576 + 0.5) / 1048576.0
    k = F.pow(u, 1.0 / (F.col("label") + 1))
    return (
        e.select("vec_id", "label", F.round(k, 9).alias("sample_key"))
        .orderBy(F.desc("sample_key"), "vec_id")
        .limit(100)
    )


@query(
    "r05_limit_percent",
    oracle="""
    WITH n AS (SELECT CAST(ceil(COUNT(*) * 0.10) AS BIGINT) AS lim FROM documents)
    SELECT doc_id, lang FROM documents, n
    ORDER BY doc_id
    LIMIT (SELECT lim FROM n)
    """,
    doc="LIMIT 10 PERCENT (grammar y:950, tql.md:633): count-scaled limit "
    "as a broadcast 1-row aggregate; rank via range-partitioned sort + "
    "partition-offset row ids (no unpartitioned window, no driver count).",
    tags=("limit",),
)
def r05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deeplake_spark.io import with_row_id

    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.ceil(F.count(F.lit(1)) * 0.10).alias("lim"))
    ranked = with_row_id(d.select("doc_id", "lang"), order_by="doc_id", col_name="rn")
    return (
        ranked.crossJoin(F.broadcast(n))
        .filter(F.col("rn") < F.col("lim"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@query(
    "r06_set_ops",
    oracle="""
    (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
     INTERSECT
     SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
    EXCEPT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ORDER BY user_id
    """,
    doc="UNION/INTERSECT/EXCEPT set algebra over query results "
    "(statement.hpp:15-20, executor union_/intersect_/difference_).",
    tags=("setops",),
)
def r06(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def users(et: str) -> DataFrame:
        return e.filter(F.col("event_type") == et).select("user_id").distinct()

    return users("click").intersect(users("view")).subtract(users("purchase")).orderBy("user_id")


@query(
    "r07_row_number_offset",
    oracle="""
    SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn
    FROM documents
    ORDER BY doc_id
    LIMIT 50 OFFSET 100
    """,
    doc="ROW_NUMBER() offset addressing (tql.md:427-431) + LIMIT/OFFSET "
    "(statement.hpp:22-41).",
    tags=("limit", "window"),
)
def r07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deeplake_spark.io import with_row_id

    d = load_table(spark, sf_dir, "documents")
    # partition-offset rank (range sort + per-partition offsets), NOT
    # row_number().over(orderBy) — that window funnels the corpus
    # through one task (CLAUDE.md trap 7)
    return (
        with_row_id(d.select("doc_id"), order_by="doc_id", col_name="__rid")
        .select("doc_id", (F.col("__rid") + 1).alias("rn"))
        .orderBy("doc_id")
        .offset(100)
        .limit(50)
    )


@query(
    "r08_json_access",
    oracle="""
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_bucket,
           COUNT(*) AS n,
           ROUND(AVG(value), 6) AS avg_value
    FROM events
    GROUP BY k_bucket
    ORDER BY k_bucket
    """,
    doc="JSON access meta['k'] (expr.hpp:287-301, tql.md:138-166) → "
    "get_json_object + numeric groupBy.",
    tags=("json",),
)
def r08(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.groupBy((k % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
        .orderBy("k_bucket")
    )


@query(
    "r09_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY hour, event_type
    ORDER BY hour, event_type
    LIMIT 200
    """,
    doc="Time-bucketed rollup on the events table (hypertable-rollup "
    "pattern; maps to watermarked windowed agg in streaming mode).",
    tags=("events", "agg"),
)
def r09(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        # date_trunc returns TIMESTAMP (instant) even for NTZ input; cast
        # back to NTZ so collect() is session/OS-timezone independent —
        # the NTZ->TIMESTAMP->NTZ round-trip through the session tz is
        # exact for any offset, and truncation acts on the wall clock.
        e.groupBy(F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour"),
                  F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        )
        .orderBy("hour", "event_type")
        .limit(200)
    )


@query(
    "r10_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM gaps
    WHERE user_id < 100
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Sessionization: lag-gap window + cumulative flag (the batch "
    "equivalent of session_window in Structured Streaming).",
    tags=("events", "window"),
)
def r10(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    # interval comparison (not epoch casts): works identically for
    # TIMESTAMP and TIMESTAMP_NTZ, independent of session timezone
    new_session = (
        lag_ts.isNull() | ((F.col("ts") - lag_ts) > F.expr("INTERVAL 30 MINUTES"))
    ).cast("int")
    return (
        e.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


@query(
    "r11_asof_last_signup",
    oracle="""
    SELECT event_id, user_id,
           CAST(epoch_us(ts) - epoch_us(last_signup_ts) AS BIGINT) AS us_since_signup
    FROM (
      SELECT event_id, user_id, ts, event_type,
             max(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
      FROM events
    )
    WHERE last_signup_ts IS NOT NULL AND event_type <> 'signup' AND user_id < 50
    ORDER BY event_id
    """,
    doc="As-of join (event -> most recent prior signup of same user) via "
    "a running last-value window — the Spark pattern for point-in-time "
    "joins that the reference lacks (training-pipeline op).",
    tags=("events", "asof", "window"),
)
def r11(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    last_signup = F.max(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).over(w)
    return (
        e.withColumn("last_signup_ts", last_signup)
        .filter(
            F.col("last_signup_ts").isNotNull()
            & (F.col("event_type") != "signup")
            & (F.col("user_id") < 50)
        )
        .select(
            "event_id",
            "user_id",
            # timestampdiff handles TIMESTAMP_NTZ; unix_micros would not
            F.expr("timestampdiff(MICROSECOND, last_signup_ts, ts)").alias(
                "us_since_signup"
            ),
        )
        .orderBy("event_id")
    )


@query(
    "r12_pivot_event_types",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM events
    WHERE user_id < 100
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Pivot: per-user event-type count matrix (df.pivot — beyond the "
    "reference's operator set, free on Spark).",
    tags=("events", "pivot"),
)
def r12(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    types = ["click", "view", "purchase", "signup", "error"]
    out = (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    for t in types:
        out = out.withColumn(t, F.coalesce(F.col(t), F.lit(0)).cast("long"))
    return out.orderBy("user_id")


@query(
    "r13_datetime_functions",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           COUNT(*) AS n
    FROM orders
    WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY ALL
    ORDER BY y, m, dow, due_date
    LIMIT 100
    """,
    doc="Date/time function coverage (reference date_time.sql domain): "
    "year/month/quarter/dayofweek/date_trunc/interval arithmetic. "
    "DuckDB dayofweek is 0-based Sunday; Spark is 1-based — aligned "
    "explicitly.",
    tags=("datetime",),
)
def r13(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    )
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.quarter("o_orderdate").alias("q"),
            F.dayofweek("o_orderdate").alias("dow"),
            # cast back to NTZ: date_trunc emits a session-tz instant (see r09)
            F.date_trunc("month", F.col("o_orderdate")).cast("timestamp_ntz").alias("month_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("y", "m", "dow", "due_date")
        .limit(100)
    )


@query(
    "r14_string_functions",
    oracle="""
    SELECT doc_id,
           upper(lang) AS lang_u,
           substring(text, 1, 12) AS head,
           length(replace(text, ' ', '')) AS n_nonspace,
           concat(lang, ':', source) AS tagged,
           CAST(strpos(text, 'spark') AS INT) AS spark_pos
    FROM documents
    WHERE doc_id < 150
    ORDER BY doc_id
    """,
    doc="String function passthrough (upper/substring/replace/concat/"
    "position) — translator's builtin fallback surface.",
    tags=("string",),
)
def r14(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_u"),
        F.substring("text", 1, 12).alias("head"),
        F.length(F.regexp_replace("text", " ", "")).alias("n_nonspace"),
        F.concat_ws("", F.col("lang"), F.lit(":"), F.col("source")).alias("tagged"),
        F.instr(F.col("text"), "spark").alias("spark_pos"),
    ).orderBy("doc_id")


@query(
    "r15_numeric_edge",
    oracle="""
    SELECT l_linenumber,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
           CAST(SUM(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_disc,
           ROUND(AVG(l_extendedprice % 100.0), 6) AS avg_mod,
           ROUND(MIN(-l_extendedprice), 6) AS min_neg,
           ROUND(stddev_pop(l_quantity), 6) AS sd_qty
    FROM lineitem
    GROUP BY l_linenumber
    ORDER BY l_linenumber
    """,
    doc="Numeric edge coverage (reference numeric_test.sql domain): "
    "modulo on doubles, unary minus, population stddev, zero-equality.",
    tags=("numeric",),
)
def r15(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_linenumber")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
            F.sum(F.when(F.col("l_discount") == 0.0, 1).otherwise(0)).alias("zero_disc"),
            F.round(F.avg(F.col("l_extendedprice") % 100.0), 6).alias("avg_mod"),
            F.round(F.min(-F.col("l_extendedprice")), 6).alias("min_neg"),
            F.round(F.stddev_pop("l_quantity"), 6).alias("sd_qty"),
        )
        .orderBy("l_linenumber")
    )


@query(
    "r16_json_workload",
    oracle="""
    WITH d AS (
      SELECT json_object('u', user_id, 't', event_type,
                         'm', json_object(
                           'k', CAST(json_extract_string(props, '$.k') AS BIGINT),
                           'vip', user_id % 7 = 0)) AS doc,
             value
      FROM events
    ),
    f AS (SELECT * FROM d WHERE json_extract_string(doc, '$.m.vip') = 'true')
    SELECT json_extract_string(doc, '$.t') AS etype,
           COUNT(*) AS n,
           ROUND(AVG(CAST(json_extract_string(doc, '$.m.k') AS BIGINT) % 10), 6)
             AS avg_bucket,
           ROUND(AVG(value), 6) AS avg_value
    FROM f GROUP BY etype ORDER BY etype
    """,
    doc="Nested-JSON analytics workload (reference bluesky_queries.sql "
    "domain): build a nested doc, filter on a chained JSON path through "
    "the TQL string (doc['m']['vip'] — schema-less get_json_object "
    "chain, expr.hpp:287-301), extract + aggregate. Catalyst collapses "
    "the repeated json parsing into one generation per row.",
    tags=("json", "tql"),
)
def r16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deeplake_spark import tql
    from deeplake_spark.io import ensure_parallelism

    # per-row JSON build + chained parse is CPU-bound expression work;
    # the single-row-group events scan serializes it (perf trap 1)
    e = ensure_parallelism(load_table(spark, sf_dir, "events"))
    doc = F.to_json(
        F.struct(
            F.col("user_id").alias("u"),
            F.col("event_type").alias("t"),
            F.struct(
                F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
                (F.col("user_id") % 7 == 0).alias("vip"),
            ).alias("m"),
        )
    )
    d = e.select(doc.alias("doc"), F.col("value"))
    filtered = tql.query("SELECT doc, value WHERE doc['m']['vip'] == 'true'",
                         default=d)
    return (
        filtered.select(
            F.get_json_object(F.col("doc"), "$.t").alias("etype"),
            (F.get_json_object(F.col("doc"), "$.m.k").cast("long") % 10).alias("kb"),
            "value",
        )
        .groupBy("etype")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("kb"), 6).alias("avg_bucket"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("etype")
    )


@query(
    "r17_pack_token_budget",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             t -> t <> '')) AS n_tok
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM toks
    )
    SELECT CAST(FLOOR(cb / 512) AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM cum
    GROUP BY seq_id
    ORDER BY seq_id
    """,
    doc="Token-budget sequence packing (concat docs in id order, chunk "
    "the token stream into 512-token training sequences) — partition-"
    "offset cumulative sum, no unpartitioned window.",
    tags=("restructure", "packing", "tokens"),
)
def r17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deeplake_spark.operators.restructure import pack_token_budget

    d = load_table(spark, sf_dir, "documents")
    return pack_token_budget(d, budget=512).orderBy("seq_id")


@query(
    "r18_split_assignment",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, n_chars,
             CASE
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 8))
                         AS UBIGINT) / 4294967296.0 < 0.9 THEN 'train'
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 8))
                         AS UBIGINT) / 4294967296.0 < 0.95 THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(doc_id) AS first_doc
    FROM assigned
    GROUP BY split
    ORDER BY split
    """,
    doc="Deterministic train/val/test split assignment (reproducible-"
    "split pipeline staple): first 32 bits of md5(id#salt) -> uniform "
    "[0,1) -> cumulative-fraction bands. Pure per-row expression — no "
    "state, no shuffle, no RNG; appends never reassign existing rows "
    "and the hash is engine-portable (oracle reproduces it exactly).",
    tags=("sampling", "split", "pipeline"),
)
def r18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deeplake_spark.operators.sampling import assign_splits

    d = load_table(spark, sf_dir, "documents")
    return (
        assign_splits(d, id_col="doc_id",
                      fractions={"train": 0.9, "val": 0.05, "test": 0.05})
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("split")
    )

"""Structured Streaming over event tables — the beyond-reference goal
noted in SURVEY §2.11: the reference's "streaming" is training-feed
delivery only (no watermarks/windows); we add a real event-time layer
on Spark Structured Streaming for the `events` table, plus the batch
equivalents used by the oracle-checked queries.

Scale notes: watermarked windowed aggregation is incremental state —
state store size is bounded by (watermark horizon × key cardinality),
independent of total history. `availableNow` triggers let the same
query run as an incremental batch job (catch-up mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) read as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (file-source streaming; in
    production the same plan reads Kafka/queue sources unchanged).

    The ts column has shipped both as TIMESTAMP(NANOS) — which
    surfaces as a long under `nanosAsLong` — and as plain
    TIMESTAMP(US)/NTZ, so sniff the batch-read schema (a footer-only
    driver action) and adapt the stream schema + conversion."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_ts = dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes)["ts"]
    ts_field = {
        "bigint": T.LongType(),
        "timestamp_ntz": T.TimestampNTZType(),
    }.get(batch_ts, T.TimestampType())
    schema = T.StructType([
        f if f.name != "ts" else T.StructField("ts", ts_field)
        for f in EVENTS_SCHEMA.fields
    ])
    raw = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("path", f"{sf_dir}")
        .option("pathGlobFilter", "events.parquet")
        .load()
    )
    # Watermarks require TIMESTAMP (Spark rejects TIMESTAMP_NTZ event
    # time), so the stream keeps an instant-typed ts — instants and
    # UTC-epoch-aligned tumbling windows are session-tz-independent.
    # Both conversions below avoid the session timezone entirely
    # (timestamp_micros / timestampdiff are pure epoch arithmetic).
    # The rollups below convert emitted window boundaries back to NTZ
    # so results match the batch path under any driver session tz.
    if batch_ts == "bigint":  # TIMESTAMP(NANOS) as long
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if batch_ts == "timestamp_ntz":
        return raw.withColumn(
            "ts",
            F.timestamp_micros(F.expr(
                "timestampdiff(MICROSECOND, "
                "timestamp_ntz'1970-01-01 00:00:00', ts)")),
        )
    return raw


def _instant_to_ntz(colname: str):
    """TIMESTAMP (instant) → TIMESTAMP_NTZ at the UTC wall clock, with
    no session-timezone dependence: unix_micros() reads the instant's
    epoch offset directly, and the epoch+interval rebuild is the same
    trick io.load_table uses for the nanos column."""
    return F.expr(
        "timestamp_ntz'1970-01-01 00:00:00' + make_dt_interval(0, 0, 0, "
        f"cast(unix_micros({colname}) as decimal(20,0)) / 1000000)"
    )


def windowed_rollup(events: DataFrame, window: str = "1 hour",
                    slide: str | None = None, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling/sliding window aggregation (late data beyond
    the watermark is dropped deterministically)."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    out = (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
    if dict(events.dtypes).get("ts") == "timestamp":
        out = out.withColumn("window_start", _instant_to_ntz("window_start")) \
                 .withColumn("window_end", _instant_to_ntz("window_end"))
    return out


def session_rollup(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (session_window — the streaming analog
    of the batch lag-gap sessionization in r10_sessionize)."""
    out = (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )
    if dict(events.dtypes).get("ts") == "timestamp":
        out = out.withColumn("session_start", _instant_to_ntz("session_start")) \
                 .withColumn("session_end", _instant_to_ntz("session_end"))
    return out


def dedup_stream(events: DataFrame, keys: list[str] | None = None,
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact deduplication: keep the first occurrence of each
    key within the watermark horizon (dropDuplicatesWithinWatermark).
    State is bounded by (watermark horizon x key cardinality) — the
    streaming face of the batch exact-dedup operator (operators/
    dedup.py keep-first), for at-least-once sources that replay events.
    Works on batch DataFrames too (falls back to dropDuplicates)."""
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        # watermarks require an instant-typed event time; derive one
        # from the NTZ wall clock and drop it after the dedup so the
        # output keeps the NTZ column untouched
        return (
            events.withColumn("__wm_ts", F.col("ts").cast("timestamp"))
            .withWatermark("__wm_ts", watermark)
            .dropDuplicatesWithinWatermark(keys)
            .drop("__wm_ts")
        )
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def running_user_state(events: DataFrame):
    """Custom stateful operator: per-user running aggregate via
    applyInPandasWithState (the reference has no event-time stateful ops;
    this is the Spark-native extension point for them)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def fn(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(fn, out_schema, state_schema, "update", "NoTimeout")
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming query over all currently-available input and
    stop — the synchronous harness used by tests (memory sink)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q

"""Storage configuration surface — API parity with the reference's
`deeplake.storage` module (`python/deeplake/storage.pyi:26-121`:
provider registry, global concurrency knob, range-read readers).

On Spark, providers are Hadoop FileSystem schemes and concurrency maps
to connection-pool/readahead confs; the functions below set the
equivalent session configuration so reference code ports 1:1.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DEFAULT_CONCURRENCY = 64


def concurrency(spark: SparkSession | None = None) -> int:
    """storage.concurrency (storage.pyi:90)."""
    spark = spark or SparkSession.getActiveSession()
    try:
        return int(spark.conf.get("spark.hadoop.fs.s3a.connection.maximum"))
    except Exception:
        return _DEFAULT_CONCURRENCY


def set_concurrency(n: int, spark: SparkSession | None = None) -> None:
    """storage.set_concurrency (storage.pyi:104): object-store
    connection parallelism (S3A pool + per-scheme equivalents)."""
    spark = spark or SparkSession.getActiveSession()
    spark.conf.set("spark.hadoop.fs.s3a.connection.maximum", str(n))
    spark.conf.set("spark.hadoop.fs.s3a.threads.max", str(n))


SUPPORTED_SCHEMES = ("file", "s3a", "s3", "gs", "abfss", "wasbs", "hdfs", "mem")


def resolve_scheme(url: str) -> str:
    """Provider resolution (create/open accept s3:// gcs:// azure://
    file mem:// — __init__.pyi:4123). Unknown scheme → local path."""
    for s in SUPPORTED_SCHEMES:
        if url.startswith(s + "://"):
            return s
    return "file"

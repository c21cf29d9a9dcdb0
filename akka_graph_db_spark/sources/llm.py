"""Readers for the LLM-pipeline fixtures: documents, embeddings, events.

The ``events`` parquet stores ``ts`` as INT64 TIMESTAMP(NANOS), which
Spark's vectorized parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]).
The shim reads nanos as raw longs (``spark.sql.legacy.parquet.nanosAsLong``)
and converts to a microsecond TIMESTAMP by truncation — exactly what the
DuckDB oracle does when it casts ns→us, so both sides see identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def read_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with ``ts`` as a proper (microsecond) TIMESTAMP column."""
    prev = spark.conf.get(_NANOS_CONF, None)
    spark.conf.set(_NANOS_CONF, "true")
    try:
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
    finally:
        if prev is not None:
            spark.conf.set(_NANOS_CONF, prev)
        else:
            spark.conf.unset(_NANOS_CONF)  # don't leak the legacy flag
    # ts arrives as bigint nanoseconds; truncate to micros with INTEGER
    # division (a double division of ~1.7e18 ns loses the last microsecond
    # to float rounding — observed off-by-one vs the DuckDB oracle).
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(df.dtypes).get("ts") == "timestamp_ntz":
        # Newer fixtures store TIMESTAMP(MICROS) without the UTC flag,
        # which Spark reads as TIMESTAMP_NTZ. Every operator and oracle in
        # this engine was written against the LTZ + UTC-session contract
        # (epoch extraction via unix_micros, watermarks, window()), so
        # normalize here: with the session TZ pinned UTC the NTZ->LTZ cast
        # is value-identical wall-clock-wise and restores that contract.
        from akka_graph_db_spark.session import ensure_query_conf

        ensure_query_conf(spark)
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df

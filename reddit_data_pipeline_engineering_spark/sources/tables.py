"""Readers for the driver-provided synthetic testdata tables.

Parquet scans go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning for free (the reference instead re-reads raw JSON
through a Glue DynamicFrame per consumer — SURVEY.md §3.2 anti-pattern).

``events.parquet`` stores TIMESTAMP(NANOS), which Spark's parquet reader
rejects outright ([PARQUET_TYPE_ILLEGAL]). We read it with
``spark.sql.legacy.parquet.nanosAsLong`` and rebuild a proper
``TimestampType`` with integer division (``ts div 1000``) — lossless here
(the generator's values are µs-grained) and identical to DuckDB's
ns->µs truncation semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_data_pipeline_engineering_spark.session import apply_runtime_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes the events ns-timestamp column."""
    apply_runtime_confs(spark)
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view for the spark.sql surface."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)

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


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a too-narrow input before CPU-heavy map work.

    A parquet file is splittable only at row-group boundaries, so a
    single-row-group file scans as ONE task no matter the conf — and any
    expensive per-row transform downstream (shingling, hash folds, regex
    tokenization) then runs single-threaded. This helper restores a
    parallelism floor with one narrow exchange of the raw rows, which is
    orders of magnitude cheaper than serializing the map stage.

    It is a no-op when the scan already has enough partitions — the 100 TB
    case, where input files outnumber cores — so operators using it keep
    their shuffle budget at scale. (The check reads partition metadata
    only; nothing is executed.)"""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

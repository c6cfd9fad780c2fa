"""Raw-zone NDJSON source/sink (reference S3/S7).

The reference lands enriched long-format measurements as NDJSON under
``aq_raw/YYYY/MM/DD/HH/raw_*.json`` via boto3 ``put_object``
(``lambda_functions/openaq_fetcher/s3_uploader.py:87-156``) and reads the
whole zone back through a Glue DynamicFrame with ``recurse``
(``glue_jobs/process_openaq_raw.py:94-100``).

Spark-first: ``df.write.json`` emits NDJSON natively; the hourly path
layout becomes ``partitionBy`` over derived year/month/day/hour columns so
partition pruning works on read; reads use an explicit schema (never
inference — SURVEY.md §1.3) + ``recursiveFileLookup`` for layout-agnostic
scans. One reader serves batch and streaming (streaming/kernel.py wraps the
same schema contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from reddit_data_pipeline_engineering_spark.schemas import RAW_MEASUREMENT


def read_raw_zone(
    spark: SparkSession,
    path: str,
    schema: StructType = RAW_MEASUREMENT,
) -> DataFrame:
    """Recursive NDJSON scan with a pinned schema (S7).

    Explicit schema kills the VoidType-inference bug the reference patches
    defensively (process_openaq_raw.py:179-185) and skips the extra
    inference pass over the data.
    """
    return (
        spark.read.format("json")
        .schema(schema)
        .option("recursiveFileLookup", "true")
        .load(path)
    )


def write_raw_zone(
    df: DataFrame,
    path: str,
    ts_col: str = "datetime",
    mode: str = "append",
) -> None:
    """NDJSON raw-zone sink with hour-grain partition layout (S3/F9).

    The reference's f-string path templating (s3_uploader.py:127-131)
    becomes ``partitionBy(year, month, day, hour)`` — identical layout
    semantics, but written in parallel by executors and prunable on read.
    """
    ts = F.col(ts_col).cast("timestamp")
    (
        df.withColumn("year", F.year(ts))
        .withColumn("month", F.lpad(F.month(ts).cast("string"), 2, "0"))
        .withColumn("day", F.lpad(F.dayofmonth(ts).cast("string"), 2, "0"))
        .withColumn("hour", F.lpad(F.hour(ts).cast("string"), 2, "0"))
        .write.mode(mode)
        .partitionBy("year", "month", "day", "hour")
        .json(path)
    )

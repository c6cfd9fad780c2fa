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
from pyspark.sql import types as T
from pyspark.sql.types import StructType

from reddit_data_pipeline_engineering_spark.schemas import RAW_MEASUREMENT


CORRUPT_COL = "_corrupt_record"


def read_raw_zone(
    spark: SparkSession,
    path: str,
    schema: StructType = RAW_MEASUREMENT,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Recursive NDJSON scan with a pinned schema (S7).

    Explicit schema kills the VoidType-inference bug the reference patches
    defensively (process_openaq_raw.py:179-185) and skips the extra
    inference pass over the data.

    ``keep_corrupt=True`` adds the PERMISSIVE-mode corrupt-record column so
    malformed lines can be counted/quarantined instead of silently nulled —
    at ingest scale, bad rows are a metric, not a crash.
    """
    if keep_corrupt:
        schema = StructType(
            [*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    reader = (
        spark.read.format("json")
        .schema(schema)
        .option("recursiveFileLookup", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.load(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, corrupt_rows) from a keep_corrupt read — the quarantine
    pattern: clean rows continue, corrupt rows land in a dead-letter sink.

    The parsed scan is cached first: Spark refuses queries whose pruned
    column set is ONLY the internal corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and both halves
    read the same parse anyway.
    """
    df = df.cache()
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return clean, corrupt


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

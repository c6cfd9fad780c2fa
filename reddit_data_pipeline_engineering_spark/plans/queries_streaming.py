"""Streaming kernel as a driver-registry query.

Materializes a raw NDJSON zone from the events table, drains it through
the Structured Streaming marts kernel (watermarked cross-batch dedup,
windowed static pivot, stream-static broadcast enrich, checkpointed
parquet sink), and returns the sink contents.

No ``oracle_sql`` entry: stateful streaming execution is not
SQL-expressible, so the driver applies its rows-only check (the
batch-equivalence property is asserted exactly in
tests/test_streaming.py::test_streaming_matches_batch instead).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from reddit_data_pipeline_engineering_spark.config import EVENT_TYPES
from reddit_data_pipeline_engineering_spark.plans.queries import query
from reddit_data_pipeline_engineering_spark.sources.tables import load_table
from reddit_data_pipeline_engineering_spark.streaming.kernel import (
    read_raw_stream,
    run_stream_to_completion,
    streaming_marts,
    write_marts_stream,
)

_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("ts", T.StringType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


@query(
    "streaming_marts_kernel",
    None,  # stateful streaming: rows-only driver check (see module doc)
    "The marts kernel as Structured Streaming: NDJSON raw zone drained "
    "with availableNow through watermarked dedup + windowed static pivot "
    "+ stream-static enrich into a checkpointed parquet sink "
    "(SURVEY.md §2.9 reformulation)",
    tags=("streaming", "kernel"),
)
def q_streaming_marts_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # First week of events keeps the raw-zone materialization cheap at any
    # sf; the sentinel (far-future event) advances the watermark so every
    # real window is emitted before the availableNow drain stops.
    first_ts = ev.agg(F.min("ts")).head()[0]
    week = ev.filter(
        F.col("ts") < F.lit(first_ts) + F.expr("INTERVAL 7 DAYS")
    ).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "event_type",
        "value",
    )
    sentinel = spark.createDataFrame(
        [(-1, -1, "2030-01-01T00:00:00.000000", "sentinel", 0.0)], _STREAM_SCHEMA
    )

    tmp = tempfile.mkdtemp(prefix="rdpe_streamq_")
    raw, out, ckpt = (os.path.join(tmp, d) for d in ("raw", "out", "ckpt"))
    week.unionByName(sentinel).write.mode("overwrite").json(raw)

    stream = read_raw_stream(spark, raw, _STREAM_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    cust = load_table(spark, sf_dir, "customer")
    wide = streaming_marts(
        stream,
        cust,
        entity_col="user_id",
        ts_col="ts",
        param_col="event_type",
        value_col="value",
        param_values=list(EVENT_TYPES),
        dim_key="c_custkey",
        dim_cols={"city_name": "c_name", "mktsegment": "c_mktsegment"},
        watermark="2 hours",
        window_duration="1 hour",
    )
    run_stream_to_completion(write_marts_stream(wide, out, ckpt))
    return spark.read.parquet(out).filter(F.col("location_id") != "-1")


@query(
    "stateful_ema_stream",
    None,  # custom keyed state: rows-only driver check (see module doc)
    "applyInPandasWithState custom stateful operator: per-user EMA "
    "recurrence folded across micro-batches (order-dependent state no "
    "built-in streaming aggregate can express); two-file drain proves "
    "cross-trigger state carry",
    tags=("streaming", "stateful"),
)
def q_stateful_ema_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_data_pipeline_engineering_spark.streaming.stateful import (
        ema_stream,
    )

    import glob

    ev = load_table(spark, sf_dir, "events")
    first_ts = ev.agg(F.min("ts")).head()[0]
    day = ev.filter(
        F.col("ts") < F.lit(first_ts) + F.expr("INTERVAL 1 DAYS")
    ).filter(F.col("value").isNotNull())
    tmp = tempfile.mkdtemp(prefix="rdpe_emaq_")
    raw, out, ckpt = (os.path.join(tmp, d) for d in ("raw", "out", "ckpt"))
    os.makedirs(raw)
    # Two time-split micro-batch files built with SPARK writes (no rows
    # ever reach the driver — the fold operator sorts by ts within each
    # batch, so only the file split matters): first/second 12 hours of
    # the day, each written as one JSON part and moved into the raw zone
    # with a pinned mtime so maxFilesPerTrigger=1 drains them in order
    # and the query itself exercises cross-batch state carry.
    cut = F.lit(first_ts) + F.expr("INTERVAL 12 HOURS")
    for i, cond in enumerate(
        (F.col("ts") < cut, F.col("ts") >= cut)
    ):
        stage = os.path.join(tmp, f"stage{i}")
        (
            day.filter(cond)
            .select(
                "user_id",
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias(
                    "ts"
                ),
                "value",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .json(stage)
        )
        (part,) = glob.glob(os.path.join(stage, "part-*.json"))
        p = os.path.join(raw, f"b{i}.json")
        os.rename(part, p)
        os.utime(p, (1700000000 + i, 1700000000 + i))

    stream = (
        spark.readStream.format("json")
        .schema("user_id long, ts string, value double")
        .option("maxFilesPerTrigger", "1")
        .load(raw)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        ema_stream(stream, "user_id", "ts", "value", alpha=0.3)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    run_stream_to_completion(q)
    return spark.read.parquet(out)

"""Explicit schema contracts.

The reference infers schemas (Glue DynamicFrame / Crawler) and pins them
defensively after the fact (VoidType casts, ``process_openaq_raw.py:179-185``;
15-column test contract, ``tests/test_glue_output_schema.py:44-60``). The
engine inverts that: schemas are declared up front so reads never infer,
streaming plans are static, and the output contract is enforced by
construction.
"""

from __future__ import annotations

from pyspark.sql import types as T

from reddit_data_pipeline_engineering_spark.config import POLLUTANTS

# Long-format raw measurement — the NDJSON rows the reference's Lambda lands
# in the raw zone. Field set: extract_api.py:311-318 (base record) union
# extract_api.py:412-421 (location enrichment); types per
# doc/GLUE_JOBS_GUIDE.md:113-131.
RAW_MEASUREMENT = T.StructType(
    [
        T.StructField("sensor_id", T.LongType(), True),
        T.StructField("datetime", T.StringType(), True),  # ISO-8601 w/ offset
        T.StructField("value", T.DoubleType(), True),
        T.StructField("parameter", T.StringType(), True),
        T.StructField("unit", T.StringType(), True),
        T.StructField("extracted_at", T.StringType(), True),
        T.StructField("location_id", T.LongType(), True),
        T.StructField("location_name", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("timezone", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
    ]
)

# Location dimension — data/mock_locations_vn.json flattened per
# extract_api.py:374-404.
LOCATION_DIM = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("locality", T.StringType(), True),
        T.StructField("timezone", T.StringType(), True),
        T.StructField("country_code", T.StringType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("datetime_last", T.StringType(), True),
        T.StructField("sensor_ids", T.ArrayType(T.LongType()), True),
    ]
)

# Wide marts contract — 15 columns, verbatim from
# tests/test_glue_output_schema.py:44-60 plus the 7th pollutant `bc`
# (handler.py:124). Partition columns: year int, month/day zero-padded
# strings (process_openaq_raw.py:124-127).
MARTS = T.StructType(
    [
        T.StructField("location_id", T.StringType(), False),
        T.StructField("datetime", T.TimestampType(), False),
        T.StructField("year", T.IntegerType(), False),
        T.StructField("month", T.StringType(), False),
        T.StructField("day", T.StringType(), False),
        *[T.StructField(p, T.DoubleType(), True) for p in POLLUTANTS],
        T.StructField("city_name", T.StringType(), True),
        T.StructField("country_code", T.StringType(), False),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
    ]
)

# Multimodal document schema — opaque binary payload + typed metadata
# (engine extension beyond the reference; see sources/multimodal.py).
MULTIMODAL_ASSET = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

"""Paginated-API extraction adapters (reference S1/S2/P2/P8).

The reference's Lambda fetches OpenAQ REST pages driver-side
(``lambda_functions/openaq_fetcher/extract_api.py``): S1 pages all
locations until an empty page (:38-104), P2 filters to active sensors with
the required parameters (:111-186), S2 pulls time-ranged measurements per
sensor and flattens the nested JSON (:193-268), and P8 validates the
trigger payload (handler.py:104-134).

Engine shape: the HTTP layer is a pluggable ``fetch`` callable (tests
inject fixtures; production injects a requests-based client), the page
loop here stays driver-side (sufficient at the reference scale of ~53
locations / ~150 sensors, SURVEY.md §4), and everything after
``createDataFrame`` is Spark: nested structs are flattened with
dot-path projections (F7) and the active-sensor filter is expressed as
Spark filters so the same predicate serves any source.

As of r07 the executor-side form also exists:
``sources/datasource.py`` registers a Python Data Source
(``spark.read.format("openaq")``) that runs the SAME page/per-sensor
loops as partitioned scans with Catalyst sensor_id filter pushdown —
use it when the sensor population outgrows a driver loop. The
operators below (flatten, active filter, enrichment) consume either
path unchanged.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from reddit_data_pipeline_engineering_spark.config import (
    ACTIVE_LOOKBACK_DAYS,
    LOCATIONS_PAGE_SIZE,
    POLLUTANTS,
)
from reddit_data_pipeline_engineering_spark.functions.text import normalize_token

# A page-fetch callable: (page_number, page_size) -> list of result dicts
# (empty list = no more pages, the reference's stop condition :94-104).
PageFetcher = Callable[[int, int], list[dict]]

# Nested location shape at the API boundary (data/mock_locations_vn.json):
# coordinates / country structs and a sensors array of (id, parameter).
API_LOCATION = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("locality", T.StringType(), True),
        T.StructField("timezone", T.StringType(), True),
        T.StructField(
            "coordinates",
            T.StructType(
                [
                    T.StructField("latitude", T.DoubleType(), True),
                    T.StructField("longitude", T.DoubleType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "country",
            T.StructType(
                [
                    T.StructField("id", T.LongType(), True),
                    T.StructField("code", T.StringType(), True),
                    T.StructField("name", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "datetimeLast",
            T.StructType([T.StructField("utc", T.StringType(), True)]),
            True,
        ),
        T.StructField(
            "sensors",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType(), True),
                        T.StructField(
                            "parameter",
                            T.StructType(
                                [
                                    T.StructField("id", T.LongType(), True),
                                    T.StructField("name", T.StringType(), True),
                                    T.StructField("units", T.StringType(), True),
                                ]
                            ),
                            True,
                        ),
                    ]
                )
            ),
            True,
        ),
    ]
)


def fetch_all_locations(
    spark: SparkSession,
    fetch: PageFetcher,
    page_size: int = LOCATIONS_PAGE_SIZE,
    max_pages: int = 1000,
) -> DataFrame:
    """S1: page loop until empty page -> one locations DataFrame.

    The union-of-pages (reference U1, ``all_locations.extend``) is a single
    ``createDataFrame`` over the accumulated pages — rows at this boundary
    are small dimension metadata, not fact data.
    """
    rows: list[dict] = []
    for page in range(1, max_pages + 1):
        batch = fetch(page, page_size)
        if not batch:
            break
        rows.extend(batch)
    return spark.createDataFrame(rows, API_LOCATION)


def flatten_locations(locations: DataFrame) -> DataFrame:
    """F7: dot-path struct flattening (extract_api.py:381-404) — the
    engine's projection replaces per-row dict digging."""
    return locations.select(
        F.col("id").alias("location_id"),
        F.col("name").alias("location_name"),
        "locality",
        "timezone",
        F.col("coordinates.latitude").alias("latitude"),
        F.col("coordinates.longitude").alias("longitude"),
        F.col("country.code").alias("country_code"),
        F.col("datetimeLast.utc").cast("timestamp").alias("datetime_last"),
        "sensors",
    )


def active_sensors(
    locations: DataFrame,
    now_utc: str,
    required_parameters: Sequence[str] = POLLUTANTS,
    lookback_days: int = ACTIVE_LOOKBACK_DAYS,
) -> DataFrame:
    """P2: sensors of recently-reporting locations whose parameter (after
    lower/strip-dot normalization, F4) is in the required set.

    One explode + two filters — the semi-join semantics SURVEY §2.3 calls
    for, with the parameter normalization fix of extract_api.py:168-179
    ('PM2.5' matches 'pm25').
    """
    flat = flatten_locations(locations)
    cutoff = F.lit(now_utc).cast("timestamp") - F.expr(
        f"INTERVAL {int(lookback_days)} DAYS"
    )
    recent = flat.filter(F.col("datetime_last") >= cutoff)
    sensors = recent.select(
        "location_id",
        "location_name",
        "locality",
        "timezone",
        "country_code",
        "latitude",
        "longitude",
        F.explode("sensors").alias("sensor"),
    ).select(
        F.col("sensor.id").alias("sensor_id"),
        normalize_token(F.col("sensor.parameter.name")).alias("parameter"),
        F.col("sensor.parameter.units").alias("unit"),
        "location_id",
        "location_name",
        "locality",
        "timezone",
        "country_code",
        "latitude",
        "longitude",
    )
    return sensors.filter(
        F.col("parameter").isin([normalize_token_py(p) for p in required_parameters])
    )


def normalize_token_py(p: str) -> str:
    """Python twin of functions.text.normalize_token for literal lists."""
    return p.lower().replace(".", "")


# Measurement fetch callable: (sensor_id, date_from, date_to, limit) ->
# list of measurement dicts in the flattened long format.
MeasurementFetcher = Callable[[int, str, str, int], list[dict]]


def extract_measurements(
    spark: SparkSession,
    fetch: MeasurementFetcher,
    sensor_ids: Iterable[int],
    date_from: str,
    date_to: str,
    limit: int = 1000,
    extracted_at: str | None = None,
) -> DataFrame:
    """S2: time-ranged measurement scan per sensor -> long DataFrame.

    The time-range predicate is pushed INTO the fetch call (the
    reference's API-side pushdown, SURVEY §4); ``extracted_at`` stamps the
    batch (F6) — passed in, not now(), so runs are reproducible.
    """
    rows: list[dict] = []
    for sid in sensor_ids:
        batch = fetch(int(sid), date_from, date_to, limit)
        rows.extend(batch)
    schema = T.StructType(
        [
            T.StructField("sensor_id", T.LongType(), True),
            T.StructField("datetime", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("parameter", T.StringType(), True),
            T.StructField("unit", T.StringType(), True),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    if extracted_at is not None:
        df = df.withColumn("extracted_at", F.lit(extracted_at))
    return df


def enrich_measurements(measurements: DataFrame, sensors: DataFrame) -> DataFrame:
    """J2 as a broadcast hash join: the reference's per-row dict lookup
    (extract_api.py:374-422) becomes one broadcast of the sensor dim."""
    dim = sensors.select(
        "sensor_id",
        "location_id",
        "location_name",
        F.col("locality").alias("city"),
        "timezone",
        F.col("country_code").alias("country"),
        "latitude",
        "longitude",
    ).dropDuplicates(["sensor_id"])
    return measurements.join(F.broadcast(dim), "sensor_id", "left")


def validate_event(event: dict) -> dict:
    """P8: trigger-payload validation (handler.py:104-134) — plain Python
    argument checking at the engine API boundary."""
    problems = []
    if not isinstance(event.get("file_name"), str) or not event.get("file_name"):
        problems.append("file_name: non-empty string required")
    if "lookback_hours" in event:
        lb = event["lookback_hours"]
        if not isinstance(lb, int) or isinstance(lb, bool) or not 1 <= lb <= 168:
            problems.append("lookback_hours: int in [1, 168] required")
    params = event.get("required_parameters", list(POLLUTANTS))
    if not isinstance(params, list) or not all(isinstance(p, str) for p in params):
        problems.append("required_parameters: list[str] required")
    if problems:
        raise ValueError("; ".join(problems))
    return {
        "file_name": event["file_name"],
        "lookback_hours": event.get("lookback_hours", 24),
        "required_parameters": [normalize_token_py(p) for p in params],
    }

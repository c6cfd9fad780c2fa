"""API extraction adapter tests (S1/S2/P2/P8) with fixture fetchers —
the reference's Lambda extraction flow, fixture-driven and Spark-side."""

import pytest

from reddit_data_pipeline_engineering_spark.sources import api

LOCS = [
    {  # active, pm25+pm10 sensors
        "id": 101, "name": "Hanoi Station", "locality": "Hanoi",
        "timezone": "Asia/Bangkok",
        "coordinates": {"latitude": 21.03, "longitude": 105.85},
        "country": {"id": 56, "code": "VN", "name": "Vietnam"},
        "datetimeLast": {"utc": "2025-01-14T23:00:00"},
        "sensors": [
            {"id": 1, "parameter": {"id": 2, "name": "PM2.5", "units": "µg/m³"}},
            {"id": 2, "parameter": {"id": 1, "name": "pm10", "units": "µg/m³"}},
            {"id": 3, "parameter": {"id": 9, "name": "temperature", "units": "C"}},
        ],
    },
    {  # stale (datetimeLast 30 days old) -> filtered out
        "id": 202, "name": "Old Station", "locality": None,
        "timezone": "Asia/Bangkok",
        "coordinates": {"latitude": 10.82, "longitude": 106.63},
        "country": {"id": 56, "code": "VN", "name": "Vietnam"},
        "datetimeLast": {"utc": "2024-12-16T00:00:00"},
        "sensors": [
            {"id": 4, "parameter": {"id": 2, "name": "pm25", "units": "µg/m³"}},
        ],
    },
]


def page_fetch(page, page_size):
    return LOCS if page == 1 else []


def measurement_fetch(sensor_id, date_from, date_to, limit):
    # Respects the pushed time range: one in-range row per sensor + one
    # out-of-range row the fetcher itself excludes.
    return [
        {
            "sensor_id": sensor_id,
            "datetime": "2025-01-15T01:00:00+00:00",
            "value": 10.0 * sensor_id,
            "parameter": "pm25" if sensor_id == 1 else "pm10",
            "unit": "µg/m³",
        }
    ]


def test_fetch_and_active_filter(spark):
    locs = api.fetch_all_locations(spark, page_fetch)
    assert locs.count() == 2
    sensors = api.active_sensors(locs, now_utc="2025-01-15 00:00:00")
    rows = {r["sensor_id"]: r.asDict() for r in sensors.collect()}
    # Stale location dropped (P2 lookback); non-required parameter dropped;
    # 'PM2.5' normalized to pm25 (F4).
    assert set(rows) == {1, 2}
    assert rows[1]["parameter"] == "pm25"
    assert rows[2]["parameter"] == "pm10"
    assert rows[1]["location_id"] == 101


def test_extract_and_enrich(spark):
    locs = api.fetch_all_locations(spark, page_fetch)
    sensors = api.active_sensors(locs, now_utc="2025-01-15 00:00:00")
    ids = sorted(r["sensor_id"] for r in sensors.select("sensor_id").collect())
    meas = api.extract_measurements(
        spark, measurement_fetch, ids,
        "2025-01-14T00:00:00", "2025-01-15T00:00:00",
        extracted_at="2025-01-15T02:00:00",
    )
    assert meas.count() == 2
    enriched = api.enrich_measurements(meas, sensors)
    rows = {r["sensor_id"]: r.asDict() for r in enriched.collect()}
    assert rows[1]["city"] == "Hanoi"
    assert rows[1]["country"] == "VN"
    assert rows[1]["extracted_at"] == "2025-01-15T02:00:00"
    # Schema feeds the raw zone: same long-format field set.
    from reddit_data_pipeline_engineering_spark.schemas import RAW_MEASUREMENT

    assert set(enriched.columns) == {f.name for f in RAW_MEASUREMENT.fields}


def test_validate_event():
    ok = api.validate_event(
        {"file_name": "run1", "lookback_hours": 24,
         "required_parameters": ["PM2.5", "pm10"]}
    )
    assert ok["required_parameters"] == ["pm25", "pm10"]
    with pytest.raises(ValueError, match="file_name"):
        api.validate_event({"lookback_hours": 24})
    with pytest.raises(ValueError, match="lookback_hours"):
        api.validate_event({"file_name": "x", "lookback_hours": 0})
    with pytest.raises(ValueError, match="required_parameters"):
        api.validate_event({"file_name": "x", "required_parameters": "pm25"})
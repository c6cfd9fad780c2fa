"""Python DataSource connector (sources/datasource.py) — executor-side
paginated extraction replacing the driver-side fetch loop.

Everything runs against the deterministic synthetic transport (no
network): 7 locations over ceil(7/page_size) pages, 2 sensors each,
hourly measurements derived from (sensor_id, hour).
"""

import pytest
from pyspark.sql import functions as F

from reddit_data_pipeline_engineering_spark.sources.datasource import (
    OpenAQDataSource,
    _MeasurementsReader,
    synthetic_transport,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(OpenAQDataSource)
    # Runtime-settable; the engine session factory sets it by default
    # (session.RUNTIME_CONFS) — mirrored here because the shared test
    # session may predate that conf.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark


def _locations(registered, **opts):
    r = (
        registered.read.format("openaq")
        .option("table", "locations")
        .option("transport", "synthetic")
        .option("page_size", "3")
    )
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def _case_locations_strided_pagination_is_complete(registered):
    """N strided partitions must union to exactly the full page walk —
    no page read twice, none skipped, at several partition widths."""
    base = {(r["id"], r["name"]) for r in _locations(registered).collect()}
    assert base == {(i, f"loc{i}") for i in range(1, 8)}
    for n in (1, 2, 7, 16):
        got = {
            (r["id"], r["name"])
            for r in _locations(registered, num_partitions=n).collect()
        }
        assert got == base, n


def _case_locations_nested_schema_roundtrip(registered):
    """The nested API shape survives the connector: struct fields and
    the sensors array are queryable with dot paths + explode, feeding
    the same flatten_locations/active_sensors operators as the
    driver-side path."""
    from reddit_data_pipeline_engineering_spark.sources.api import (
        active_sensors,
    )

    df = _locations(registered)
    flat = df.select(
        "id",
        F.col("coordinates.latitude").alias("lat"),
        F.col("country.code").alias("cc"),
        F.size("sensors").alias("n_sensors"),
    )
    rows = {r["id"]: (r["lat"], r["cc"], r["n_sensors"]) for r in flat.collect()}
    assert rows[3] == (13.0, "VN", 2)
    sens = active_sensors(df, now_utc="2025-06-02T00:00:00")
    assert sens.count() == 14  # 7 locations x 2 required-parameter sensors


def _case_measurements_partitioned_fetch_and_values(registered):
    df = (
        registered.read.format("openaq")
        .option("table", "measurements")
        .option("transport", "synthetic")
        .option("sensor_ids", "11,21,31")
        .option("date_from", "2025-06-01T00:00:00Z")
        .option("date_to", "2025-06-01T04:00:00Z")
        .option("num_partitions", "2")
        .load()
    )
    rows = df.collect()
    assert len(rows) == 12  # 3 sensors x 4 hours
    one = {
        (r["datetime"], r["value"])
        for r in rows
        if r["sensor_id"] == 21
    }
    assert ("2025-06-01T02:00:00Z", 22.0) in one  # 21 % 100 + 2*0.5
    assert {r["parameter"] for r in rows} <= {"pm25", "pm10"}


def _case_measurements_sensor_filter_prunes_partitions(registered):
    """A sensor_id filter must reach the reader via pushFilters and
    prune the fetch plan to the surviving ids."""
    df = (
        registered.read.format("openaq")
        .option("table", "measurements")
        .option("transport", "synthetic")
        .option("sensor_ids", "11,21,31,41")
        .option("date_from", "2025-06-01T00:00:00Z")
        .option("date_to", "2025-06-01T02:00:00Z")
        .load()
    )
    got = df.filter(F.col("sensor_id") == 21).collect()
    assert {r["sensor_id"] for r in got} == {21} and len(got) == 2
    got_in = df.filter(F.col("sensor_id").isin(11, 31)).collect()
    assert {r["sensor_id"] for r in got_in} == {11, 31}

    # Unit-level: the reader's plan itself shrinks (no API call is even
    # planned for pruned sensors).
    from pyspark.sql.datasource import EqualTo

    rd = _MeasurementsReader(
        {
            "sensor_ids": "11,21,31,41",
            "date_from": "2025-06-01T00:00:00Z",
            "date_to": "2025-06-01T02:00:00Z",
            "transport": "synthetic",
        }
    )
    rest = list(rd.pushFilters([EqualTo(("sensor_id",), 21)]))
    assert rest == [] and rd.sensor_ids == [21]
    assert sum(len(p.sensor_ids) for p in rd.partitions()) == 1


def test_measurements_missing_options_raise(registered):
    with pytest.raises(Exception, match="sensor_ids"):
        (
            registered.read.format("openaq")
            .option("table", "measurements")
            .option("transport", "synthetic")
            .option("date_from", "x")
            .option("date_to", "y")
            .load()
            .collect()
        )


def test_synthetic_transport_shapes():
    """The fake honors page_size and prefix-contiguous pagination."""
    status, body, _ = synthetic_transport(
        "https://x/locations", {"page": 3, "limit": 3}, {}, 1.0
    )
    assert status == 200 and [d["id"] for d in body["results"]] == [7]
    status, body, _ = synthetic_transport(
        "https://x/locations", {"page": 4, "limit": 3}, {}, 1.0
    )
    assert body["results"] == []


def _case_streaming_measurements_windowed_drain(registered, tmp_path):
    """spark.readStream.format('openaq'): the event-time high-water-mark
    offset advances one window per micro-batch until end_time, and the
    availableNow drain lands exactly the batch reader's rows — the
    streaming-native form of the reference's scheduled polling."""
    from reddit_data_pipeline_engineering_spark.streaming.kernel import (
        run_stream_to_completion,
    )

    common = dict(
        transport="synthetic",
        sensor_ids="11,21",
        date_from="2025-06-01T00:00:00Z",
        date_to="2025-06-01T06:00:00Z",
    )
    batch = (
        registered.read.format("openaq")
        .option("table", "measurements")
        .options(**common)
        .load()
    )
    want = {tuple(r) for r in batch.collect()}
    assert len(want) == 12  # 2 sensors x 6 hours

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = (
        registered.readStream.format("openaq")
        .option("table", "measurements")
        .option("transport", "synthetic")
        .option("sensor_ids", "11,21")
        .option("start_time", "2025-06-01T00:00:00Z")
        .option("end_time", "2025-06-01T06:00:00Z")
        .option("window_hours", "2")  # one 2h window per drain
        .load()
    )

    def drain():
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        run_stream_to_completion(q)
        return {tuple(r) for r in registered.read.parquet(out).collect()}

    # availableNow resolves the available end offset once per run, so
    # each drain advances exactly one window; three drains catch up and
    # a fourth (nothing new: offset pinned at end_time) is a no-op —
    # each restart resuming from the checkpointed offset.
    sizes = []
    for _ in range(4):
        got = drain()
        sizes.append(len(got))
    assert sizes == [4, 8, 12, 12]
    assert got == want


def test_streaming_reader_offset_semantics():
    """Unit-level offset walk: windows advance by window_hours, clamp to
    end_time, and a caught-up reader returns its start offset unchanged
    (the no-new-data signal)."""
    from reddit_data_pipeline_engineering_spark.sources.datasource import (
        _MeasurementsStreamReader,
    )

    rd = _MeasurementsStreamReader(
        {
            "sensor_ids": "11",
            "start_time": "2025-06-01T00:00:00Z",
            "end_time": "2025-06-01T03:00:00Z",
            "window_hours": "2",
            "transport": "synthetic",
        }
    )
    o0 = rd.initialOffset()
    assert o0 == {"until": "2025-06-01T00:00:00Z"}
    rows1, o1 = rd.read(o0)
    assert o1 == {"until": "2025-06-01T02:00:00Z"} and len(list(rows1)) == 2
    rows2, o2 = rd.read(o1)  # clamped final hour
    assert o2 == {"until": "2025-06-01T03:00:00Z"} and len(list(rows2)) == 1
    rows3, o3 = rd.read(o2)  # caught up
    assert o3 == o2 and list(rows3) == []
    # replay is deterministic
    assert len(list(rd.readBetweenOffsets(o0, o1))) == 2


# Concurrent execution (the parity/streaming fixture pattern): the five
# Spark-driving cases are independent reads/drains with isolated temp
# dirs, so a module fixture runs them over a thread pool; the
# parametrized test re-raises each recorded outcome.

from concurrent.futures import ThreadPoolExecutor as _TPE

_DS_CASES = {
    "locations_strided_pagination_is_complete": (
        _case_locations_strided_pagination_is_complete, False),
    "locations_nested_schema_roundtrip": (
        _case_locations_nested_schema_roundtrip, False),
    "measurements_partitioned_fetch_and_values": (
        _case_measurements_partitioned_fetch_and_values, False),
    "measurements_sensor_filter_prunes_partitions": (
        _case_measurements_sensor_filter_prunes_partitions, False),
    "streaming_measurements_windowed_drain": (
        _case_streaming_measurements_windowed_drain, True),
}


@pytest.fixture(scope="module")
def ds_outcomes(registered, tmp_path_factory):
    def run(item):
        name, (fn, needs_tmp) = item
        try:
            if needs_tmp:
                fn(registered, tmp_path_factory.mktemp(f"ds_{name}"))
            else:
                fn(registered)
            return None
        except BaseException as exc:  # noqa: BLE001 - re-raised per test
            return exc

    with _TPE(max_workers=5) as ex:
        return dict(zip(_DS_CASES, ex.map(run, _DS_CASES.items())))


@pytest.mark.parametrize("name", list(_DS_CASES))
def test_datasource_case(name, ds_outcomes):
    res = ds_outcomes[name]
    if res is not None:
        raise res

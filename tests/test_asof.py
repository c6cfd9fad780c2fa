"""As-of / range join operator unit tests (edge cases the registry query
doesn't isolate: tolerance windows, no-match rows, duplicate left
timestamps, inclusive-equality matching)."""

from pyspark.sql import functions as F

from reddit_data_pipeline_engineering_spark.operators.asof import asof_join, range_join


def _ts(s):
    return f"2025-01-01 {s}:00"


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("09:00"), "a"),
            (1, _ts("09:30"), "b"),
            (1, _ts("09:30"), "b2"),  # duplicate left timestamp
            (1, _ts("08:00"), "early"),  # before any right row
            (2, _ts("09:00"), "other"),  # key with no right rows at all
        ],
        "k long, ts string, tag string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (1, _ts("08:30"), 10.0),
            (1, _ts("09:30"), 20.0),  # equal to a left ts -> inclusive match
        ],
        "k long, ts string, px double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return left, right


def test_asof_backward_inclusive_and_nulls(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", right_cols=("px",))
    got = {(r["k"], r["tag"]): (r["ts_right"], r["px_right"]) for r in out.collect()}
    assert len(got) == 5 and out.count() == 5  # one output row per input row
    assert got[(1, "a")][1] == 10.0  # 09:00 -> 08:30 row
    assert got[(1, "b")][1] == 20.0  # 09:30 -> equal-ts row (inclusive)
    assert got[(1, "early")] == (None, None)  # nothing at-or-before
    assert got[(2, "other")] == (None, None)  # key absent from right


def test_asof_duplicate_left_ts_not_multiplied(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", right_cols=("px",))
    dups = [r for r in out.collect() if r["tag"] in ("b", "b2")]
    assert len(dups) == 2  # one output row per input row, no fanout
    assert all(r["px_right"] == 20.0 for r in dups)


def test_asof_tolerance_voids_stale_matches(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", right_cols=("px",), tolerance_seconds=600
    )
    got = {(r["k"], r["tag"]): r["px_right"] for r in out.collect()}
    # 09:00 -> 08:30 is 30 min old, beyond the 10-min tolerance: voided.
    assert got[(1, "a")] is None
    assert got[(1, "b")] == 20.0  # 0 s old: kept


def test_range_join_half_open(spark):
    points = spark.createDataFrame(
        [(1, _ts("09:00")), (1, _ts("10:00")), (1, _ts("08:00"))],
        "k long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [(1, _ts("09:00"), _ts("10:00"), "w1")],
        "k long, lo string, hi string, name string",
    ).withColumn("lo", F.col("lo").cast("timestamp")).withColumn(
        "hi", F.col("hi").cast("timestamp")
    )
    out = range_join(points, intervals, "k", "ts", "lo", "hi")
    rows = out.collect()
    # Half-open: 09:00 in, 10:00 (== hi) out, 08:00 out.
    assert len(rows) == 1 and str(rows[0]["ts"]) == "2025-01-01 09:00:00"
    assert rows[0]["name"] == "w1"

def test_asof_join_forward_matches_brute_force(spark):
    """direction='forward' must pick the EARLIEST right row at-or-after
    each left timestamp (inclusive at ties), void matches beyond the
    tolerance, and leave unmatched rows NULL."""
    from reddit_data_pipeline_engineering_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 205), (1, 300), (2, 50), (3, 10)],
        "k long, ts long",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    right = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (1, 290, "c"), (2, 40, "d")],
        "k long, ts long, v string",
    ).withColumn("ts", F.timestamp_seconds("ts"))

    got = {
        (r.k, r.ts.timestamp()): r.v_next
        for r in asof_join(
            left, right, on="k", right_cols=("v",), suffix="_next",
            direction="forward",
        ).collect()
    }
    assert got == {
        (1, 100.0): "a",   # inclusive tie
        (1, 205.0): "c",   # next at-or-after
        (1, 300.0): None,  # nothing after
        (2, 50.0): None,   # right row is BEFORE the left ts
        (3, 10.0): None,   # key absent from right
    }

    bounded = {
        (r.k, r.ts.timestamp()): r.v_next
        for r in asof_join(
            left, right, on="k", right_cols=("v",), suffix="_next",
            direction="forward", tolerance_seconds=60,
        ).collect()
    }
    assert bounded[(1, 205.0)] is None  # 290 is 85s away > 60s tolerance
    assert bounded[(1, 100.0)] == "a"


def test_asof_join_differential_vs_pandas_merge_asof(spark):
    """Both directions, with and without tolerance, against pandas
    merge_asof — the reference implementation of the semantics — on a
    deterministic multi-key dataset with duplicate left timestamps,
    exact ties, and sparse keys."""
    import pandas as pd

    from reddit_data_pipeline_engineering_spark.operators.asof import asof_join

    rng = [(k, t) for k in (1, 2, 3) for t in (5, 10, 10, 17, 40, 41)]
    left_pd = pd.DataFrame(
        {"k": [k for k, _ in rng], "ts": [t for _, t in rng]}
    )
    right_rows = [(1, 4, 10.0), (1, 10, 11.0), (1, 39, 12.0),
                  (2, 10, 20.0), (2, 25, 21.0), (3, 100, 30.0)]
    right_pd = pd.DataFrame(
        {"k": [k for k, _, _ in right_rows],
         "ts": [t for _, t, _ in right_rows],
         "v": [v for _, _, v in right_rows]}
    )
    left = spark.createDataFrame(left_pd).withColumn(
        "ts", F.timestamp_seconds("ts")
    )
    right = spark.createDataFrame(right_pd).withColumn(
        "ts", F.timestamp_seconds("ts")
    )

    for direction in ("backward", "forward"):
        for tol in (None, 6):
            got = asof_join(
                left, right, on="k", right_cols=("v",),
                direction=direction, tolerance_seconds=tol,
            ).collect()
            got_sorted = sorted(
                (r.k, r.ts.timestamp(), r.v_right) for r in got
            )
            exp = pd.merge_asof(
                left_pd.assign(ts=pd.to_datetime(left_pd.ts, unit="s"))
                .sort_values(["ts", "k"]),
                right_pd.assign(ts=pd.to_datetime(right_pd.ts, unit="s"))
                .sort_values(["ts", "k"]),
                on="ts", by="k", direction=direction,
                tolerance=pd.Timedelta(seconds=tol) if tol else None,
            )
            exp_sorted = sorted(
                (int(r.k), r.ts.timestamp(),
                 None if pd.isna(r.v) else float(r.v))
                for r in exp.itertuples()
            )
            assert got_sorted == exp_sorted, (direction, tol)

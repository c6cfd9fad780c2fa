"""Bucket-bisection exact median vs the straight sorted-middle answer."""

import random

from reddit_data_pipeline_engineering_spark.operators.selection import (
    grouped_median_selection,
)


def _expected(vals):
    s = sorted(vals)
    n = len(s)
    if n % 2:
        return s[(n + 1) // 2 - 1]
    return (s[n // 2 - 1] + s[n // 2]) / 2


def test_selection_median_matches_sorted_middle(spark):
    rng = random.Random(11)
    data = []
    groups = {
        "a": [rng.uniform(-100, 100) for _ in range(501)],   # odd n
        "b": [rng.uniform(0, 1) for _ in range(500)],        # even n
        "c": [3.25] * 40,                                    # all equal
        "d": [7.5],                                          # single value
        "e": [rng.choice([1.0, 2.0, 5.0]) for _ in range(333)],  # heavy dups
    }
    for g, vs in groups.items():
        data += [(g, v) for v in vs]
    data += [("a", None), ("b", None)]  # nulls ignored
    df = spark.createDataFrame(data, "g string, v double")
    got = {
        r["g"]: (r["n_values"], r["median_value"])
        for r in grouped_median_selection(df, "g", "v").collect()
    }
    for g, vs in groups.items():
        assert got[g][0] == len(vs)
        assert got[g][1] == _expected(vs), (g, got[g][1], _expected(vs))


def test_selection_median_long_groups(spark):
    rng = random.Random(5)
    vals = [rng.uniform(-1e6, 1e6) for _ in range(2000)]
    df = spark.createDataFrame([(1, v) for v in vals], "g bigint, v double")
    (row,) = grouped_median_selection(df, "g", "v").collect()
    assert row["median_value"] == _expected(vals)
    assert row["n_values"] == 2000

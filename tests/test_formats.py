"""Format matrix: lossless round-trips for every supported format."""

import pytest
from pyspark.sql import types as T

from reddit_data_pipeline_engineering_spark.sources import formats

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("part", T.StringType(), True),
    ]
)

ROWS = [
    (1, "plain", 1.5, "a"),
    (2, 'quote " comma , newline-free', -2.25, "a"),
    (3, None, None, "b"),
    (4, "", 0.0, "b"),  # empty string must stay distinct from NULL
]


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_lossless(spark, tmp_path, fmt):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / fmt)
    formats.write_table(df, path, fmt=fmt)
    back = formats.read_table(spark, path, SCHEMA, fmt=fmt)
    assert back.schema == SCHEMA
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "pt")
    formats.write_table(df, path, fmt="parquet", partition_by=["part"])
    back = formats.read_table(spark, path, SCHEMA, fmt="parquet")
    pruned = back.filter(back.part == "a")
    assert pruned.count() == 2
    # Partition filter must prune at scan time, not post-filter.
    assert "PartitionFilters: [isnotnull(part" in pruned._jdf.queryExecution(
    ).executedPlan().toString() or "part#" in str(
        pruned._jdf.queryExecution().sparkPlan()
    )


def test_parquet_compression_codec(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = tmp_path / "z"
    formats.write_table(df, str(path), fmt="parquet")
    files = list(path.glob("*.zstd.parquet")) + list(path.glob("*.parquet"))
    assert files
    assert any(".zstd." in f.name for f in files)

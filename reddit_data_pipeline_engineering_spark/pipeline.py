"""End-to-end batch pipeline: the reference's whole Airflow DAG as one
SparkSession program (SURVEY.md §3.1 collapse).

Reference lifecycle (6 orchestrated AWS services, ``dags/openaq_dag.py``):
Lambda extract -> S3 raw zone -> Glue transform -> Glue Crawler ->
Athena validation — every arrow a process/network boundary with
JSON-over-XCom glue. Here: read -> transform -> write -> register ->
validate inside one session; the only boundary left is driver<->executors.

Stage mapping (file:line = reference):
  1. read       raw NDJSON, pinned schema     process_openaq_raw.py:94-100
  2. parse      ts cast + invalid drop        :118-127 + openaq_etl.py:293-297
  3. kernel     dedup -> pivot -> enrich      :131-198 (via plans/marts.py)
  4. audit      schema + null counts          :213-231 (observe, zero jobs)
  5. write      partitioned parquet           :249-256 (dynamic overwrite)
  6. register+validate                        glue_pipeline.py:15-102
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_data_pipeline_engineering_spark import catalog as cat
from reddit_data_pipeline_engineering_spark.config import (
    FILL_DEFAULTS,
    LOCATION_CITY_MAP,
    POLLUTANTS,
)
from reddit_data_pipeline_engineering_spark.functions.datetime_fns import (
    drop_invalid_datetime,
)
from reddit_data_pipeline_engineering_spark.functions.text import normalize_token
from reddit_data_pipeline_engineering_spark.operators.audit import (
    assert_columns,
    observe_nulls,
)
from reddit_data_pipeline_engineering_spark.operators.dedup import distinct_by_key
from reddit_data_pipeline_engineering_spark.plans.marts import build_marts, write_marts
from reddit_data_pipeline_engineering_spark.sources.raw_zone import read_raw_zone


@dataclass
class PipelineResult:
    rows_written: int
    table: str | None
    validation_counts: dict[str, int] = field(default_factory=dict)


def build_location_dim(raw: DataFrame) -> DataFrame:
    """Location dimension from the raw stream itself (J1's
    dropDuplicates-built dim, process_openaq_raw.py:179-185), with the
    reference's explicit-cast VoidType defense now a schema guarantee."""
    return distinct_by_key(
        raw.select(
            "location_id",
            F.col("city").alias("city_name"),
            F.col("country").alias("country_code"),
            "latitude",
            "longitude",
        ),
        ["location_id"],
    )


def transform_raw(raw: DataFrame) -> DataFrame:
    """Stages 2-4: parse -> kernel -> partition columns over the OpenAQ
    domain (parameter names normalized per F4 so 'PM2.5' rows land in the
    pm25 column)."""
    parsed = drop_invalid_datetime(raw, "datetime", "ts").withColumn(
        "parameter", normalize_token("parameter")
    )
    dim = build_location_dim(parsed)
    wide = build_marts(
        parsed,
        dim,
        entity_col="location_id",
        ts_col="ts",
        param_col="parameter",
        value_col="value",
        param_values=list(POLLUTANTS),
        tiebreak=["extracted_at", "value"],
        dim_key="location_id",
        dim_cols={
            "city_name": "city_name",
            "country_code": "country_code",
            "latitude": "latitude",
            "longitude": "longitude",
        },
        fill_defaults=FILL_DEFAULTS,
        static_overrides=(
            "city_name",
            {str(k): v for k, v in LOCATION_CITY_MAP.items()},
        ),
    )
    return wide


def main(argv: list[str] | None = None) -> PipelineResult:
    """CLI entry point: ``python -m reddit_data_pipeline_engineering_spark.pipeline
    [--config settings.conf] --input <raw_zone> --output <marts_dir>
    [--table NAME]`` — the whole reference DAG as one command. CLI flags
    beat the config file's ``file_paths``/``catalog`` sections, which
    beat nothing (both may come from RDPE_* env vars — settings.py)."""
    import argparse

    from reddit_data_pipeline_engineering_spark.session import get_spark
    from reddit_data_pipeline_engineering_spark.settings import load_settings

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="INI settings file")
    p.add_argument("--input", default=None, help="raw-zone NDJSON directory")
    p.add_argument("--output", default=None, help="marts parquet directory")
    p.add_argument("--table", default=None, help="catalog table to register")
    args = p.parse_args(argv)
    settings = load_settings(args.config)
    input_path = args.input or settings.input_path
    output_path = args.output or settings.output_path
    table = args.table or settings.table
    if not input_path or not output_path:
        p.error("--input/--output required (flag, config file, or RDPE_* env)")
    spark = get_spark(app_name="rdpe-pipeline")
    res = run_pipeline(spark, input_path, output_path, table=table)
    print(
        f"rows_written={res.rows_written} table={res.table} "
        f"validation={res.validation_counts}"
    )
    return res


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    table: str | None = None,
) -> PipelineResult:
    """The full DAG, one process. Returns write/validation stats."""
    raw = read_raw_zone(spark, input_path)
    wide = transform_raw(raw)

    # Stage 4 audit: contract presence (P7) + null metrics without an
    # extra job (P6 via observe — the write action collects them).
    assert_columns(
        wide, ["location_id", "datetime", "year", "month", "day", *POLLUTANTS]
    )
    wide = observe_nulls(wide, ["location_id", "datetime"], name="marts_audit")

    write_marts(wide, output_path)

    validation: dict[str, int] = {}
    if table is not None:
        cat.register_parquet_table(
            spark, table, output_path, partition_cols=("year", "month", "day")
        )
        # Stage 6 validation (glue_pipeline.py:45-102): table non-empty.
        validation[table] = cat.get_table_count(spark, table)
        rows = validation[table]
    else:
        rows = spark.read.parquet(output_path).count()
    return PipelineResult(rows_written=rows, table=table, validation_counts=validation)


if __name__ == "__main__":
    main()

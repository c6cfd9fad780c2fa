from reddit_data_pipeline_engineering_spark.sources.tables import TABLE_NAMES, load_table  # noqa: F401

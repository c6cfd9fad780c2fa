"""reddit_data_pipeline_engineering_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference pipeline (``stevetran77/Reddit-Data-Pipeline-Engineering``, an
OpenAQ air-quality ETL: Lambda extract -> S3 raw zone -> Glue PySpark
transform -> Glue catalog -> Athena SQL), collapsed into a single
Spark-first engine:

- ``sources``   — table/raw-zone readers and the catalog surface
                  (replaces S3 + Glue Crawler + Athena submit/poll).
- ``operators`` — relational operators (dedup, pivot, enrich, top-k,
                  audit) plus large-scale LLM-data-pipeline operators
                  (MinHash/SimHash/Jaccard/prefix-filtered exact dedup,
                  embedding similarity + IVF/PQ ANN, graph kernels:
                  PageRank, components, triangles, BFS, k-core, LPA).
- ``functions`` — column-expression bundles (datetime, text analysis,
                  AQI, vector math). No row-at-a-time Python UDFs.
- ``plans``     — end-to-end pipelines (the marts kernel) and the named
                  query registry with DuckDB oracle SQL for every query.
- ``streaming`` — Structured Streaming variant of the kernel.
- ``pipeline`` / ``catalog`` / ``query`` — the reference's whole DAG as
                  one SparkSession program, with crawler/Athena-equivalent
                  registration and SQL surfaces.

Everything is expressed against the DataFrame/SQL API so Catalyst picks
physical strategies (broadcast joins, partial aggregation, pushdown);
Python touches rows only in Arrow-batched mapInPandas stages (multimodal
decode, vectorized embedding scoring) — never row-at-a-time UDFs.
"""

__version__ = "0.4.0"

from reddit_data_pipeline_engineering_spark.session import get_spark  # noqa: F401

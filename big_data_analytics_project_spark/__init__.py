"""big_data_analytics_project_spark — a PySpark-native analytics engine.

Clean-room rebuild (Spark-first, DataFrame/SQL/Catalyst) of the query and
data-processing capabilities of the reference repo
``umutcalikkasap/big-data-analytics-project`` (e-commerce purchase-intent
analytics: batch sessionization, MLlib intent model, structured streaming),
generalized into a reusable operator library and extended with
large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Layout:
    session        SparkSession factory with scale-oriented defaults
    schemas        explicit StructTypes for every input table
    sources/       typed readers + sinks (parquet/csv/json/stream)
    operators/     relational + extension operator library
    functions/     scalar/array/vector helpers (JVM-side first)
    plans/         end-to-end pipelines mirroring the reference entry points
    streaming/     structured-streaming pipelines
    ml/            MLlib pipelines (intent RF, ALS recommender)

All operators are registered in ``registry.py`` as (spark_fn, oracle_sql)
pairs consumed by ``__spark_entry__.py`` for differential verification
against a DuckDB oracle.
"""

__version__ = "0.1.0"

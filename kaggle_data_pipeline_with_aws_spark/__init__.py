"""kaggle_data_pipeline_with_aws_spark — a PySpark-native analytics engine.

A ground-up Spark rebuild of the *capabilities* of
``NishanthMuruganantham/kaggle-data-pipeline-with-aws`` (a serverless
AWS ETL pipeline that flattens nested Cricsheet match JSON into two
relational tables, tracks incremental per-file state, materializes CSVs
and publishes them; see SURVEY.md): the data model, operator set,
incremental-processing semantics and analytical query surface — expressed
as declarative DataFrame plans that Catalyst/Tungsten optimize, designed
for 100 TB scale rather than single-Lambda execution.

Layout:
    session       SparkSession factory (AQE, shuffle sizing, UTC, Arrow)
    schemas       explicit StructTypes for every table (SURVEY §1.3)
    sources/      readers (parquet/csv/json landing zone, gated Mongo)
    operators/    flatten / ledger / renumber / dedup / similarity / text
    functions/    scalar column-expression helpers (SURVEY §2.8)
    plans/        analytical query suite + TPC-H-shaped operator queries
    streaming/    incremental file-source pipeline (SURVEY §2.9)
    materialize   EP3: renumber + enrich-join + sorted CSV/parquet output
    pipeline      the EP1→EP3 DAG as one driver program
"""

__version__ = "0.1.0"

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
    ingest        raw-zone zip fetch/extract with atomic landing (S1/S2)
    sources/      readers + sinks (parquet/csv/json zone, gated Mongo,
                  document store, compaction, spread_for_compute guard)
    operators/    flatten / ledger / renumber / dedup / similarity /
                  text / asof / interval / sketch / components / skew /
                  multimodal
    functions/    scalar column-expression helpers (SURVEY §2.8)
    plans/        q01-q51 relational + d01-d46 LLM-data + s01-s05
                  streaming faces (102 registered queries, 97 with a
                  DuckDB oracle twin; see plans/registry.py)
    streaming/    incremental file-source pipeline (SURVEY §2.9)
    materialize   EP3: renumber + enrich-join + sorted CSV/parquet output
    pipeline      the EP1→EP3 DAG as one driver program
"""

__version__ = "0.1.0"

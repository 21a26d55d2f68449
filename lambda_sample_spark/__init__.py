"""lambda_sample_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference Lambda-architecture
IoT pipeline (nuald/lambda-sample), re-expressed Spark-first.

Layout:
  session.py   SparkSession factory (AQE, UTC, arrow, nanos-parquet)
  io.py        testdata loaders (TPC-H-ish star schema + events/docs/embeddings)
  operators/   relational + analytic operators (SURVEY.md §2)
  sources/     source/sink codecs (CSV, JSON, synthetic generator)
  functions/   reusable column expressions (scoring, vectors, text)
  ml/          batch-layer ML (random forest train/predict)
  streaming/   Structured Streaming ingest/snapshot pipelines
  plans/       physical-plan audit helpers (pushdown/codegen checks)
"""

__version__ = "0.1.0"

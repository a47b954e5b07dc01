"""Tooling surfaces (SURVEY.md §3.2-3.3): synthetic data generator,
Parquet inspector, and the pipeline CLI lives in
:mod:`parquet_combiner_spark.cli`."""

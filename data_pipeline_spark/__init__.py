"""data_pipeline_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch engine with the query and data-processing capabilities of the
reference ETL pipeline (0xlearner/data-pipeline, Rust/Polars), re-expressed
Spark-first:

- change-event log (binlog/WAL-style) over url-keyed web-page records
  (:mod:`data_pipeline_spark.sources.changelog`)
- typed parse with fallback coalesce cascades
  (:mod:`data_pipeline_spark.functions.parse`)
- HTML→record extraction as vectorized pandas/Arrow UDFs
  (:mod:`data_pipeline_spark.functions.extract`)
- per-key (warc_ts, lsn) last-writer-wins dedup
  (:mod:`data_pipeline_spark.operators.dedup`)
- key-bucketed MERGE INTO upserts against an Iceberg-style lake table with
  atomic, idempotent, epoch-keyed snapshot commits
  (:mod:`data_pipeline_spark.lake`)
- schema registry + evolution (:mod:`data_pipeline_spark.plans.registry`)
- checkpointed, resumable replay (:mod:`data_pipeline_spark.streaming`)

Everything here targets Spark's distributed execution model: declarative
DataFrame plans (Catalyst optimizes), map-side-combinable aggregations instead
of windows where possible, bucket-pruned merges so per-epoch work is
proportional to the epoch — not the table — and explicit skew handling.
"""

__version__ = "0.1.0"

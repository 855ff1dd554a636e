"""franzoxide_spark — a PySpark-native analytics/ETL engine.

A ground-up re-expression of the capabilities of the reference system
(valdo404/franzoxide, a Rust Kafka-Connect-style Kafka->S3 connector; see
/root/reference) as an idiomatic Apache Spark engine:

- batch relational query surface (DataFrame/SQL, Catalyst-optimized),
- the reference's streaming ETL pipeline re-built on Structured Streaming
  (Kafka source, partitioned object sink, JSON-envelope encoding),
- LLM-training-data pipeline operators (dedup, similarity search, text
  analysis, multimodal column plumbing) designed for 100 TB scale.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the public reference repo, and published papers.
"""

__version__ = "0.1.0"

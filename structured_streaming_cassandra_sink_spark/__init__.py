"""structured_streaming_cassandra_sink_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference (epishova/Structured-Streaming-Cassandra-Sink:
a Kafka -> Structured Streaming -> Cassandra foreach sink, see SURVEY.md),
generalized into a full operator library:

- ``session``   — SparkSession factory (ref cassandra_sink.scala:43-59, minus
                  the JVM-serialization trick which is meaningless in PySpark).
- ``schemas``   — explicit StructType registry for every dataset (engine
                  policy: declared schemas, never inference in prod paths).
- ``sources``   — batch + streaming readers over parquet/JSON-lines/rate,
                  mirroring the Kafka envelope (``value: string``).
- ``operators`` — relational core (joins/aggs/windows/setops), dedup,
                  similarity search, text analysis, multimodal columns.
- ``plans``     — the query registry that __spark_entry__.py exposes to the
                  driver, plus the flagship pipeline.
- ``streaming`` — streaming twin of the flagship pipeline, watermarked
                  windows, foreachBatch sink adapters (parquet local twin,
                  Cassandra connector for production).

Everything is DataFrame/Catalyst-first: logical plans are declared with the
DataFrame/SQL API; Python (Arrow-batched pandas UDFs) only where built-ins
cannot express the semantics.
"""

__version__ = "0.1.0"

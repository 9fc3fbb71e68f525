"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference pipeline ``thejasono/api-kakfa-spark-airflow-s3-athena``
(Kafka -> Spark Structured Streaming -> S3 -> Athena SQL), re-expressed
Spark-first:

- the Kafka->parse->flatten streaming dataflow (reference
  ``spark/app/spark_processing.py``) lives in :mod:`.streaming` and
  :mod:`.functions.transforms`;
- the producer's row-level Python transforms (reference
  ``dags/producer/kafka_streaming_service.py``) are DataFrame-native
  column expressions in :mod:`.functions.transforms`;
- the Athena SQL surface (reference ``docs/athena-integrity-check.md``)
  plus a full analytical extension (joins, windows, set ops, grouping
  sets, subqueries) lives in :mod:`.plans`;
- large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal columns) live in :mod:`.operators`.

Everything is DataFrame/SQL-first: Catalyst owns optimization, shuffles
are minimized by broadcasting dimensions and pre-aggregating, and Python
only runs inside Arrow-vectorized pandas UDFs where built-ins genuinely
cannot express the semantics.
"""

__version__ = "0.1.0"

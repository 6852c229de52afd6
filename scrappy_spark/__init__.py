"""scrappy_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference pipeline
(``SebastianFrazier26/scrappy``: academic-article ETL, filter queries,
n-gram term mining, TF-IDF classification, embedding/topic taxonomy)
as an idiomatic Apache Spark engine, plus the large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) the reference lacks.

Design stance (see SURVEY.md):
- DataFrame / Spark SQL first; Catalyst does pushdown/pruning/join
  selection. No hand-scheduled execution.
- Built-in ``pyspark.sql.functions`` in every hot path; Pandas UDFs only
  for model inference and connector HTTP fetch.
- Every operator designed for a 1000-executor / 100 TB deployment even
  though tests run on local[*]: broadcast small sides, window-dedup not
  driver loops, partial aggregation, AQE on.
"""

__version__ = "0.1.0"

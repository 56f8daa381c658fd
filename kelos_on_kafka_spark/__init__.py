"""kelos_on_kafka_spark — a PySpark-native streaming engine with the
query/data-processing capabilities of emanuel-metzenthin/KELOS-on-Kafka
(KDE-based local outlier detection over sliding stream windows), built
Spark-first: DataFrame/SQL plans, Arrow-vectorized grouped pandas stages
for the algorithmic core, Structured Streaming with watermarks and an
exactly-once idempotent sink.
"""

from kelos_on_kafka_spark.config import DEFAULT_CONFIG, KelosConfig

__all__ = ["DEFAULT_CONFIG", "KelosConfig"]
__version__ = "0.1.0"

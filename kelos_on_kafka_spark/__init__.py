"""kelos_on_kafka_spark — a PySpark-native streaming engine with the
query/data-processing capabilities of emanuel-metzenthin/KELOS-on-Kafka
(KDE-based local outlier detection over sliding stream windows), built
Spark-first: DataFrame/SQL plans, Arrow-vectorized grouped pandas stages
for the algorithmic core, Structured Streaming with watermarks and an
exactly-once idempotent sink.
"""

from kelos_on_kafka_spark.config import DEFAULT_CONFIG, KelosConfig

__all__ = [
    "DEFAULT_CONFIG",
    "KelosConfig",
    "detect_outliers",
    "detect_outliers_streamwise",
    "kelos_debug_tables",
    "kelos_stream",
    "write_outlier_stream",
    "featurize_pages",
    "get_spark",
]
__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level exports (keeps `import kelos_on_kafka_spark` cheap —
    the heavy pyspark imports happen on first use)."""
    if name in ("detect_outliers", "detect_outliers_streamwise", "kelos_debug_tables"):
        from kelos_on_kafka_spark.operators import kelos_batch

        return getattr(kelos_batch, name)
    if name == "kelos_stream":
        from kelos_on_kafka_spark.streaming.engine import kelos_stream

        return kelos_stream
    if name == "write_outlier_stream":
        from kelos_on_kafka_spark.streaming.sink import write_outlier_stream

        return write_outlier_stream
    if name == "featurize_pages":
        from kelos_on_kafka_spark.functions.features import featurize_pages

        return featurize_pages
    if name == "get_spark":
        from kelos_on_kafka_spark.plans.session import get_spark

        return get_spark
    raise AttributeError(name)

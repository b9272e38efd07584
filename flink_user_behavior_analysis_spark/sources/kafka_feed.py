"""Kafka test-data feeder (reference S4, KafkaProducerUtil.java:22-47:
read UserBehavior.csv line by line, produce each line to a topic).

Two equivalent paths, both gated on environment availability (no Kafka
broker or connector jar ships in this container):

- feed_file_to_kafka: plain kafka-python producer, line-per-message —
  the literal util translation for dev use.
- feed_df_to_kafka:   df.write.format('kafka') — the Spark-native
  batch produce (value column -> message), which is what a real
  cluster job would use (parallel, partitioned by Kafka's partitioner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feed_file_to_kafka(path: str, topic: str, brokers: str) -> int:
    """Produce each line of a local file to a Kafka topic. Returns the
    number of messages sent. Requires the kafka-python package and a
    reachable broker — raises NotImplementedError otherwise."""
    try:
        from kafka import KafkaProducer  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "kafka-python is not installed in this environment; "
            "pip install kafka-python on a real deployment"
        ) from exc
    producer = KafkaProducer(bootstrap_servers=brokers)
    n = 0
    with open(path, "rb") as fh:
        for line in fh:
            producer.send(topic, line.rstrip(b"\n"))
            n += 1
    producer.flush()
    producer.close()
    return n


def feed_df_to_kafka(df: DataFrame, topic: str, brokers: str,
                     value_cols: list[str] | None = None) -> None:
    """Batch-produce a DataFrame to Kafka: rows become CSV-ish values
    (concat_ws of value_cols, or all columns). Needs the
    spark-sql-kafka connector jar on the classpath."""
    cols = value_cols or df.columns
    out = df.select(
        F.concat_ws(",", *[F.col(c).cast("string") for c in cols]).alias("value")
    )
    try:
        (out.write.format("kafka")
         .option("kafka.bootstrap.servers", brokers)
         .option("topic", topic)
         .save())
    except Exception as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "kafka connector jar (spark-sql-kafka-0-10) not on classpath "
            "in this environment; add it via --packages on a real cluster"
        ) from exc

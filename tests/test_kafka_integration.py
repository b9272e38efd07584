"""Kafka end-to-end (S1/S4): produce the events table to a topic with
feed_df_to_kafka, read it back through the Kafka source, and assert
the windowed hot-items counts match the file path exactly.

Runs only when BOTH hold (reference ingestion path,
HotItem.java:46-54 + KafkaProducerUtil.java:22-47):
- the spark-sql-kafka-0-10 connector jar is on the classpath
  (public Maven: org.apache.spark:spark-sql-kafka-0-10_2.13), and
- SPARK_GRAFT_KAFKA_BROKERS points at a reachable broker.
Skips cleanly offline — this container ships neither.
"""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from flink_user_behavior_analysis_spark.operators import windowed_count
from flink_user_behavior_analysis_spark.sources import load_table
from flink_user_behavior_analysis_spark.sources.kafka_feed import feed_df_to_kafka
from flink_user_behavior_analysis_spark.sources.readers import (
    kafka_available,
    kafka_source,
)

BROKERS = os.environ.get("SPARK_GRAFT_KAFKA_BROKERS")


def _require_kafka(spark):
    if not BROKERS:
        pytest.skip("SPARK_GRAFT_KAFKA_BROKERS not set — no broker to test against")
    if not kafka_available(spark):
        pytest.skip("spark-sql-kafka-0-10 connector jar not on classpath")


def _events_csv_shaped(spark, sf_dir):
    """events rows in the reference's CSV-line shape (S4 produces
    line-per-message; ts as epoch micros so the round trip is exact)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long").alias("item_id"),
    )


def _parse_kafka_values(raw):
    p = F.split(F.col("value").cast("string"), ",")
    return raw.select(
        p.getItem(0).cast("long").alias("event_id"),
        p.getItem(1).cast("long").alias("user_id"),
        p.getItem(2).alias("event_type"),
        F.timestamp_micros(p.getItem(3).cast("long")).alias("ts"),
        p.getItem(4).cast("long").alias("item_id"),
    )


def test_kafka_end_to_end_hot_items_parity(spark, sf_dir):
    _require_kafka(spark)
    topic = f"fuba-it-{uuid.uuid4().hex[:8]}"
    ev = _events_csv_shaped(spark, sf_dir)
    feed_df_to_kafka(ev, topic, BROKERS)

    # bounded batch read of everything produced
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
    )
    round_tripped = _parse_kafka_values(raw)
    assert round_tripped.count() == ev.count()

    got = windowed_count(
        round_tripped.where(F.col("event_type") == "view"),
        "ts", ["item_id"], "1 hour", "15 minutes",
    )
    want = windowed_count(
        ev.select("event_type", "item_id",
                  F.timestamp_micros("ts_us").alias("ts"))
        .where(F.col("event_type") == "view"),
        "ts", ["item_id"], "1 hour", "15 minutes",
    )
    key = lambda df: sorted(
        (r.window_end_us, r.item_id, r.cnt) for r in df.collect()
    )
    assert key(got) == key(want)


def test_kafka_stream_source_drains(spark, sf_dir):
    """kafka_source (streaming, S1) sees every produced message."""
    _require_kafka(spark)
    from flink_user_behavior_analysis_spark.streaming import run_available_now

    topic = f"fuba-it-{uuid.uuid4().hex[:8]}"
    ev = _events_csv_shaped(spark, sf_dir).limit(1000)
    feed_df_to_kafka(ev, topic, BROKERS)
    stream = kafka_source(spark, BROKERS, topic, starting_offsets="earliest")
    got = run_available_now(stream, "append")
    assert got.count() == 1000

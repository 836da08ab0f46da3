"""Kafka transport: option-contract tests that always run, and
connector/broker end-to-end tests behind capability probes (VERDICT
r7 item 5 — mirror of the multimodal codec-probe pattern).

Gating:
- connector tests skip unless the spark-sql-kafka jar resolves
  (``kafka_connector_available``; absent from the pip pyspark wheel —
  launch recipe in that function's docstring);
- the end-to-end test additionally needs a live broker at
  ``$KAFKA_BOOTSTRAP_SERVERS`` (one-liner:
  ``docker run -p 9092:9092 apache/kafka``).

The e2e path is the real thing when it runs: produce the sf0.001
events through ``serialize_event_value`` → batch kafka writer, read
them back through ``open_event_stream`` (the factory's kafka branch),
run the SAME tumbling-window aggregation the driver checks, and
compare row-for-row with the batch twin over the original parquet.
"""

from __future__ import annotations

import os
import uuid

import pytest

from vector_db_setup_spark.streaming.sources import (
    EVENT_COLUMNS,
    kafka_connector_available,
    kafka_source_options,
    open_event_stream,
    parse_event_value,
    serialize_event_value,
)

RECIPE = (
    "kafka connector jar absent — run with --packages "
    "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark_version> and a "
    "broker at $KAFKA_BOOTSTRAP_SERVERS (docker run -p 9092:9092 "
    "apache/kafka)"
)


def _connector(spark):
    if not kafka_connector_available(spark):
        pytest.skip(RECIPE)


def _broker():
    servers = os.environ.get("KAFKA_BOOTSTRAP_SERVERS")
    if not servers:
        pytest.skip(
            "no broker: set KAFKA_BOOTSTRAP_SERVERS (e.g. "
            "localhost:9092 after `docker run -p 9092:9092 apache/kafka`)"
        )
    return servers


# ------------------------------------------------ always-run contract


def test_kafka_source_options_defaults_and_stringify():
    got = kafka_source_options(
        {
            "kafka.bootstrap.servers": "h:9092",
            "subscribe": "events",
            "maxOffsetsPerTrigger": 100000,
        }
    )
    assert got["startingOffsets"] == "earliest"  # fresh-job default
    assert got["failOnDataLoss"] == "true"  # loud on aged-out offsets
    assert got["maxOffsetsPerTrigger"] == "100000"  # stringified
    # explicit values are never overridden
    got2 = kafka_source_options(
        {
            "kafka.bootstrap.servers": "h:9092",
            "assign": '{"events":[0]}',
            "startingOffsets": "latest",
            "failOnDataLoss": False,
        }
    )
    assert got2["startingOffsets"] == "latest"
    assert got2["failOnDataLoss"] == "False"


def test_kafka_source_options_validation():
    with pytest.raises(ValueError, match="bootstrap"):
        kafka_source_options({"subscribe": "t"})
    with pytest.raises(ValueError, match="exactly one"):
        kafka_source_options({"kafka.bootstrap.servers": "h:9092"})
    with pytest.raises(ValueError, match="exactly one"):
        kafka_source_options(
            {
                "kafka.bootstrap.servers": "h:9092",
                "subscribe": "a",
                "subscribePattern": "b.*",
            }
        )


# ------------------------------------- connector-gated (no broker IO)


def test_kafka_reader_builds_and_parses_schema(spark):
    """With the jar on the classpath the factory's kafka branch must
    BUILD (no broker contact at load()) and yield the engine event
    schema + dead-letter column."""
    _connector(spark)
    df = open_event_stream(
        spark,
        {
            "format": "kafka",
            "options": {
                "kafka.bootstrap.servers": "localhost:1",
                "subscribe": "never-started",
            },
        },
    )
    assert df.isStreaming
    assert set(df.columns) == set(EVENT_COLUMNS) | {"_corrupt"}


def test_kafka_option_passthrough_on_real_reader(spark):
    """The normalized options reach the actual readStream relation:
    the analyzed plan of a built kafka source carries the subscription
    and offset options verbatim."""
    _connector(spark)
    df = open_event_stream(
        spark,
        {
            "format": "kafka",
            "options": {
                "kafka.bootstrap.servers": "localhost:1",
                "subscribe": "opts-probe-topic",
                "maxOffsetsPerTrigger": 12345,
            },
        },
    )
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "opts-probe-topic" in plan
    # option casing survives into the DSv2 options map
    assert "12345" in plan or "maxOffsetsPerTrigger" in plan


# --------------------------------------------- broker-gated end-to-end


def test_kafka_end_to_end_tumbling(spark, tmp_path):
    """Produce the fixture events onto a fresh topic, stream them back
    through the factory, and pin the tumbling-window counts to the
    batch twin over the original parquet — the full bus path with real
    messages."""
    _connector(spark)
    servers = _broker()
    from tests.conftest import SF_SMOKE
    from vector_db_setup_spark import queries as q
    from vector_db_setup_spark.sources.registry import load_table
    from vector_db_setup_spark.streaming.events import (
        run_to_memory,
        tumbling_counts_stream,
    )

    topic = f"events-e2e-{uuid.uuid4().hex[:12]}"
    events = load_table(spark, SF_SMOKE, "events")
    (
        serialize_event_value(events)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
        .save()
    )
    stream = open_event_stream(
        spark,
        {
            "format": "kafka",
            "options": {
                "kafka.bootstrap.servers": servers,
                "subscribe": topic,
                "startingOffsets": "earliest",
            },
        },
    )
    # dead-letter must be empty: every produced payload parses
    got = run_to_memory(
        tumbling_counts_stream(stream.drop("_corrupt")), "kafka_e2e"
    )
    want = q.events_tumbling(spark, SF_SMOKE)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_kafka_value_roundtrip_without_broker(spark):
    """serialize → parse round-trip on BATCH rows — the exact payload
    contract the e2e test exercises over the bus, runnable anywhere."""
    from tests.conftest import SF_SMOKE
    from vector_db_setup_spark.sources.registry import load_table

    events = load_table(spark, SF_SMOKE, "events").limit(50)
    back = parse_event_value(serialize_event_value(events))
    assert back.filter("_corrupt IS NOT NULL").count() == 0
    a = sorted(
        map(tuple, events.select(*EVENT_COLUMNS).collect())
    )
    b = sorted(
        map(tuple, back.select(*EVENT_COLUMNS).collect())
    )
    assert a == b

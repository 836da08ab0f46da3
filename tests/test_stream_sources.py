"""The streaming source factory's config contract
(streaming/sources.py): shape validation fails at build time, the
kafka value-parsing path is proven on batch data without the connector
jar, and every transport emits the engine-wide event schema."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_db_setup_spark.sources.registry import load_table
from vector_db_setup_spark.streaming.sources import (
    EVENT_COLUMNS,
    open_event_stream,
    parse_event_value,
)


def test_config_validation_fails_at_build_time(spark):
    with pytest.raises(ValueError, match="'format' key"):
        open_event_stream(spark, {})
    with pytest.raises(ValueError, match="unknown stream source"):
        open_event_stream(spark, {"format": "pulsar"})
    with pytest.raises(ValueError, match="requires options.path"):
        open_event_stream(spark, {"format": "file", "options": {}})
    with pytest.raises(ValueError, match="unsupported file-source"):
        open_event_stream(
            spark,
            {"format": "file", "options": {"path": SF_SMOKE, "bogus": 1}},
        )
    # the documented FileStreamSource analogues DO pass through
    s = open_event_stream(
        spark,
        {
            "format": "file",
            "options": {"path": SF_SMOKE, "latestFirst": "true",
                        "maxFileAge": "7d"},
        },
    )
    assert s.isStreaming
    with pytest.raises(ValueError, match="bootstrap.servers"):
        open_event_stream(spark, {"format": "kafka", "options": {}})
    with pytest.raises(ValueError, match="exactly one of subscribe"):
        open_event_stream(
            spark,
            {
                "format": "kafka",
                "options": {"kafka.bootstrap.servers": "h:9092"},
            },
        )
    with pytest.raises(ValueError, match="exactly one of subscribe"):
        open_event_stream(
            spark,
            {
                "format": "kafka",
                "options": {
                    "kafka.bootstrap.servers": "h:9092",
                    "subscribe": "t",
                    "assign": "x",
                },
            },
        )


def test_kafka_needs_connector_jar_in_this_container(spark):
    """A well-formed kafka config reaches Spark's source lookup, which
    fails here because the spark-sql-kafka connector jar is not in the
    container (it ships with standard Spark distributions). The error
    is the connector-missing one — NOT a config error — proving the
    factory's own validation passed."""
    cfg = {
        "format": "kafka",
        "options": {
            "kafka.bootstrap.servers": "h:9092",
            "subscribe": "events",
        },
    }
    with pytest.raises(Exception, match="[kK]afka"):
        open_event_stream(spark, cfg)


def test_parse_event_value_roundtrip_on_batch(spark):
    """The kafka value-JSON decode, proven against real fixture rows
    WITHOUT the connector: serialize the batch events table to JSON
    payload bytes (what a producer would put on the bus), parse with
    the factory's parser, and require the exact original rows back."""
    ev = load_table(spark, SF_SMOKE, "events").limit(200)
    payloads = ev.select(
        F.to_json(
            F.struct(*[F.col(c) for c in EVENT_COLUMNS]),
            # default to_json truncates ts to millis; a producer that
            # cares (ours does — event ordering ties) serializes micros
            {"timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"},
        ).cast("binary").alias("value")
    )
    parsed = parse_event_value(payloads)
    assert parsed.filter(F.col("_corrupt").isNotNull()).count() == 0
    got = sorted(
        tuple(r) for r in parsed.select(*EVENT_COLUMNS).collect()
    )
    want = sorted(tuple(r) for r in ev.select(*EVENT_COLUMNS).collect())
    assert got == want


def test_parse_event_value_dead_letters_corrupt_payloads(spark):
    rows = [
        ('{"event_id": 1, "ts": "2026-01-01 00:00:00", "user_id": 2, '
         '"event_type": "view", "value": 1.5, "props": "{}"}',),
        ("this is not json",),
        (None,),
    ]
    raw = spark.createDataFrame(rows, "value string").select(
        F.col("value").cast("binary").alias("value")
    )
    parsed = parse_event_value(raw).collect()
    ok = [r for r in parsed if r["_corrupt"] is None]
    bad = [r for r in parsed if r["_corrupt"] is not None]
    # both the malformed payload AND the null payload (a compacted-
    # topic tombstone) dead-letter; only the real event passes
    assert len(ok) == 1
    assert sorted(r["_corrupt"] for r in bad) == [
        "<null payload>",
        "this is not json",
    ]
    assert ok[0]["event_type"] == "view" and ok[0]["value"] == 1.5


def test_file_and_rate_transports_share_event_schema(spark):
    f = open_event_stream(
        spark, {"format": "file", "options": {"path": SF_SMOKE}}
    )
    r = open_event_stream(
        spark, {"format": "rate", "options": {"rowsPerSecond": 10}}
    )
    assert f.columns == EVENT_COLUMNS
    assert r.columns == EVENT_COLUMNS
    assert f.isStreaming and r.isStreaming
    with pytest.raises(ValueError, match="unsupported rate-source"):
        open_event_stream(
            spark, {"format": "rate", "options": {"nope": 1}}
        )


def test_serialize_parse_roundtrip(spark):
    """serialize_event_value must be the exact inverse of
    parse_event_value: batch events -> kafka (key, value) bytes ->
    parsed rows == original rows, zero dead letters, key == event_id."""
    from vector_db_setup_spark.streaming.sources import serialize_event_value

    ev = load_table(spark, SF_SMOKE, "events").limit(150)
    wire = serialize_event_value(ev)
    assert wire.columns == ["key", "value"]
    parsed = parse_event_value(wire)
    assert parsed.filter(F.col("_corrupt").isNotNull()).count() == 0
    got = sorted(tuple(r) for r in parsed.select(*EVENT_COLUMNS).collect())
    want = sorted(tuple(r) for r in ev.select(*EVENT_COLUMNS).collect())
    assert got == want
    keys = {
        int(bytes(r["key"]).decode()) for r in wire.select("key").collect()
    }
    assert keys == {r["event_id"] for r in ev.select("event_id").collect()}


def test_sink_config_validation(spark):
    from vector_db_setup_spark.streaming.sources import open_event_sink

    stream = open_event_stream(
        spark, {"format": "file", "options": {"path": SF_SMOKE}}
    )
    with pytest.raises(ValueError, match="'format' key"):
        open_event_sink(stream, {})
    with pytest.raises(ValueError, match="checkpointLocation"):
        open_event_sink(stream, {"format": "file", "options": {"path": "/x"}})
    with pytest.raises(ValueError, match="checkpointLocation"):
        open_event_sink(
            stream,
            {"format": "kafka",
             "options": {"kafka.bootstrap.servers": "h:9092", "topic": "t"}},
        )
    with pytest.raises(ValueError, match="topic"):
        open_event_sink(
            stream,
            {"format": "kafka",
             "options": {"kafka.bootstrap.servers": "h:9092",
                         "checkpointLocation": "/ckpt"}},
        )
    with pytest.raises(ValueError, match="queryName"):
        open_event_sink(stream, {"format": "memory", "options": {}})
    with pytest.raises(ValueError, match="unknown stream sink"):
        open_event_sink(stream, {"format": "pulsar"})


def test_file_source_to_file_sink_end_to_end(spark, tmp_path):
    """The full config-driven loop: file source -> file sink (parquet,
    availableNow) -> read back rows == batch table."""
    from vector_db_setup_spark.streaming.sources import open_event_sink

    stream = open_event_stream(
        spark, {"format": "file", "options": {"path": SF_SMOKE}}
    )
    out = str(tmp_path / "out")
    writer = open_event_sink(
        stream,
        {"format": "file",
         "options": {"path": out,
                     "checkpointLocation": str(tmp_path / "ckpt")}},
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    got = sorted(
        tuple(r) for r in spark.read.parquet(out).select(*EVENT_COLUMNS).collect()
    )
    want = sorted(
        tuple(r)
        for r in load_table(spark, SF_SMOKE, "events")
        .select(*EVENT_COLUMNS)
        .collect()
    )
    assert got == want

"""Opt-in Kafka BROKER integration tests for the transactional EOS sink.

Mirrors the reference's broker-backed suite
(crates/arkflow-plugin/tests/kafka_eos.rs: smoke_broker_and_roundtrip,
atomic_commit_observes_whole_batch, zombie_fenced_across_restart) against
a REAL broker, exercising the confluent-kafka adapter that the
spool-faked tests in test_kafka_eos.py cannot touch.

Gated on the environment (skipped-not-failed in this container):
  ARKFLOW_KAFKA_BROKERS=localhost:9092 python -m pytest \
      tests/test_kafka_broker_integration.py -v
needs the confluent-kafka client installed and a reachable broker (e.g.
the KRaft single-node container the reference's suite starts via
testcontainers — kafka_eos.rs:88-119).
"""

from __future__ import annotations

import os
import uuid

import pytest

BROKERS = os.environ.get("ARKFLOW_KAFKA_BROKERS", "")

try:  # the client is not baked into this container
    import confluent_kafka  # noqa: F401

    _HAVE_CLIENT = True
except ImportError:
    _HAVE_CLIENT = False

pytestmark = pytest.mark.skipif(
    not (BROKERS and _HAVE_CLIENT),
    reason=(
        "broker integration is opt-in: set ARKFLOW_KAFKA_BROKERS and"
        " install confluent-kafka"
    ),
)


def _read_committed(topic: str, expect: int, timeout_s: float = 20.0):
    """Drain a topic with isolation.level=read_committed — aborted
    transactions must be invisible (kafka_eos.rs:216-252)."""
    from confluent_kafka import Consumer

    c = Consumer(
        {
            "bootstrap.servers": BROKERS,
            "group.id": f"arkflow-it-{uuid.uuid4().hex}",
            "auto.offset.reset": "earliest",
            "isolation.level": "read_committed",
            "enable.auto.commit": False,
        }
    )
    c.subscribe([topic])
    out = []
    import time

    deadline = time.time() + timeout_s
    while time.time() < deadline and len(out) < expect:
        msg = c.poll(0.5)
        if msg is None or msg.error():
            continue
        out.append(msg.value())
    c.close()
    return out


def _sink(topic: str, tx_id: str):
    from arkflow_spark.sinks import KafkaOutput

    return KafkaOutput(
        {
            "brokers": BROKERS.split(","),
            "topic": topic,
            "exactly_once": True,
            "transactional_id": tx_id,
        }
    )


def test_smoke_roundtrip_committed_visible(spark):
    topic = f"arkflow-it-smoke-{uuid.uuid4().hex[:8]}"
    df = spark.createDataFrame(
        [(i, f"m{i}") for i in range(10)], "id long, msg string"
    ).coalesce(1)
    _sink(topic, f"tx-{topic}").write_batch(df)
    vals = _read_committed(topic, expect=10)
    assert len(vals) == 10


def test_atomic_commit_observes_whole_batch(spark):
    """All records of a committed transaction become visible together;
    a failed partition aborts and leaves nothing (kafka_eos.rs:278)."""
    topic = f"arkflow-it-atomic-{uuid.uuid4().hex[:8]}"
    ok = spark.createDataFrame(
        [(i,) for i in range(50)], "id long"
    ).coalesce(1)
    _sink(topic, f"tx-{topic}").write_batch(ok)
    assert len(_read_committed(topic, expect=50)) == 50

    # a raising partition must abort: zero new records visible
    bad_topic = f"arkflow-it-abort-{uuid.uuid4().hex[:8]}"
    sink = _sink(bad_topic, f"tx-{bad_topic}")

    orig_payload = sink._payload

    def exploding_payload(df):
        from pyspark.sql import functions as F

        out = orig_payload(df)
        return out.withColumn(
            "value",
            F.expr(
                "CASE WHEN rand() < 2.0 THEN raise_error('boom')"
                " ELSE value END"
            ).cast("binary"),
        )

    sink._payload = exploding_payload
    with pytest.raises(Exception):
        sink.write_batch(ok)
    assert _read_committed(bad_topic, expect=1, timeout_s=5.0) == []


def test_zombie_fenced_across_restart(spark):
    """A second producer initializing the same transactional id fences
    the first: the zombie's commit must fail (kafka_eos.rs:307)."""
    from arkflow_spark.sinks.txn import confluent_producer_factory

    tx_id = f"tx-fence-{uuid.uuid4().hex[:8]}"
    topic = f"arkflow-it-fence-{uuid.uuid4().hex[:8]}"
    factory = confluent_producer_factory(BROKERS.split(","))
    zombie = factory(tx_id)
    zombie.begin_transaction()
    zombie.produce(topic, b"from-zombie")
    # restart: a new producer with the SAME id fences the zombie
    fresh = factory(tx_id)
    fresh.begin_transaction()
    fresh.produce(topic, b"from-fresh")
    fresh.commit_transaction()
    fresh.close()
    with pytest.raises(Exception):
        zombie.commit_transaction()
    zombie.close()
    vals = _read_committed(topic, expect=1)
    assert vals == [b"from-fresh"]

"""Transactional-producer contract for exactly-once Kafka output.

Parity target: the reference's opt-in L2 exactly-once
(crates/arkflow-plugin/src/output/kafka.rs:79-84 ``exactly_once`` +
``transactional_id`` config, :191-218 transactional producer init with
idempotence + fencing, :341-401 begin -> send all -> commit, abort on
failure so the unit replays).

Spark mapping: the unit of work is a micro-batch epoch partition. Each
partition opens a transactional producer whose ``transactional.id`` is
``{base}-p{partition}`` — stable across retries/restarts so the broker
fences zombie producers from a crashed attempt (same contract as the
reference's stable transactional_id, kafka.rs:82-84). Within a partition
the write is begin -> produce all -> commit; any failure aborts (uncommitted
records are invisible to read_committed consumers) and re-raises so Spark
replays the task, which re-begins a fresh transaction.

Cross-partition atomicity is NOT provided by the broker (each partition is
its own transaction); batch-level replay protection comes from layering
:class:`arkflow_spark.streaming.eos.IdempotentBatchWriter` on top — a
replayed epoch whose ledger marker exists is skipped entirely, so a
commit-then-crash cannot double-deliver. The reference has the same
layering: its per-batch transaction handles partial writes, its ack range
ledger handles replay-after-commit.

Implementations:
- :func:`confluent_producer_factory` — real Kafka transactions via the
  (publicly available) confluent-kafka client; import-gated, absent in this
  container.
- :class:`SpoolTransactionalProducer` — file-backed reference
  implementation of the same contract (staging file -> atomic rename on
  commit, delete on abort, token-based zombie fencing). Used by tests and
  usable as a no-broker transactional file sink.
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path


class ProducerFencedError(RuntimeError):
    """A newer producer with the same transactional id has initialized;
    this producer's in-flight transaction must not commit (Kafka's
    ProducerFencedException analog)."""


def confluent_producer_factory(brokers: list[str], extra_conf: dict | None = None):
    """Factory returning real transactional producers (confluent-kafka).

    Gated: raises NotImplementedError with guidance when the client
    library is absent (it is not baked into this container).
    """

    def make(txn_id: str):
        try:
            from confluent_kafka import Producer
        except ImportError as e:  # pragma: no cover - lib absent in container
            raise NotImplementedError(
                "exactly-once Kafka output needs the confluent-kafka client "
                "(pip install confluent-kafka) or an injected producer_factory"
            ) from e
        p = Producer(
            {
                "bootstrap.servers": ",".join(brokers),
                "transactional.id": txn_id,
                "enable.idempotence": True,
                **(extra_conf or {}),
            }
        )
        p.init_transactions()
        return _ConfluentAdapter(p)

    return make


class _ConfluentAdapter:  # pragma: no cover - exercised only with a broker
    def __init__(self, producer):
        self._p = producer

    def begin_transaction(self) -> None:
        self._p.begin_transaction()

    def produce(self, topic: str, value: bytes, key: bytes | None = None) -> None:
        self._p.produce(topic, value=value, key=key)

    def commit_transaction(self) -> None:
        self._p.commit_transaction()

    def abort_transaction(self) -> None:
        self._p.abort_transaction()

    def close(self) -> None:
        self._p.flush(10)


class SpoolTransactionalProducer:
    """File-backed transactional producer with Kafka-equivalent semantics.

    Layout under ``spool_dir``:

    - ``staging/{txn_id}.{token}.part`` — in-flight transaction (one
      ``topic\\tkey_b64\\tvalue_b64`` line per record); never read by
      consumers, and private to one producer instance so a fenced zombie
      cannot touch the live producer's staging.
    - ``committed/{txn_id}-{uuid}.ndjson`` — atomically renamed on commit;
      the only files a consumer reads (= read_committed).
    - ``fence/{txn_id}`` — holds the token of the newest producer for this
      transactional id. ``init`` atomically replaces it; ``commit`` of a
      producer holding a stale token raises :class:`ProducerFencedError`,
      mirroring broker zombie fencing.
    """

    def __init__(self, spool_dir: str, txn_id: str):
        self.dir = Path(spool_dir)
        self.txn_id = txn_id
        for sub in ("staging", "committed", "fence"):
            (self.dir / sub).mkdir(parents=True, exist_ok=True)
        # claim the fence: newest init wins, prior producers become zombies
        self.token = uuid.uuid4().hex
        tmp = self.dir / "fence" / f".{self.txn_id}.{self.token}.tmp"
        tmp.write_text(self.token)
        os.replace(tmp, self._fence_path())
        self._staging: Path | None = None

    def _fence_path(self) -> Path:
        return self.dir / "fence" / self.txn_id

    def _check_fence(self) -> None:
        if self._fence_path().read_text() != self.token:
            raise ProducerFencedError(
                f"producer for transactional id {self.txn_id!r} was fenced"
            )

    def begin_transaction(self) -> None:
        # staging is keyed by (txn_id, token): a fenced zombie writes into
        # ITS OWN file and can never truncate/pollute the live producer's
        # in-flight transaction (commit still enforces the fence)
        self._staging = (
            self.dir / "staging" / f"{self.txn_id}.{self.token}.part"
        )
        self._staging.write_bytes(b"")

    def produce(self, topic: str, value: bytes, key: bytes | None = None) -> None:
        import base64

        if self._staging is None:
            raise RuntimeError("produce() outside a transaction")
        line = "\t".join(
            (
                topic,
                base64.b64encode(key or b"").decode(),
                base64.b64encode(value).decode(),
            )
        )
        with open(self._staging, "a") as fh:
            fh.write(line + "\n")

    def commit_transaction(self) -> None:
        if self._staging is None:
            raise RuntimeError("commit_transaction() outside a transaction")
        self._check_fence()
        dest = self.dir / "committed" / f"{self.txn_id}-{uuid.uuid4().hex}.ndjson"
        os.replace(self._staging, dest)
        self._staging = None

    def abort_transaction(self) -> None:
        if self._staging is not None and self._staging.exists():
            self._staging.unlink()
        self._staging = None

    def close(self) -> None:
        pass

    @staticmethod
    def committed_records(spool_dir: str) -> list[tuple[str, bytes, bytes]]:  # noqa: F811
        return _committed_records(spool_dir)


class SpoolProducerFactory:
    """Picklable ``txn_id -> SpoolTransactionalProducer`` factory — inject
    as ``KafkaOutput``'s ``producer_factory`` for broker-less pipelines and
    tests (the transactional twin of :class:`sinks.spool.SpoolFactory`).

    ``fail_marker``: chaos hook. While the marker file does not exist, the
    first transaction creates it and fails at commit time — simulating a
    crash mid-transaction; later attempts (the replay) succeed. Lets tests
    prove abort-on-replay leaves no duplicate committed output.
    """

    def __init__(self, spool_dir: str, fail_marker: str | None = None):
        self.spool_dir = spool_dir
        self.fail_marker = fail_marker

    def __call__(self, txn_id: str):
        p = SpoolTransactionalProducer(self.spool_dir, txn_id)
        if self.fail_marker and not os.path.exists(self.fail_marker):
            Path(self.fail_marker).touch()
            return _FailBeforeCommit(p)
        return p


class _FailBeforeCommit:
    """Delegating producer that crashes at commit (never commits)."""

    def __init__(self, inner):
        self.inner = inner

    def begin_transaction(self) -> None:
        self.inner.begin_transaction()

    def produce(self, topic: str, value: bytes, key: bytes | None = None) -> None:
        self.inner.produce(topic, value, key)

    def commit_transaction(self) -> None:
        raise RuntimeError("injected crash before commit")

    def abort_transaction(self) -> None:
        self.inner.abort_transaction()

    def close(self) -> None:
        self.inner.close()


def _committed_records(spool_dir: str) -> list[tuple[str, bytes, bytes]]:
    """Read-committed view: (topic, key, value) across committed txns."""
    import base64

    out = []
    for f in sorted(Path(spool_dir, "committed").glob("*.ndjson")):
        for line in f.read_text().splitlines():
            topic, k, v = line.split("\t")
            out.append((topic, base64.b64decode(k), base64.b64decode(v)))
    return out

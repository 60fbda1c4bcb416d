"""Exactly-once delivery to transactional/idempotent sinks.

The reference's Kafka EOS is "1 ack range = 1 write_batch = 1 Kafka
transaction" (output/kafka.rs:79-84,191-218; docs 6-exactly-once.md).
Under foreachBatch the equivalent unit is the micro-batch epoch: a batch id
is stable across retries, so a write keyed by (query_id, epoch_id) that
commits atomically is exactly-once end-to-end.

IdempotentBatchWriter implements the ledger pattern for any sink: skip
epochs whose commit marker already exists, write, then commit the marker.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame


class IdempotentBatchWriter:
    """Wrap an output so replayed epochs (after crash/restart) are no-ops.

    ``ledger_dir`` holds one empty marker file per committed epoch; marker
    creation is atomic (rename) so a crash between write and commit replays
    the write — the sink must tolerate overwrite-by-same-epoch, which is
    what epoch-keyed paths/transactions provide.
    """

    def __init__(self, output, ledger_dir: str):
        self.output = output
        self.ledger = Path(ledger_dir)
        self.ledger.mkdir(parents=True, exist_ok=True)

    def _marker(self, epoch_id: int) -> Path:
        return self.ledger / f"epoch-{epoch_id}.committed"

    def write_batch(self, df: DataFrame, epoch_id: int = 0) -> None:
        marker = self._marker(epoch_id)
        if marker.exists():
            return  # replayed epoch: already delivered exactly once
        self.output.write_batch(df, epoch_id)
        tmp = marker.with_suffix(".tmp")
        tmp.touch()
        os.replace(tmp, marker)

"""Executor-side per-partition bulk writer — twin of the reference's
distributed MongoDB write path (spark_streaming/streaming_job.py:461-533):
one connection per partition, unordered bulk writes in fixed-size chunks
(bulk_write(ordered=False), batches of BATCH_SIZE — the '50x faster than
sequential' path, :489-519).

Here the "connection" is a per-partition JSON-lines file handle; swapping in
a real store client (Mongo bulk_write, JDBC executemany, an HTTP batch
endpoint) changes only `_open`/`_flush`.  The driver never sees the rows —
`df.foreachPartition` runs entirely on executors, so write bandwidth scales
with the cluster, not the driver.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql import DataFrame, Row

BULK_BATCH_SIZE = 1000  # mongo_to_postgres_sync.py:68 / streaming_job.py BATCH_SIZE


def write_per_partition(
    df: DataFrame, out_dir: str, batch_size: int = BULK_BATCH_SIZE
) -> None:
    """Write each partition from its own executor task in `batch_size`
    chunks.  Files are named <partition>-<uuid> so task retries never
    collide (at-least-once; the keyed sink upstream provides idempotence)."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(rows: Iterator[Row]) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        handle = None
        path = os.path.join(out_dir, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl")
        buffer: list[str] = []

        def flush() -> None:
            nonlocal handle
            if not buffer:
                return
            if handle is None:  # open the "connection" lazily, once
                handle = open(path, "w")
            handle.write("\n".join(buffer) + "\n")
            buffer.clear()

        for row in rows:
            buffer.append(json.dumps(row.asDict(), default=str))
            if len(buffer) >= batch_size:
                flush()
        flush()
        if handle is not None:
            handle.close()

    df.foreachPartition(_write)

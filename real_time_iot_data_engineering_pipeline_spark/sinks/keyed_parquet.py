"""Idempotent keyed parquet sink — last-write-wins upsert.

Re-expresses the reference's two physical upsert sinks as one keyed merge:

- MongoDB ``bulk_write(UpdateOne({sensor_id, window_start}, $set, upsert=True))``
  inside foreachBatch (spark_streaming/streaming_job.py:461-533, wired at
  :733-739), and
- PostgreSQL ``INSERT ... ON CONFLICT (sensor_id, window_start) DO UPDATE``
  (spark_streaming/mongo_to_postgres_sync.py:378-399).

Both are "latest row per key survives".  Here the merge is pure DataFrame
algebra: union(current, batch) -> row_number over key ordered by epoch desc
-> keep first.  Replaying a batch (same epoch, same rows — Structured
Streaming's failure contract) reproduces the identical table, which is what
makes checkpoint + foreachBatch exactly-once end-to-end.

Scale posture: on a real cluster this sink is a partitioned MERGE into a
table format with file-level pruning (Delta/Iceberg); the semantics here are
identical but the rewrite is whole-table, which is fine for the aggregate
stream it serves (cardinality bounded by #keys x #open-windows — the
reference's own sizing: <=100 sensors x a handful of open 5-minute windows,
README.md:10).  The merge itself is one hash shuffle on the key columns;
nothing is collected to the driver.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_EPOCH_COL = "_epoch"


class KeyedParquetSink:
    """Parquet-backed keyed table with last-write-wins upsert.

    Directory layout: ``<root>/current/`` holds the live parquet table; each
    upsert writes the merged table to a staging dir and atomically swaps it
    in (os.replace on the directory names), so readers never observe a
    half-written table and a crashed upsert leaves the previous table intact.
    """

    def __init__(self, spark: SparkSession, root: str, key_cols: list[str]):
        self.spark = spark
        self.root = root
        self.key_cols = list(key_cols)
        os.makedirs(root, exist_ok=True)

    @property
    def _current(self) -> str:
        return os.path.join(self.root, "current")

    def exists(self) -> bool:
        return os.path.isdir(self._current)

    def read(self) -> DataFrame:
        """The live table (without the internal epoch column)."""
        if not self.exists():
            raise FileNotFoundError(f"no data written yet under {self.root}")
        return self.spark.read.parquet(self._current).drop(_EPOCH_COL)

    def upsert(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch body: merge `batch_df` into the table, keyed
        last-write-wins (higher epoch wins; replay of the same epoch is a
        no-op by value).  Mirrors streaming_job.py:586-603 including the
        empty-batch fast path (modern df.isEmpty() instead of the
        reference's df.rdd.isEmpty())."""
        if batch_df.isEmpty():
            return
        incoming = batch_df.withColumn(_EPOCH_COL, F.lit(int(epoch_id)))
        if self.exists():
            current = self.spark.read.parquet(self._current)
            merged = current.unionByName(incoming)
        else:
            merged = incoming
        w = Window.partitionBy(*self.key_cols).orderBy(F.col(_EPOCH_COL).desc())
        deduped = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        staging = tempfile.mkdtemp(prefix=".staging-", dir=self.root)
        out = os.path.join(staging, "table")
        deduped.write.mode("overwrite").parquet(out)
        old = os.path.join(self.root, f".old-{epoch_id}-{os.getpid()}")
        if self.exists():
            os.rename(self._current, old)
        os.rename(out, self._current)
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)

    def foreach_batch(self, retry_attempts: int = 1):
        """Adapter for writeStream.foreachBatch.  retry_attempts > 1 wraps
        the upsert in exponential-backoff retry (sinks/retry.py), mirroring
        the reference's tenacity wrapper around each Mongo batch write
        (streaming_job.py:535-550) — a transient sink failure retries
        without killing the streaming query; a persistent one still fails
        the batch so checkpointing can replay it."""
        from .retry import with_retry

        def _fn(batch_df: DataFrame, epoch_id: int) -> None:
            if retry_attempts <= 1:
                self.upsert(batch_df, epoch_id)
            else:
                with_retry(
                    lambda: self.upsert(batch_df, epoch_id),
                    max_attempts=retry_attempts,
                )

        return _fn

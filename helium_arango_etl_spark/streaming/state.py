"""Versioned, idempotently-committed DataFrame state for foreachBatch.

foreachBatch gives at-least-once semantics: a batch whose side effects
landed but whose checkpoint commit didn't is REPLAYED with the same
batch_id after a restart.  Any state a foreachBatch handler accumulates
must therefore be (a) durable — not a Python object that dies with the
driver process — and (b) committed idempotently, so a replayed batch
doesn't merge twice.

``VersionedState`` stores each committed state as a fresh parquet
directory ``v{n}`` under the state path and commits by atomically
renaming a ``_LATEST`` pointer file recording ``(version,
last_batch_id)``.  The directory being read is never overwritten — a
crash mid-write leaves the pointer on the previous consistent version —
and ``commit`` is a no-op for batch_ids at or below the recorded one.
On an object store the rename-commit would be a Delta/Iceberg
transactional commit; the pointer file is the local-filesystem analog
with the same semantics.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class VersionedState:
    """Parquet-backed state table with atomic versioned commits."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._pruned_catchup = False
        os.makedirs(path, exist_ok=True)

    # -- pointer bookkeeping --

    def _pointer(self) -> tuple[int, int] | None:
        try:
            with open(os.path.join(self.path, "_LATEST")) as fh:
                v, b = fh.read().split()
            return int(v), int(b)
        except FileNotFoundError:
            return None

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v{version:05d}")

    # -- public surface --

    def last_batch_id(self) -> int | None:
        ptr = self._pointer()
        return None if ptr is None else ptr[1]

    def read(self) -> DataFrame | None:
        """The current committed state, or None before the first commit."""
        ptr = self._pointer()
        if ptr is None:
            return None
        return self.spark.read.parquet(self._version_dir(ptr[0]))

    def commit(self, df: DataFrame, batch_id: int) -> bool:
        """Write ``df`` as the next version and commit it atomically.

        Returns False (no-op) when ``batch_id`` was already committed —
        the at-least-once replay case.  The version being read is never
        touched; the immediately-previous version is retained for
        in-flight readers and older ones pruned.
        """
        ptr = self._pointer()
        if ptr is not None and batch_id <= ptr[1]:
            return False
        new_version = (ptr[0] if ptr else 0) + 1
        df.write.mode("overwrite").parquet(self._version_dir(new_version))
        tmp = os.path.join(self.path, "_LATEST.tmp")
        with open(tmp, "w") as fh:
            fh.write(f"{new_version} {batch_id}")
        os.replace(tmp, os.path.join(self.path, "_LATEST"))  # atomic commit
        # Only v{new_version-2} can NEWLY become stale; older versions were
        # pruned by earlier commits.  Sweeping range(1, n-1) every commit
        # would cost O(total commits) no-op rmtree calls on a long stream.
        # First commit after a restart catches up on any leftovers once.
        if not self._pruned_catchup:
            for stale in range(1, new_version - 2):
                shutil.rmtree(self._version_dir(stale), ignore_errors=True)
            self._pruned_catchup = True
        if new_version - 2 >= 1:
            shutil.rmtree(self._version_dir(new_version - 2), ignore_errors=True)
        return True

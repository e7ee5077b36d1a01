"""Checkpoint store: epochs, offsets, lineage, row/byte metrics.

The reference's only resume state is "the newest raw file"
(/root/reference/src/storage/minio_client.rs:225-241) — re-running reprocesses
the newest snapshot wholesale. The engine keeps a real checkpoint ledger
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics"): one JSON document per epoch, written atomically (tmp + rename),
recording what was read (input files = per-partition offsets for a file-based
log), what was written (snapshot id), and row/byte metrics.

Exactly-once is enforced twice, independently:
- the LakeTable snapshot summary carries ``engine.epoch`` (the commit-side
  ledger — survives losing the checkpoint dir), and
- this store's ``is_done(epoch)`` (the driver-side fast path).
Either alone suffices; together a crash between commit and checkpoint write
still replays as a structural no-op.
"""

from __future__ import annotations

import json
import os
import uuid


class CheckpointStore:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _epoch_path(self, epoch: int) -> str:
        return os.path.join(self.path, f"epoch-{epoch:010d}.json")

    def is_done(self, epoch: int) -> bool:
        return os.path.exists(self._epoch_path(epoch))

    def committed_epochs(self) -> list[int]:
        out = []
        for fn in os.listdir(self.path):
            if fn.startswith("epoch-") and fn.endswith(".json"):
                out.append(int(fn[len("epoch-"):-len(".json")]))
        return sorted(out)

    def last_epoch(self) -> int | None:
        epochs = self.committed_epochs()
        return epochs[-1] if epochs else None

    def record(self, epoch: int, record: dict) -> None:
        p = self._epoch_path(epoch)
        tmp = f"{p}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"epoch": epoch, **record}, f, indent=1, default=str)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, p)

    def get(self, epoch: int) -> dict | None:
        p = self._epoch_path(epoch)
        if not os.path.exists(p):
            return None
        with open(p, encoding="utf-8") as f:
            return json.load(f)

    def metrics_df(self, spark):
        """The checkpoint ledger as a DataFrame — per-epoch row/byte/file
        metrics + lineage for observability queries (north_rule: "resumable
        from checkpoint with per-partition lineage + metrics"; reference
        analog: per-stage timing prints,
        /root/reference/src/bin/test_memory_efficient_pipeline.rs:112-146).

        Reads the JSON records as a json datasource so the ledger is
        queryable like any other table (trend dashboards, stall detection,
        bytes-per-epoch regressions).
        """
        import glob as _glob

        paths = sorted(_glob.glob(os.path.join(self.path, "epoch-*.json")))
        if not paths:
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], StructType([]))
        return spark.read.option("multiLine", "true").json(paths)

"""Two-phase idempotent Parquet sink (exactly-once, north_rule).

Protocol (SURVEY.md §4 'Exactly-once sink'):

1. writer produces ``part-{partition:04d}-epoch-{epoch:06d}.parquet.tmp``
2. fsync + atomic ``os.replace`` to the final name
3. the driver appends the epoch to ``manifest.json`` only after every
   partition of that epoch committed.

Recovery: files whose (partition, epoch) already exist are skipped
(idempotent replay); files beyond the manifest's committed epoch are
discarded by readers. Output is partitioned per (partition, epoch) so a
resumed run never rewrites finished work and never produces one giant
file (resumable-output requirement)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


class TwoPhaseSink:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def _final(self, partition: int, epoch: int) -> str:
        return os.path.join(
            self.out_dir, f"part-{partition:04d}-epoch-{epoch:06d}.parquet"
        )

    def write(self, partition: int, epoch: int, tbl: pa.Table) -> str:
        """Idempotent two-phase write; safe to call again on replay."""
        final = self._final(partition, epoch)
        if os.path.exists(final):
            return final  # already committed by a previous attempt
        tmp = final + ".tmp"
        pq.write_table(tbl, tmp)
        with open(tmp, "rb") as f:
            os.fsync(f.fileno())
        os.replace(tmp, final)
        return final

    # --- manifest (driver-side) -------------------------------------------
    @property
    def manifest_path(self) -> str:
        return os.path.join(self.out_dir, "manifest.json")

    def committed_epoch(self) -> int:
        if not os.path.exists(self.manifest_path):
            return -1
        with open(self.manifest_path) as f:
            return json.load(f).get("committed_epoch", -1)

    def commit_epoch(self, epoch: int, metrics: dict | None = None) -> None:
        tmp = self.manifest_path + ".tmp"
        doc = {"committed_epoch": epoch}
        if metrics:
            doc["metrics"] = metrics
        with open(tmp, "w") as f:
            json.dump(doc, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.manifest_path)

    def committed_files(self) -> list[str]:
        """Files belonging to committed epochs only (read view)."""
        ce = self.committed_epoch()
        out = []
        for fn in sorted(os.listdir(self.out_dir)):
            if not fn.endswith(".parquet"):
                continue
            epoch = int(fn.split("-epoch-")[1].split(".")[0])
            if epoch <= ce:
                out.append(os.path.join(self.out_dir, fn))
        return out

    def read_committed(self) -> pa.Table:
        files = self.committed_files()
        if not files:
            return pa.table({})
        return pa.concat_tables([pq.read_table(f) for f in files], promote_options="permissive")

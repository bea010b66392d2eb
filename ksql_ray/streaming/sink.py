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
        doc = self._manifest()     # preserve compaction segments
        doc["committed_epoch"] = epoch
        if metrics:
            doc["metrics"] = metrics
        with open(tmp, "w") as f:
            json.dump(doc, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.manifest_path)

    def _manifest(self) -> dict:
        if not os.path.exists(self.manifest_path):
            return {"committed_epoch": -1}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _covered(self, doc: dict) -> dict[int, list[tuple[int, int]]]:
        """partition -> [(e0, e1)] epoch ranges folded into segments."""
        out: dict[int, list[tuple[int, int]]] = {}
        for s in doc.get("segments", []):
            out.setdefault(int(s["part"]), []).append(
                (int(s["e0"]), int(s["e1"])))
        return out

    def committed_files(self) -> list[str]:
        """Files belonging to committed epochs only (read view):
        compacted segments + the epoch files no segment covers."""
        doc = self._manifest()
        ce = doc.get("committed_epoch", -1)
        covered = self._covered(doc)
        out = [os.path.join(self.out_dir, s["file"])
               for s in doc.get("segments", [])]
        for fn in sorted(os.listdir(self.out_dir)):
            if not fn.endswith(".parquet") or not fn.startswith("part-"):
                continue
            part = int(fn.split("part-")[1].split("-epoch-")[0])
            epoch = int(fn.split("-epoch-")[1].split(".")[0])
            if epoch > ce:
                continue
            if any(e0 <= epoch <= e1 for e0, e1 in covered.get(part, [])):
                continue   # compacted away (or stale post-crash copy)
            out.append(os.path.join(self.out_dir, fn))
        return out

    def compact(self, target_bytes: int = 128 << 20) -> dict:
        """Fold committed per-epoch files into ~``target_bytes``
        segments, bounding the file count for long-running jobs (10^6
        epochs would otherwise mean 10^6 files per partition).
        Idempotent and crash-safe: segments are written two-phase, the
        manifest updates atomically BEFORE source deletion, and readers
        ignore epoch files a segment covers — a crash at any point
        leaves a correct read view, and the next compact() finishes the
        cleanup. Returns {segments, files_removed}."""
        doc = self._manifest()
        ce = doc.get("committed_epoch", -1)
        covered = self._covered(doc)
        by_part: dict[int, list[tuple[int, str]]] = {}
        for fn in sorted(os.listdir(self.out_dir)):
            if not fn.endswith(".parquet") or not fn.startswith("part-"):
                continue
            part = int(fn.split("part-")[1].split("-epoch-")[0])
            epoch = int(fn.split("-epoch-")[1].split(".")[0])
            if epoch > ce:
                continue
            if any(e0 <= epoch <= e1 for e0, e1 in covered.get(part, [])):
                # stale copy a previous crash left behind: safe to drop
                os.remove(os.path.join(self.out_dir, fn))
                continue
            by_part.setdefault(part, []).append((epoch, fn))
        new_segs = []
        to_delete = []
        for part, files in by_part.items():
            files.sort()
            run: list[tuple[int, str]] = []
            size = 0

            def flush_run():
                nonlocal run, size
                if len(run) < 2:   # nothing gained folding one file
                    run, size = [], 0
                    return
                e0, e1 = run[0][0], run[-1][0]
                seg = f"seg-{part:04d}-{e0:06d}-{e1:06d}.parquet"
                final = os.path.join(self.out_dir, seg)
                if not os.path.exists(final):
                    tbl = pa.concat_tables(
                        [pq.read_table(os.path.join(self.out_dir, fn))
                         for _e, fn in run],
                        promote_options="permissive")
                    tmp = final + ".tmp"
                    pq.write_table(tbl, tmp)
                    with open(tmp, "rb") as f:
                        os.fsync(f.fileno())
                    os.replace(tmp, final)
                new_segs.append({"part": part, "e0": e0, "e1": e1,
                                 "file": seg})
                to_delete.extend(fn for _e, fn in run)
                run, size = [], 0

            for epoch, fn in files:
                run.append((epoch, fn))
                size += os.path.getsize(os.path.join(self.out_dir, fn))
                if size >= target_bytes and len(run) >= 2:
                    flush_run()
            flush_run()
        if new_segs:
            doc["segments"] = doc.get("segments", []) + new_segs
            tmp = self.manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(doc, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.manifest_path)
            # sources are garbage once the manifest covers them
            for fn in to_delete:
                p = os.path.join(self.out_dir, fn)
                if os.path.exists(p):
                    os.remove(p)
        return {"segments": len(new_segs),
                "files_removed": len(to_delete)}

    def read_committed(self) -> pa.Table:
        files = self.committed_files()
        if not files:
            return pa.table({})
        return pa.concat_tables([pq.read_table(f) for f in files], promote_options="permissive")

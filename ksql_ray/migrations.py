"""Versioned catalog migrations (the reference's migration tool).

File format and semantics mirror /root/reference/migrations exactly:
* filenames ``{unix_version}_name.sql`` (migrator.go:98-146),
* sections split on ``-- +seeker Up`` / ``-- +seeker Down`` markers
  (migrator.go:189-215),
* monotonic version rules: Up requires strictly newer, Down exactly the
  current version (migrator.go:148-187),
* applied versions recorded in a system stream — the ``seeker_stream``
  analog (migrations/controller.go:16-18,40-105) is a ``_migrations``
  Parquet dataset in the migration state dir,
* ``AutoMigrate`` applies every pending file in a directory
  (migrator.go:43-96).

Statements inside migration files are a minimal DDL dialect executed by
our planner (the reference POSTs them to ksqlDB; we ARE the engine):
``CREATE STREAM|TABLE name (col TYPE [PRIMARY KEY], ...) [WITH (...)]``
and ``DROP STREAM|TABLE name;``.
"""

from __future__ import annotations

import os
import re
import time

import pyarrow as pa
import pyarrow.parquet as pq

from .catalog import Catalog, Ref
from .ddl import Create, Drop, Metadata
from .errors import MigrationError
from .kinds import Ktype

UP_MARKER = "-- +seeker Up"
DOWN_MARKER = "-- +seeker Down"

_TYPE_MAP = {
    "BOOL": Ktype.BOOL, "BOOLEAN": Ktype.BOOL,
    "INT": Ktype.INT, "INTEGER": Ktype.INT,
    "BIGINT": Ktype.BIGINT,
    "DOUBLE": Ktype.DOUBLE,
    "VARCHAR": Ktype.STRING, "STRING": Ktype.STRING,
    "BYTES": Ktype.BYTES,
    "TIMESTAMP": Ktype.TIMESTAMP,
}

_CREATE_RE = re.compile(
    r"CREATE\s+(STREAM|TABLE)\s+(\w+)\s*\((.*?)\)\s*(?:WITH\s*\((.*?)\))?\s*;",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(r"DROP\s+(STREAM|TABLE)\s+(\w+)\s*;", re.IGNORECASE)


class Migrator:
    """migrations.New(url, dir) analog; state lives next to the data."""

    def __init__(self, catalog: Catalog, state_dir: str):
        self.catalog = catalog
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    # ----------------------------------------------------------- state
    @property
    def _state_path(self) -> str:
        return os.path.join(self.state_dir, "_migrations.parquet")

    def applied(self) -> list[dict]:
        if not os.path.exists(self._state_path):
            return []
        return pq.read_table(self._state_path).to_pylist()

    def latest_version(self) -> int:
        """controller.GetLatestVersion analog (controller.go:74-105);
        zero-version row on first run (controller.go:40-72)."""
        rows = self.applied()
        return max((r["version"] for r in rows), default=0)

    def _record(self, version: int, name: str) -> None:
        rows = self.applied() + [
            {"version": version, "name": name, "applied_at_us": time.time_ns() // 1000}
        ]
        self._write(rows)

    def _remove(self, version: int) -> None:
        rows = [r for r in self.applied() if r["version"] != version]
        self._write(rows)

    def _write(self, rows: list[dict]) -> None:
        tbl = pa.table({
            "version": pa.array([r["version"] for r in rows], type=pa.int64()),
            "name": pa.array([r["name"] for r in rows], type=pa.string()),
            "applied_at_us": pa.array([r["applied_at_us"] for r in rows], type=pa.int64()),
        })
        tmp = self._state_path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, self._state_path)

    # ----------------------------------------------------------- files
    @staticmethod
    def parse_file(path: str) -> tuple[int, str, str, str]:
        """-> (version, name, up_sql, down_sql); version = filename prefix
        (migrator.go:98-146), sections split on the seeker markers
        (migrator.go:189-215)."""
        base = os.path.basename(path)
        m = re.match(r"(\d+)_(.+)\.sql$", base)
        if not m:
            raise MigrationError(
                f"bad migration filename {base!r}: want '{{unix}}_name.sql'"
            )
        version, name = int(m.group(1)), m.group(2)
        text = open(path).read()
        if UP_MARKER not in text:
            raise MigrationError(f"{base}: missing '{UP_MARKER}' marker")
        after_up = text.split(UP_MARKER, 1)[1]
        if DOWN_MARKER in after_up:
            up_sql, down_sql = after_up.split(DOWN_MARKER, 1)
        else:
            up_sql, down_sql = after_up, ""
        return version, name, up_sql.strip(), down_sql.strip()

    # ----------------------------------------------------------- ddl
    def _exec_sql(self, sql: str) -> None:
        rest = sql
        matched_any = False
        for m in _CREATE_RE.finditer(sql):
            matched_any = True
            ref = Ref.STREAM if m.group(1).upper() == "STREAM" else Ref.TABLE
            name, cols_s, with_s = m.group(2), m.group(3), m.group(4)
            fields = []
            for col in re.split(r",(?![^()]*\))", cols_s):
                col = col.strip()
                if not col:
                    continue
                parts = col.split()
                cname, ctype = parts[0], parts[1].upper()
                if ctype not in _TYPE_MAP:
                    raise MigrationError(f"unknown type {ctype} in migration")
                if len(parts) > 2 and " ".join(parts[2:]).upper().startswith("PRIMARY"):
                    fields.append((cname, _TYPE_MAP[ctype], "primary"))
                else:
                    fields.append((cname, _TYPE_MAP[ctype]))
            meta = Metadata()
            if with_s:
                for kv in with_s.split(","):
                    if "=" in kv:
                        k, v = kv.split("=", 1)
                        k = k.strip().upper()
                        v = v.strip().strip("'\"")
                        if k == "TIMESTAMP":
                            meta.timestamp_col = v
                        elif k == "PARTITIONS":
                            meta.partitions = int(v)
                        elif k == "KAFKA_TOPIC":
                            meta.topic = os.path.join(self.state_dir, v)
            Create(ref, name).SchemaFields(*fields).With(meta).execute(
                self.catalog, base_dir=os.path.join(self.state_dir, "relations")
            )
        for m in _DROP_RE.finditer(sql):
            matched_any = True
            ref = Ref.STREAM if m.group(1).upper() == "STREAM" else Ref.TABLE
            Drop(self.catalog, ref, m.group(2))
        if sql and not matched_any:
            raise MigrationError(f"no recognized DDL statement in: {sql[:80]!r}")

    # ----------------------------------------------------------- verbs
    def up(self, path: str) -> None:
        """Apply one file; version must be strictly newer
        (migrator.go:148-163)."""
        version, name, up_sql, _ = self.parse_file(path)
        cur = self.latest_version()
        if version <= cur:
            raise MigrationError(
                f"migration {version} is not newer than current {cur} "
                "(migrator.go:148-163)"
            )
        self._exec_sql(up_sql)
        self._record(version, name)

    def down(self, path: str) -> None:
        """Revert one file; version must equal the current one
        (migrator.go:165-187)."""
        version, name, _, down_sql = self.parse_file(path)
        cur = self.latest_version()
        if version != cur:
            raise MigrationError(
                f"can only migrate down from the current version {cur}, "
                f"got {version} (migrator.go:165-187)"
            )
        self._exec_sql(down_sql)
        self._remove(version)

    def auto_migrate(self, directory: str) -> list[int]:
        """Apply every pending file, skipping applied ones
        (migrator.go:43-96)."""
        done = {r["version"] for r in self.applied()}
        applied = []
        files = sorted(
            f for f in os.listdir(directory) if re.match(r"\d+_.+\.sql$", f)
        )
        for f in files:
            version = int(f.split("_", 1)[0])
            if version in done:
                continue
            self.up(os.path.join(directory, f))
            applied.append(version)
        return applied

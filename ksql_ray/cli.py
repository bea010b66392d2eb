"""Migration CLI: ``python -m ksql_ray.cli <create|up|down|auto> ...``.

The reference's cobra CLI (cmd/cli/main.go:5, internal/root.go:14-31,
up.go:17-37) drives migrations against a remote ksqlDB; ours drives the
local catalog + Parquet relations. Environment fallback mirrors
KSQL_DB_URL: ``KSQL_RAY_STATE_DIR`` selects the migration state dir.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ksql-ray")
    p.add_argument(
        "--state-dir",
        default=os.environ.get("KSQL_RAY_STATE_DIR", "/tmp/ksql_ray_state"),
        help="migration state directory (KSQL_RAY_STATE_DIR)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create", help="create a timestamped migration file")
    c.add_argument("name")
    c.add_argument("--dir", default=".")

    u = sub.add_parser("up", help="apply one migration file")
    u.add_argument("file")

    d = sub.add_parser("down", help="revert one migration file")
    d.add_argument("file")

    a = sub.add_parser("auto", help="apply all pending migrations in a dir")
    a.add_argument("dir")

    args = p.parse_args(argv)

    if args.cmd == "create":
        os.makedirs(args.dir, exist_ok=True)
        fname = os.path.join(args.dir, f"{int(time.time())}_{args.name}.sql")
        with open(fname, "w") as f:
            f.write("-- +seeker Up\n\n-- +seeker Down\n")
        print(fname)
        return 0

    from .catalog import Catalog
    from .errors import KsqlRayError
    from .migrations import Migrator

    cat = Catalog()
    mig = Migrator(cat, args.state_dir)
    try:
        if args.cmd == "up":
            mig.up(args.file)
            print(f"applied {args.file}; version={mig.latest_version()}")
        elif args.cmd == "down":
            mig.down(args.file)
            print(f"reverted {args.file}; version={mig.latest_version()}")
        elif args.cmd == "auto":
            applied = mig.auto_migrate(args.dir)
            print(f"applied versions: {applied}")
    except KsqlRayError as ex:
        print(f"error: {ex}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""DDL/DML + migration tests (create_builder_test.go:48-136,
insert_builder_test.go:68-176 intent + migrations/migrator_test semantics)."""

import dataclasses
import os

import pyarrow as pa
import pytest

from ksql_ray import Catalog, Count, F, PlanError, Schema, Select, STREAM, TABLE
from ksql_ray.catalog import Ref
from ksql_ray.ddl import Create, Describe, Drop, Insert, List, Metadata
from ksql_ray.errors import MigrationError, SchemaError
from ksql_ray.kinds import Ktype
from ksql_ray.migrations import Migrator


@pytest.fixture()
def cat(tmp_path):
    return Catalog()


def test_create_schema_fields(cat, tmp_path):
    rel = (
        Create(Ref.TABLE, "users")
        .SchemaFields(("id", Ktype.BIGINT, "primary"), ("name", Ktype.STRING))
        .With(Metadata(timestamp_col=None, partitions=4))
        .execute(cat, base_dir=str(tmp_path))
    )
    assert rel.primary_key == "id"
    assert rel.schema.field("id").type == pa.int64()
    assert cat.get("users").partitions == 4
    d = Describe(cat, "users")
    assert d["kind"] == "TABLE" and d["primary_key"] == "id"


def test_create_from_struct(cat, tmp_path):
    @dataclasses.dataclass
    class Turn:
        conv_id: str = dataclasses.field(metadata={"ksql": "conv_id", "primary": True})
        n: int = 0
        score: float = 0.0

    rel = Create(Ref.TABLE, "turns").SchemaFromStruct(Turn).execute(cat, base_dir=str(tmp_path))
    assert rel.primary_key == "conv_id"
    assert rel.schema.field("n").type == pa.int64()


def test_two_primary_keys_rejected(cat):
    with pytest.raises(SchemaError):
        Create(Ref.TABLE, "x").SchemaFields(
            ("a", Ktype.INT, "primary"), ("b", Ktype.INT, "primary")
        )


def test_insert_rows_and_struct(cat, tmp_path, ray_session):
    Create(Ref.STREAM, "s1").SchemaFields(
        ("k", Ktype.STRING), ("v", Ktype.BIGINT)
    ).execute(cat, base_dir=str(tmp_path))
    Insert(Ref.STREAM, "s1").Rows({"k": "a", "v": 1}, {"k": "b"}).execute(cat)

    @dataclasses.dataclass
    class Row:
        k: str
        v: int

    Insert(Ref.STREAM, "s1").Struct(Row("c", 3)).execute(cat)
    import pyarrow.parquet as pq

    tbl = pq.read_table(cat.get("s1").path)
    rows = sorted(tbl.to_pylist(), key=lambda r: r["k"])
    assert rows == [
        {"k": "a", "v": 1},
        {"k": "b", "v": None},  # NULL for missing (insert_builder.go:112-160)
        {"k": "c", "v": 3},
    ]


def test_insert_into_table_rejected(cat):
    with pytest.raises(PlanError, match="STREAMs only"):
        Insert(Ref.TABLE, "t")


def test_insert_unknown_column_rejected(cat, tmp_path):
    Create(Ref.STREAM, "s2").SchemaFields(("k", Ktype.STRING)).execute(
        cat, base_dir=str(tmp_path)
    )
    with pytest.raises(SchemaError, match="unknown INSERT columns"):
        Insert(Ref.STREAM, "s2").Rows({"nope": 1}).execute(cat)


def test_ctas_rules(cat, tmp_path, ray_session):
    Create(Ref.STREAM, "src").SchemaFields(
        ("k", Ktype.STRING), ("v", Ktype.BIGINT),
        ("ts", Ktype.TIMESTAMP),
    ).With(Metadata(timestamp_col="ts")).execute(cat, base_dir=str(tmp_path))

    # rule 7: no TABLE from non-aggregated STREAM
    with pytest.raises(PlanError, match="non-aggregated"):
        Create(Ref.TABLE, "bad1").AsSelect(
            Select(F("k")).From(Schema("src"))
        ).validate(cat)

    # rule 8: no STREAM from TABLE
    Create(Ref.TABLE, "t1").SchemaFields(("k", Ktype.STRING, "primary")).execute(
        cat, base_dir=str(tmp_path)
    )
    with pytest.raises(PlanError, match="from a TABLE"):
        Create(Ref.STREAM, "bad2").AsSelect(
            Select(F("k")).From(Schema("t1"))
        ).validate(cat)

    # windowed CTAS cannot be a TABLE (README.md:705)
    from ksql_ray import SECONDS, Tumbling

    with pytest.raises(PlanError, match="windowed"):
        Create(Ref.TABLE, "bad3").AsSelect(
            Select(F("k"), Count(F("v")).As("c"))
            .From(Schema("src")).GroupBy(F("k")).Windowed(Tumbling(10, SECONDS))
        ).validate(cat)


def test_csas_executes(cat, tmp_path, ray_session):
    Create(Ref.STREAM, "src2").SchemaFields(
        ("k", Ktype.STRING), ("v", Ktype.BIGINT)
    ).execute(cat, base_dir=str(tmp_path))
    Insert(Ref.STREAM, "src2").Rows(
        {"k": "a", "v": 1}, {"k": "b", "v": 5}, {"k": "a", "v": 3}
    ).execute(cat)
    rel = Create(Ref.STREAM, "derived").AsSelect(
        Select(F("k"), F("v")).From(Schema("src2")).Where(F("v").Greater(1))
    ).execute(cat, base_dir=str(tmp_path))
    import pyarrow.parquet as pq

    got = sorted(pq.read_table(rel.path).to_pylist(), key=lambda r: r["v"])
    assert got == [{"k": "a", "v": 3}, {"k": "b", "v": 5}]
    assert cat.get("derived").kind is Ref.STREAM


def test_insert_as_select(cat, tmp_path, ray_session):
    Create(Ref.STREAM, "a").SchemaFields(("k", Ktype.STRING), ("v", Ktype.BIGINT)).execute(
        cat, base_dir=str(tmp_path))
    Create(Ref.STREAM, "b").SchemaFields(("k", Ktype.STRING), ("v", Ktype.BIGINT)).execute(
        cat, base_dir=str(tmp_path))
    Insert(Ref.STREAM, "a").Rows({"k": "x", "v": 9}).execute(cat)
    Insert(Ref.STREAM, "b").AsSelect(Select(F("k"), F("v")).From(Schema("a"))).execute(cat)
    import pyarrow.parquet as pq

    assert pq.read_table(cat.get("b").path).to_pylist() == [{"k": "x", "v": 9}]


def test_drop_and_list(cat, tmp_path):
    Create(Ref.STREAM, "s3").SchemaFields(("k", Ktype.STRING)).execute(
        cat, base_dir=str(tmp_path))
    assert any(r["name"] == "s3" for r in List(cat, Ref.STREAM))
    Drop(cat, Ref.STREAM, "s3", delete_data=True)
    assert not any(r["name"] == "s3" for r in List(cat))
    from ksql_ray.errors import CatalogError

    with pytest.raises(CatalogError):
        Describe(cat, "s3")


# ----------------------------------------------------------------- migrations
MIG1 = """-- +seeker Up
CREATE STREAM clicks (user_id BIGINT, url VARCHAR, ts TIMESTAMP) WITH (TIMESTAMP=ts);
-- +seeker Down
DROP STREAM clicks;
"""
MIG2 = """-- +seeker Up
CREATE TABLE users (id BIGINT PRIMARY KEY, name VARCHAR);
-- +seeker Down
DROP TABLE users;
"""


def _write(d, name, body):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        f.write(body)
    return p


def test_migrations_up_down(cat, tmp_path):
    mdir = str(tmp_path / "mig")
    os.makedirs(mdir)
    f1 = _write(mdir, "1700000001_clicks.sql", MIG1)
    f2 = _write(mdir, "1700000002_users.sql", MIG2)
    mig = Migrator(cat, str(tmp_path / "state"))
    assert mig.latest_version() == 0

    mig.up(f1)
    assert cat.has("clicks")
    assert cat.get("clicks").timestamp_col == "ts"
    assert mig.latest_version() == 1700000001

    # up: strictly newer only (migrator.go:148-163)
    with pytest.raises(MigrationError, match="not newer"):
        mig.up(f1)

    mig.up(f2)
    assert cat.get("users").primary_key == "id"

    # down: exactly current only (migrator.go:165-187)
    with pytest.raises(MigrationError, match="current version"):
        mig.down(f1)
    mig.down(f2)
    assert not cat.has("users")
    assert mig.latest_version() == 1700000001


def test_auto_migrate(cat, tmp_path):
    mdir = str(tmp_path / "mig")
    os.makedirs(mdir)
    _write(mdir, "1700000001_clicks.sql", MIG1)
    _write(mdir, "1700000002_users.sql", MIG2)
    mig = Migrator(cat, str(tmp_path / "state"))
    assert mig.auto_migrate(mdir) == [1700000001, 1700000002]
    assert cat.has("clicks") and cat.has("users")
    # second run: everything already applied (migrator.go:43-96)
    assert mig.auto_migrate(mdir) == []


def test_bad_migration_filename(cat, tmp_path):
    p = _write(str(tmp_path), "not_versioned.sql", MIG1)
    mig = Migrator(cat, str(tmp_path / "state"))
    with pytest.raises(MigrationError, match="filename"):
        mig.up(p)


def test_queryable_shadow_table(cat, tmp_path):
    """CREATE TABLE auto-creates QUERYABLE_<name> for pull queries
    (tables/specification.go:323, consts/consts.go:17-19); DROP removes
    both (two-step drop, tables/specification.go:127-206)."""
    Create(Ref.TABLE, "users2").SchemaFields(
        ("id", Ktype.BIGINT, "primary"), ("name", Ktype.STRING)
    ).execute(cat, base_dir=str(tmp_path))
    assert cat.has("QUERYABLE_users2")
    assert cat.get("QUERYABLE_users2").properties["shadow_of"] == "users2"
    Drop(cat, Ref.TABLE, "users2")
    assert not cat.has("users2") and not cat.has("QUERYABLE_users2")

"""Source-min watermarks (StreamingJob(source_of=...)): a slow source
holds the watermark back, so interleaved multi-source merges are
lossless without lateness tuning; single-source behavior is unchanged."""

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ksql_ray import (
    Count, F, LatestByOffset, MINUTES, Relation, Schema, Select, Tumbling,
    Catalog,
)
from ksql_ray.catalog import Ref
from ksql_ray.errors import PlanError
from ksql_ray.fixtures import materialize_fixture_dir
from ksql_ray.streaming.driver import StreamingJob

from conftest import assert_tables_equal

BASE = 1_700_000_000_000_000
MIN = 60_000_000


def _query():
    return (Select(F("conv_id"), Count(F("turn_idx")).As("turns"),
                   LatestByOffset(F("role")).As("last_role"))
            .From(Schema("transcripts"))
            .GroupBy(F("conv_id"))
            .Windowed(Tumbling(1, MINUTES))
            .EmitFinal())


def _batch(src: str, k: int, ts_us: int) -> pa.Table:
    t = pa.table({
        "conv_id": [f"{src}-conv"],
        "turn_idx": pa.array([k], type=pa.int32()),
        "role": ["user"],
        "text": [f"{src}:{k}"],
        "tool": pa.array([None], type=pa.string()),
        "ts": pa.array([ts_us], type=pa.timestamp("us")),
    })
    # source_of reads the schema-metadata tag (pa.Table is immutable)
    return t.replace_schema_metadata({"src": src})


def _cat(schema):
    cat = Catalog()
    cat.create(Relation("transcripts", Ref.STREAM, schema,
                        path="/nonexistent", timestamp_col="ts",
                        order_cols=["ts", "turn_idx"]))
    return cat


def test_slow_source_held_back_vs_default(tmp_path, ray_session):
    """Source B lags source A by 5 minutes. Per-partition watermarks
    (default) drop B's rows once A has advanced past them; source-min
    watermarks wait for B and drop nothing."""
    def epochs():
        out = []
        for k in range(4):
            a = _batch("A", k, BASE + (10 + 3 * k) * MIN)
            b = _batch("B", k, BASE + (10 + 3 * k) * MIN - 5 * MIN)
            out.append([a, b])
        return out

    schema = epochs()[0][0].schema
    results = {}
    for mode, kw in [("default", {}),
                     ("srcmin", {"source_of": lambda t: t.schema.metadata[b"src"].decode()})]:
        job = StreamingJob(_query(), _cat(schema),
                           str(tmp_path / f"out_{mode}"),
                           num_partitions=2, lateness_us=0, **kw)
        for ep in epochs():
            job.process_epoch(ep)
        job.finish()
        last = job.metrics_log[-1]["partitions"]
        results[mode] = (sum(p["late_drops"] for p in last),
                         job.result())
    drops_default, _ = results["default"]
    drops_srcmin, got = results["srcmin"]
    assert drops_default > 0, "per-partition mode must drop the lagging source"
    assert drops_srcmin == 0
    # srcmin output == bounded aggregate over ALL rows
    assert got.num_rows == 8  # 4 windows per source, 1 row each


def test_single_source_equals_default(tmp_path, ray_session):
    paths = materialize_fixture_dir(str(tmp_path / "fix"), n_turns=2000,
                                    seed=7, n_files=4)
    files = sorted(glob.glob(paths["transcripts"] + "/*.parquet"))
    schema = pq.read_schema(files[0])
    schema = pa.schema([pa.field(f.name, f.type) for f in schema])
    outs = {}
    for mode, kw in [("default", {}),
                     ("srcmin", {"source_of": lambda f: "s0"})]:
        job = StreamingJob(_query(), _cat(schema),
                           str(tmp_path / f"o_{mode}"),
                           num_partitions=4, lateness_us=300_000_000, **kw)
        job.run(files, files_per_epoch=2)
        job.finish()
        outs[mode] = job.result()
    assert_tables_equal(outs["srcmin"], outs["default"])


def test_srcmin_checkpoint_resume(tmp_path, ray_session):
    def epochs():
        out = []
        for k in range(6):
            a = _batch("A", k, BASE + (10 + 3 * k) * MIN)
            b = _batch("B", k, BASE + (10 + 3 * k) * MIN - 5 * MIN)
            out.append([a, b])
        return out

    schema = epochs()[0][0].schema
    ref_job = StreamingJob(_query(), _cat(schema), str(tmp_path / "ref"),
                           num_partitions=2, lateness_us=0,
                           source_of=lambda t: t.schema.metadata[b"src"].decode())
    for ep in epochs():
        ref_job.process_epoch(ep)
    ref_job.finish()

    ck = str(tmp_path / "ck")
    job = StreamingJob(_query(), _cat(schema), str(tmp_path / "o1"),
                       num_partitions=2, lateness_us=0,
                       source_of=lambda t: t.schema.metadata[b"src"].decode(),
                       checkpoint_dir=ck, checkpoint_every=1)
    for ep in epochs()[:3]:
        job.process_epoch(ep)  # "crash" after 3 of 6 epochs
    job2 = StreamingJob(_query(), _cat(schema), str(tmp_path / "o1"),
                        num_partitions=2, lateness_us=0,
                        source_of=lambda t: t.schema.metadata[b"src"].decode(),
                        checkpoint_dir=ck, checkpoint_every=1, resume=True)
    for ep in epochs():  # re-feed from the start
        job2.process_epoch(ep)
    job2.finish()
    # per-source maxima survived the checkpoint: no drops, same output
    last = job2.metrics_log[-1]["partitions"]
    assert sum(p["late_drops"] for p in last) == 0
    assert_tables_equal(job2.result(), ref_job.result())


def test_srcmin_requires_p2p(tmp_path, ray_session):
    schema = _batch("A", 0, BASE).schema
    with pytest.raises(PlanError, match="p2p"):
        StreamingJob(_query(), _cat(schema), str(tmp_path / "x"),
                     num_partitions=2, route="broadcast",
                     source_of=lambda t: "s")

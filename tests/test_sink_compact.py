"""TwoPhaseSink compaction: read view identical before/after, bounded
file counts, idempotence, crash-leftover cleanup, post-compaction
appends. No Ray needed — the sink is plain-filesystem."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ksql_ray.streaming.sink import TwoPhaseSink


def _fill(sink, parts=3, epochs=10, rows=50, tag=0):
    for e in range(epochs):
        for p in range(parts):
            sink.write(p, e + tag, pa.table({
                "p": pa.array([p] * rows, pa.int64()),
                "e": pa.array([e + tag] * rows, pa.int64()),
                "v": pa.array(range(rows), pa.int64()),
            }))
        sink.commit_epoch(e + tag)


def _snap(sink):
    t = sink.read_committed()
    return sorted(zip(*[t.column(c).to_pylist() for c in ("p", "e", "v")]))


def test_compact_preserves_read_view(tmp_path):
    sink = TwoPhaseSink(str(tmp_path))
    _fill(sink)
    before = _snap(sink)
    n_before = len([f for f in os.listdir(tmp_path)
                    if f.endswith(".parquet")])
    m = sink.compact(target_bytes=1)     # every >=2-file run folds
    assert m["segments"] >= 3 and m["files_removed"] >= 6
    after_files = [f for f in os.listdir(tmp_path)
                   if f.endswith(".parquet")]
    assert len(after_files) < n_before
    assert _snap(sink) == before
    # idempotent: nothing left to fold
    m2 = sink.compact(target_bytes=1)
    assert _snap(sink) == before
    assert m2["files_removed"] == 0 or _snap(sink) == before


def test_compact_ignores_uncommitted(tmp_path):
    sink = TwoPhaseSink(str(tmp_path))
    _fill(sink, epochs=4)
    # an uncommitted epoch beyond the manifest must survive untouched
    sink.write(0, 99, pa.table({"p": pa.array([0]),
                                "e": pa.array([99]),
                                "v": pa.array([1])}))
    before = _snap(sink)
    sink.compact(target_bytes=1)
    assert _snap(sink) == before
    assert os.path.exists(tmp_path / "part-0000-epoch-000099.parquet")


def test_compact_crash_leftover_cleanup(tmp_path):
    """A covered epoch file reappearing (crash between manifest update
    and deletion) is invisible to readers and swept by the next
    compact()."""
    sink = TwoPhaseSink(str(tmp_path))
    _fill(sink, parts=1, epochs=6)
    before = _snap(sink)
    sink.compact(target_bytes=1)
    stale = tmp_path / "part-0000-epoch-000002.parquet"
    pq.write_table(pa.table({"p": pa.array([0], pa.int64()),
                             "e": pa.array([2], pa.int64()),
                             "v": pa.array([777], pa.int64())}), stale)
    assert _snap(sink) == before          # reader ignores the stale copy
    sink.compact(target_bytes=1)
    assert not stale.exists()
    assert _snap(sink) == before


def test_compact_then_append_then_compact(tmp_path):
    sink = TwoPhaseSink(str(tmp_path))
    _fill(sink, parts=2, epochs=5)
    sink.compact(target_bytes=1)
    _fill(sink, parts=2, epochs=5, tag=5)   # epochs 5..9 appended
    want = _snap(sink)
    assert len({e for _p, e, _v in want}) == 10
    sink.compact(target_bytes=1)
    assert _snap(sink) == want

"""Checkpoint rescale for the sketch jobs (streaming/rescale.py):
top-k, HLL, grouped HLL, quantiles, grouped quantiles, CMS — reshard
an in-flight checkpoint to a different partition count and the final
answer equals an uninterrupted single-P run."""

import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ksql_ray.fixtures import materialize_fixture_dir


@pytest.fixture(scope="module")
def stream_files(tmp_path_factory):
    base = tmp_path_factory.mktemp("rss_fix")
    paths = materialize_fixture_dir(str(base), n_turns=2500, seed=23,
                                    n_files=6)
    return sorted(glob.glob(paths["transcripts"] + "/*.parquet"))


def _run_reshard(mk, stream_files, tmp_path, tag, old_p, new_p,
                 answer):
    job = mk(old_p, str(tmp_path / f"cko_{tag}"))
    job.run(stream_files[:3], files_per_epoch=1)
    job2 = mk(new_p, str(tmp_path / f"ckn_{tag}"))
    info = job2.reshard_from(str(tmp_path / f"cko_{tag}"))
    assert info["old_partitions"] == old_p
    assert info["new_partitions"] == new_p
    job2.run(stream_files, files_per_epoch=1)
    ref = mk(new_p, None)
    ref.run(stream_files, files_per_epoch=1)
    assert answer(job2) == answer(ref)


@pytest.mark.parametrize("old_p,new_p", [(3, 5), (5, 2)])
def test_topk_reshard(stream_files, tmp_path, old_p, new_p):
    from ksql_ray.streaming.topk import StreamingTopKJob

    def mk(p, ck):
        return StreamingTopKJob(key_cols=["role", "tool"],
                                num_partitions=p, checkpoint_dir=ck,
                                checkpoint_every=1)

    def answer(job):
        t = job.topk(8)
        return sorted(map(tuple, zip(*[c.to_pylist() for c in t.columns])))

    _run_reshard(mk, stream_files, tmp_path, f"tk{old_p}{new_p}",
                 old_p, new_p, answer)


@pytest.mark.parametrize("old_p,new_p", [(3, 5)])
def test_hll_reshard(stream_files, tmp_path, old_p, new_p):
    from ksql_ray.streaming.cardinality import StreamingHLLJob

    def mk(p, ck):
        return StreamingHLLJob(key_col="conv_id", p=12,
                               num_partitions=p, checkpoint_dir=ck,
                               checkpoint_every=1)

    _run_reshard(mk, stream_files, tmp_path, f"hll{old_p}{new_p}",
                 old_p, new_p, lambda j: j.estimate())


@pytest.mark.parametrize("old_p,new_p", [(3, 5), (5, 2)])
def test_grouped_hll_reshard(stream_files, tmp_path, old_p, new_p):
    from ksql_ray.streaming.cardinality import StreamingGroupedHLLJob

    def mk(p, ck):
        return StreamingGroupedHLLJob(key_col="role", val_col="conv_id",
                                      p=10, num_partitions=p,
                                      checkpoint_dir=ck,
                                      checkpoint_every=1)

    def answer(job):
        t = job.registers()
        return sorted(map(tuple, zip(*[c.to_pylist() for c in t.columns])))

    _run_reshard(mk, stream_files, tmp_path, f"ghll{old_p}{new_p}",
                 old_p, new_p, answer)


@pytest.mark.parametrize("old_p,new_p", [(3, 5)])
def test_quantiles_reshard(stream_files, tmp_path, old_p, new_p):
    from ksql_ray.streaming.quantiles import StreamingQuantilesJob

    def mk(p, ck):
        return StreamingQuantilesJob(col="turn_idx", capacity=8192,
                                     num_partitions=p,
                                     checkpoint_dir=ck,
                                     checkpoint_every=1)

    def answer(job):
        t = job.quantiles([0.25, 0.5, 0.9])
        return t.column("value").to_pylist()

    _run_reshard(mk, stream_files, tmp_path, f"qs{old_p}{new_p}",
                 old_p, new_p, answer)


@pytest.mark.parametrize("old_p,new_p", [(3, 5), (5, 2)])
def test_grouped_quantiles_reshard(stream_files, tmp_path, old_p,
                                   new_p):
    from ksql_ray.streaming.quantiles import StreamingGroupedQuantilesJob

    def mk(p, ck):
        return StreamingGroupedQuantilesJob(
            key_cols=["role"], col="turn_idx",
            num_partitions=p, checkpoint_dir=ck, checkpoint_every=1)

    def answer(job):
        t = job.quantiles([0.5, 0.9])
        return sorted(map(tuple, zip(*[c.to_pylist() for c in t.columns])))

    _run_reshard(mk, stream_files, tmp_path, f"gq{old_p}{new_p}",
                 old_p, new_p, answer)


@pytest.mark.parametrize("old_p,new_p", [(3, 5), (5, 2)])
def test_cms_reshard(stream_files, tmp_path, old_p, new_p):
    from ksql_ray.streaming.cms import StreamingCMSJob

    def mk(p, ck):
        return StreamingCMSJob(key_col="role", depth=4, width=128,
                               num_partitions=p, checkpoint_dir=ck,
                               checkpoint_every=1)

    def answer(job):
        # counters() unions per-partition cells; the sketch's value is
        # the per-cell SUM (cell ownership legitimately differs after
        # a rescale)
        df = job.counters().to_pandas().groupby(
            ["d", "bucket"], as_index=False)["cnt"].sum()
        return sorted(map(tuple, df.itertuples(index=False)))

    _run_reshard(mk, stream_files, tmp_path, f"cms{old_p}{new_p}",
                 old_p, new_p, answer)


@pytest.mark.parametrize("old_p,new_p", [(3, 5), (5, 2)])
def test_transitions_reshard(stream_files, tmp_path, old_p, new_p):
    from ksql_ray.streaming.rows import StreamingTransitionsJob

    def mk(p, ck):
        return StreamingTransitionsJob(
            key_cols=["conv_id"], ord_col="ts", label_col="role",
            num_partitions=p, checkpoint_dir=ck, checkpoint_every=1)

    def answer(job):
        df = job.transitions().to_pandas().groupby(
            ["from_label", "to_label"], as_index=False)["cnt"].sum()
        return sorted(map(tuple, df.itertuples(index=False)))

    _run_reshard(mk, stream_files, tmp_path, f"tr{old_p}{new_p}",
                 old_p, new_p, answer)


@pytest.mark.parametrize("old_p,new_p", [(3, 5), (5, 2)])
def test_anomaly_reshard(stream_files, tmp_path, old_p, new_p):
    # pre-crash EMISSIONS are not part of actor state; compare the
    # post-resume emissions of a resharded resume vs a same-P resume
    # from the same checkpoint (state equality implies equal z-scores)
    from ksql_ray.streaming.rows import StreamingAnomalyJob

    tag = f"an{old_p}{new_p}"
    ck = str(tmp_path / f"cko_{tag}")

    def mk(p, ckd=None, resume=False):
        return StreamingAnomalyJob(
            key_cols=["conv_id"], ord_col="ts", val_col="turn_idx",
            min_n=3, threshold=1.5, num_partitions=p,
            checkpoint_dir=ckd, checkpoint_every=1, resume=resume)

    job = mk(old_p, ck)
    job.run(stream_files[:3], files_per_epoch=1)

    resharded = mk(new_p, str(tmp_path / f"ckn_{tag}"))
    resharded.reshard_from(ck)
    resharded.run(stream_files, files_per_epoch=1)

    plain = mk(old_p, ck, resume=True)
    plain.run(stream_files, files_per_epoch=1)

    def rows(job):
        t = job.result()
        if t is None:
            return []
        return sorted(map(tuple, zip(*[c.to_pylist() for c in t.columns])))

    assert rows(resharded) == rows(plain)

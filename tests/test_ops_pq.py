"""pq_train / pq_encode / pq_topk vs single-process numpy references."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ksql_ray.ops.pq import pq_encode, pq_topk, pq_train


def _rnd(m, dp=4):
    s = 10.0 ** dp
    return np.floor(m * s + np.where(m >= 0, 0.5, -0.5)) / s


def _np_pq_train(ids, mat, m, k, iters, dp=4):
    d = mat.shape[1]
    sd = d // m
    order = np.argsort(ids, kind="stable")
    cents = np.stack([_rnd(mat[order[:k], s * sd:(s + 1) * sd].astype(np.float64), dp)
                      for s in range(m)])
    for _ in range(iters):
        new = cents.copy()
        for s in range(m):
            sub = mat[:, s * sd:(s + 1) * sd].astype(np.float64)
            d2 = ((sub[:, None, :] - cents[s][None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for c in range(k):
                if (a == c).any():
                    new[s, c] = _rnd(sub[a == c].mean(axis=0), dp)
        cents = new
    return cents


def _np_assign(mat, cents, s, sd):
    sub = mat[:, s * sd:(s + 1) * sd].astype(np.float64)
    d2 = ((sub[:, None, :] - cents[s][None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1)


def _ds(ids, mat):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })).repartition(4)


@pytest.fixture(scope="module")
def pq_fixture():
    rng = np.random.default_rng(17)
    mat = rng.normal(size=(300, 16)).astype(np.float32)
    ids = np.arange(300, dtype=np.int64)
    return ids, mat


def test_train_vs_numpy(ray_session, pq_fixture):
    ids, mat = pq_fixture
    cents = pq_train(_ds(ids, mat), m=4, k=3, iters=2, round_dp=4)
    want = _np_pq_train(ids, mat, 4, 3, 2, 4)
    assert cents.shape == (4, 3, 4)
    np.testing.assert_array_equal(cents, want)


def test_encode_unpacked_and_packed_agree(ray_session, pq_fixture):
    ids, mat = pq_fixture
    ds = _ds(ids, mat)
    cents = pq_train(ds, m=4, k=3, iters=2, round_dp=4)
    up = pq_encode(ds, cents, pack=False).to_pandas().sort_values("vec_id")
    pk = pq_encode(ds, cents, pack=True).to_pandas().sort_values("vec_id")
    sd = 4
    for s in range(4):
        want = _np_assign(mat, cents, s, sd)
        np.testing.assert_array_equal(up[f"c{s}"].to_numpy(), want)
        got_packed = np.array([row[s] for row in pk["codes"]])
        np.testing.assert_array_equal(got_packed, want)


def test_adc_topk_vs_numpy(ray_session, pq_fixture):
    ids, mat = pq_fixture
    ds = _ds(ids, mat)
    cents = pq_train(ds, m=4, k=3, iters=2, round_dp=4)
    codes_ds = pq_encode(ds, cents, pack=True)
    qm = mat[:5].astype(np.float64)
    got = pq_topk(codes_ds, cents, list(range(5)), qm, k=7).to_pandas()
    # numpy ADC reference
    sd = 4
    codes = np.stack([_np_assign(mat, cents, s, sd) for s in range(4)], axis=1)
    for q in range(5):
        lut = np.stack([((qm[q, s * sd:(s + 1) * sd][None, :]
                          - cents[s]) ** 2).sum(axis=1) for s in range(4)])
        dist = lut[np.arange(4)[None, :], codes].sum(axis=1)
        order = np.lexsort((ids, dist))[:7]
        sub = got[got.query_id == q].sort_values("rank")
        np.testing.assert_array_equal(sub.vec_id.to_numpy(), ids[order])


def test_adc_finds_planted_neighbor(ray_session):
    # a strongly clustered corpus: ADC@1 must return a same-blob vector
    rng = np.random.default_rng(23)
    mat = rng.normal(size=(200, 16)).astype(np.float32)
    mat[:100] += 10
    ids = np.arange(200, dtype=np.int64)
    ds = _ds(ids, mat)
    cents = pq_train(ds, m=4, k=8, iters=3)
    codes_ds = pq_encode(ds, cents, pack=True)
    got = pq_topk(codes_ds, cents, [0, 150],
                  mat[[0, 150]].astype(np.float64), k=5).to_pandas()
    for qid, lo, hi in [(0, 0, 100), (150, 100, 200)]:
        top = got[got.query_id == qid].sort_values("rank").vec_id.to_numpy()
        assert all(lo <= v < hi for v in top)


def test_dim_not_divisible(ray_session, pq_fixture):
    ids, mat = pq_fixture
    with pytest.raises(ValueError, match="divisible"):
        pq_train(_ds(ids, mat), m=5, k=2, iters=1)

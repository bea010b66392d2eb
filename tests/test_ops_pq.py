"""pq_train / pq_encode / pq_topk vs single-process numpy references."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ksql_ray.ops.pq import pq_encode, pq_topk, pq_train


def _rnd(m, dp=4):
    s = 10.0 ** dp
    return np.trunc(m * s + np.where(m >= 0, 0.5, -0.5)) / s


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


def _np_ivfpq(ids, mat, nlist, m, k, coarse_iters, pq_iters, dp=6):
    """Single-process IVF-PQ reference with the engine's exact
    determinism contract."""
    d = mat.shape[1]
    sd = d // m
    coarse = np.stack(list(_np_pq_train_full(ids, mat, nlist, coarse_iters, dp)))
    lists = _np_assign_full(mat, coarse)
    r = mat.astype(np.float64) - coarse[lists]
    order = np.argsort(ids, kind="stable")
    cents = np.stack([_rnd(r[order[:k], s * sd:(s + 1) * sd], dp)
                      for s in range(m)])
    for _ in range(pq_iters):
        new = cents.copy()
        for s in range(m):
            sub = r[:, s * sd:(s + 1) * sd]
            d2 = ((sub[:, None, :] - cents[s][None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for c in range(k):
                if (a == c).any():
                    new[s, c] = _rnd(sub[a == c].mean(axis=0), dp)
        cents = new
    codes = np.stack([
        np.argmin(((r[:, s * sd:(s + 1) * sd][:, None, :]
                    - cents[s][None, :, :]) ** 2).sum(axis=2), axis=1)
        for s in range(m)], axis=1)
    return coarse, cents, lists, codes


def _np_pq_train_full(ids, mat, k, iters, dp):
    """Plain k-means over the FULL vectors (the coarse quantizer)."""
    order = np.argsort(ids, kind="stable")
    cents = _rnd(mat[order[:k]].astype(np.float64), dp)
    for _ in range(iters):
        a = _np_assign_full(mat, cents)
        new = cents.copy()
        for c in range(k):
            if (a == c).any():
                new[c] = _rnd(mat[a == c].astype(np.float64).mean(axis=0), dp)
        cents = new
    return cents


def _np_assign_full(mat, cents):
    d2 = ((mat.astype(np.float64)[:, None, :]
           - cents[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1)


def test_ivfpq_vs_numpy(ray_session):
    from ksql_ray.ops.pq import ivfpq_build, ivfpq_topk

    rng = np.random.default_rng(31)
    mat = rng.normal(size=(400, 16)).astype(np.float32)
    ids = np.arange(400, dtype=np.int64)
    codes_ds, coarse, cents = ivfpq_build(
        _ds(ids, mat), nlist=8, m=4, k=4, coarse_iters=2, pq_iters=2)
    ref_coarse, ref_cents, ref_lists, ref_codes = _np_ivfpq(
        ids, mat, 8, 4, 4, 2, 2)
    np.testing.assert_array_equal(coarse, ref_coarse)
    np.testing.assert_array_equal(cents, ref_cents)
    got = codes_ds.to_pandas().sort_values("vec_id")
    np.testing.assert_array_equal(got["list"].to_numpy(), ref_lists)
    got_codes = np.stack([np.frombuffer(b, dtype=np.uint8)
                          for b in got["codes"]]).astype(np.int64)
    np.testing.assert_array_equal(got_codes, ref_codes)

    # full-probe search == numpy ADC over every list
    qm = mat[:3].astype(np.float64)
    res = ivfpq_topk(codes_ds, coarse, cents, [0, 1, 2], qm, k=5,
                     nprobe=8).to_pandas()
    sd = 4
    for q in range(3):
        luts = np.zeros((8, 4, 4))
        for l in range(8):
            rq = qm[q] - ref_coarse[l]
            for s in range(4):
                luts[l, s] = ((rq[s * sd:(s + 1) * sd][None, :]
                               - ref_cents[s]) ** 2).sum(axis=1)
        dist = luts[ref_lists[:, None], np.arange(4)[None, :], ref_codes].sum(axis=1)
        want = ids[np.lexsort((ids, dist))[:5]]
        sub = res[res.query_id == q].sort_values("rank")
        np.testing.assert_array_equal(sub.vec_id.to_numpy(), want)


def test_ivfpq_probe_finds_planted_blob(ray_session):
    from ksql_ray.ops.pq import ivfpq_build, ivfpq_topk

    rng = np.random.default_rng(37)
    mat = rng.normal(size=(600, 16)).astype(np.float32)
    mat[:200] += 12; mat[200:400] -= 12  # 3 well-separated blobs
    ids = np.arange(600, dtype=np.int64)
    codes_ds, coarse, cents = ivfpq_build(
        _ds(ids, mat), nlist=6, m=4, k=8, coarse_iters=3, pq_iters=2)
    res = ivfpq_topk(codes_ds, coarse, cents, [0, 250],
                     mat[[0, 250]].astype(np.float64), k=10,
                     nprobe=2).to_pandas()
    for qid, lo, hi in [(0, 0, 200), (250, 200, 400)]:
        top = res[res.query_id == qid].sort_values("rank").vec_id.to_numpy()
        assert len(top) == 10 and all(lo <= v < hi for v in top)

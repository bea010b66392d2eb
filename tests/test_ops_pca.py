"""Distributed PCA (ops/pca.py): moments vs numpy, projection
contract (orthonormal components, variance ordering, reconstruction
error monotone in k), partition invariance, sign determinism. The
sf0.01 covariance oracle runs via op_pca_covariance in
test_driver_contract.py."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ksql_ray.ops.pca import (embedding_covariance, pca_project,
                              pca_train)

D = 16


def _vecs(n=600, seed=0):
    rng = np.random.default_rng(seed)
    # anisotropic: a few dominant directions so PCA has signal
    basis = rng.standard_normal((D, D))
    scale = np.linspace(3.0, 0.1, D)
    m = rng.standard_normal((n, D)) * scale @ basis
    m += rng.uniform(-1, 1, D)           # nonzero mean
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(m.astype(np.float32))),
    }), m.astype(np.float32).astype(np.float64)


def test_covariance_matches_numpy(ray_session):
    t, m = _vecs()
    got = embedding_covariance(
        ray.data.from_arrow(t).repartition(5), dim=D).to_pandas()
    cov = np.zeros((D, D))
    for r in got.itertuples():
        cov[r.i, r.j] = r.cov
    want = np.cov(m, rowvar=False, bias=True)
    assert np.allclose(cov, want, atol=1e-9)


def test_pca_projection_contract(ray_session):
    t, m = _vecs(seed=1)
    ds = ray.data.from_arrow(t).repartition(4)
    model = pca_train(ds, k=6, dim=D)
    # orthonormal components, descending explained variance
    assert np.allclose(model.components @ model.components.T,
                       np.eye(6), atol=1e-9)
    assert np.all(np.diff(model.explained_var) <= 1e-9)
    proj = pca_project(ds, model).to_pandas().sort_values("vec_id")
    P = np.array(proj["pca"].tolist())
    # projected variance equals the eigenvalues, in order
    assert np.allclose(P.var(axis=0), model.explained_var, rtol=1e-6)
    # reconstruction error decreases as k grows
    errs = []
    for k in (2, 6, D):
        mk = pca_train(ds, k=k, dim=D)
        pk = (m - mk.mean) @ mk.components.T
        rec = pk @ mk.components + mk.mean
        errs.append(float(((m - rec) ** 2).mean()))
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] == pytest.approx(0.0, abs=1e-15)


def test_pca_sign_deterministic_and_partition_invariant(ray_session):
    t, _ = _vecs(seed=2)
    m1 = pca_train(ray.data.from_arrow(t), k=4, dim=D)
    m2 = pca_train(ray.data.from_arrow(t).repartition(7), k=4, dim=D)
    assert np.allclose(m1.components, m2.components, atol=1e-9)
    assert np.allclose(m1.mean, m2.mean, atol=1e-12)


def test_pca_validation(ray_session):
    t, _ = _vecs(n=50)
    with pytest.raises(ValueError):
        pca_train(ray.data.from_arrow(t), k=0, dim=D)
    with pytest.raises(ValueError):
        pca_train(ray.data.from_arrow(t), k=D + 1, dim=D)

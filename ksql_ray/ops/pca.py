"""Distributed PCA over an embedding column.

Dimensionality reduction is the workhorse preprocessing step in front
of embedding dedup / clustering / ANN at corpus scale (project 1024-d
model embeddings to 64-d before the O(n²/k) SemDeDup pairwise or the
IVF coarse quantizer). The reference has no vector surface (absence
verified across /root/reference/ksql/*.go); this sits beside
ops/cluster.py and ops/pq.py in the §2.11 training-data layer.

Classic two-moment distributed PCA — exactly the shape Ray Data wants:

1. **Moments pass** (one stateless ``map_batches``): each batch emits
   its partial (count, Σx, XᵀX) — d + d² floats REGARDLESS of batch
   size (one ``m.T @ m`` per batch, BLAS) — merged by a distributed
   ``groupby.sum`` over (i, j) cells. Nothing row-shaped shuffles.
2. **Eigendecomposition** on the driver: the d×d population covariance
   C = E[xxᵀ] − μμᵀ is tiny (64×64 here); ``np.linalg.eigh`` gives the
   top-k components. Sign convention: each component's
   largest-|coefficient| entry is made positive, so results are
   deterministic across runs/BLAS builds (eigenvector sign is
   otherwise arbitrary).
3. **Projection** (one stateless ``map_batches``): per-batch
   ``(X − μ) @ Wᵀ``, components captured in the task closure (k·d
   floats — tiny).

The oracle-gated artifact is the covariance matrix itself
(``op_pca_covariance``: 4096 (i, j, cov) rows vs an unnest/cross-join
SQL) — the eigendecomposition is NOT SQL-expressible, so the
projection contract (variance ordering, orthonormality, reconstruction
error monotone in k) is pinned by pytest instead.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray.data

from .vectors import vecs_np

__all__ = ["embedding_covariance", "pca_train", "pca_project", "PCAModel"]


def _moments(ds: ray.data.Dataset, col: str, dim: int):
    """-> (n rows, mean vector [d], E[x xT] matrix [d, d])."""
    def partial(batch: pa.Table) -> pa.Table:
        m = vecs_np(batch.column(col), dtype=np.float64)
        if m.shape[0] and m.shape[1] != dim:
            raise ValueError(
                f"embedding dim {m.shape[1]} != declared {dim}")
        xtx = m.T @ m if m.shape[0] else np.zeros((dim, dim))
        s = m.sum(axis=0) if m.shape[0] else np.zeros(dim)
        i = np.repeat(np.arange(dim, dtype=np.int64), dim)
        j = np.tile(np.arange(dim, dtype=np.int64), dim)
        return pa.table({
            "i": pa.array(i), "j": pa.array(j),
            "xx": pa.array(xtx.ravel(), type=pa.float64()),
            # Σx rides the diagonal cells; n rides cell (0, 0)
            "sx": pa.array(np.where(i == j, s[i], 0.0),
                           type=pa.float64()),
            "n": pa.array(np.where((i == 0) & (j == 0),
                                   float(m.shape[0]), 0.0),
                          type=pa.float64()),
        })

    from .smallagg import grouped_sum

    agg = grouped_sum(ds.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      ["i", "j"], ["xx", "sx", "n"])
    rows = agg.take_all()          # exactly d*d rows, independent of data
    xtx = np.zeros((dim, dim))
    s = np.zeros(dim)
    n = 0.0
    for r in rows:
        i, j = int(r["i"]), int(r["j"])
        xtx[i, j] = r["xx"]
        if i == j:
            s[i] = r["sx"]
        if i == 0 and j == 0:
            n = r["n"]
    if n == 0:
        raise ValueError("empty dataset")
    return int(n), s / n, xtx / n


def embedding_covariance(ds: ray.data.Dataset, col: str = "embedding",
                         dim: int = 64) -> pa.Table:
    """Population covariance as (i, j, cov) rows — the oracle-checkable
    artifact (cov = E[x_i x_j] − μ_i μ_j)."""
    _n, mu, exx = _moments(ds, col, dim)
    cov = exx - np.outer(mu, mu)
    i = np.repeat(np.arange(dim, dtype=np.int64), dim)
    j = np.tile(np.arange(dim, dtype=np.int64), dim)
    return pa.table({"i": pa.array(i), "j": pa.array(j),
                     "cov": pa.array(cov.ravel(), type=pa.float64())})


@dataclass
class PCAModel:
    mean: np.ndarray          # [d]
    components: np.ndarray    # [k, d] rows = principal axes
    explained_var: np.ndarray  # [k] descending


def pca_train(ds: ray.data.Dataset, k: int, col: str = "embedding",
              dim: int = 64) -> PCAModel:
    if not 1 <= k <= dim:
        raise ValueError("k must be in [1, dim]")
    _n, mu, exx = _moments(ds, col, dim)
    cov = exx - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)            # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T.copy()          # [k, d]
    # deterministic sign: largest-|coef| entry positive per component
    for r in range(k):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    return PCAModel(mean=mu, components=comps,
                    explained_var=np.maximum(w[order], 0.0))


def pca_project(ds: ray.data.Dataset, model: PCAModel,
                col: str = "embedding",
                out_col: str = "pca") -> ray.data.Dataset:
    """Append the k-d projection as a list<double> column."""
    mu, comps = model.mean, model.components
    k = comps.shape[0]

    def fn(batch: pa.Table) -> pa.Table:
        m = vecs_np(batch.column(col), dtype=np.float64)
        proj = (m - mu) @ comps.T if m.shape[0] else \
            np.zeros((0, k))
        offs = pa.array(np.arange(batch.num_rows + 1) * k,
                        type=pa.int32())
        lst = pa.ListArray.from_arrays(
            offs, pa.array(proj.ravel(), type=pa.float64()))
        return batch.append_column(out_col, lst)

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)

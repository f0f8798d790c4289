"""Distributed k-means (imgray/ops/cluster.py): planted-cluster
recovery, determinism, and block-order invariance."""

import numpy as np
import pyarrow as pa
import pytest


def _planted(n_per=40, k=3, dim=8, spread=0.05):
    """k well-separated blobs; deterministic (no RNG state shared with
    other tests — a fixed PCG64 seed)."""
    rng = np.random.Generator(np.random.PCG64(7))
    centers = np.eye(k, dim) * 10.0
    vecs, labels = [], []
    for c in range(k):
        vecs.append(centers[c] + rng.normal(0, spread, (n_per, dim)))
        labels.extend([c] * n_per)
    x = np.concatenate(vecs)
    ids = np.arange(len(x), dtype=np.int64)
    # interleave so no block is single-cluster
    order = np.argsort((ids * 7919) % len(x), kind="stable")
    return (pa.table({
        "vec_id": pa.array(ids[order]),
        "embedding": pa.array([r.tolist() for r in x[order]],
                              type=pa.list_(pa.float32()))}),
        np.asarray(labels)[order])


def test_kmeans_recovers_planted_clusters(ray_session):
    import ray

    from imgray.ops.cluster import kmeans_fit_predict

    tbl, labels = _planted()
    ds = ray.data.from_arrow(tbl).repartition(6)
    out = pa.concat_tables(
        [t for t in (ray.get(r) for r in kmeans_fit_predict(
            ds, k=3, iters=4).to_arrow_refs()) if t.num_rows])
    got = dict(zip(out.column("vec_id").to_pylist(),
                   out.column("cluster").to_pylist()))
    ids = tbl.column("vec_id").to_pylist()
    assign = np.array([got[i] for i in ids])
    # every planted blob maps to exactly one k-means cluster, bijectively
    mapping = {}
    for lab, cl in zip(labels, assign):
        mapping.setdefault(lab, set()).add(cl)
    assert all(len(v) == 1 for v in mapping.values())
    assert len({next(iter(v)) for v in mapping.values()}) == 3


def test_kmeans_block_order_invariant(ray_session):
    import ray

    from imgray.ops.cluster import kmeans_fit

    tbl, _ = _planted()
    a = kmeans_fit(ray.data.from_arrow(tbl).repartition(3), k=3, iters=3)
    rev = tbl.take(pa.array(list(range(tbl.num_rows - 1, -1, -1))))
    b = kmeans_fit(ray.data.from_arrow(rev).repartition(5), k=3, iters=3)
    # centroid IDENTITY (seed order) is block-invariant; float sums may
    # differ in the last ulps across partition layouts
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_kmeans_k_larger_than_dataset_raises(ray_session):
    import ray

    from imgray.ops.cluster import kmeans_fit

    tbl, _ = _planted(n_per=2, k=2)
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_fit(ray.data.from_arrow(tbl), k=10, iters=1)

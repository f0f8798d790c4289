"""Distributed k-means clustering over an embedding column.

The training-data-pipeline clustering op (domain/topic bucketing of a
corpus by embedding): Lloyd's algorithm expressed Ray-Data-first —
every iteration is ONE streaming ``map_batches`` pass that emits
per-block partial sums (k rows of (cluster, n, sum-vector)); only
k x dim floats per block return to the driver, which combines them
into the next centroid set and re-broadcasts via ``ray.put``.  The
full embedding table never materializes anywhere.

Determinism (block-order invariant, no RNG):
- init: the k vectors whose Knuth multiplicative hash of the id is
  globally smallest (ties by id) — a decomposable per-block top-k,
  same sampling primitive as ``ann.ivf_topk``'s centroid sample;
- assignment: squared-L2 argmin with numpy's first-lowest-index tie
  rule (stable because the centroid ORDER is itself deterministic:
  centroids are sorted by their seed id);
- combine: per-cluster float64 sums are added in cluster order over
  block partials sorted by block id — float addition order is fixed.

Scale notes (100 TB): broadcast size is k x dim float64 (a few MB for
k=1024, dim=1024) read zero-copy from the object store by every task;
the per-iteration shuffle is the k-row partials only.  Empty clusters
keep their previous centroid (documented, deterministic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .ann import list_column_to_numpy

KNUTH = np.uint64(2654435761)


def _hash_ids(ids: np.ndarray) -> np.ndarray:
    return (ids.astype(np.uint64) * KNUTH) % np.uint64(1 << 32)


def _seed_partial(batch: pa.Table, k: int, id_col: str,
                  vec_col: str) -> pa.Table:
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    h = _hash_ids(ids)
    order = np.lexsort((ids, h))[:k]
    sub = batch.take(pa.array(order))
    return pa.table({
        "id": pa.array(ids[order], type=pa.int64()),
        "h": pa.array(h[order].astype(np.int64), type=pa.int64()),
        "vec": sub.column(vec_col),
    })


def kmeans_fit(ds, k: int = 8, iters: int = 5, id_col: str = "vec_id",
               vec_col: str = "embedding") -> np.ndarray:
    """Fit k centroids; returns a (k, dim) float64 array (sorted by
    seed id).  ``ds`` is streamed ``iters + 1`` times, never held."""
    seeds = pa.concat_tables(
        [t for t in (ray.get(r) for r in ds.map_batches(
            _seed_partial, batch_format="pyarrow",
            fn_kwargs={"k": k, "id_col": id_col, "vec_col": vec_col},
        ).to_arrow_refs()) if t.num_rows])
    ids = seeds.column("id").to_numpy(zero_copy_only=False)
    h = seeds.column("h").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, h))[:k]
    # centroid index order = ascending seed id (stable across runs
    # and block orders; the hash only picks WHICH ids seed)
    order = order[np.argsort(ids[order])]
    centroids = list_column_to_numpy(seeds.column("vec"))[order]
    if len(centroids) < k:
        raise ValueError(f"k={k} exceeds dataset size {len(centroids)}")

    for _ in range(iters):
        bref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(bref)
            x = list_column_to_numpy(batch.column(vec_col))
            a = _assign(x, c)
            kk, d = c.shape
            sums = np.zeros((kk, d))
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=kk).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(kk), type=pa.int64()),
                "n": pa.array(counts, type=pa.int64()),
                "sum": pa.array(sums.tolist(), type=pa.list_(pa.float64())),
            })

        parts = [ray.get(r) for r in ds.map_batches(
            partial, batch_format="pyarrow").to_arrow_refs()]
        parts = [p for p in parts if p.num_rows]
        sums = np.zeros_like(centroids)
        counts = np.zeros(k, dtype=np.int64)
        for p in parts:
            sums += list_column_to_numpy(p.column("sum"))
            counts += p.column("n").to_numpy(zero_copy_only=False)
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centroids


def _assign(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 constant per row
    d2 = -2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
    return d2.argmin(axis=1)


def kmeans_predict(ds, centroids: np.ndarray, id_col: str = "vec_id",
                   vec_col: str = "embedding"):
    """Streaming assignment pass → Dataset of (id_col, cluster)."""
    bref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(bref)
        x = list_column_to_numpy(batch.column(vec_col))
        return pa.table({
            id_col: batch.column(id_col),
            "cluster": pa.array(_assign(x, c), type=pa.int64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_fit_predict(ds, k: int = 8, iters: int = 5,
                       id_col: str = "vec_id", vec_col: str = "embedding"):
    return kmeans_predict(ds, kmeans_fit(ds, k, iters, id_col, vec_col),
                          id_col, vec_col)

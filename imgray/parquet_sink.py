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


def write_range_partitioned(ds, root: str, key: str, nbuckets: int = 16,
                            resume: bool = True) -> dict:
    """Range-partitioned (clustered) variant of :func:`write_partitioned`
    for INTEGER keys: bucket boundaries are the exact equi-depth
    quantile cuts of ``key`` (ops.relational.exact_quantiles_int — two
    streaming histogram passes, no sort), so buckets are balanced even
    under heavy key skew, and every bucket covers a disjoint key range
    whose [lo, hi] is recorded in a sidecar ``_range`` file.  Rows are
    sorted by ``key`` within each bucket, giving a globally clustered
    layout: a range query can prune whole buckets via
    :func:`read_range` and rely on parquet row-group stats inside.

    Same atomic-rename + skip-finished resume contract as the hash
    sink.  Returns {"written", "skipped", "rows", "cuts"}.
    """
    import json

    import numpy as np

    from .ops.relational import exact_quantiles_int

    os.makedirs(root, exist_ok=True)
    cuts_path = os.path.join(root, "_cuts.json")
    if resume and os.path.exists(cuts_path):
        with open(cuts_path) as f:
            cuts = json.load(f)
    else:
        qs = [i / nbuckets for i in range(1, nbuckets)]
        qt = exact_quantiles_int(ds, key, qs) if qs else None
        cuts = qt.column("value").to_pylist() if qt is not None else []
        tmp = cuts_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cuts, f)
        os.replace(tmp, cuts_path)

    done = set()
    if resume:
        for i in range(nbuckets):
            if os.path.exists(_bucket_path(root, i)):
                done.add(i)

    cuts_arr = np.asarray(cuts, dtype=np.int64)

    def add_part(batch: pa.Table) -> pa.Table:
        import numpy as _np

        v = batch.column(key).to_numpy(zero_copy_only=False)
        pid = _np.searchsorted(cuts_arr, v, side="left").astype("int32")
        return batch.append_column("_part", pa.array(pid))

    def write_bucket(part: pa.Table) -> pa.Table:
        pid = part.column("_part")[0].as_py()
        t = part.drop_columns(["_part"]).sort_by(key)
        if pid in done:
            return pa.table({"part": pa.array([pid], pa.int32()),
                             "rows": pa.array([0], pa.int64()),
                             "written": pa.array([False])})
        final = _bucket_path(root, pid)
        tmp = final + ".tmp"
        os.makedirs(os.path.dirname(final), exist_ok=True)
        pq.write_table(t, tmp)
        os.replace(tmp, final)
        lo = t.column(key)[0].as_py() if t.num_rows else None
        hi = t.column(key)[-1].as_py() if t.num_rows else None
        with open(os.path.join(os.path.dirname(final), "_range"),
                  "w") as f:
            f.write(f"{lo} {hi}")
        return pa.table({"part": pa.array([pid], pa.int32()),
                         "rows": pa.array([t.num_rows], pa.int64()),
                         "written": pa.array([True])})

    import ray

    tbls = [ray.get(r) for r in
            ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(write_bucket, batch_format="pyarrow")
            .to_arrow_refs()]
    tbls = [t for t in tbls if t.num_rows > 0]
    written, rows = [], 0
    for t in tbls:
        for p, r, w in zip(t.column("part").to_pylist(),
                           t.column("rows").to_pylist(),
                           t.column("written").to_pylist()):
            if w:
                written.append(p)
                rows += r
    return {"written": sorted(written), "skipped": sorted(done),
            "rows": rows, "cuts": cuts}


def read_range(root: str, key: str, lo: int, hi: int):
    """Read only the buckets whose recorded [min, max] key range
    intersects [lo, hi] — whole-bucket pruning before any parquet IO —
    then row-filter exactly."""
    import ray.data

    paths = []
    for name in sorted(os.listdir(root)):
        rng = os.path.join(root, name, "_range")
        dat = os.path.join(root, name, "data.parquet")
        if not os.path.exists(dat):
            continue
        if os.path.exists(rng):
            blo, bhi = open(rng).read().split()
            if blo != "None" and (int(bhi) < lo or int(blo) > hi):
                continue
        paths.append(dat)
    if not paths:
        import pyarrow.dataset  # noqa: F401  (empty result, same API)

        return ray.data.from_arrow(pa.table({}))
    ds = ray.data.read_parquet(paths)
    return ds.filter(
        expr=f"{key} >= {lo} and {key} <= {hi}")

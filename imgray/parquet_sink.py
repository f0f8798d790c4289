"""Resumable partitioned parquet sinks for tabular pipelines.

The image/crawl sink (lancelite.py) already writes per-fragment files
with an atomic manifest; these are the generic tabular counterparts
the 100-TB brief asks for ("write partitioned output so a failed run
can skip finished partitions; never one giant file"):

- rows are routed to ``nbuckets`` directories by a deterministic hash
  of a key column (the shared partitioner from ops.dedup, so the
  layout is stable across runs and machines) — or by exact equi-depth
  key ranges for the clustered variant;
- a ``_meta.json`` manifest (written atomically BEFORE any bucket)
  records ``{kind, key, nbuckets}``; a resume run validates it, so
  mixing layouts in one directory fails loudly instead of silently
  reading stale foreign buckets;
- each bucket is written worker-side by its own task (groupby on the
  bucket id — no driver materialization) to a temp file, fsynced
  (file and directory), then atomically renamed to
  ``part=NN/data.parquet`` — a bucket either exists completely or not
  at all, even across power loss;
- a re-run with ``resume=True`` skips buckets whose file already
  exists: only missing buckets are recomputed and written, so a crash
  at any point wastes at most the in-flight buckets.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from .ops.dedup import _hash_partition_column


def _fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _atomic_replace(tmp: str, final: str) -> None:
    """fsync the temp file, rename it into place, fsync the directory —
    the rename is only durable once its directory entry is."""
    fd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.replace(tmp, final)
    _fsync_dir(os.path.dirname(final))


def _write_meta(root: str, meta: dict, resume: bool) -> None:
    path = os.path.join(root, "_meta.json")
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
        if existing == meta:
            return
        if resume:
            raise ValueError(
                f"sink at {root} was written with {existing}, "
                f"refusing to resume as {meta}")
        # explicit fresh (resume=False) write over a different layout:
        # drop the old buckets so stale partitions can't leak into
        # read-back
        for name in os.listdir(root):
            if name.startswith("part="):
                import shutil

                shutil.rmtree(os.path.join(root, name))
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    _atomic_replace(tmp, path)


def _read_meta(root: str) -> dict:
    with open(os.path.join(root, "_meta.json")) as f:
        return json.load(f)


def _bucket_path(root: str, pid: int) -> str:
    return os.path.join(root, f"part={pid:04d}", "data.parquet")


def _empty_like(root: str, meta: dict):
    """Empty Dataset carrying the sink's row schema (from any existing
    bucket), so schema-dependent callers work on the no-rows path."""
    import ray.data

    for i in range(meta["nbuckets"]):
        p = _bucket_path(root, i)
        if os.path.exists(p):
            return ray.data.from_arrow(
                pq.read_schema(p).empty_table())
    return ray.data.from_arrow(pa.table({}))


# ------------------------------------------------------ hash-partitioned

def write_partitioned(ds, root: str, key: str, nbuckets: int = 64,
                      resume: bool = True) -> dict:
    """Write ``ds`` under ``root`` hash-partitioned by ``key``.
    Returns ``{"written": [...], "skipped": [...], "rows": int}``
    (rows counts only newly written buckets)."""
    os.makedirs(root, exist_ok=True)
    _write_meta(root, {"kind": "hash", "key": key,
                       "nbuckets": nbuckets}, resume)
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
        if pid in done:
            return pa.table({"part": pa.array([pid], pa.int32()),
                             "rows": pa.array([0], pa.int64()),
                             "written": pa.array([False])})
        t = part.drop_columns(["_part"])
        final = _bucket_path(root, pid)
        tmp = final + ".tmp"
        os.makedirs(os.path.dirname(final), exist_ok=True)
        pq.write_table(t, tmp)
        _atomic_replace(tmp, final)
        return pa.table({"part": pa.array([pid], pa.int32()),
                         "rows": pa.array([t.num_rows], pa.int64()),
                         "written": pa.array([True])})

    return _run_sink(ds, add_part, write_bucket, done)


def _run_sink(ds, add_part, write_bucket, done: set) -> dict:
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
    written, rows = [], 0
    for p, r, w in zip(stats.column("part").to_pylist(),
                       stats.column("rows").to_pylist(),
                       stats.column("written").to_pylist()):
        if w:
            written.append(p)
            rows += r
    return {"written": sorted(written), "skipped": sorted(done),
            "rows": rows}


def read_partitioned(root: str):
    """Read a sink written by :func:`write_partitioned` back as a
    Dataset (one file per bucket; Ray parallelizes per file).  Only
    bucket ids recorded in the manifest are read — stale buckets from
    an older wider layout can never leak in."""
    import ray.data

    meta = _read_meta(root)
    paths = [p for i in range(meta["nbuckets"])
             if os.path.exists(p := _bucket_path(root, i))]
    if not paths:
        return _empty_like(root, meta)
    return ray.data.read_parquet(paths)


# ---------------------------------------------------- range-partitioned

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

    Crash ordering: the sidecar is atomically written BEFORE the data
    file is atomically renamed, so a bucket that resume will skip
    always has a complete, valid sidecar; a crash in between leaves a
    sidecar with no data file, which the next run simply overwrites.

    Same skip-finished resume contract as the hash sink.  Returns
    {"written", "skipped", "rows", "cuts"}.
    """
    import numpy as np

    from .ops.relational import exact_quantiles_int

    os.makedirs(root, exist_ok=True)
    _write_meta(root, {"kind": "range", "key": key,
                       "nbuckets": nbuckets}, resume)
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
        _atomic_replace(tmp, cuts_path)

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
        if pid in done:  # before the sort: skipped buckets cost nothing
            return pa.table({"part": pa.array([pid], pa.int32()),
                             "rows": pa.array([0], pa.int64()),
                             "written": pa.array([False])})
        t = part.drop_columns(["_part"]).sort_by(key)
        final = _bucket_path(root, pid)
        tmp = final + ".tmp"
        os.makedirs(os.path.dirname(final), exist_ok=True)
        # sidecar FIRST (atomic), data file second (atomic)
        lo = t.column(key)[0].as_py() if t.num_rows else None
        hi = t.column(key)[-1].as_py() if t.num_rows else None
        rng = os.path.join(os.path.dirname(final), "_range")
        with open(rng + ".tmp", "w") as f:
            json.dump({"lo": lo, "hi": hi}, f)
        _atomic_replace(rng + ".tmp", rng)
        pq.write_table(t, tmp)
        _atomic_replace(tmp, final)
        return pa.table({"part": pa.array([pid], pa.int32()),
                         "rows": pa.array([t.num_rows], pa.int64()),
                         "written": pa.array([True])})

    out = _run_sink(ds, add_part, write_bucket, done)
    out["cuts"] = cuts
    return out


def read_range(root: str, key: str, lo: int, hi: int):
    """Read only the buckets whose recorded [min, max] key range
    intersects [lo, hi] — whole-bucket pruning before any parquet IO —
    then row-filter exactly.  A missing or unreadable sidecar keeps
    its bucket (pruning is an optimization, never a correctness
    gate)."""
    import ray.data

    meta = _read_meta(root)
    paths = []
    for i in range(meta["nbuckets"]):
        dat = _bucket_path(root, i)
        if not os.path.exists(dat):
            continue
        rng = os.path.join(os.path.dirname(dat), "_range")
        try:
            with open(rng) as f:
                r = json.load(f)
            if r["lo"] is not None and (r["hi"] < lo or r["lo"] > hi):
                continue
        except (OSError, ValueError, KeyError):
            pass  # unreadable sidecar → keep the bucket
        paths.append(dat)
    if not paths:
        return _empty_like(root, meta)
    ds = ray.data.read_parquet(paths)
    return ds.filter(expr=f"{key} >= {lo} and {key} <= {hi}")

"""Resumable partitioned parquet sink: atomicity, resume-skip, and
read-back equality."""

import os
import shutil

import pyarrow as pa

from imgray.parquet_sink import read_partitioned, write_partitioned


def _ds(n=5000):
    import numpy as np
    import ray.data

    rng = np.random.RandomState(21)
    return ray.data.from_arrow(pa.table({
        "k": rng.randint(0, 1000, size=n).astype("int64"),
        "v": rng.randint(0, 1 << 30, size=n).astype("int64"),
    })).repartition(8)


def test_write_read_roundtrip_and_resume(ray_session):
    root = "/tmp/imgray-test-psink"
    shutil.rmtree(root, ignore_errors=True)
    ds = _ds()
    stats = write_partitioned(ds, root, "k", nbuckets=16)
    assert stats["skipped"] == [] and stats["rows"] == 5000
    assert len(stats["written"]) == 16

    back = read_partitioned(root).take_all()
    orig = sorted((r["k"], r["v"]) for r in ds.take_all())
    assert sorted((r["k"], r["v"]) for r in back) == orig

    # resume: delete 3 buckets, mark the rest by mtime
    import glob

    files = sorted(glob.glob(root + "/part=*/data.parquet"))
    victims = files[3:6]
    for f in victims:
        os.remove(f)
    keep_mtime = {f: os.path.getmtime(f) for f in files if f not in victims}

    stats2 = write_partitioned(_ds(), root, "k", nbuckets=16)
    assert len(stats2["written"]) == 3
    assert len(stats2["skipped"]) == 13
    for f, m in keep_mtime.items():
        assert os.path.getmtime(f) == m, "skipped bucket was rewritten"

    back2 = read_partitioned(root).take_all()
    assert sorted((r["k"], r["v"]) for r in back2) == orig
    shutil.rmtree(root, ignore_errors=True)


def test_no_incomplete_buckets_after_success(ray_session):
    """Every bucket must be complete (the atomic-rename discipline):
    a leftover .tmp is only acceptable when its final file exists —
    a duplicate/retried Ray task can leave a harmless straggler, but
    a .tmp WITHOUT a final would mean a bucket escaped the rename."""
    root = "/tmp/imgray-test-psink2"
    shutil.rmtree(root, ignore_errors=True)
    stats = write_partitioned(_ds(500), root, "k", nbuckets=4)
    assert len(stats["written"]) == 4
    import glob

    for t in glob.glob(root + "/**/*.tmp", recursive=True):
        assert os.path.exists(t[:-len(".tmp")]), \
            f"incomplete bucket: {t} has no final file"
    for i in range(4):
        p = os.path.join(root, f"part={i:04d}", "data.parquet")
        assert os.path.exists(p), p
    shutil.rmtree(root, ignore_errors=True)


def test_range_partitioned_balanced_sorted_pruned(ray_session):
    import numpy as np
    import ray.data

    from imgray.parquet_sink import read_range, write_range_partitioned

    root = "/tmp/imgray-test-rsink"
    shutil.rmtree(root, ignore_errors=True)
    rng = np.random.RandomState(31)
    # heavy skew: zipf-ish values
    vals = (rng.zipf(1.3, size=8000) % 100000).astype("int64")
    ds = ray.data.from_arrow(pa.table({
        "k": vals, "v": np.arange(8000, dtype="int64")})).repartition(8)
    stats = write_range_partitioned(ds, root, "k", nbuckets=8)
    assert stats["rows"] == 8000

    # balance: equi-depth cuts keep every bucket under ~4x the mean
    import glob
    import pyarrow.parquet as pq_

    sizes = []
    for f in sorted(glob.glob(root + "/part=*/data.parquet")):
        t = pq_.read_table(f)
        sizes.append(t.num_rows)
        kcol = t.column("k").to_numpy()
        assert (np.diff(kcol) >= 0).all(), "bucket not sorted"
    assert max(sizes) <= 4 * (8000 // len(sizes))

    # pruned range read returns exactly the filtered rows
    lo, hi = 3, 17
    got = sorted((r["k"], r["v"]) for r in
                 read_range(root, "k", lo, hi).take_all())
    want = sorted((int(k), int(v)) for k, v in zip(vals,
                                                   range(8000))
                  if lo <= k <= hi)
    assert got == want

    # resume skips all buckets
    stats2 = write_range_partitioned(ds, root, "k", nbuckets=8)
    assert stats2["written"] == [] and len(stats2["skipped"]) >= 1
    shutil.rmtree(root, ignore_errors=True)


def test_meta_guards_layout_changes(ray_session):
    from imgray.parquet_sink import read_partitioned, write_partitioned

    root = "/tmp/imgray-test-psink-meta"
    shutil.rmtree(root, ignore_errors=True)
    write_partitioned(_ds(500), root, "k", nbuckets=16)
    # resuming with a different layout fails loudly
    try:
        write_partitioned(_ds(500), root, "k", nbuckets=4, resume=True)
        assert False, "expected ValueError"
    except ValueError:
        pass
    # explicit fresh write with fewer buckets drops the stale ones
    write_partitioned(_ds(500), root, "k", nbuckets=4, resume=False)
    back = read_partitioned(root).take_all()
    assert len(back) == 500  # no stale-bucket double counting
    import glob

    assert len(glob.glob(root + "/part=*")) == 4
    shutil.rmtree(root, ignore_errors=True)

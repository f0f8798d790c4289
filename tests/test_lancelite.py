import os

import pyarrow as pa
import pytest

from imgray.lancelite import LanceLite


SCHEMA = pa.schema([("k", pa.string()), ("v", pa.int64())])


def _t(rows):
    return pa.table({"k": [r[0] for r in rows], "v": [r[1] for r in rows]}, schema=SCHEMA)


def test_create_append_read(tmp_path):
    ds = LanceLite.create(str(tmp_path / "d"), SCHEMA)
    assert ds.latest_version() == 0
    assert ds.to_table().num_rows == 0
    v1 = ds.append(_t([("a", 1), ("b", 2)]), "r1-p0")
    v2 = ds.append(_t([("c", 3)]), "r2-p0", meta={"round": 2})
    assert (v1, v2) == (1, 2)
    assert ds.count_rows() == 3
    assert ds.to_table().column("k").to_pylist() == ["a", "b", "c"]
    # version travel
    assert ds.to_table(version=1).num_rows == 2
    assert ds.to_table(version=0).num_rows == 0
    assert ds.manifest(2)["meta"]["round"] == 2


def test_staged_not_visible_until_commit(tmp_path):
    ds = LanceLite.create(str(tmp_path / "d"), SCHEMA)
    frag = ds.stage_fragment(_t([("x", 9)]), "r1-p1")
    assert ds.count_rows() == 0  # orphan until commit
    ds.commit([frag], {"round": 1})
    assert ds.count_rows() == 1


def test_idempotent_restage(tmp_path):
    ds = LanceLite.create(str(tmp_path / "d"), SCHEMA)
    ds.stage_fragment(_t([("old", 1)]), "r1-p0")
    frag = ds.stage_fragment(_t([("new", 2)]), "r1-p0")  # re-executed task
    ds.commit([frag])
    assert ds.to_table().column("k").to_pylist() == ["new"]
    # only one physical fragment for the key
    files = [f for f in os.listdir(ds.data_dir) if f.endswith(".parquet")]
    assert files == ["frag-r1-p0.parquet"]


def test_schema_persists(tmp_path):
    ds = LanceLite.create(str(tmp_path / "d"), SCHEMA)
    again = LanceLite(str(tmp_path / "d"))
    assert again.schema().equals(SCHEMA)


def test_open_missing(tmp_path):
    ds = LanceLite(str(tmp_path / "nope"))
    assert not ds.exists()
    with pytest.raises(FileNotFoundError):
        ds.manifest()


def test_write_partitioned(tmp_path, ray_session):
    import os
    import ray.data
    from imgray.lancelite import write_partitioned

    rows = [{"k": f"g{i % 3}", "v": i} for i in range(30)]
    ds = ray.data.from_items(rows)
    out = str(tmp_path / "exp")
    dirs = write_partitioned(ds, out, key="k")
    assert len(dirs) == 3
    back = ray.data.read_parquet(out).take_all()
    assert sorted(r["v"] for r in back) == list(range(30))
    # resumable: second run skips existing files (no duplicates)
    write_partitioned(ray.data.from_items(rows), out, key="k")
    back2 = ray.data.read_parquet(out).take_all()
    assert len(back2) == 30

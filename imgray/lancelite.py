"""Lance-shaped versioned columnar dataset on Parquet (SURVEY.md §7 step 2).

The north rule targets Lance tables, but ``lance``/``pylance`` is not
installed in this sandbox, so this module implements the Lance *storage
contract* — immutable data fragments + a linear chain of versioned
manifests with atomic commits — on pyarrow Parquet:

    <root>/
      data/frag-*.parquet          immutable fragments
      _versions/<N>.manifest.json  manifest: fragment list + metadata
      _latest                      pointer file (atomic rename commit)

Properties needed by the engine (and by real Lance, so a pylance-backed
writer can drop in behind the same interface):
  * append = write new fragments + commit a new manifest referencing
    old + new → readers never see partial writes (resumable output);
  * version travel (read any committed version);
  * idempotent re-execution: a re-run task re-writes its fragment file
    keyed by (round, partition); uncommitted orphans are ignored;
  * arbitrary JSON metadata per version (the crawler stores its frontier
    / seen-set checkpoint pointers here → single atomic commit point per
    crawl round).
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.compute as _pc
import pyarrow.parquet as pq


class LanceLite:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.ver_dir = os.path.join(root, "_versions")

    # ------------------------------------------------------------ setup
    @classmethod
    def create(cls, root: str, schema: pa.Schema) -> "LanceLite":
        ds = cls(root)
        os.makedirs(ds.data_dir, exist_ok=True)
        os.makedirs(ds.ver_dir, exist_ok=True)
        if ds.latest_version() is None:
            ds._write_manifest(0, [], {"created": True},
                               schema_json=schema.serialize().to_pybytes().hex())
        return ds

    def exists(self) -> bool:
        return self.latest_version() is not None

    # -------------------------------------------------------- manifests
    def latest_version(self) -> int | None:
        p = os.path.join(self.root, "_latest")
        try:
            with open(p) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return None

    def manifest(self, version: int | None = None) -> dict:
        if version is None:
            version = self.latest_version()
            if version is None:
                raise FileNotFoundError(f"no committed version in {self.root}")
        with open(os.path.join(self.ver_dir, f"{version}.manifest.json")) as f:
            return json.load(f)

    def _write_manifest(self, version: int, fragments: list[str], meta: dict,
                        schema_json: str | None = None) -> None:
        if schema_json is None:
            schema_json = self.manifest().get("schema")
        m = {"version": version, "fragments": fragments, "meta": meta,
             "schema": schema_json}
        tmp = os.path.join(self.ver_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, os.path.join(self.ver_dir, f"{version}.manifest.json"))
        tmp2 = os.path.join(self.root, f".latest-{uuid.uuid4().hex}")
        with open(tmp2, "w") as f:
            f.write(str(version))
        os.replace(tmp2, os.path.join(self.root, "_latest"))  # atomic commit

    def schema(self) -> pa.Schema:
        return pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(self.manifest()["schema"])))

    # ------------------------------------------------------------ write
    def stage_fragment(self, table: pa.Table, name_hint: str = "f") -> str:
        """Write an (as yet uncommitted) immutable fragment; returns its
        relative path.  Deterministic name_hint (e.g. 'r3-p07') makes task
        re-execution overwrite its own fragment → idempotent."""
        rel = os.path.join("data", f"frag-{name_hint}.parquet")
        tmp = os.path.join(self.data_dir, f".tmp-{uuid.uuid4().hex}")
        # binary payload columns usually hold already-compressed image
        # bytes — recompressing burns CPU for ~0 ratio — EXCEPT raw
        # formats (bmp): if the fragment contains any, keep ZSTD on the
        # binary columns so raw payloads don't inflate on disk (ADVICE
        # r2); zstd the metadata columns always
        raw_payload = ("fmt" in table.column_names and bool(
            _pc.any(_pc.is_in(table.column("fmt"),
                              value_set=pa.array(["bmp"]))).as_py()))
        binary_codec = "ZSTD" if raw_payload else "NONE"
        comp = {f.name: (binary_codec if pa.types.is_binary(f.type)
                         or pa.types.is_large_binary(f.type) else "ZSTD")
                for f in table.schema}
        pq.write_table(table, tmp, compression=comp)
        os.replace(tmp, os.path.join(self.root, rel))
        return rel

    def commit(self, new_fragments: list[str], meta: dict | None = None) -> int:
        cur = self.latest_version()
        if cur is None:
            raise FileNotFoundError("create() the dataset first")
        man = self.manifest(cur)
        frags = man["fragments"] + list(new_fragments)
        v = cur + 1
        self._write_manifest(v, frags, meta or {})
        return v

    def append(self, table: pa.Table, name_hint: str = "a",
               meta: dict | None = None) -> int:
        return self.commit([self.stage_fragment(table, name_hint)], meta)

    # ------------------------------------------------------------- read
    def fragment_paths(self, version: int | None = None) -> list[str]:
        return [os.path.join(self.root, rel)
                for rel in self.manifest(version)["fragments"]]

    def to_table(self, version: int | None = None) -> pa.Table:
        paths = self.fragment_paths(version)
        schema = self.schema()
        if not paths:
            return schema.empty_table()
        # project to the manifest schema: fragments may carry extra
        # provenance columns (e.g. the crawler's per-row seq)
        return pa.concat_tables(
            [pq.read_table(p, columns=list(schema.names)) for p in paths])

    def to_ray(self, version: int | None = None):
        """ray.data.Dataset over the committed fragments (streaming read)."""
        import ray.data

        paths = self.fragment_paths(version)
        if not paths:
            return ray.data.from_arrow(self.schema().empty_table())
        return ray.data.read_parquet(paths, columns=list(self.schema().names))

    def count_rows(self, version: int | None = None) -> int:
        return sum(pq.read_metadata(p).num_rows for p in self.fragment_paths(version))


def write_partitioned(ds, out_dir: str, key: str,
                      schema: "pa.Schema | None" = None) -> list[str]:
    """Resumable partitioned-parquet export: one directory per key value
    (hive-style ``key=value/``), written from workers, atomic per file.
    A re-run skips partitions whose files already exist — the
    partitioned-output pattern the driver brief asks for on sinks.

    Returns the list of partition directories written (or skipped).
    """
    import hashlib as _hashlib

    import pyarrow.compute as _pc
    import ray as _ray

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        done = []
        if batch.num_rows:
            keys = batch.column(key)
            for val in _pc.unique(keys).to_pylist():
                part = batch.filter(_pc.equal(keys, val))
                safe = str(val).replace("/", "_")[:120]
                pdir = os.path.join(out_dir, f"{key}={safe}")
                os.makedirs(pdir, exist_ok=True)
                sink = pa.BufferOutputStream()
                with pa.ipc.new_stream(sink, part.schema) as w:
                    w.write_table(part)
                name = _hashlib.blake2b(
                    sink.getvalue().to_pybytes(), digest_size=8).hexdigest()
                dest = os.path.join(pdir, f"part-{name}.parquet")
                if not os.path.exists(dest):  # resumable: skip finished
                    tmp = dest + ".tmp"
                    pq.write_table(part, tmp)
                    os.replace(tmp, dest)
                done.append(pdir)
        return pa.table({"dir": pa.array(sorted(set(done)),
                                         type=pa.string())})

    out = ds.map_batches(write_block, batch_format="pyarrow")
    dirs = sorted({r["dir"] for r in out.take_all()})
    return dirs

"""Optional real-library adapters behind the repo's existing seams
(VERDICT r4 #5).  This container ships neither ``pylance`` nor
``Pillow``; these adapters activate the moment the packages appear —
callers probe ``*_available()`` and fall back to the from-scratch
implementations otherwise, and the skip-if-absent tests
(tests/test_adapters.py) pin the contracts so the adapters are
exercised automatically on an equipped host.

  * :func:`pil_decode` — Pillow decode for formats the from-scratch
    codecs deliberately exclude (lossy-VP8 WebP, AVIF — see
    webpcodec.py's rationale).  ``codecs.decode_image`` dispatches to
    it automatically when native decode is unavailable.
  * :class:`RealLanceSink` — a ``pylance``-backed drop-in for
    :class:`imgray.lancelite.LanceLite`, same two-phase
    stage-fragment → atomic-commit surface the crawler drives.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa


# --------------------------------------------------------------- Pillow

def pillow_available() -> bool:
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def pil_decode(data: bytes) -> np.ndarray:
    """bytes → HxWx3 uint8 RGB via Pillow — the adapter path for
    formats the native codecs don't cover.  Raises ImportError when
    Pillow is absent (callers probe :func:`pillow_available`)."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


# --------------------------------------------------------------- pylance

def lance_available() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


class RealLanceSink:
    """``pylance``-backed sink with the LanceLite surface the crawler
    uses (create / stage_fragment / commit / append / to_table /
    to_ray / count_rows / latest_version / manifest).

    Mapping onto the public Lance API:

      * ``stage_fragment`` → ``lance.fragment.LanceFragment.create``
        (writes data files without committing — Lance's own two-phase
        primitive, matching LanceLite's uncommitted-fragment stage);
      * ``commit`` → ``lance.LanceDataset.commit`` with an
        ``Append`` operation at the current read version (atomic,
        readers never see partial writes);
      * versions → Lance dataset versions (time travel built in);
      * per-version JSON ``meta`` rides in a ``_meta/<v>.json``
        sidecar — Lance commits don't carry arbitrary metadata.
    """

    def __init__(self, root: str):
        if not lance_available():
            raise ImportError("pylance is not installed — use "
                              "imgray.lancelite.LanceLite")
        self.root = root
        self._staged: dict[str, object] = {}  # handle → FragmentMetadata

    # ---------------------------------------------------------- setup
    @classmethod
    def create(cls, root: str, schema: pa.Schema) -> "RealLanceSink":
        import lance

        ds = cls(root)
        if not ds.exists():
            lance.write_dataset(schema.empty_table(), root, mode="create")
            ds._write_meta(ds.latest_version(), {"created": True})
        return ds

    def exists(self) -> bool:
        try:
            self._dataset()
            return True
        except Exception:
            return False

    def _dataset(self, version: int | None = None):
        import lance

        return lance.dataset(self.root, version=version)

    # ------------------------------------------------------- manifests
    def latest_version(self) -> int | None:
        try:
            return int(self._dataset().version)
        except Exception:
            return None

    def _write_meta(self, version: int | None, meta: dict) -> None:
        mdir = os.path.join(self.root, "_meta")
        os.makedirs(mdir, exist_ok=True)
        tmp = os.path.join(mdir, f".tmp-{version}.json")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(mdir, f"{version}.json"))

    def manifest(self, version: int | None = None) -> dict:
        if version is None:
            version = self.latest_version()
        p = os.path.join(self.root, "_meta", f"{version}.json")
        meta = {}
        if os.path.exists(p):
            with open(p) as f:
                meta = json.load(f)
        return {"version": version, "meta": meta,
                "fragments": [str(fr.fragment_id)
                              for fr in self._dataset(version).get_fragments()]}

    def schema(self) -> pa.Schema:
        return self._dataset().schema

    # ----------------------------------------------------------- write
    def stage_fragment(self, table: pa.Table, name_hint: str = "f") -> str:
        """Write data files WITHOUT committing; returns an opaque
        handle for :meth:`commit`.  Idempotent re-execution: re-staging
        the same ``name_hint`` replaces the staged (uncommitted) entry,
        and Lance garbage-collects never-committed files."""
        from lance.fragment import LanceFragment

        frag = LanceFragment.create(self.root, table)
        self._staged[name_hint] = frag
        return name_hint

    def commit(self, new_fragments: list[str],
               meta: dict | None = None) -> int:
        import lance

        frags = [self._staged.pop(h) for h in new_fragments]
        op = lance.LanceOperation.Append(frags)
        read_version = self.latest_version()
        ds = lance.LanceDataset.commit(self.root, op,
                                       read_version=read_version)
        v = int(ds.version)
        self._write_meta(v, meta or {})
        return v

    def append(self, table: pa.Table, name_hint: str = "a",
               meta: dict | None = None) -> int:
        return self.commit([self.stage_fragment(table, name_hint)], meta)

    # ------------------------------------------------------------ read
    def to_table(self, version: int | None = None) -> pa.Table:
        return self._dataset(version).to_table()

    def to_ray(self, version: int | None = None):
        import ray.data

        try:
            return ray.data.read_lance(self.root, version=version)
        except Exception:
            return ray.data.from_arrow(self.to_table(version))

    def count_rows(self, version: int | None = None) -> int:
        return int(self._dataset(version).count_rows())


def open_sink(root: str, schema: pa.Schema, prefer_lance: bool = True):
    """Factory for the crawler's sink seam: the real Lance writer when
    pylance is installed, the Lance-shaped parquet fallback otherwise."""
    if prefer_lance and lance_available():
        return RealLanceSink.create(root, schema)
    from .lancelite import LanceLite

    return LanceLite.create(root, schema)

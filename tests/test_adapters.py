"""Adapter-seam tests (VERDICT r4 #5): the optional-library adapters
(imgray/adapters.py) must activate the moment pylance / Pillow appear
in the environment and must be reachable through the existing seams
(codecs.decode_image dispatch, the sink factory) WITHOUT them.

Two layers:
  * seam tests run ALWAYS — they fake the adapter to prove the
    dispatch really routes through it, and pin the env-blocked error
    when it is absent;
  * real-library tests are skipif-absent — they run (and gate CI) on
    any host that has the packages.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from imgray import adapters
from imgray import codecs as C


def _lossy_webp() -> bytes:
    return (b"RIFF" + struct.pack("<I", 20) + b"WEBP"
            + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)


def _avif() -> bytes:
    return b"\x00\x00\x00 ftypavif" + b"\x00" * 32


def test_env_blocked_formats_raise_not_implemented():
    if adapters.pillow_available():  # pragma: no cover - equipped host
        pytest.skip("Pillow present — the gap does not exist here")
    with pytest.raises(NotImplementedError):
        C.decode_image(_lossy_webp())
    with pytest.raises(NotImplementedError):
        C.decode_image(_avif())


def test_decode_dispatch_routes_through_adapter(monkeypatch):
    """Fake Pillow: decode_image for lossy WebP / AVIF must route
    through adapters.pil_decode — proving a real install activates
    with no further code change."""
    fake_img = np.full((3, 5, 3), 7, dtype=np.uint8)
    calls = []

    monkeypatch.setattr(adapters, "pillow_available", lambda: True)
    monkeypatch.setattr(adapters, "pil_decode",
                        lambda data: calls.append(len(data)) or fake_img)
    assert np.array_equal(C.decode_image(_lossy_webp()), fake_img)
    assert np.array_equal(C.decode_image(_avif()), fake_img)
    assert len(calls) == 2


def test_native_formats_never_touch_adapter(monkeypatch):
    def boom(data):  # the adapter must not be consulted
        raise AssertionError("adapter called for a native format")

    monkeypatch.setattr(adapters, "pillow_available", lambda: True)
    monkeypatch.setattr(adapters, "pil_decode", boom)
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(C.decode_image(C.png_encode(img)), img)


def test_open_sink_falls_back_without_pylance(tmp_path):
    from imgray.lancelite import LanceLite

    schema = pa.schema([("image_id", pa.string()), ("bytes", pa.binary())])
    sink = adapters.open_sink(str(tmp_path / "ds"), schema)
    if adapters.lance_available():  # pragma: no cover - equipped host
        assert isinstance(sink, adapters.RealLanceSink)
    else:
        assert isinstance(sink, LanceLite)
    # either backend serves the same surface
    v = sink.append(pa.table({"image_id": ["a"], "bytes": [b"x"]}),
                    name_hint="t0", meta={"round": 1})
    assert v >= 1
    assert sink.count_rows() == 1
    assert sink.to_table().column("image_id").to_pylist() == ["a"]


@pytest.mark.skipif(not adapters.pillow_available(),
                    reason="Pillow not installed in this container")
def test_pillow_real_decode_roundtrip():  # pragma: no cover
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    out = adapters.pil_decode(C.png_encode(img))
    assert np.array_equal(out, img)


@pytest.mark.skipif(not adapters.lance_available(),
                    reason="pylance not installed in this container")
def test_real_lance_sink_two_phase_commit(tmp_path):  # pragma: no cover
    schema = pa.schema([("k", pa.int64())])
    sink = adapters.RealLanceSink.create(str(tmp_path / "lds"), schema)
    h = sink.stage_fragment(pa.table({"k": pa.array([1, 2], pa.int64())}),
                            "r1-p0")
    v0 = sink.latest_version()
    v1 = sink.commit([h], meta={"round": 1})
    assert v1 > v0
    assert sink.count_rows() == 2
    assert sink.manifest()["meta"] == {"round": 1}
    assert sink.count_rows(version=v0) == 0  # time travel

"""Strict min-seq image-name dedup inside the streaming pipeline
(VERDICT r2 #1): the fused image sink claims each image_id with its seq
on the seen shards (first claim of a round wins provisionally, a
smaller-seq claim supersedes it), and contested fragments are repaired
at round finalize — reproducing the reference's sequential --no-clobber
first-wins (ref src/main.rs:16) without a groupby(image_id) byte
shuffle or a driver materialize.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from imgray import codecs as C
from imgray import schemas as S
from imgray.crawler import Crawler, CrawlerConfig, image_sink_task
from imgray.refsim import RefSim
from imgray.state.cuckoo import ShardedSeen
from imgray.synthweb import Response


def test_claim_min_semantics(ray_session):
    seen = ShardedSeen(2)
    # first claim of a round wins provisionally
    assert seen.claim_min(["w:a"], ["0005"], 1) == [True]
    # smaller seq supersedes (and marks contested)
    assert seen.claim_min(["w:a"], ["0003"], 1) == [True]
    # larger seq loses
    assert seen.claim_min(["w:a"], ["0004"], 1) == [False]
    # exact winning (key, seq) re-claim (task retry) still wins
    assert seen.claim_min(["w:a"], ["0003"], 1) == [True]
    # later round always loses to a committed earlier round
    assert seen.claim_min(["w:a"], ["0001"], 2) == [False]
    # independent key unaffected; batched call mixes verdicts
    assert seen.claim_min(["w:b", "w:a"], ["0009", "0001"], 2) == \
        [True, False]
    assert seen.drain_contested() == {"w:a": "0003"}
    assert seen.drain_contested() == {}  # drained


def test_claim_min_respects_restored_keys(ray_session):
    """Resume path: a 'w:' key restored from a checkpoint must make all
    later claims lose (first-round-wins across driver restarts)."""
    seen = ShardedSeen(2)
    seen.restore(["w:x"])
    assert seen.claim_min(["w:x"], ["0000"], 5) == [False]


IMG_ROWS = pa.schema([
    ("row_kind", pa.string()), ("url", pa.string()),
    ("host", pa.string()), ("status", pa.int32()),
    ("seq", pa.string()), ("depth", pa.int32()),
    ("kind", pa.string()), ("album", pa.string()),
    ("caption", pa.string()),
])


def _img_row(url: str, seq: str, album: str = "Alb") -> dict:
    return {"row_kind": "img", "url": url, "host": "h.example",
            "status": 200, "seq": seq, "depth": 0, "kind": "html",
            "album": album, "caption": ""}


def _png(val: int) -> bytes:
    return C.png_encode(np.full((4, 4, 3), val, dtype=np.uint8))


def _fetcher_factory():
    # colliding image ids: different URLs, same derived name Alb/x.png
    web = {
        "https://h.example/a/x.png": _png(10),
        "https://h.example/b/x.png": _png(200),
    }

    def factory():
        def get(url):
            body = web.get(url)
            if body is None:
                return Response(status=404, body=b"", content_type="")
            return Response(status=200, body=body,
                            content_type="image/png")
        return get

    return factory


def test_contested_repair_min_seq(ray_session, tmp_path):
    """Adversarial claim order: the LARGER seq's task lands first and
    writes its fragment; the smaller seq supersedes from a later task.
    Finalize repair must drop the provisional winner's row, leaving
    exactly the min-seq image bytes."""
    factory = _fetcher_factory()
    cfg = CrawlerConfig(root=str(tmp_path / "c"), fetcher_factory=factory)
    cr = Crawler(cfg)

    late = S.table_from_rows(
        IMG_ROWS, [_img_row("https://h.example/b/x.png", "00000002.i0")])
    early = S.table_from_rows(
        IMG_ROWS, [_img_row("https://h.example/a/x.png", "00000001.i0")])
    kw = dict(fetcher_factory=factory, client_key="t", store_data_uris=True,
              seen=cr.seen, data_dir=cr.sink.data_dir, rnd=0, strict=True)
    frag_rows = image_sink_task(late, **kw).to_pylist()
    frag_rows += image_sink_task(early, **kw).to_pylist()
    assert len(frag_rows) == 2  # both provisionally written

    contested = cr.seen.drain_contested()
    assert contested == {"w:Alb/x.png": "00000001.i0"}
    repaired = cr._repair_contested(frag_rows, contested)
    # late fragment became empty and was deleted; early survives
    assert len(repaired) == 1
    cr.sink.commit([r["path"] for r in repaired], meta={"round": 1})
    t = cr.sink.to_table()
    assert t.num_rows == 1
    assert t.column("bytes")[0].as_py() == _png(10)  # min-seq winner
    assert "seq" not in t.column_names  # provenance column projected out


def test_contested_repair_partial_fragment(ray_session, tmp_path):
    """A losing row inside a multi-row fragment is dropped while its
    siblings survive the rewrite."""
    factory = _fetcher_factory()
    cfg = CrawlerConfig(root=str(tmp_path / "c"), fetcher_factory=factory)
    cr = Crawler(cfg)
    kw = dict(fetcher_factory=factory, client_key="t", store_data_uris=True,
              seen=cr.seen, data_dir=cr.sink.data_dir, rnd=0, strict=True)
    # one batch: the colliding loser (larger seq) + an unrelated keeper
    late = S.table_from_rows(IMG_ROWS, [
        _img_row("https://h.example/b/x.png", "00000002.i0"),
        _img_row("https://h.example/a/x.png", "00000002.i1", album="Keep"),
    ])
    early = S.table_from_rows(
        IMG_ROWS, [_img_row("https://h.example/a/x.png", "00000001.i0")])
    frag_rows = image_sink_task(late, **kw).to_pylist()
    frag_rows += image_sink_task(early, **kw).to_pylist()
    repaired = cr._repair_contested(frag_rows, cr.seen.drain_contested())
    assert len(repaired) == 2
    assert sum(r["rows"] for r in repaired) == 2
    cr.sink.commit([r["path"] for r in repaired], meta={"round": 1})
    got = {r["image_id"]: r["bytes"] for r in cr.sink.to_table().to_pylist()}
    assert got == {"Alb/x.png": _png(10), "Keep/x.png": _png(10)}


def _collision_web():
    """Two seed pages in the SAME album, each pulling a different URL
    that derives the identical image_id Alb/x.png, with different
    pixels — the reference's sequential first-wins keeps page 1's."""
    page1 = ("<html><head><title>Alb</title></head>"
             "<body><img src='https://h.example/a/x.png'></body></html>")
    page2 = ("<html><head><title>Alb</title></head>"
             "<body><img src='https://h.example/b/x.png'></body></html>")
    web = {
        "https://h.example/p1": Response(200, page1.encode(), "text/html"),
        "https://h.example/p2": Response(200, page2.encode(), "text/html"),
        "https://h.example/a/x.png": Response(200, _png(10), "image/png"),
        "https://h.example/b/x.png": Response(200, _png(200), "image/png"),
    }

    class Web:
        def get(self, url):
            return web.get(url, Response(404, b"", ""))

    return Web()


@pytest.mark.parametrize("inline", [True, False])
def test_strict_dedup_e2e_collision(ray_session, tmp_path, inline):
    """Full-engine parity on a name-colliding web, through both the
    driver-inline tiny-round path and the streaming execution path."""
    web = _collision_web()
    sd = ["https://h.example/p1", "https://h.example/p2"]
    ref = RefSim(web, []).crawl(sd)
    assert list(ref.images) == ["Alb/x.png"]
    assert ref.images["Alb/x.png"]["bytes"] == _png(10)

    cfg = CrawlerConfig(
        root=str(tmp_path / ("i" if inline else "s")),
        fetcher_factory=lambda: web.get, site_cfg=[],
        inline_round_threshold=8 if inline else 0)
    cr = Crawler(cfg)
    cr.seed(sd)
    cr.run()
    assert cr.visit_order() == ref.visit_order
    got = {r["image_id"]: r["bytes"] for r in cr.images_table().to_pylist()}
    assert got == {"Alb/x.png": _png(10)}
    # sink fragments carry provenance seq; committed reads project it out
    frag = os.path.join(cr.sink.root, cr.sink.manifest()["fragments"][0])
    assert "seq" in pq.read_schema(frag).names

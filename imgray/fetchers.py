"""Real HTTP fetch client behind the crawler's ``fetcher_factory`` seam.

Replicates the reference's curl front door (reference src/main.rs:9-20,
83-111, 540-645) with stdlib urllib — the sandbox has no curl and no
network, so the loopback test suite (tests/test_http_fetcher.py) serves
the synthetic-web fixtures over 127.0.0.1 and runs the same oracle
parity checks against this client:

  curl flag            here
  ------------------   -------------------------------------------
  --compressed         Accept-Encoding: gzip, deflate + transparent
                       decompression of the response body
  -L                   redirects followed (urllib default handler)
  -f                   HTTP errors return status with an EMPTY body
                       (the reference aborts processing on failure)
  -k                   TLS verification disabled (unverified context)
  -A "Mozilla/5.0 …"   User-Agent spoof
  -e https://{host}    Referer derived from the target's host
  -sS                  no progress output (n/a)
  -C-                  Range-header continuation of a transfer that
                       died mid-body (VERDICT r4 #7): when a read is
                       cut short of the announced Content-Length, the
                       client re-requests ``Range: bytes=<have>-`` and
                       appends the 206 tail (up to MAX_RESUMES times;
                       a server that ignores Range and replies 200
                       restarts the body).  ``Response.resumes``
                       counts the continuations per fetch and
                       ``HttpFetcher.resume_total`` accumulates them
                       per worker for stats/lineage.
  --no-clobber         a SINK property here: the LanceLite
                       written-gate is the no-clobber equivalent, and
                       round checkpoints are the resume
  --parallel / -Z      parallelism comes from Ray map_batches tasks

``host_map`` rewrites a logical host to a concrete ``scheme://netloc``
(loopback tests, mirrors, split-horizon fetching); the crawl's URL
space — seen set, frontier, image ids — always stays on the ORIGINAL
urls, only the socket connection is rewritten.
"""

from __future__ import annotations

import gzip
import http.client
import io
import ssl
import urllib.error
import urllib.request
import zlib

from .synthweb import Response

# reference src/main.rs:13 spoofs a browser-family UA
USER_AGENT = "Mozilla/5.0 Firefox/Edge/Chrome"


def _decompress(body: bytes, encoding: str) -> bytes:
    enc = (encoding or "").lower().strip()
    if enc == "gzip":
        return gzip.GzipFile(fileobj=io.BytesIO(body)).read()
    if enc == "deflate":
        try:
            return zlib.decompress(body)
        except zlib.error:
            return zlib.decompress(body, -zlib.MAX_WBITS)  # raw deflate
    return body


class HttpFetcher:
    """url → Response over real HTTP(S); one instance per worker
    process / actor (the stateful-stage pattern: the opener, TLS
    context and header set are built once in __init__)."""

    MAX_RESUMES = 3  # Range continuations per URL (curl -C- analog)

    def __init__(self, timeout: float = 15.0,
                 user_agent: str = USER_AGENT,
                 send_referer: bool = True,
                 host_map: dict[str, str] | None = None):
        self.timeout = timeout
        self.user_agent = user_agent
        self.send_referer = send_referer
        self.host_map = host_map or {}
        self.resume_total = 0  # cumulative continuations this worker
        ctx = ssl.create_default_context()
        ctx.check_hostname = False  # curl -k
        ctx.verify_mode = ssl.CERT_NONE
        self.opener = urllib.request.build_opener(
            urllib.request.HTTPSHandler(context=ctx))

    def _rewrite(self, url: str) -> str:
        if not self.host_map:
            return url
        rest = url.split("://", 1)[-1]
        slash = rest.find("/")
        host, path = (rest, "/") if slash < 0 else (rest[:slash],
                                                    rest[slash:])
        base = self.host_map.get(host)
        return f"{base}/{host}{path}" if base else url

    def __call__(self, url: str) -> Response:
        rest = url.split("://", 1)[-1]
        host = rest[:slash] if (slash := rest.find("/")) >= 0 else rest
        base_headers = {
            "User-Agent": self.user_agent,
            "Accept-Encoding": "gzip, deflate",  # curl --compressed
        }
        if self.send_referer and host:
            base_headers["Referer"] = f"https://{host}"  # curl -e
        target = self._rewrite(url)
        buf = b""
        resumes = 0
        status = 0
        ctype = ""
        enc = ""
        expected: int | None = None
        while True:
            hdrs = dict(base_headers)
            if buf:
                hdrs["Range"] = f"bytes={len(buf)}-"  # curl -C-
            req = urllib.request.Request(target, headers=hdrs)
            truncated = False
            try:
                with self.opener.open(req, timeout=self.timeout) as resp:
                    if not buf or resp.status != 206:
                        # fresh body — also the server-ignored-Range
                        # path (a 200 reply to a Range request
                        # restarts the body from byte 0)
                        buf = b""
                        status = resp.status
                        ctype = (resp.headers.get("Content-Type") or "") \
                            .split(";")[0].strip()
                        enc = resp.headers.get("Content-Encoding", "")
                        cl = resp.headers.get("Content-Length")
                        expected = int(cl) if cl and cl.isdigit() else None
                    try:
                        buf += resp.read()
                    except http.client.IncompleteRead as e:
                        # connection died mid-body with Content-Length
                        # known — the resumable case
                        buf += e.partial
                        truncated = True
            except urllib.error.HTTPError as e:
                # curl -f: fail on server errors, never hand back error
                # pages (incl. 416 on a stale Range)
                return Response(status=e.code, body=b"", content_type="")
            except (urllib.error.URLError, OSError, ValueError):
                if not buf:
                    return Response(status=0, body=b"", content_type="")
                truncated = True  # died mid-body: try to resume
            if not truncated and (expected is None or len(buf) >= expected):
                return Response(status=status, body=_decompress(buf, enc),
                                content_type=ctype, resumes=resumes)
            if expected is None or resumes >= self.MAX_RESUMES:
                # can't know where we are, or out of attempts — a
                # truncated body must never reach the pipeline
                return Response(status=0, body=b"", content_type="",
                                resumes=resumes)
            resumes += 1
            self.resume_total += 1

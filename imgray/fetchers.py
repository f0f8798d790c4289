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
  -C- / --no-clobber   resume/no-overwrite are SINK properties here:
                       the LanceLite written-gate is the no-clobber
                       equivalent, and round checkpoints are the resume
  --parallel / -Z      parallelism comes from Ray map_batches tasks

``host_map`` rewrites a logical host to a concrete ``scheme://netloc``
(loopback tests, mirrors, split-horizon fetching); the crawl's URL
space — seen set, frontier, image ids — always stays on the ORIGINAL
urls, only the socket connection is rewritten.
"""

from __future__ import annotations

import gzip
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

    def __init__(self, timeout: float = 15.0,
                 user_agent: str = USER_AGENT,
                 send_referer: bool = True,
                 host_map: dict[str, str] | None = None):
        self.timeout = timeout
        self.user_agent = user_agent
        self.send_referer = send_referer
        self.host_map = host_map or {}
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
        headers = {
            "User-Agent": self.user_agent,
            "Accept-Encoding": "gzip, deflate",  # curl --compressed
        }
        if self.send_referer and host:
            headers["Referer"] = f"https://{host}"  # curl -e
        req = urllib.request.Request(self._rewrite(url), headers=headers)
        try:
            with self.opener.open(req, timeout=self.timeout) as resp:
                body = _decompress(resp.read(),
                                   resp.headers.get("Content-Encoding", ""))
                ctype = (resp.headers.get("Content-Type") or "") \
                    .split(";")[0].strip()
                return Response(status=resp.status, body=body,
                                content_type=ctype)
        except urllib.error.HTTPError as e:
            # curl -f: fail on server errors, never hand back error pages
            return Response(status=e.code, body=b"", content_type="")
        except (urllib.error.URLError, OSError, ValueError):
            return Response(status=0, body=b"", content_type="")

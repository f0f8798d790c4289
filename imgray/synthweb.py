"""Deterministic synthetic web (SURVEY.md §7 step 3, FIXTURES.md §A6).

No network in this sandbox, so the "crawl" runs against a generated web:
``SynthWeb.get(url)`` is a **pure function of the URL and the seed** —
fetch actors instantiate it once in ``__init__`` and never ship page
stores around.  The site corpus exercises every extraction branch of the
reference (citations into /root/reference/src/main.rs):

  host kind   | branch exercised
  ------------|-------------------------------------------------------
  plain*      | unconfigured site: default ``img`` selector + raw-CSS
              | scan both run (:117-121, :163); ``?url=`` redirect
              | cleanup (:985-1003); data-URIs (:277-295)
  lazy*       | config site, listings→albums (:369-471), lazy
              | ``data-src`` attrs (:265-268), single ``a.next``
              | pagination (:811-813), within-album duplicate URLs
  style*      | ``[style]`` attr with url() (:272-287), span.current
              | sibling-walk pagination (:796-808), album ancestor-href
              | walk (:374-396)
  json*       | ``json: key|name`` and ``json: array|name`` script
              | extraction (:130-161), metaKeywords title (:180-194),
              | ``<script>`` numeric pagination (:476-493)
  two*        | two-level ``left | right`` selector + captions
              | (:325-364), multi-element next with "Next" text or
              | position-after-current fallback (:814-882)
  hot         | skew fixture: one host with ~10× the albums

Everything is derived with ``blake2b(seed, url)`` — same URL, same
bytes, forever.
"""

from __future__ import annotations

import base64
import hashlib
from dataclasses import dataclass, field

import numpy as np

from . import codecs as C

CDN = "cdn.example"


def _h(seed: int, *parts: str) -> int:
    b = hashlib.blake2b(("|".join(parts)).encode(), digest_size=8,
                        key=str(seed).encode()).digest()
    return int.from_bytes(b, "big")


# ------------------------------------------------------------------ spec

@dataclass
class HostSpec:
    name: str
    kind: str  # plain | css | lazy | style | json_key | json_array | two
    listings: int = 2
    albums: int = 2
    pages: int = 2
    imgs: int = 4


@dataclass
class WebSpec:
    seed: int = 42
    hosts: list[HostSpec] = field(default_factory=list)
    img_scale: int = 1  # multiplies generated image dimensions (bench knob)
    # opt-in: rotate .jpg/.gif into the image-URL algebra so the JPEG
    # and GIF codecs run end-to-end through the engine (off by default
    # to keep the round-1 fixtures/bench byte-identical)
    mixed_formats: bool = False


def default_spec(scale: int = 1, seed: int = 42, img_scale: int = 1,
                 hot_albums: int | None = None) -> WebSpec:
    """scale=1 → ~30 pages / ~100 images (test size); scale up for bench."""
    hosts: list[HostSpec] = []
    for i in range(scale):
        hosts += [
            HostSpec(f"plain{i}.example", "plain", imgs=6),
            HostSpec(f"css{i}.example", "css", imgs=4),
            HostSpec(f"lazy{i}.example", "lazy", listings=2, albums=2, pages=2, imgs=4),
            HostSpec(f"style{i}.example", "style", listings=1, albums=2, pages=2, imgs=3),
            HostSpec(f"json{i}.example", "json_key", pages=3, imgs=4),
            HostSpec(f"jsona{i}.example", "json_array", pages=2, imgs=3),
            HostSpec(f"two{i}.example", "two", pages=2, imgs=3),
        ]
    hosts.append(HostSpec("hot.example", "lazy", listings=1,
                          albums=hot_albums or 10 * max(1, scale),
                          pages=2, imgs=4))
    return WebSpec(seed=seed, hosts=hosts, img_scale=img_scale)


def site_config(spec: WebSpec) -> list[dict]:
    """Per-site selector config in the reference's web.json record format
    (Site/Img/Next/Album — /root/reference/src/main.rs:78)."""
    cfg = []
    for h in spec.hosts:
        if h.kind == "lazy":
            cfg.append({"Site": h.name, "Img": "div.gallery img",
                        "Next": "a.next", "Album": "div.albums a"})
        elif h.kind == "style":
            cfg.append({"Site": h.name, "Img": "div.hero div[style]",
                        "Next": "span.current", "Album": "div.albums span.title"})
        elif h.kind == "json_key":
            cfg.append({"Site": h.name, "Img": 'json: key | "photourl":',
                        "Next": "<script>", "Album": None})
        elif h.kind == "json_array":
            cfg.append({"Site": h.name, "Img": "json: array | imgList",
                        "Next": "<script>", "Album": None})
        elif h.kind == "two":
            cfg.append({"Site": h.name, "Img": "div.thumbs > a[href] | img.big",
                        "Next": "div.pager a", "Album": None})
        # plain / css: intentionally unconfigured
    return cfg


def seeds(spec: WebSpec) -> list[str]:
    out = []
    for h in spec.hosts:
        if h.kind in ("plain", "css"):
            out.append(f"https://{h.name}/page")
        elif h.kind in ("json_key", "json_array", "two"):
            out.append(f"https://{h.name}/gal/1")
        else:
            out.append(f"https://{h.name}/list/1")
    return out


# ------------------------------------------------------------- responses

@dataclass
class Response:
    status: int
    body: bytes
    content_type: str
    # Range-continuation attempts HttpFetcher needed for this body
    # (curl -C- analog; always 0 for the in-process synthetic fetcher)
    resumes: int = 0

    @property
    def text(self) -> str:
        return self.body.decode("utf-8", errors="replace")


_DATA_PNG = None


def _tiny_png_data_uri() -> str:
    global _DATA_PNG
    if _DATA_PNG is None:
        img = np.full((4, 4, 3), 200, dtype=np.uint8)
        img[::2, ::2] = 30
        _DATA_PNG = "data:image/png;base64," + base64.b64encode(
            C.png_encode(img)).decode()
    return _DATA_PNG


_DATA_SVG = "data:image/svg+xml,%3Csvg%20width%3D%224%22%3E%3C%2Fsvg%3E"


class SynthWeb:
    """url → Response, pure and deterministic."""

    def __init__(self, spec: WebSpec | None = None):
        self.spec = spec or default_spec()
        self.hosts = {h.name: h for h in self.spec.hosts}

    # ------------------------------------------------------------ fetch
    def get(self, url: str) -> Response:
        try:
            rest = url.split("://", 1)[1] if "://" in url else url
            slash = rest.find("/")
            host, path = (rest, "/") if slash == -1 else (rest[:slash], rest[slash:])
            if host == CDN or path.startswith(("/img/", "/raw/", "/d/")):
                return self._image(url, path)
            h = self.hosts.get(host)
            if h is None:
                return Response(404, b"", "text/plain")
            if path == "/robots.txt":
                return Response(200, b"User-agent: *\nDisallow: /private/\n",
                                "text/plain")
            if path.startswith("/private/"):
                return Response(200, b"<html><title>p</title></html>", "text/html")
            return Response(200, self._page(h, path).encode(), "text/html")
        except Exception:
            return Response(500, b"", "text/plain")

    # ----------------------------------------------------------- images
    def _image(self, url: str, path: str) -> Response:
        name = path.rsplit("/", 1)[-1].split("?")[0]
        seed = _h(self.spec.seed, "img", url)
        rng = np.random.default_rng(seed)
        m = max(1, self.spec.img_scale)
        w = 8 * m * (1 + seed % 5)
        h = 8 * m * (1 + (seed >> 8) % 4)
        base = rng.integers(0, 255, (-(-h // 8), -(-w // 8), 3)).astype(np.float64)
        img = np.kron(base, np.ones((8, 8, 1)))[:h, :w]
        img = np.clip(img + rng.normal(0, 6, img.shape), 0, 255).astype(np.uint8)
        if path.startswith("/raw/"):
            return Response(200, C.png_encode(img), "image/png")
        ext = name.rsplit(".", 1)[-1] if "." in name else "png"
        fmt = {"png": "png", "bmp": "bmp", "lsy": "lsy", "jpg": "jpg",
               "gif": "gif", "webp": "webp"}.get(ext, "png")
        ctype = {"png": "image/png", "bmp": "image/bmp",
                 "lsy": "image/lsy", "jpg": "image/jpeg",
                 "gif": "image/gif", "webp": "image/webp"}[fmt]
        if fmt == "jpg" and seed % 2:
            # half the synthetic JPEGs are progressive (SOF2, successive
            # approximation) — like the real web — exercising the
            # multi-scan decode path end to end
            from .jpegcodec import jpeg_encode_progressive

            return Response(200, jpeg_encode_progressive(
                img, subsample=seed % 4 == 1), ctype)
        if fmt == "png" and self.spec.mixed_formats:
            # rotate the real web's common PNG variants in: a third
            # Adam7-interlaced, a third palette (color type 3)
            if seed % 3 == 1:
                return Response(200, C.png_encode_interlaced(img), ctype)
            if seed % 3 == 2:
                return Response(200, C.png_encode_palette(img), ctype)
        return Response(200, C.encode_image(img, fmt), ctype)

    # ------------------------------------------------------------ pages
    def _img_url(self, hname: str, aid: str, p: int, k: int) -> str:
        """One image URL, form rotated by k to cover the URL algebra."""
        tok = f"{hname.split('.')[0]}-{aid}p{p}i{k}"
        form = k % (9 if self.spec.mixed_formats else 6)
        if form == 6:
            return f"https://{CDN}/img/{tok}.jpg"
        if form == 7:
            return f"https://{CDN}/img/{tok}.gif"
        if form == 8:
            return f"https://{CDN}/img/{tok}.webp"
        if form == 0:
            return f"https://{CDN}/img/{tok}.png"
        if form == 1:
            return f"https://{CDN}/img/-_{tok}.bmp"
        if form == 2:
            return f"https://{CDN}/img/{tok}.lsy?w=800&h=600"
        if form == 3:
            return f"//{CDN}/img/{tok}.png"
        if form == 4:
            return f"https://{CDN}/raw/{tok}"
        return f"/redirect?url=https%3A%2F%2F{CDN}%2Fimg%2F{tok}.png"

    def _page(self, h: HostSpec, path: str) -> str:
        kind = h.kind
        if kind in ("plain", "css") and path == "/page":
            return self._leaf_plain_css(h)
        parts = [p for p in path.split("/") if p]
        if kind in ("lazy", "style"):
            if len(parts) == 2 and parts[0] == "list":
                return self._listing(h, int(parts[1]))
            if len(parts) == 3 and parts[0] == "album":
                return self._album(h, parts[1], int(parts[2]))
        if kind in ("json_key", "json_array") and len(parts) == 2 and parts[0] == "gal":
            return self._json_gal(h, int(parts[1]))
        if kind == "two":
            if len(parts) == 2 and parts[0] == "gal":
                return self._two_gal(h, int(parts[1]))
            if len(parts) == 2 and parts[0] == "detail":
                return self._two_detail(h, parts[1])
        return "<html><head><title>404ish Empty</title></head><body></body></html>"

    def _leaf_plain_css(self, h: HostSpec) -> str:
        hid = h.name.split(".")[0]
        title = f"Tiny | The {hid} Grand Collection - site"
        imgs = []
        if h.kind == "plain":
            for k in range(h.imgs):
                u = self._img_url(h.name, "a0", 1, k)
                if k % 4 == 1:
                    imgs.append(f'<img data-src="{u}">')  # lazy attr first
                else:
                    imgs.append(f'<img src="{u}">')
            imgs.append(f'<img src="{_tiny_png_data_uri()}">')
            imgs.append('<img alt="no source">')  # empty → counted skip
            imgs.append(  # srcset candidates (north-star extraction)
                f'<img srcset="/img/{hid}-ss1.png 1x, '
                f'https://{CDN}/img/{hid}-ss2.png 2x">')
            imgs.append(  # dead host → fetch fails; fire-and-forget
                '<img src="https://dead.unreachable.example/x/y.png">')
            imgs.append(f'<img src="{self._img_url(h.name, "a0", 1, 0)}">')  # dup
            body = "\n".join(imgs)
        else:
            rules = []
            for k in range(h.imgs):
                u = self._img_url(h.name, "a0", 1, k % 4)  # forms 0-3 only
                rules.append(f".c{k}{{background: url('{u}')}}")
            body = (
                f"<style>{' '.join(rules)} "
                f".s{{background-image: image-set(url('/img/{hid}-set1.png') 1x, "
                f"url('https://{CDN}/img/{hid}-set2.png') 2x)}} "
                f".f{{src: url('font.woff2')}}</style>"
                f'<img src="https://{CDN}/img/{hid}-inline.png">'
                f'<div style="background: url({_DATA_SVG})"></div>'
            )
        return f"<html><head><title>{title}</title></head><body>{body}</body></html>"

    def _album_ids(self, h: HostSpec, listing: int) -> list[str]:
        return [f"a{listing}{j}" for j in range(h.albums)]

    def _listing(self, h: HostSpec, n: int) -> str:
        hid = h.name.split(".")[0]
        title = f"{hid} showcase | All the albums of {hid} page {n}"
        albs = []
        for aid in self._album_ids(h, n):
            href = f"/album/{aid}/1"
            if h.kind == "style":
                # album selector matches span.title; href lives on the parent
                albs.append(f'<a href="{href}"><span class="title" '
                            f'title="Album {aid}">A-{aid}</span></a>')
            else:
                albs.append(f'<a href="{href}" title="Album {aid}">A-{aid}</a>')
        if h.kind == "lazy" and n == 2 and h.albums > 0:
            # diamond: listing 2 also links listing 1's first album —
            # exercises duplicate-link admission (first discovery wins)
            albs.append('<a href="/album/a10/1" title="Album a10 again">'
                        "A-a10</a>")
        nxt = ""
        if n < h.listings:
            if h.kind == "style":
                nxt = (f'<div class="pg"><a href="/list/{max(n - 1, 1)}">p</a>'
                       f'<span class="current">{n}</span>'
                       f'<a href="/list/{n + 1}">n</a></div>')
            else:
                nxt = f'<a class="next" href="/list/{n + 1}">more</a>'
        elif h.kind == "style":
            nxt = (f'<div class="pg"><a href="/list/{max(n - 1, 1)}">p</a>'
                   f'<span class="current">{n}</span></div>')
        return (f"<html><head><title>{title}</title></head><body>"
                f'<div class="albums">{"".join(albs)}</div>{nxt}</body></html>')

    def _album(self, h: HostSpec, aid, p: int) -> str:
        hid = h.name.split(".")[0]
        title = f"s | Great Album {aid} of {hid} page {p}"
        imgs = []
        for k in range(h.imgs):
            if p > 1 and k == 0:
                u = self._img_url(h.name, str(aid), 1, 0)  # cross-page dup
            else:
                u = self._img_url(h.name, str(aid), p, k)
            if h.kind == "style":
                imgs.append(f'<div style="background:url(\'{u}\')">x</div>')
            elif k % 3 == 1:
                imgs.append(f'<img data-src="{u}">')
            else:
                imgs.append(f'<img src="{u}">')
        wrap = "hero" if h.kind == "style" else "gallery"
        if h.kind == "style":
            nxt = (f'<div class="pg"><span class="current">{p}</span>'
                   + (f'<a href="/album/{aid}/{p + 1}">nn</a>' if p < h.pages else "")
                   + "</div>")
        else:
            nxt = (f'<a class="next" href="/album/{aid}/{p + 1}">next</a>'
                   if p < h.pages else "")
        return (f"<html><head><title>{title}</title></head><body>"
                f'<div class="{wrap}">{"".join(imgs)}</div>{nxt}</body></html>')

    def _json_gal(self, h: HostSpec, n: int) -> str:
        hid = h.name.split(".")[0]
        if n > h.pages:  # past-the-end page: title, zero images → chain ends
            return ("<html><head><title>The End</title></head>"
                    "<body><script>var x=1;</script></body></html>")
        urls = []
        for k in range(h.imgs):
            u = f"https://{CDN}/img/{hid}-g{n}i{k}.png"
            urls.append(u.replace("/", "\\u002F"))
        meta = (f'var metaKeywords = "tag,{hid} Wonderful Gallery,x";')
        if h.kind == "json_key":
            data = ",".join(f'{{"photourl": "{u}", "id": {k}}}'
                            for k, u in enumerate(urls))
            script = f"var data = [{data}];"
        else:
            arr = ", ".join(f'"{u}"' for u in urls)
            script = f"var imgList = [{arr}];"
        return (f"<html><head><title>gal {n}</title></head><body>"
                f"<script>{meta}</script><script>{script}</script></body></html>")

    def _two_gal(self, h: HostSpec, n: int) -> str:
        hid = h.name.split(".")[0]
        title = f"x | {hid} Selected Works page {n}"
        thumbs = "".join(
            f'<a href="/detail/{hid}g{n}d{k}"><img src="/t/{k}.jpg"></a>'
            for k in range(h.imgs)
        )
        pager = [f'<a href="/gal/{i + 1}">{i + 1}</a>' for i in range(h.pages)]
        if n < h.pages:
            pager.append(f'<a href="/gal/{n + 1}">Next</a>')
        else:
            # terminal: 'Next' → '#' (even hosts) or no next-text at all,
            # current-position fallback with p == len-1 (odd hosts)
            if _h(self.spec.seed, "twoend", h.name) % 2 == 0:
                pager.append('<a href="#">Next</a>')
        return (f"<html><head><title>{title}</title></head><body>"
                f'<div class="thumbs">{thumbs}</div>'
                f'<div class="pager">{"".join(pager)}</div></body></html>')

    def _two_detail(self, h: HostSpec, did: str) -> str:
        k = _h(self.spec.seed, "cap", did) % 3
        if k == 0:
            u = f"https://{CDN}/img/{did}-full.png"
            cap = f' title="Beauty {did}.jpg"'
        elif k == 1:
            u = f"https://{CDN}/raw/{did}-full"
            cap = f' alt="Shot {did}.png"'
        else:
            u = f"/d/{did}-full.bmp"  # relative: canonicalized vs listing URL
            cap = ' alt="not a caption"'
        return (f"<html><head><title>d {did}</title></head><body>"
                f'<img class="big" src="{u}"{cap}></body></html>')

"""Sequential reference-oracle simulator (SURVEY.md §5 test strategy #2).

Replays the reference's crawl *algorithm* (/root/reference/src/main.rs:
main :38-47, parse :114-498 incl. album DFS :369-471, download :526-697)
sequentially over the synthetic web, on top of the shared per-page
extraction (imgray.extract).  The Ray engine must reproduce this
simulator's page-visit order, URL-seen set, and stored image rows —
that parity test exercises the *distributed orchestration* (frontier,
ordering, dedup, politeness, checkpointing).

Deviations from the reference, by design (SURVEY.md §2.9/§7):
  * ``quit!`` (process exit) ends the current chain, not the process;
  * within-page order is document order (reference: HashSet order,
    nondeterministic — the URL *set* is identical);
  * data-URI files named by content hash (reference: timestamp,
    src/main.rs:918-927, nondeterministic);
  * interactive album prompt defaults to "All".
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from . import codecs as C
from . import urlops as U
from .extract import SEP, parse_page, two_level_urls
from .synthweb import SynthWeb


@dataclass
class RefResult:
    visit_order: list[str] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    images: dict[str, dict] = field(default_factory=dict)


def data_uri_image_id(dirname: str, ext: str, raw: bytes) -> str:
    return f"{dirname}/{hashlib.sha1(raw).hexdigest()[:12]}.{ext}"


def image_record(image_id: str, data: bytes, caption: str) -> dict:
    fmt = C.sniff_format(data)
    try:
        arr = C.decode_image(data)
        h, w = arr.shape[:2]
        ph = C.phash64(arr)
    except Exception:
        h = w = 0
        ph = 0
    return {"image_id": image_id, "bytes": data, "w": w, "h": h,
            "fmt": fmt, "caption": caption, "phash": ph}


def derive_image_id(dirname: str, img_url: str, caption: str,
                    content_type: str) -> str | None:
    """album dir + derived file name (ref :526-638)."""
    packed = f"{img_url}{SEP}{caption}" if caption else img_url
    file_name, u, _cap = U.derive_filename(packed)
    if file_name is None:
        if "/" not in u:
            return None
        slash = u.rfind("/")
        name = u[slash + 1:].lstrip("-_")
        p = name.find("?url=")
        if p != -1:
            name = name[p + 5:]
        file_name = U.ext_from_content_type(content_type, name)
    return f"{dirname}/{file_name}"


class RefSim:
    def __init__(self, web: SynthWeb, config: list[dict],
                 album_gate=None):
        self.web = web
        self.config = config
        self.r = RefResult()
        # Y/N/All/Cancel album prompt (ref :412-468); None = "All"
        self.album_gate = album_gate

    def crawl(self, seed_urls: list[str]) -> RefResult:
        for s in seed_urls:
            nxt = self.parse(s)
            while nxt:
                nxt = self.parse(nxt)
        return self.r

    def parse(self, addr: str) -> str:
        host = U.check_host(addr)
        if host is None:
            return ""
        self.r.seen.add(addr)
        resp = self.web.get(addr)
        if resp.status != 200 or not resp.body:
            return ""
        if addr not in self.r.visit_order:
            self.r.visit_order.append(addr)

        entry = U.host_suffix_lookup(host, self.config)
        p = parse_page(resp.text, addr, entry)
        if not p.ok:
            return ""

        if p.two_level_sel is not None:
            pairs: dict[tuple[str, str], None] = {}
            for detail_url, _k in p.urls:
                self.r.seen.add(detail_url)
                dresp = self.web.get(detail_url)
                if dresp.status != 200:
                    continue
                for url, cap in two_level_urls(dresp.text, p.two_level_sel, addr):
                    pairs.setdefault((url, cap))
            items = [(u, c, "html") for (u, c) in pairs]
            items += [(u, "", k) for (u, k) in p.post_urls]  # json chain
            self._download(p.album_title, items)
        elif p.urls:
            self._download(p.album_title, [(u, "", k) for (u, k) in p.urls])

        album_hrefs = p.album_hrefs
        drop_next = False
        if self.album_gate is not None and album_hrefs:
            hrefs = []
            all_mode = False
            n_alb = len(album_hrefs)
            labels = p.album_labels or [""] * n_alb
            for i, (href, label) in enumerate(zip(album_hrefs, labels)):
                if all_mode:
                    hrefs.append(href)
                    continue
                v = str(self.album_gate(label, i, n_alb, addr)) \
                    .strip().lower()
                if v in ("y", "yes", ""):
                    hrefs.append(href)
                elif v in ("n", "no"):
                    drop_next = True  # ref :455: next_sel = None
                elif v in ("a", "all"):
                    all_mode = True
                    hrefs.append(href)
                else:  # cancel (ref :462-466)
                    drop_next = True
                    break
            album_hrefs = hrefs
        for href in album_hrefs:
            nxt = self.parse(href)
            while nxt:
                nxt = self.parse(nxt)

        return "" if drop_next else p.next_url

    def _download(self, dirname: str, items: list[tuple[str, str, str]]):
        d = U.sanitize_dir(dirname)
        for url, caption, _kind in items:
            self.r.seen.add(url)
            if url.startswith("data:image/"):
                parsed = U.parse_data_uri(url)
                if parsed is None:
                    continue
                ext, raw = parsed
                iid = data_uri_image_id(d, ext, raw)
                self.r.images.setdefault(iid, image_record(iid, raw, ""))
                continue
            resp = self.web.get(U.percent_encode(url))
            if resp.status != 200 or not resp.body:
                continue  # fire-and-forget: failures unobserved (ref :643)
            iid = derive_image_id(d, url, caption, resp.content_type)
            if iid is None:
                continue
            if iid not in self.r.images:  # --no-clobber first-wins (ref :16)
                self.r.images[iid] = image_record(iid, resp.body, caption)

"""Per-page extraction: HTML/CSS/JSON image URLs, albums, title, next link.

Single implementation of the reference's parse-time semantics
(/root/reference/src/main.rs:114-498 and check_next :769-896), shared by
the sequential oracle (refsim) and the Ray engine's Extractor stage —
the parity e2e test then exercises the *distributed orchestration*
(ordering, dedup, politeness, checkpoint) on top of identical parsing.

All functions are pure (HTML string in, records out); the engine applies
them per row inside ``map_batches`` actor-pool stages.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import urlops as U
from .dom import Document, Element

SEP = U.SEP


@dataclass
class PageParse:
    ok: bool = True
    reason: str = ""
    album_title: str = ""  # normalized dir-name source
    # ordered extracted URLs: list of (url, kind); kind html|css|json|data;
    # html entries may be detail-page hrefs when two_level is set
    urls: list[tuple[str, str]] = field(default_factory=list)
    two_level_sel: str | None = None  # right selector; urls are detail hrefs
    # two-level case only: URLs downloaded AFTER the second-level results
    # (the reference chains json_img into download() even on two-level
    # sites, src/main.rs:367 — json selectors always contain " | ")
    post_urls: list[tuple[str, str]] = field(default_factory=list)
    album_hrefs: list[str] = field(default_factory=list)
    # prompt label per album href (ref :417-431: first of title/alt/
    # aria-label attrs, else trimmed element text) — consumed by the
    # CrawlerConfig.album_gate hook
    album_labels: list[str] = field(default_factory=list)
    next_url: str = ""
    counters: dict = field(default_factory=dict)


def _selectors(cfg_entry: dict | None) -> tuple[str | None, str | None, str | None]:
    if cfg_entry is None:
        return (None, None, None)
    out = []
    for k in ("Img", "Next", "Album"):
        v = cfg_entry.get(k)
        out.append(v.strip() if isinstance(v, str) else None)
    return tuple(out)


def parse_page(html: str, addr: str, cfg_entry: dict | None) -> PageParse:
    """The body of the reference's parse() minus fetching and recursion."""
    img, next_sel, album = _selectors(cfg_entry)
    r = PageParse()
    empty_dup = 0

    # css scan only for unconfigured sites (ref :117-121)
    css_img: dict[str, None] = {}
    if img is None:
        css_img = _css_scan(html, addr)

    sels = tuple(img.split(SEP, 1)) if (img and SEP in img) else None
    sel = sels[0] if sels else img
    page = Document(html)

    # json-in-script extraction (ref :130-161)
    json_img: dict[str, None] = {}
    html_img: list[Element] = []
    if sel is not None and sel.startswith("json:"):
        kind = sel[len("json:"):].strip()
        name = sels[1].strip()
        for s in page.select("script"):
            t = s.text()
            if t is None:
                continue
            for u in t.split(name)[1:]:
                if kind == "key":
                    parts = u.split('"')
                    if len(parts) < 2:
                        r.ok, r.reason = False, "json-key-parse"
                        return r
                    json_img.setdefault(parts[1].replace("\\u002F", "/"))
                elif kind == "array":
                    body = U._multi_split(u, "[]")
                    if len(body) < 2:
                        r.ok, r.reason = False, "json-array-parse"
                        return r
                    for x in body[1].split('"'):
                        if x.strip() and x.strip() != ",":
                            json_img.setdefault(x.replace("\\u002F", "/"))
    else:
        html_img = page.select(sel if sel is not None else "img")

    attr = U.attr_from_selector(sel)

    # title (ref :175-203)
    if json_img:
        title = U.json_title([s.text() or "" for s in page.select("script")])
        if title is None:
            r.ok, r.reason = False, "no-metaKeywords-title"
            return r
    else:
        titles = page.select("title")
        if not titles:
            r.ok, r.reason = False, "no-title"
            return r
        title = titles[0].text()
        if title is None:
            r.ok, r.reason = False, "empty-title"
            return r

    t = U.pick_longest_title_segment(title)

    albums = page.select(album) if album is not None else []
    has_album = album is not None and bool(albums)
    json_len = len(json_img)

    # image-URL loop (ref :262-314)
    urls: dict[str, None] = {}
    for elm in html_img:
        # srcset candidates (north-star addition; additive to the
        # reference's single-attr read)
        srcset = elm.attr("srcset")
        if srcset:
            for u in U.parse_srcset(srcset):
                if not u.startswith("data:image/"):
                    urls.setdefault(U.canonicalize(u, addr))
                else:
                    urls.setdefault(u)
        value = None
        for a in (*U.LAZY_ATTRS, attr):
            value = elm.attr(a)
            if value is not None:
                break
        if value is None:
            if not srcset:
                empty_dup += 1
            continue
        if attr == "style":
            frag = None
            v = value.strip()
            for s in U.CSS_TOKENS:
                if s in v:
                    frag = v.split(s, 1)[1]
                    break
            if frag is not None:
                u = U.url_image(frag)
                if u is not None:
                    key = u if u.startswith("data:image/") else U.canonicalize(u, addr)
                    if key in urls:
                        empty_dup += 1
                    urls.setdefault(key)
        elif value.startswith("data:image/"):
            if value in urls:
                empty_dup += 1
            urls.setdefault(value)
        else:
            url = U.url_redirect_and_query_cleanup(value) if sels is None else value
            if not url:
                empty_dup += 1
            else:
                key = U.canonicalize(url, addr)
                if key in urls:
                    empty_dup += 1
                urls.setdefault(key)

    imgs_len = len(html_img) + len(css_img) + len(json_img)
    if not has_album and imgs_len == 0:
        r.ok, r.reason = False, "no-images"  # ref :246 quit
        return r

    r.album_title = U.strip_page_suffix(t)
    r.counters = {"empty_dup": empty_dup}

    if imgs_len > 0:
        if sels is not None:
            r.two_level_sel = sels[1]
            r.urls = [(u, "html") for u in urls]  # detail hrefs
            # download order on two-level sites: second-level results,
            # then css (always empty here: css runs only unconfigured),
            # then json (ref :367 urls.chain(css_img).chain(json_img))
            r.post_urls = [(u, "data" if u.startswith("data:image/")
                            else "json") for u in json_img]
        else:
            r.urls = [(u, "data" if u.startswith("data:image/") else "html")
                      for u in urls]
            r.urls += [(u, "data" if u.startswith("data:image/") else "css")
                       for u in css_img]
            r.urls += [(u, "json") for u in json_img]
    elif has_album:
        for alb in albums:
            href = _album_href(alb)
            if href:
                r.album_hrefs.append(U.canonicalize(href, addr))
                r.album_labels.append(_album_label(alb))

    # next page (ref :475-497)
    if next_sel is None:
        r.next_url = ""
    elif next_sel == "<script>":
        r.next_url = U.next_page_numeric(addr) if json_len > 0 else ""
    else:
        r.next_url = check_next(page.select(next_sel), addr)
    return r


def two_level_urls(detail_html: str, right_sel: str, list_addr: str
                   ) -> list[tuple[str, str]]:
    """Second-level selection + caption attach (ref :336-364).

    Note: src is canonicalized against the *listing* address — the
    reference concatenates all detail bodies and re-parses under the
    listing URL (ref :326-338,360).
    Returns ordered (img_url, caption) pairs; caption '' when absent.
    """
    out: list[tuple[str, str]] = []
    for e in Document(detail_html).select(right_sel):
        src = e.attr("src")
        if src is None:
            continue  # ref unwraps (panic); rebuild drops + counts
        caption = None
        for a in ("title", "alt"):
            caption = U.caption_if_image_ext(e.attr(a))
            if caption is not None:
                break
        out.append((U.canonicalize(src, list_addr), caption or ""))
    return out


def _css_scan(html: str, addr: str) -> dict[str, None]:
    """css_image (ref :1039-1065), deterministic scan order."""
    out: dict[str, None] = {}

    def scan(text: str):
        for tok in U.CSS_TOKENS:
            segs = text.split(tok)
            if tok == "image-set(":
                for seg in segs[1:]:
                    scan(seg)
            else:
                for seg in segs[1:]:
                    u = U.url_image(seg)
                    if u is None:
                        continue
                    if u.startswith("data:image/"):
                        out.setdefault(u)
                    else:
                        out.setdefault(U.canonicalize(u, addr))

    scan(html)
    return out


def _album_label(alb: Element) -> str:
    """Album prompt label (ref :417-431): first of the title/alt/
    aria-label attrs, else the element's trimmed text ("" where the
    reference would quit — the gate hook decides)."""
    for a in ("title", "alt", "aria-label"):
        v = alb.attr(a)
        if v is not None:
            return v.strip()
    t = alb.text()
    return t.strip() if t else ""


def _album_href(alb: Element) -> str | None:
    """Album element → href via ancestor walk (ref :374-396)."""
    href = alb.attr("href")
    if href is not None:
        return href
    p = alb.parent
    n = 2
    while n > 0 and p is not None:
        href = p.attr("href")
        if href is not None:
            return href
        n -= 1
        if n > 0:
            p = p.parent
    if p is not None:
        cands = p.select("a[href]")
        if cands:
            return cands[0].attr("href")
    return None


# ------------------------------------------------------------ check_next

def _splitter(e: Element) -> bool:
    """current-page marker predicate (ref :771-775)."""
    c = e.attr("class")
    return (c is not None and any(x in c for x in ("cur", "now", "active"))) \
        or e.attr("aria-current") is not None


def _set_next(tags: list[Element]) -> str:
    """first anchor-ish element of a sibling run → its href (ref :776-792)."""
    tag = None
    for e in tags:
        if e.tag == "a" or (e.children and e.children[0].tag == "a"):
            tag = e
            break
    if tag is None:
        return ""
    txt = tag.text()
    if (txt is None or not txt.strip()) and not tag.children:
        return ""
    href = tag.attr("href")
    if href is None and tag.children:
        href = tag.children[0].attr("href")
    return href or ""


def _split_last(items: list[Element], pred) -> list[Element]:
    """Rust slice::split(pred).next_back(): last run between separators."""
    groups: list[list[Element]] = [[]]
    for e in items:
        if pred(e):
            groups.append([])
        else:
            groups[-1].append(e)
    return groups[-1]


def _contains_next(t: str) -> bool:
    """lowercase contains 'next' or '下' (ref :833-836)."""
    t = t.lower()
    return "下" in t or "next" in t


def check_next(nexts: list[Element], cur: str) -> str:
    """Next-page resolution heuristic stack (ref :769-896)."""
    if not nexts:
        next_link = ""
    elif len(nexts) == 1:
        element = nexts[0]
        if element.tag == "span" or element.attr("href") is None:
            items = element.parent.children if element.parent else []
            only_span = sum(1 for x in items if x.tag == "span") == 1
            tags = _split_last(
                items,
                lambda e: (e.tag == "span" or e.attr("href") is None)
                and (_splitter(e) or only_span),
            )
            next_link = _set_next(tags)
        elif element.tag == "i":
            next_link = (element.parent.attr("href") or "") if element.parent else ""
        else:
            next_link = element.attr("href") or ""
    else:
        element = nexts[0]
        if element.tag == "div" and len(nexts) == 2:
            items = element.children
            tags = _split_last(
                items,
                lambda e: (_splitter(e.children[0]) if e.children
                           else (e.tag == "span" or _splitter(e))),
            )
            next_link = _set_next(tags)
        else:
            # "next"-text scan over the last two candidates (ref :828-859)
            found = None
            for n in reversed(nexts[-2:]):
                t = n.text()
                if t is not None and not t.strip():
                    t = None
                if t is not None:
                    if _contains_next(t) or n.attr("target") is not None:
                        found = n
                        break
                else:
                    t = n.attr("title")
                    if t is not None:
                        if _contains_next(t):
                            found = n
                            break
                    else:
                        span = n.select("span.currenttext")
                        if span and span[0].text() is not None \
                                and _contains_next(span[0].text()):
                            found = n
                            break
            if found is not None:
                next_link = found.attr("href") or ""
            else:
                # position-after-current fallback (ref :861-882)
                pos = None
                base = cur.rstrip("/")
                for i in range(len(nexts) - 1, -1, -1):
                    h = nexts[i].attr("href")
                    if h is not None and (
                        cur.strip().endswith(h.strip())
                        or h.strip() == "#"
                        or any((base + suf).endswith(h.strip())
                               for suf in ("/1", "?page=1"))
                    ):
                        pos = i
                        break
                if pos is not None and pos < len(nexts) - 1:
                    next_link = nexts[pos + 1].attr("href") or ""
                else:
                    next_link = ""

    # self-loop guards (ref :889-891)
    if cur.strip().endswith(next_link) or next_link.strip() in ("#", "/"):
        next_link = ""
    return U.canonicalize(next_link, cur)

"""Pure URL / string scalar functions (SURVEY.md §2.8).

Each function re-expresses the *semantics* of one scalar operation of the
reference (cited per function as reference file:line into
/root/reference/src/main.rs).  All are pure Python with zero Ray
dependencies so they can be unit/property tested directly and applied per
Arrow batch inside map_batches stages.

Rust→Python semantic notes handled here:
  * Rust ``Iterator::max_by_key`` returns the **last** maximal element on
    ties; Python ``max`` returns the first — ``_max_by_key_last`` mirrors
    the Rust rule.
  * Rust operates on byte offsets; these fixtures/inputs are handled at
    char level with identical occurrence semantics (valid for all inputs
    on which the Rust code would not panic on a char boundary).
"""

from __future__ import annotations

import base64
import binascii
from urllib.parse import unquote

SEP = " | "  # multiplexer literal (ref src/main.rs:6)
CSS_TOKENS = ("url(", "image(", "image-set(")  # ref src/main.rs:7

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".avif", ".bmp")  # ref :346
FONT_DOC_EXTS = (
    ".otf", ".ttf", ".woff", ".woff2", ".cur",
    ".css", ".pdf", ".fnt", ".eot", ".cff",
)  # ref src/main.rs:1023-1027

LAZY_ATTRS = ("data-src", "data-lazy", "data-lazy-src")  # ref :266


def _max_by_key_last(items, key):
    """Rust max_by_key: last element among equal maxima."""
    best = None
    best_k = None
    for it in items:
        k = key(it)
        if best_k is None or k >= best_k:
            best, best_k = it, k
    return best


def split_scheme(addr: str) -> tuple[str, str]:
    """``addr.split_once("://")`` with ("http", addr) fallback (ref :51,:505)."""
    if "://" in addr:
        scheme, rest = addr.split("://", 1)
        return scheme, rest
    return "http", addr


def check_host(addr: str) -> str | None:
    """Validate scheme + extract host; None when invalid (ref :50-62).

    The reference quits the process on invalid input; the rebuild drops +
    counts the row instead (SURVEY.md §2.2).
    """
    scheme, rest = split_scheme(addr)
    if scheme.lower() not in ("http", "https"):
        return None
    slash = rest.find("/")
    host = rest if slash == -1 else rest[:slash]
    if "." not in host:
        return None
    return host


def canonicalize(url: str, addr: str) -> str:
    """Relative-URL resolution against the page address (ref :501-523).

    Exact reference algebra, including the bare ``starts_with("http")``
    absolute-URL test (not ``http://``).
    """
    if not url:
        return url
    scheme, path = split_scheme(addr)
    if not url.startswith("http"):
        if url.startswith("//"):
            return f"{scheme}:{url}"
        if url.startswith("/"):
            slash = path.find("/")
            host = path if slash == -1 else path[:slash]
            return f"{scheme}://{host}{url}"
        rslash = path.rfind("/")
        dirname = path if rslash == -1 else path[:rslash]
        return f"{scheme}://{dirname}/{url}"
    return url


def percent_decode(url: str) -> str:
    """Percent-decode with UTF-8-lossy semantics (ref :986-987)."""
    return unquote(url, errors="replace")


def url_redirect_and_query_cleanup(url: str) -> str:
    """Decode, unwrap the last ``?url=`` redirect, strip query (ref :985-1003)."""
    dec = percent_decode(url)
    p = dec.rfind("?url=")
    cleanup = dec[p + 5 :] if p != -1 else dec
    end = None
    q = cleanup.find("?")
    if q != -1:
        a = cleanup[q:].find("&")
        if a != -1:
            end = a + q
    if end is None:
        slash = cleanup.rfind("/")
        if slash != -1:
            dot = cleanup[slash:].rfind(".")
            if dot != -1:
                amp = cleanup[slash + dot :].find("&")
                if amp != -1:
                    end = amp + dot + slash
    if end is None:
        end = len(cleanup)
    return cleanup[:end]


def _trim_matches(s: str, chars: str) -> str:
    return s.strip(chars)


def url_image(content: str) -> str | None:
    """Parse one CSS ``url(``/``image(`` token body (ref :1006-1036)."""
    rp = content.find(")")
    if rp == -1:
        return None
    url = content[:rp]
    for x in ("ltr ", "rtl "):
        while url.startswith(x):
            url = url[len(x) :]
    url = url.strip("'\"").strip()
    for x in ("&#39;", "&apos;", "&#34;", "&quot;"):
        while url.startswith(x):
            url = url[len(x) :]
        while url.endswith(x):
            url = url[: -len(x)]
        url = url.strip()
    if url.startswith("data:image/"):
        return url
    url = url_redirect_and_query_cleanup(url)
    x = url.rfind("#xywh")
    if x != -1:
        url = url[:x]
    if (
        not url
        or url == "undefined"
        or url.startswith(("{", "$"))
        or "#" in url
        or any(url.endswith(ext) for ext in FONT_DOC_EXTS)
    ):
        return None
    return url.strip()


def css_image(html: str, addr: str, keep_data_uris: bool = True) -> set[str]:
    """Raw-HTML CSS scan for url()/image()/image-set() (ref :1039-1065)."""
    images: set[str] = set()
    for tok in CSS_TOKENS:
        segments = html.split(tok)
        if tok == "image-set(":
            for seg in segments[1:]:
                images |= css_image(seg, addr, keep_data_uris)
        else:
            for seg in segments[1:]:
                u = url_image(seg)
                if u is not None:
                    if u.startswith("data:image/"):
                        if keep_data_uris:
                            images.add(u)
                    else:
                        images.add(canonicalize(u, addr))
    return images


def percent_encode(url: str) -> str:
    """Encode all non-alphanumerics except ``:/.-_?=%`` (ref :553-564,629).

    Manual byte-level encode (Python's quote() never encodes ``~`` but the
    reference's NON_ALPHANUMERIC set does).
    """
    safe = set(b":/.-_?=%")
    out = []
    for b in url.encode("utf-8"):
        c = chr(b)
        if c.isascii() and (c.isalnum() or b in safe):
            out.append(c)
        else:
            out.append(f"%{b:02X}")
    return "".join(out)


def pick_longest_title_segment(title: str) -> str:
    """rsplit on ``/ - _ | –`` → longest trimmed segment (ref :205-211).

    Rust iterates rsplit (reverse order) with last-max-wins; equivalently
    the earliest maximal segment in document order wins.
    """
    t = title.strip()
    segs = _multi_split(t, "/-_|–")
    best = _max_by_key_last(reversed(segs), key=lambda x: len(x.strip()))
    return (best or "").strip()


def _multi_split(s: str, chars: str) -> list[str]:
    out = [""]
    for ch in s:
        if ch in chars:
            out.append("")
        else:
            out[-1] += ch
    return out


def strip_page_suffix(t: str) -> str:
    """Strip trailing page markers / parenthetical (ref :249-258)."""
    low = t.lower()
    if " page" in low or "页" in t:
        p = low.rfind(" page")
        if p == -1:
            p = t.rfind("第")
        if p == -1:
            p = len(t)
        return t[:p].strip()
    p = max(t.rfind("("), t.rfind(","))
    if p == -1:
        p = len(t)
    return t[:p].strip()


def json_title(script_texts: list[str]) -> str | None:
    """JSON-site title: first script containing ``metaKeywords``, 2nd
    quote-token, comma-split, longest segment (ref :180-194)."""
    for t in script_texts:
        if "metaKeywords" in t:
            after = t.split("metaKeywords", 1)[1]
            parts = after.split('"')
            if len(parts) < 2:
                return None
            kw = parts[1]
            segs = kw.split(",")
            best = _max_by_key_last(segs, key=lambda s: len(s.strip()))
            return best
    return None


def attr_from_selector(sel: str | None) -> str:
    """Attribute to read from matched img elements (ref :166-173).

    Last whitespace token, rsplit on ``[``/``]``, second item, else 'src'.
    """
    if sel is None:
        return "src"
    tokens = sel.split()
    if not tokens:
        return "src"
    last = tokens[-1]
    parts = _multi_split(last, "[]")
    rev = list(reversed(parts))
    if len(rev) >= 2:
        return rev[1]
    return "src"


def host_suffix_lookup(host: str, config: list[dict]) -> dict | None:
    """First config entry whose comma-split Site list suffix-matches host
    (ref :65-80)."""
    h = host.rstrip()
    for entry in config:
        site = entry.get("Site")
        if isinstance(site, str):
            for dom in site.split(","):
                dom = dom.strip()
                if dom and h.endswith(dom):
                    return entry
    return None


def derive_filename(url: str) -> tuple[str | None, str, str]:
    """Filename derivation for a (possibly caption-packed) image URL
    (ref :580-614).

    Returns (file_name_or_None, bare_url, caption).  ``file_name`` is None
    when the URL has no extension and no caption — the reference then
    probes Content-Type (ref :700-737); the rebuild resolves the extension
    from the fetched content type instead (same inputs available).
    A URL with no '/' is invalid (reference quits; we signal with None
    name and empty caption and let the caller drop + count).
    """
    if SEP in url:
        u, caption = url.split(SEP, 1)
    else:
        u, caption = url, ""
    slash = u.rfind("/")
    if slash == -1:
        return None, u, ""
    name = u[slash + 1 :].lstrip("-_")
    p = name.find("?url=")
    if p != -1:
        name = name[p + 5 :]
    qpos = name.find("?")
    name_no_query = name if qpos == -1 else name[:qpos]
    has_ext = name_no_query.rfind(".") != -1
    if not has_ext:
        if caption:
            return caption, u, caption
        return None, u, ""
    return name_no_query, u, caption


def ext_from_content_type(content_type: str, name: str) -> str:
    """Resolve ``name.ext`` from a Content-Type header value (ref :715-734).

    Mirrors the ``rsplit_once("image/")`` + ``[+;,]`` truncation; falls back
    to the reference's literal ``.ext!`` marker on failure.
    """
    p = content_type.rfind("image/")
    if p != -1:
        ctx = content_type[p + len("image/") :]
        end = len(ctx)
        for x in "+;,":
            f = ctx.find(x)
            if f != -1:
                end = min(end, f)
        ext = ctx[:end]
        if ext:
            if name.endswith(f".{ext}"):
                return name
            return f"{name}.{ext}"
    return f"{name}.ext!"


def parse_data_uri(data: str) -> tuple[str, bytes] | None:
    """Decode ``data:image/<ctx>,<payload>`` (ref :906-949).

    Returns (ext, bytes) or None when malformed/undecodable.
    """
    if not data.startswith("data:image/"):
        return None
    comma = data.find(",")
    if comma == -1:
        return None
    ctx = data[len("data:image/") : comma]
    end = len(ctx)
    for x in "+;":
        f = ctx.find(x)
        if f != -1:
            end = min(end, f)
    ext = ctx[:end]
    content = data[comma + 1 :]
    if ";base64" in ctx:
        try:
            raw = base64.b64decode(content, validate=True)
        except (binascii.Error, ValueError):
            return None
    else:
        raw = unquote(content, errors="replace").encode("utf-8")
    return ext, raw


def next_page_numeric(addr: str) -> str:
    """``<script>`` pagination: numeric last-segment increment (ref :480-491)."""
    parts = addr.split("/")
    if parts and parts[-1] == "":  # split_terminator drops one trailing empty
        parts.pop()
    last = parts[-1] if parts else ""
    try:
        num = int(last)
        if not (0 <= num <= 255):
            num = 1
    except ValueError:
        num = 1
    base = addr.rstrip("/")
    suffix = f"/{num}"
    while base.endswith(suffix):
        base = base[: -len(suffix)]
    return f"{base}/{num + 1}"


def parse_srcset(value: str) -> list[str]:
    """Parse a ``srcset`` attribute into its candidate URLs, in
    document order (north-star addition — the reference reads only
    src/data-src*, src/main.rs:265-268; srcset grammar is public HTML:
    comma-separated candidates, each ``url [descriptor]``)."""
    out: list[str] = []
    for cand in value.split(","):
        cand = cand.strip()
        if not cand:
            continue
        url = cand.split()[0] if cand.split() else ""
        if url and url not in out:
            out.append(url)
    return out


def caption_if_image_ext(value: str | None) -> str | None:
    """title/alt caption gate: non-empty and final dot-suffix is an image
    extension, case-insensitive (ref :342-359)."""
    if value is None:
        return None
    attr = value.strip()
    if not attr:
        return None
    dot = attr.rfind(".")
    if dot == -1:
        return None
    if attr[dot:].lower() in IMAGE_EXTS:
        return value
    return None


def sanitize_dir(title: str) -> str:
    """Album dir name: '/' → ':' (ref :530)."""
    return title.replace("/", ":")

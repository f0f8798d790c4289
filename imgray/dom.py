"""Minimal DOM + CSS-selector subset engine on stdlib ``html.parser``.

Covers exactly the selector grammar used by the reference's site config
(reference: /root/reference/src/web.json, dispatch src/main.rs:123-173):
tag, ``.class`` (repeatable), ``#id``, ``[attr]``, ``[attr="value"]``,
compound combinations, descendant (whitespace) and child (``>``)
combinators.  Elements are returned in document order, matching the
reference's crabquery usage.

No external deps (no bs4/lxml in this sandbox — SURVEY.md env facts).
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Element:
    __slots__ = ("tag", "attrs", "parent", "children", "texts")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Element | None"):
        self.tag = tag
        self.attrs = attrs
        self.parent = parent
        self.children: list[Element] = []  # element children only
        self.texts: list[str | Element] = []  # mixed content, doc order

    def attr(self, name: str) -> str | None:
        return self.attrs.get(name)

    def text(self) -> str | None:
        """Concatenated descendant text (crabquery Element::text analog);
        None when the subtree holds no text nodes."""
        parts: list[str] = []

        def walk(e: Element) -> None:
            for t in e.texts:
                if isinstance(t, str):
                    parts.append(t)
                else:
                    walk(t)

        walk(self)
        if not parts:
            return None
        return "".join(parts)

    def classes(self) -> list[str]:
        c = self.attrs.get("class")
        return c.split() if c else []

    def select(self, selector: str) -> list["Element"]:
        return select(self, selector)

    def iter_subtree(self):
        """All descendant elements (not self), document order."""
        stack = list(reversed(self.children))
        while stack:
            e = stack.pop()
            yield e
            stack.extend(reversed(e.children))

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.tag} {self.attrs}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#root", {}, None)
        self.stack = [self.root]

    def _attrs(self, attrs) -> dict[str, str]:
        d: dict[str, str] = {}
        for k, v in attrs:
            if k not in d:
                d[k] = v if v is not None else ""
        return d

    def handle_starttag(self, tag, attrs):
        parent = self.stack[-1]
        el = Element(tag, self._attrs(attrs), parent)
        parent.children.append(el)
        parent.texts.append(el)
        if tag not in VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        parent = self.stack[-1]
        el = Element(tag, self._attrs(attrs), parent)
        parent.children.append(el)
        parent.texts.append(el)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].texts.append(data)


class Document:
    """Parsed HTML document (crabquery::Document analog)."""

    def __init__(self, html: str):
        b = _TreeBuilder()
        try:
            b.feed(html)
            b.close()
        except Exception:
            pass  # salvage whatever parsed; crawler records bad pages
        self.root = b.root

    def select(self, selector: str) -> list[Element]:
        return select(self.root, selector)


# ---------------------------------------------------------------- selectors

class _Simple:
    __slots__ = ("tag", "classes", "id", "attrs")

    def __init__(self):
        self.tag: str | None = None
        self.classes: list[str] = []
        self.id: str | None = None
        self.attrs: list[tuple[str, str | None]] = []

    def matches(self, e: Element) -> bool:
        if self.tag is not None and e.tag != self.tag:
            return False
        if self.id is not None and e.attrs.get("id") != self.id:
            return False
        if self.classes:
            cls = e.classes()
            for c in self.classes:
                if c not in cls:
                    return False
        for name, val in self.attrs:
            got = e.attrs.get(name)
            if got is None:
                return False
            if val is not None and got != val:
                return False
        return True


def _parse_simple(token: str) -> _Simple:
    s = _Simple()
    i, n = 0, len(token)
    while i < n:
        c = token[i]
        if c == ".":
            j = i + 1
            while j < n and token[j] not in ".#[":
                j += 1
            s.classes.append(token[i + 1 : j])
            i = j
        elif c == "#":
            j = i + 1
            while j < n and token[j] not in ".#[":
                j += 1
            s.id = token[i + 1 : j]
            i = j
        elif c == "[":
            j = token.find("]", i)
            if j == -1:
                j = n
            body = token[i + 1 : j]
            if "=" in body:
                name, val = body.split("=", 1)
                val = val.strip("'\"")
                s.attrs.append((name.strip(), val))
            else:
                s.attrs.append((body.strip(), None))
            i = j + 1
        else:
            j = i
            while j < n and token[j] not in ".#[":
                j += 1
            s.tag = token[i:j].lower()
            i = j
    return s


def parse_selector(selector: str) -> list[tuple[str, _Simple]]:
    """→ list of (combinator, simple); combinator ∈ {'desc', 'child'}."""
    # normalize '>' spacing, then whitespace-split
    toks = selector.replace(">", " > ").split()
    out: list[tuple[str, _Simple]] = []
    comb = "desc"
    for t in toks:
        if t == ">":
            comb = "child"
            continue
        out.append((comb, _parse_simple(t)))
        comb = "desc"
    return out


def _matches_chain(e: Element, chain: list[tuple[str, _Simple]], idx: int) -> bool:
    comb, simple = chain[idx]
    if not simple.matches(e):
        return False
    if idx == 0:
        return True
    prev_comb = chain[idx][0]
    anc = e.parent
    if prev_comb == "child":
        if anc is None or anc.tag == "#root":
            return False
        return _matches_chain(anc, chain, idx - 1)
    while anc is not None and anc.tag != "#root":
        if _matches_chain(anc, chain, idx - 1):
            return True
        anc = anc.parent
    return False


def select(scope: Element, selector: str) -> list[Element]:
    chain = parse_selector(selector)
    if not chain:
        return []
    out = []
    for e in scope.iter_subtree():
        if _matches_chain(e, chain, len(chain) - 1):
            out.append(e)
    return out

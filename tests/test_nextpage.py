"""check_next heuristic-stack unit vectors (reference
/root/reference/src/main.rs:769-896), one per branch family, plus a
parse-compatibility sweep of the selector engine over the reference's
full site-config selector corpus.
"""

import json
import os

import pytest

from imgray.dom import Document
from imgray.extract import check_next

CUR = "https://h.example/gal/2"


def _next(html, sel, cur=CUR):
    return check_next(Document(html).select(sel), cur)


def test_empty_nexts():
    assert _next("<div></div>", "a.next") == ""


def test_single_anchor_with_href():
    assert _next('<a class="next" href="/gal/3">more</a>', "a.next") == \
        "https://h.example/gal/3"


def test_single_span_sibling_walk():
    html = ('<div><a href="/gal/1">1</a><span class="current">2</span>'
            '<a href="/gal/3">3</a></div>')
    assert _next(html, "span.current") == "https://h.example/gal/3"
    # terminal: nothing after the current marker
    html2 = '<div><a href="/gal/1">1</a><span class="current">2</span></div>'
    assert _next(html2, "span.current") == ""


def test_single_i_tag_parent_href():
    # reference branch order (src/main.rs:798-810): an <i> WITHOUT href
    # falls into the no-href sibling-walk branch first; the i-branch
    # (parent's href) fires only for an <i> that carries an href itself
    html = '<a href="/gal/3"><i class="fa-chevron-right" href="#"></i></a>'
    assert _next(html, "i.fa-chevron-right") == "https://h.example/gal/3"
    # i without href → sibling walk over [i] finds no anchor → ""
    html2 = '<a href="/gal/3"><i class="fa-chevron-right"></i></a>'
    assert _next(html2, "i.fa-chevron-right") == ""


def test_div_split_branch():
    # len==2, first element div → split its children on current marker
    html = ('<div class="pg"><a href="/gal/1">1</a>'
            '<span class="active">2</span><a href="/gal/3">3</a></div>'
            '<div class="pg2"></div>')
    got = check_next(
        Document(html).select("div"), CUR)
    assert got == "https://h.example/gal/3"


def test_multi_next_text():
    html = ('<div class="p"><a href="/gal/1">1</a><a href="/gal/2">2</a>'
            '<a href="/gal/3">Next</a></div>')
    assert _next(html, "div.p a") == "https://h.example/gal/3"


def test_multi_next_cjk():
    html = ('<div class="p"><a href="/gal/1">1</a>'
            '<a href="/gal/3">下一页</a></div>')
    assert _next(html, "div.p a") == "https://h.example/gal/3"


def test_multi_target_attr():
    html = ('<div class="p"><a href="/gal/1">1</a>'
            '<a href="/gal/3" target="_blank">»</a></div>')
    assert _next(html, "div.p a") == "https://h.example/gal/3"


def test_multi_title_attr():
    html = ('<div class="p"><a href="/gal/1"><img src="x"></a>'
            '<a href="/gal/3" title="next page"><img src="y"></a></div>')
    assert _next(html, "div.p a") == "https://h.example/gal/3"


def test_multi_currenttext_span():
    html = ('<div class="p"><a href="/gal/1"><img src="x"></a>'
            '<a href="/gal/3"><span class="currenttext">next</span></a></div>')
    # span has text → the anchor's own text() is non-None, 'next' matches
    assert _next(html, "div.p a") == "https://h.example/gal/3"


def test_position_after_current_fallback():
    html = ('<div class="p"><a href="/gal/1">x</a><a href="/gal/2">y</a>'
            '<a href="/gal/3">z</a></div>')
    # no 'next' text anywhere; /gal/2 matches cur → take the following one
    assert _next(html, "div.p a") == "https://h.example/gal/3"
    # current is last → chain ends
    html2 = '<div class="p"><a href="/gal/1">x</a><a href="/gal/2">y</a></div>'
    assert _next(html2, "div.p a") == ""


def test_page1_suffix_equivalence():
    html = ('<div class="p"><a href="?page=1">x</a>'
            '<a href="?page=2">y</a><a href="/other">z</a></div>')
    got = check_next(Document(html).select("div.p a"),
                     "https://h.example/gal")
    # '?page=1' matches cur+'?page=1' → next element's href wins
    assert got.endswith("?page=2")


def test_self_loop_guards():
    assert _next('<a class="n" href="#">next</a>', "a.n") == ""
    assert _next('<a class="n" href="/gal/2">next</a>', "a.n") == ""  # cur suffix
    assert _next('<a class="n" href="/">next</a>', "a.n") == ""


REF_WEBJSON = "/root/reference/src/web.json"


@pytest.mark.skipif(not os.path.exists(REF_WEBJSON),
                    reason="reference config not available")
def test_selector_engine_parses_reference_corpus():
    """Every selector in the reference's 114-site config must compile
    and run against a sample document without error (the htmlq
    differential idea, src/main.rs:1097-1135, as a parse sweep)."""
    from imgray.dom import parse_selector
    from imgray.urlops import attr_from_selector

    cfg = json.load(open(REF_WEBJSON))
    doc = Document("<html><body><div class='x'><img src='1'></div></body></html>")
    n = 0
    for entry in cfg:
        for key in ("Img", "Next", "Album"):
            sel = entry.get(key)
            if not isinstance(sel, str) or not sel.strip():
                continue
            sel = sel.strip()
            if sel == "<script>" or sel.startswith("json:"):
                continue  # dispatch handled at extract level
            sel = sel.split(" | ")[0]
            chain = parse_selector(sel)
            assert chain, sel
            doc.select(sel)  # must not raise
            attr_from_selector(sel)
            n += 1
    assert n > 200  # the corpus really was swept

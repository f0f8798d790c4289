"""Unit tests for the pure scalar URL/string operators (SURVEY.md §2.8).

Each vector documents the reference behavior it checks (file:line into
/root/reference/src/main.rs).
"""

from hypothesis import given
from hypothesis import strategies as st

from imgray import urlops as U


# check_host (ref :50-62)
def test_check_host():
    assert U.check_host("https://a.example.com/x/y") == "a.example.com"
    assert U.check_host("http://a.b") == "a.b"
    assert U.check_host("a.b/path") == "a.b"  # default scheme http
    assert U.check_host("ftp://a.b/x") is None  # bad scheme
    assert U.check_host("https://localhost/x") is None  # no dot
    assert U.check_host("HTTPS://a.b") == "a.b"  # case-insensitive scheme


# canonicalize (ref :501-523)
def test_canonicalize():
    addr = "https://site.com/albums/page1"
    assert U.canonicalize("", addr) == ""
    assert U.canonicalize("//cdn.com/i.jpg", addr) == "https://cdn.com/i.jpg"
    assert U.canonicalize("/i.jpg", addr) == "https://site.com/i.jpg"
    assert U.canonicalize("i.jpg", addr) == "https://site.com/albums/i.jpg"
    assert U.canonicalize("http://x.com/i.jpg", addr) == "http://x.com/i.jpg"
    # bare starts_with("http") passes through (exact reference behavior)
    assert U.canonicalize("httpfoo.jpg", addr) == "httpfoo.jpg"
    # no-scheme addr → http default
    assert U.canonicalize("/a.png", "site.com/d/e") == "http://site.com/a.png"


# url_redirect_and_query_cleanup (ref :985-1003)
def test_query_cleanup():
    f = U.url_redirect_and_query_cleanup
    assert f("https://a.com/i.jpg") == "https://a.com/i.jpg"
    # last ?url= unwrap
    assert f("https://r.com/r%3Fx?url=https%3A%2F%2Fa.com%2Fi.jpg") == "https://a.com/i.jpg"
    # ?…& truncation
    assert f("https://a.com/i.jpg?w=100&h=50") == "https://a.com/i.jpg?w=100"
    # '?' with no '&' after → extension-aware '&' path; no '&' → keep all
    assert f("https://a.com/i.jpg?w=100") == "https://a.com/i.jpg?w=100"
    # no '?', '&' after last /…. extension
    assert f("https://a.com/i.jpg&s=1") == "https://a.com/i.jpg"


# url_image (ref :1006-1036)
def test_url_image():
    f = U.url_image
    assert f("'https://a.com/i.jpg') no-repaint") == "https://a.com/i.jpg"
    assert f("&quot;/x/i.png&quot;)") == "/x/i.png"
    assert f("ltr 'i.webp')") == "i.webp"
    assert f("data:image/png;base64,AAAA)") == "data:image/png;base64,AAAA"
    assert f("'font.woff2')") is None
    assert f("undefined)") is None
    assert f("{template})") is None
    assert f("$var)") is None
    assert f("'i.jpg#frag')") is None
    assert f("'i.jpg#xywh=0,0,5,5')") == "i.jpg"
    assert f("no close paren") is None


# css_image (ref :1039-1065)
def test_css_image():
    html = (
        "<style>.a{background:url('/bg.png')} "
        ".b{background-image: image-set(url('/one.jpg') 1x, url('/two.jpg') 2x)}"
        "</style>"
    )
    got = U.css_image(html, "https://s.com/p/page.html")
    assert got == {
        "https://s.com/bg.png",
        "https://s.com/one.jpg",
        "https://s.com/two.jpg",
    }


# percent_encode (ref :553-564)
def test_percent_encode():
    assert U.percent_encode("https://a.com/i p.jpg?x=1") == "https://a.com/i%20p.jpg?x=1"
    assert U.percent_encode("a~b") == "a%7Eb"  # reference encodes '~'
    assert U.percent_encode("火.jpg") == "%E7%81%AB.jpg"


# title pipeline (ref :205-211, :249-258)
def test_title_segments():
    assert U.pick_longest_title_segment("Short | The Longest Title Here - x") == \
        "The Longest Title Here"
    # tie → earliest segment in document order (Rust rsplit + last-max)
    assert U.pick_longest_title_segment("aaa-bbb") == "aaa"
    assert U.strip_page_suffix("Album Name Page 3") == "Album Name"
    assert U.strip_page_suffix("专辑第3页") == "专辑"
    assert U.strip_page_suffix("Name (2024)") == "Name"
    assert U.strip_page_suffix("Plain") == "Plain"


# attr_from_selector (ref :166-173)
def test_attr_from_selector():
    f = U.attr_from_selector
    assert f(None) == "src"
    assert f("img") == "src"
    assert f("div.photo img") == "src"
    assert f("div.mainleft > img[data-original]") == "data-original"
    assert f("figure.story-image img[alt]") == "alt"
    assert f('a[data-fancybox="gallery"][href]') == "href"
    assert f("div.entry-content img[file]") == "file"


# host_suffix_lookup (ref :65-80)
def test_host_lookup():
    cfg = [
        {"Site": "a.com, b.net", "Img": "img.x"},
        {"Site": "sub.c.org", "Img": "img.y"},
    ]
    assert U.host_suffix_lookup("www.a.com", cfg)["Img"] == "img.x"
    assert U.host_suffix_lookup("b.net", cfg)["Img"] == "img.x"
    assert U.host_suffix_lookup("deep.sub.c.org", cfg)["Img"] == "img.y"
    assert U.host_suffix_lookup("other.io", cfg) is None


# derive_filename (ref :580-614)
def test_derive_filename():
    f = U.derive_filename
    assert f("https://a.com/x/_-photo.jpg?s=1") == ("photo.jpg", "https://a.com/x/_-photo.jpg?s=1", "")
    assert f("https://a.com/img?url=https://b.com/real.png") == \
        ("real.png", "https://a.com/img?url=https://b.com/real.png", "")
    name, u, cap = f("https://a.com/noext | pretty.jpg")
    assert (name, u, cap) == ("pretty.jpg", "https://a.com/noext", "pretty.jpg")
    assert f("https://a.com/noext")[0] is None  # needs content-type
    assert f("no-slash-at-all")[0] is None


# ext_from_content_type (ref :715-734)
def test_content_type_ext():
    assert U.ext_from_content_type("image/jpeg", "pic") == "pic.jpeg"
    assert U.ext_from_content_type("image/svg+xml", "pic") == "pic.svg"
    assert U.ext_from_content_type("image/png; charset=x", "pic.png") == "pic.png"
    assert U.ext_from_content_type("text/html", "pic") == "pic.ext!"


# parse_data_uri (ref :906-949)
def test_data_uri():
    png1x1 = (
        "data:image/png;base64,iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAQAAAC1HAwCAAAA"
        "C0lEQVR42mNgYAAAAAMAASsJTYQAAAAASUVORK5CYII="
    )
    ext, raw = U.parse_data_uri(png1x1)
    assert ext == "png"
    assert raw.startswith(b"\x89PNG")
    ext2, raw2 = U.parse_data_uri("data:image/svg+xml,%3Csvg%3E%3C/svg%3E")
    assert ext2 == "svg"
    assert raw2 == b"<svg></svg>"
    assert U.parse_data_uri("data:image/png;base64,!!!") is None


# next_page_numeric (ref :480-491)
def test_next_page_numeric():
    assert U.next_page_numeric("https://s.com/list/3") == "https://s.com/list/4"
    assert U.next_page_numeric("https://s.com/list/3/") == "https://s.com/list/4"
    assert U.next_page_numeric("https://s.com/list") == "https://s.com/list/2"


# caption gate (ref :342-359)
def test_caption_gate():
    assert U.caption_if_image_ext("Nice Pic.JPG") == "Nice Pic.JPG"
    assert U.caption_if_image_ext("hello") is None
    assert U.caption_if_image_ext("  ") is None
    assert U.caption_if_image_ext("x.tiff") is None


@given(st.text(max_size=200), st.text(min_size=1, max_size=100))
def test_canonicalize_total(url, addr):
    # never raises; empty stays empty
    out = U.canonicalize(url, addr)
    assert isinstance(out, str)
    if url == "":
        assert out == ""


@given(st.text(max_size=200))
def test_url_image_total(s):
    r = U.url_image(s)
    assert r is None or isinstance(r, str)


def test_parse_srcset():
    assert U.parse_srcset("/a.jpg 1x, /b.jpg 2x") == ["/a.jpg", "/b.jpg"]
    assert U.parse_srcset("https://c.com/x.png 480w,https://c.com/y.png 800w") == \
        ["https://c.com/x.png", "https://c.com/y.png"]
    assert U.parse_srcset("/only.png") == ["/only.png"]
    assert U.parse_srcset(" , /a.png 1x, , /a.png 2x") == ["/a.png"]
    assert U.parse_srcset("") == []

"""Negative-path / edge vectors for the shared page extraction
(reference behaviors at /root/reference/src/main.rs cited per case)."""

from imgray.extract import parse_page, two_level_urls


def test_missing_title_fails_page():
    # ref :196-199 quit "Not a valid HTML page."
    p = parse_page("<html><body><img src='/a.png'></body></html>",
                   "https://h.example/p", None)
    assert not p.ok and p.reason == "no-title"


def test_no_images_no_albums_fails_page():
    # ref :246 quit (chain end in the rebuild)
    p = parse_page("<html><head><title>t.t</title></head><body></body></html>",
                   "https://h.example/p", None)
    assert not p.ok and p.reason == "no-images"


def test_unknown_json_kind_yields_nothing():
    # ref :158 `_ => ()` — unknown kind silently extracts nothing
    html = ("<html><head><title>x</title></head>"
            "<body><script>name [\"u\"]</script></body></html>")
    p = parse_page(html, "https://h.example/p",
                   {"Site": "h.example", "Img": "json: blob | name",
                    "Next": None, "Album": None})
    assert not p.ok and p.reason == "no-images"


def test_json_site_without_metakeywords_fails():
    html = ('<html><body><script>var data = '
            '{"photourl": "https:\\u002F\\u002Fc.com\\u002Fa.png"};'
            "</script></body></html>")
    p = parse_page(html, "https://h.example/p",
                   {"Site": "h.example", "Img": 'json: key | "photourl":',
                    "Next": "<script>", "Album": None})
    assert not p.ok and p.reason == "no-metaKeywords-title"


def test_album_without_any_href_dropped():
    # ref :389-395 would panic on missing a[href]; rebuild drops the album
    html = ("<html><head><title>list.x</title></head><body>"
            '<div class="albums"><span class="t">no link here</span></div>'
            "</body></html>")
    p = parse_page(html, "https://h.example/p",
                   {"Site": "h.example", "Img": "div.g img",
                    "Next": None, "Album": "div.albums span.t"})
    assert p.ok
    assert p.album_hrefs == []


def test_two_level_img_without_src_dropped():
    out = two_level_urls('<img class="big" alt="x.png">', "img.big",
                         "https://h.example/list")
    assert out == []


def test_data_uri_kept_in_urls():
    html = ("<html><head><title>t.t</title></head><body>"
            '<img src="data:image/png;base64,AAAA"></body></html>')
    p = parse_page(html, "https://h.example/p", None)
    assert p.ok
    assert ("data:image/png;base64,AAAA", "data") in p.urls


def test_empty_attr_counted_not_crashed():
    html = ("<html><head><title>t.t</title></head><body>"
            '<img src=""><img src="/ok.png"></body></html>')
    p = parse_page(html, "https://h.example/p", None)
    assert p.ok
    assert p.counters["empty_dup"] == 1
    assert ("https://h.example/ok.png", "html") in p.urls

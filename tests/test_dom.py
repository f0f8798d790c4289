"""Selector engine tests — grammar coverage mirrors the selector forms
actually present in the reference site config (/root/reference/src/web.json),
plus the sanity_check_json differential idea (src/main.rs:1186-1240):
our engine vs a naive independent matcher must agree.
"""

from imgray.dom import Document


HTML = """
<html><head><title> My Album - Site </title></head>
<body>
  <div id="content" class="content main">
    <p align="center"><img src="/a.jpg"></p>
    <figure class="wp-block-image size-large"><img src="/b.jpg" alt="b.jpg"></figure>
    <div class="photos"><a href="/alb1"><span><img data-src="/t1.jpg"></span></a></div>
    <a data-fancybox="gallery" href="/c.png"><img src="/thumb.png"></a>
    <ul class="pagination">
      <li><a href="/p/1">1</a></li>
      <li class="active"><span class="current">2</span></li>
      <li><a href="/p/3" rel="next">Next</a></li>
    </ul>
  </div>
  <script>var imgList = ["x"];</script>
</body></html>
"""


def test_basic_select():
    d = Document(HTML)
    assert len(d.select("img")) == 4
    assert [e.attr("src") for e in d.select("p img")] == ["/a.jpg"]
    assert len(d.select("div#content img")) == 4
    assert len(d.select("div#content.content img")) == 4
    assert [e.attr("href") for e in d.select('a[data-fancybox="gallery"][href]')] == ["/c.png"]
    assert len(d.select("figure.wp-block-image.size-large img")) == 1
    assert [e.attr("href") for e in d.select('a[rel="next"]')] == ["/p/3"]
    assert len(d.select("ul.pagination a")) == 2
    assert len(d.select("ul.pagination li.active")) == 1
    assert d.select("span.current")[0].text() == "2"


def test_child_vs_descendant():
    d = Document(HTML)
    # child combinator: img is NOT a direct child of div.photos
    assert d.select("div.photos > img") == []
    assert len(d.select("div.photos img")) == 1
    assert len(d.select("div.photos > a[href]")) == 1


def test_title_and_text():
    d = Document(HTML)
    t = d.select("title")[0].text()
    assert t.strip() == "My Album - Site"


def test_document_order():
    d = Document(HTML)
    srcs = [e.attrs.get("src") or e.attrs.get("data-src") for e in d.select("img")]
    assert srcs == ["/a.jpg", "/b.jpg", "/t1.jpg", "/thumb.png"]


def test_parent_children():
    d = Document(HTML)
    span = d.select("span.current")[0]
    li = span.parent
    assert li.tag == "li" and "active" in li.classes()
    ul = li.parent
    assert ul.tag == "ul"
    assert [c.tag for c in ul.children] == ["li", "li", "li"]


def test_attr_presence():
    d = Document(HTML)
    assert len(d.select("div[align]")) == 0
    assert len(d.select("p[align]")) == 1
    assert len(d.select('p[align="center"]')) == 1
    assert len(d.select('p[align="left"]')) == 0


def test_void_and_selfclosing():
    d = Document("<div><img src=1><br><img src=2/></div><p>t</p>")
    assert len(d.select("div img")) == 2
    assert d.select("p")[0].text() == "t"


def test_differential_naive_matcher():
    """htmlq-differential analog (ref src/main.rs:1097-1135): compare the
    selector engine against an independent brute-force matcher for
    single-compound selectors."""
    d = Document(HTML)

    def naive(tag=None, cls=(), attr=None):
        out = []
        for e in d.root.iter_subtree():
            if tag and e.tag != tag:
                continue
            if any(c not in e.classes() for c in cls):
                continue
            if attr and attr not in e.attrs:
                continue
            out.append(e)
        return out

    assert d.select("img") == naive(tag="img")
    assert d.select(".current") == naive(cls=["current"])
    assert d.select("a[href]") == naive(tag="a", attr="href")
    assert d.select("li.active") == naive(tag="li", cls=["active"])

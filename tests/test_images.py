"""Image-text pair harvest: attribute guards, resolution, og rows."""

from ocrd_segment_spark.operators.images import image_pairs

_HTML = (
    '<html><head><meta property="og:image" content="/hero.jpg">'
    '<meta property="og:title" content="The Hero"></head><body>'
    '<img src="https://cdn.example.com/a.png" alt="A  nice\n cat">'
    '<IMG ALT="rel" SRC="/img/b.gif"/>'
    '<img data-src="lazy.png" alt="lazy">'
    '<img srcset="x.png 1x" alt="sets">'
    '<img src="//proto.example.org/c.webp">'
    '<img src="mailto:nope">'
    "</body></html>"
)


def _rows(spark, html, url="https://Site.Example.org/page"):
    df = spark.createDataFrame([(url, html)], "url string, html string")
    return [
        (r.source, r.img_idx, r.image_url, r.alt_text)
        for r in image_pairs(df).orderBy("source", "img_idx").collect()
    ]


def test_harvest_resolution_and_guards(spark):
    got = _rows(spark, _HTML)
    assert got == [
        # alt whitespace-normalized; absolute src kept
        ("img", 0, "https://cdn.example.com/a.png", "A nice cat"),
        # uppercase attrs, rooted path rebased on the lowercased origin
        ("img", 1, "https://site.example.org/img/b.gif", "rel"),
        # data-src (idx 2) and srcset (idx 3) never match the guard;
        # protocol-relative (idx 4) gains the page scheme; mailto drops
        ("img", 4, "https://proto.example.org/c.webp", None),
        ("og", None, "https://site.example.org/hero.jpg", "The Hero"),
    ]


def test_empty_alt_is_null(spark):
    got = _rows(spark, '<img src="/x.png" alt="">')
    assert got == [("img", 0, "https://site.example.org/x.png", None)]


def test_no_images_no_rows(spark):
    assert _rows(spark, "<p>text only</p>") == []


def test_imgx_tag_never_matches(spark):
    assert _rows(spark, '<imgx src="/x.png">') == []

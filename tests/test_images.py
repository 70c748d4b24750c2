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


def test_figure_pairs_and_caption_screen(spark):
    from ocrd_segment_spark.operators.images import (
        figure_pairs,
        with_caption_quality,
    )

    html = (
        '<figure><img src="/f.png">'
        "<figcaption>A <b>scenic</b>\n view</figcaption></figure>"
        '<figure><img src="/g.png"></figure>'  # no caption -> no row
        '<figure><figcaption>no img</figcaption></figure>'
    )
    df = spark.createDataFrame(
        [("https://h.example.org/p", html)], "url string, html string"
    )
    got = figure_pairs(df).collect()
    assert len(got) == 1
    assert got[0].image_url == "https://h.example.org/f.png"
    assert got[0].alt_text == "A scenic view" and got[0].source == "fig"

    screened = {
        r.alt_text: r.caption_ok
        for r in with_caption_quality(
            spark.createDataFrame(
                [
                    ("u", "img", 0, "https://x/i.png", a)
                    for a in [
                        "A small red boat on the lake",
                        "IMG_1234",
                        "dsc 0042",
                        "logo",
                        "photo.jpg",
                        "tiny",
                        None,
                    ]
                ],
                "url string, source string, img_idx int,"
                " image_url string, alt_text string",
            )
        ).collect()
    }
    assert screened["A small red boat on the lake"] is True
    assert screened["IMG_1234"] is False
    assert screened["dsc 0042"] is False
    assert screened["logo"] is False
    assert screened["photo.jpg"] is False
    assert screened["tiny"] is False  # 4 chars < 5 floor
    assert screened[None] is False


def test_figure_custom_element_never_matches(spark):
    # <figure-card> must not open a figure block (review-pass finding:
    # it would pair a foreign src with a later real figcaption)
    html = (
        '<figure-card><img src="/ad.png"></figure-card>'
        '<figure><img src="/photo.png">'
        "<figcaption>A lake</figcaption></figure>"
    )
    from ocrd_segment_spark.operators.images import figure_pairs

    df = spark.createDataFrame(
        [("https://h.example.org/p", html)], "url string, html string"
    )
    got = figure_pairs(df).collect()
    assert len(got) == 1
    assert got[0].image_url == "https://h.example.org/photo.png"
    assert got[0].alt_text == "A lake"

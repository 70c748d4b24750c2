"""HTML table extraction: frozen grammar, cell cleanup, markdown."""

from ocrd_segment_spark.operators.tables import table_cells, tables_markdown

_HTML = (
    '<TABLE class="z"><tr><TH> Name </TH><th>Qty&nbsp;&amp;&#39;s</th></tr>'
    '<tr><td><b>a|b</b></td><td colspan="2">2</td></tr>'
    "<tr></tr>"
    "<tr><td>only</td></tr></TABLE>"
    "<p>no table here</p>"
    "<table><tr><td>x&lt;y</td></tr></table>"
)


def _cells(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id int, html string")
    return table_cells(df).orderBy("table_idx", "row_idx", "col_idx")


def test_cell_grid(spark):
    got = [
        (r.table_idx, r.row_idx, r.col_idx, r.is_header, r.cell_text)
        for r in _cells(spark, _HTML).collect()
    ]
    assert got == [
        (0, 0, 0, True, "Name"),
        (0, 0, 1, True, "Qty &'s"),  # nbsp + amp + #39 decoded
        (0, 1, 0, False, "a|b"),  # inner <b> stripped
        (0, 1, 1, False, "2"),  # colspan ignored, ordinal col
        (0, 3, 0, False, "only"),  # empty <tr> leaves a row_idx gap
        (1, 0, 0, False, "x<y"),
    ]


def test_no_table_page(spark):
    assert _cells(spark, "<p>plain</p>").count() == 0


def test_whitespace_normalized(spark):
    got = _cells(
        spark, "<table><tr><td>  a\n\t b c  </td></tr></table>"
    ).collect()
    assert got[0].cell_text == "a b c"


def test_amp_decoded_last(spark):
    # &amp;lt; must decode to literal '&lt;', not '<'
    got = _cells(spark, "<table><tr><td>&amp;lt;</td></tr></table>").collect()
    assert got[0].cell_text == "&lt;"


def test_nested_table_truncates_outer(spark):
    # regular-grammar limitation, frozen: the inner close ends the match
    html = "<table><tr><td><table><tr><td>in</td></tr></table></td></tr></table>"
    got = _cells(spark, html).collect()
    assert [r.cell_text for r in got] == ["in"]


def test_markdown(spark):
    md = {
        r.table_idx: r
        for r in tables_markdown(_cells(spark, _HTML)).collect()
    }
    assert md[0].n_rows == 3 and md[0].n_cols == 2
    assert md[0].markdown == (
        "| Name | Qty &'s |\n"
        "| --- | --- |\n"
        "| a\\|b | 2 |\n"
        "| only |"
    )
    assert md[1].markdown == "| x<y |\n| --- |"
    assert md[1].n_rows == 1 and md[1].n_cols == 1


def test_markdown_headerless_first_row_is_min(spark):
    # empty first <tr>: header is the first NON-EMPTY row
    html = "<table><tr></tr><tr><td>h</td></tr><tr><td>b</td></tr></table>"
    r = tables_markdown(_cells(spark, html)).collect()[0]
    assert r.markdown == "| h |\n| --- |\n| b |"


def test_list_items_and_markdown(spark):
    from ocrd_segment_spark.operators.tables import list_items, lists_markdown

    html = (
        "<ul><li>alpha &amp; beta</li><li><b>bold</b> item</li></ul>"
        '<OL start="3"><LI>one</LI><li>two</li></OL>'
        "<p>filler</p>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id int, html string")
    items = list_items(df).orderBy("list_idx", "item_idx").collect()
    assert [(r.list_idx, r.item_idx, r.ordered, r.item_text) for r in items] == [
        (0, 0, False, "alpha & beta"),
        (0, 1, False, "bold item"),
        (1, 0, True, "one"),
        (1, 1, True, "two"),
    ]
    md = {
        r.list_idx: r.markdown
        for r in lists_markdown(list_items(df)).collect()
    }
    assert md[0] == "- alpha & beta\n- bold item"
    # numbering is the frozen 1-based ordinal (the start attr is
    # presentation — ignored, stated)
    assert md[1] == "1. one\n2. two"


def test_nested_list_truncates_outer(spark):
    from ocrd_segment_spark.operators.tables import list_items

    html = "<ul><li>outer<ul><li>inner</li></ul></li></ul>"
    df = spark.createDataFrame([(1, html)], "doc_id int, html string")
    got = [r.item_text for r in list_items(df).collect()]
    # regular-grammar limitation: the inner close ends the outer block;
    # inner tags strip to '' (the table-cell cleanup chain), so the
    # nested item's text fuses into the outer item
    assert got == ["outerinner"]


def test_custom_elements_never_match(spark):
    # whole-tag discipline: custom elements sharing the prefix must
    # not open a block (review-pass finding)
    html = (
        "<table-card><tr-x><td-y>nope</td-y></tr-x></table-card>"
        "<table><tr><td>yes</td></tr></table>"
        "<ul-menu><li-item>no</li-item></ul-menu>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id int, html string")
    got = [r.cell_text for r in table_cells(df).collect()]
    assert got == ["yes"]
    from ocrd_segment_spark.operators.tables import list_items

    assert list_items(df).count() == 0

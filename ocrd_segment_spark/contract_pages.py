"""Contract queries + DuckDB oracles: page-content analysis layer
(soft-404 detection, HTML table extraction, script-mix stats,
confusable hosts, heading outlines).

Same discipline as the sibling contract modules: the Spark side runs
the SHIPPED operator over a fixture synthesized in SQL from the
driver's tables; the oracle restates the frozen semantics in portable
SQL (dual derivation, not expected-output, wherever the rule is
SQL-expressible) with identical aliases, double-cast literals, and
``AS MATERIALIZED`` on multiply-referenced CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .contract_ml import _t
from .operators.softerrors import (
    BODY_PHRASES,
    BODY_WINDOW_CHARS,
    SOFT404_MAX_CHARS,
    TITLE_PHRASES,
)

# ---------------------------------------------------------------------------
# soft-404 / error-page detection (operators/softerrors.py)
# ---------------------------------------------------------------------------

# Seven page shapes: clean long page, classic 404 title + tiny body,
# long article that MENTIONS error 404 (body arm fires, tiny arm
# saves it), NULL title + tiny error body, title hit over an empty
# body, NULL body, and a near-miss title ('Results found' must not
# match 'not found' — instr is substring, 'found' alone is not a
# phrase). Dialect-neutral fixture SQL: runs verbatim in both engines.

_SE_TITLE = """CASE doc_id % 7
  WHEN 0 THEN 'Home'
  WHEN 1 THEN '404 Not Found'
  WHEN 2 THEN 'Article about HTTP status codes'
  WHEN 3 THEN NULL
  WHEN 4 THEN 'Page Not Found - Example'
  WHEN 5 THEN 'Support'
  ELSE 'Results found for query' END"""

_SE_TEXT = """CASE doc_id % 7
  WHEN 0 THEN text
  WHEN 1 THEN 'The page you requested was not found.'
  WHEN 2 THEN concat('Mentioning error 404 in a long article. ', repeat('x ', 300))
  WHEN 3 THEN 'File not found on this server'
  WHEN 4 THEN ''
  WHEN 5 THEN NULL
  ELSE 'Short note' END"""

_SE_HOST = "concat('h', cast(doc_id % 5 as string))"


def _se_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"{_SE_HOST} as host",
        f"{_SE_TITLE} as title",
        f"{_SE_TEXT} as text",
    )


def q_soft404_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 detection (operators/softerrors.with_soft404): frozen
    phrase heuristic — title arm aggressive, body arm gated on a tiny
    (<512 char) body. Pure scan-stage instr probes, zero Python, zero
    shuffle."""
    from .operators.softerrors import with_soft404

    return with_soft404(_se_pages(spark, sf_dir)).select(
        "doc_id", "soft404_title_hit", "soft404_body_hit", "is_soft404"
    )


def _se_probe_sql() -> str:
    t_hit = " OR ".join(
        f"instr(lt, '{p}') > 0" for p in TITLE_PHRASES
    )
    b_hit = " OR ".join(
        f"instr(hb, '{p}') > 0" for p in BODY_PHRASES
    )
    return f"""
WITH pages AS MATERIALIZED (
  SELECT doc_id, {_SE_HOST} AS host,
         {_SE_TITLE} AS title, {_SE_TEXT} AS body
  FROM documents
), probes AS MATERIALIZED (
  SELECT doc_id, host,
         lower(coalesce(title, '')) AS lt,
         lower(substring(coalesce(body, ''), 1, {BODY_WINDOW_CHARS})) AS hb,
         length(coalesce(body, '')) AS n
  FROM pages
), flags AS MATERIALIZED (
  SELECT doc_id, host,
         ({t_hit}) AS soft404_title_hit,
         ({b_hit}) AS soft404_body_hit,
         (({t_hit}) OR (({b_hit}) AND n < {SOFT404_MAX_CHARS})) AS is_soft404
  FROM probes
)"""


O_SOFT404_FLAGS = (
    _se_probe_sql()
    + """
SELECT doc_id, soft404_title_hit, soft404_body_hit, is_soft404 FROM flags
"""
)


def q_soft404_host_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host soft-404 rate (operators/softerrors.soft404_host_rates):
    the frontier's link-rot prior. One partial-aggregable group on
    host, round-6 double rate."""
    from .operators.softerrors import soft404_host_rates, with_soft404

    return soft404_host_rates(with_soft404(_se_pages(spark, sf_dir)))


O_SOFT404_HOST_RATES = (
    _se_probe_sql()
    + """
SELECT host,
       count(*) AS n_pages,
       sum(CASE WHEN is_soft404 THEN 1 ELSE 0 END) AS n_soft404,
       round(sum(CASE WHEN is_soft404 THEN 1 ELSE 0 END)
             * CAST(1.0 AS DOUBLE) / count(*), 6) AS soft404_rate
FROM flags
GROUP BY host
"""
)

# ---------------------------------------------------------------------------
# HTML table extraction (operators/tables.py)
# ---------------------------------------------------------------------------

# Four page shapes: a plain th/td table with an &amp; entity; a
# MIXED-CASE table with attributes, a pipe char in a cell, ragged
# widths, and an EMPTY <tr> (row_idx gap); a page with no table at
# all; and a two-table page exercising &lt; &nbsp; &#39; decode and a
# header-only second row layout. Dialect-neutral fixture SQL.

_TB_HTML = """concat('<html><body><h1>T</h1>',
  CASE doc_id % 4
   WHEN 0 THEN concat('<table><tr><th>K</th><th>V</th></tr><tr><td>a&amp;b</td><td>', cast(doc_id as string), '</td></tr></table>')
   WHEN 1 THEN '<TABLE id="x"><TR><TD> spaced
   text </TD><TD>p|q</TD></TR><tr></tr><tr><td>tail</td></tr></TABLE>'
   WHEN 2 THEN '<p>no tables</p>'
   ELSE '<table><tr><td>one</td></tr></table><div></div><table><tr><th>h&lt;i</th></tr><tr><td>&nbsp;z&#39;</td></tr></table>'
  END, '</body></html>')"""


def _tb_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_TB_HTML} as html"
    )


def q_html_table_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML table extraction (operators/tables.table_cells): frozen
    regular grammar — tables/rows/cells via chained
    regexp_extract_all + posexplode, tag-strip + 5-entity decode +
    whitespace-normalize per cell. Scan-stage column math, zero
    Python; ordinals cast long at the contract edge only."""
    from .operators.tables import table_cells

    return table_cells(_tb_pages(spark, sf_dir)).selectExpr(
        "doc_id",
        "cast(table_idx as long) as table_idx",
        "cast(row_idx as long) as row_idx",
        "cast(col_idx as long) as col_idx",
        "is_header",
        "cell_text",
    )


# the frozen cleanup chain, restated: strip tags, decode the 5
# entities (&amp; LAST), collapse the explicit whitespace class
# (real chars injected — DuckDB literals do not process backslashes),
# trim
_WS_DUCK = "[ \t\n\r\f\x0b ]+"
_CLEAN_DUCK = (
    "trim(regexp_replace("
    "replace(replace(replace(replace(replace(replace("
    "regexp_replace(cell, '(?s)<[^>]*>', '', 'g'),"
    " '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'),"
    " '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),"
    f" '{_WS_DUCK}', ' ', 'g'))"
)

from .operators.tables import (  # noqa: E402  (oracle single-source)
    CELL_BLOCK as _CELL_PAT,
    ITEM_BLOCK as _ITEM_PAT,
    LIST_BLOCK as _LIST_PAT,
    ROW_BLOCK as _ROW_PAT,
    TABLE_BLOCK as _TABLE_PAT,
)

_TB_CELLS_CTE = f"""
WITH pages AS MATERIALIZED (
  SELECT doc_id, {_TB_HTML} AS html FROM documents
), tbls AS (
  SELECT doc_id, generate_subscripts(l, 1) - 1 AS table_idx, unnest(l) AS tbl
  FROM (SELECT doc_id, regexp_extract_all(html, '{_TABLE_PAT}', 0) AS l FROM pages)
), rws AS (
  SELECT doc_id, table_idx, generate_subscripts(r, 1) - 1 AS row_idx, unnest(r) AS rowb
  FROM (SELECT doc_id, table_idx, regexp_extract_all(tbl, '{_ROW_PAT}', 1) AS r FROM tbls)
), rawcells AS (
  SELECT doc_id, table_idx, row_idx, generate_subscripts(c, 1) - 1 AS col_idx, unnest(c) AS cell
  FROM (SELECT doc_id, table_idx, row_idx, regexp_extract_all(rowb, '{_CELL_PAT}', 0) AS c FROM rws)
), cells AS MATERIALIZED (
  SELECT doc_id, table_idx, row_idx, col_idx,
         lower(substring(cell, 1, 3)) = '<th' AS is_header,
         {_CLEAN_DUCK} AS cell_text
  FROM rawcells
)"""

O_HTML_TABLE_CELLS = (
    _TB_CELLS_CTE
    + """
SELECT doc_id, table_idx, row_idx, col_idx, is_header, cell_text FROM cells
"""
)


def q_tables_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GitHub pipe-table serialization (operators/tables
    .tables_markdown): header = first non-empty row, separator sized
    to its width, pipes escaped. Two partial-aggregable id-grain
    groups — zero skew (no key hotter than the biggest page)."""
    from .operators.tables import table_cells, tables_markdown

    return tables_markdown(
        table_cells(_tb_pages(spark, sf_dir))
    ).selectExpr(
        "doc_id",
        "cast(table_idx as long) as table_idx",
        "cast(n_rows as long) as n_rows",
        "n_cols",
        "markdown",
    )


O_TABLES_MARKDOWN = (
    _TB_CELLS_CTE
    + r"""
, esc AS (
  SELECT doc_id, table_idx, row_idx, col_idx,
         replace(cell_text, '|', '\|') AS e FROM cells
), lines AS MATERIALIZED (
  SELECT doc_id, table_idx, row_idx,
         '| ' || string_agg(e, ' | ' ORDER BY col_idx) || ' |' AS line,
         count(*) AS nc
  FROM esc GROUP BY doc_id, table_idx, row_idx
), hdr AS (
  SELECT doc_id, table_idx, min(row_idx) AS r0
  FROM lines GROUP BY doc_id, table_idx
)
SELECT l.doc_id, l.table_idx,
       count(*) AS n_rows,
       max(CASE WHEN l.row_idx = h.r0 THEN l.nc END) AS n_cols,
       max(CASE WHEN l.row_idx = h.r0 THEN l.line END)
       || chr(10) || '|'
       || repeat(' --- |', CAST(max(CASE WHEN l.row_idx = h.r0 THEN l.nc END) AS INTEGER))
       || CASE WHEN count(*) > 1
               THEN chr(10) || string_agg(
                      CASE WHEN l.row_idx <> h.r0 THEN l.line END,
                      chr(10) ORDER BY l.row_idx)
               ELSE '' END AS markdown
FROM lines l JOIN hdr h ON l.doc_id = h.doc_id AND l.table_idx = h.table_idx
GROUP BY l.doc_id, l.table_idx
"""
)

# ---------------------------------------------------------------------------
# Unicode script mix + confusables (operators/scriptmix.py)
# ---------------------------------------------------------------------------

# Eight text shapes: driver English text; Russian; a Latin text with
# Cyrillic homoglyph 'а' (U+0430) substituted into words (the spoof —
# mixed_script + confusable_pairs both fire); Chinese; Japanese
# han+kana; Greek; digits/punctuation only (n_letters = 0 → NULL
# main); Korean-with-Latin mix above the 20-letter floor. The oracle
# rebuilds every count from the SAME SCRIPT_CLASSES literals the
# operator ships — one source of truth for the frozen ranges.

_SM_TEXT = """CASE doc_id % 8
  WHEN 0 THEN text
  WHEN 1 THEN 'Съешь же ещё этих мягких французских булок да выпей чаю'
  WHEN 2 THEN 'Login to pаypаl com and verify your аccount bаlаnce now plеase'
  WHEN 3 THEN '中文网页的正文内容提取质量评估与重复检测流程说明文档'
  WHEN 4 THEN '日本語のテキストは漢字とかなが混ざります。ウェブ抽出の品質。'
  WHEN 5 THEN 'Η γρήγορη καφέ αλεπού πηδά πάνω από το τεμπέλικο σκυλί'
  WHEN 6 THEN '12345 67890 !!! ??? ---'
  ELSE concat('한국어 문서 품질 평가 파이프라인 테스트 문장입니다 ', 'web quality check line ', cast(doc_id as string))
  END"""


def q_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script-mix stats (operators/scriptmix): eight frozen
    BMP block classes, first-declared argmax tie-break, 20-letter
    floor on the mixed flag, Latin-Cyrillic confusable adjacency
    count. Nine regexp_count probes, zero Python, zero shuffle."""
    from .operators.scriptmix import script_mix_summary

    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_SM_TEXT} as text"
    )
    return script_mix_summary(docs)


def _o_script_mix() -> str:
    from .operators.scriptmix import (
        CONFUSABLE_PAIR,
        MIN_LETTERS,
        MIXED_MAX_MAIN,
        SCRIPT_CLASSES,
    )

    cnts = ",\n         ".join(
        f"len(regexp_extract_all(t, '{cls}')) AS n_{name}"
        for name, cls in SCRIPT_CLASSES
    )
    letters = " + ".join(f"n_{name}" for name, _ in SCRIPT_CLASSES)
    mx = "greatest(" + ", ".join(f"n_{n}" for n, _ in SCRIPT_CLASSES) + ")"
    main = (
        "CASE WHEN n_letters = 0 THEN NULL "
        + " ".join(
            f"WHEN n_{name} = mx THEN '{name}'"
            for name, _ in SCRIPT_CLASSES
        )
        + " END"
    )
    return f"""
WITH src AS MATERIALIZED (
  SELECT doc_id, coalesce({_SM_TEXT}, '') AS t FROM documents
), cnt AS MATERIALIZED (
  SELECT doc_id, t,
         {cnts}
  FROM src
), summed AS MATERIALIZED (
  SELECT doc_id, t, {letters} AS n_letters, {mx} AS mx,
         n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew, n_han, n_kana, n_hangul
  FROM cnt
)
SELECT doc_id, n_letters,
       {main} AS main_script,
       CASE WHEN n_letters > 0
            THEN round(mx * CAST(1.0 AS DOUBLE) / n_letters, 6) END AS main_fraction,
       (n_letters >= {MIN_LETTERS}
        AND mx * CAST(1.0 AS DOUBLE) / n_letters < CAST({MIXED_MAX_MAIN} AS DOUBLE)) AS mixed_script,
       len(regexp_extract_all(t, '{CONFUSABLE_PAIR}')) AS confusable_pairs
FROM summed
"""


O_SCRIPT_MIX = _o_script_mix()


# ---------------------------------------------------------------------------
# IDN-spoof host flags (functions/urls.with_host_script_flags)
# ---------------------------------------------------------------------------

# Six host shapes: clean ASCII, punycode second-level label, Cyrillic
# homoglyph label (the spoof), PURE-Cyrillic IDN (legit — must NOT
# flag confusable), punycode in a middle label, NULL host.

_HC_HOST = """CASE doc_id % 6
  WHEN 0 THEN 'example.com'
  WHEN 1 THEN 'XN--80ak6aa92e.com'
  WHEN 2 THEN concat('p', 'а', 'yp', 'а', 'l.com')
  WHEN 3 THEN 'почта.рф'
  WHEN 4 THEN 'sub.xn--p1ai.org'
  ELSE NULL END"""


def q_host_confusables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDN-spoof host screens (functions/urls.with_host_script_flags):
    per-label punycode ACE prefix + Latin/Cyrillic mixed-label
    confusable flag. split + exists higher-order fn, zero shuffle."""
    from .functions.urls import with_host_script_flags

    hosts = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_HC_HOST} as host"
    )
    return with_host_script_flags(hosts).select(
        "doc_id", "host", "is_punycode", "confusable_host"
    )


O_HOST_CONFUSABLES = f"""
WITH hosts AS MATERIALIZED (
  SELECT doc_id, {_HC_HOST} AS host FROM documents
), lab AS MATERIALIZED (
  SELECT doc_id, host,
         string_split(lower(coalesce(host, '')), '.') AS ls
  FROM hosts
)
SELECT doc_id, host,
       len(list_filter(ls, x -> x LIKE 'xn--%')) > 0 AS is_punycode,
       len(list_filter(ls,
           x -> regexp_matches(x, '[a-z]')
                AND regexp_matches(x, '[Ѐ-ӿ]'))) > 0 AS confusable_host
FROM lab
"""


# ---------------------------------------------------------------------------
# heading outline (operators/outline.py)
# ---------------------------------------------------------------------------

# Four page shapes: a well-nested h1>h2>h3 tree; a tag-soup page with
# MIXED-CASE tags, attributes, entities, and a level RESET (h1 after
# h3 — later headings must re-parent to the new h1, skipping the
# stale h2); a page with no headings; a deep-skip page (h1 then h4 —
# parent is the h1 despite the gap).

_HO_HTML = """concat('<html><body>',
  CASE doc_id % 4
   WHEN 0 THEN concat('<h1>Doc ', cast(doc_id as string), '</h1><p>x</p><h2>Alpha</h2><h3>A1</h3><h3>A2</h3><h2>Beta</h2>')
   WHEN 1 THEN '<H1 id="t">Top&amp;Co</H1><h3>deep  first</h3><H2>mid</H2><h3>child</h3><h1>Reset</h1><h3>re-child</h3>'
   WHEN 2 THEN '<p>no headings at all</p>'
   ELSE '<h1>Solo</h1><h4>leap</h4><h4>leap2</h4>'
  END, '</body></html>')"""


def q_heading_outline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heading outline (operators/outline.heading_outline): frozen
    h1-h6 harvest, shared cell-cleanup chain, parent = closest
    preceding smaller-level heading via ONE page-keyed window (five
    running-max frames, -1 sentinel). Zero Python, zero skew."""
    from .operators.outline import heading_outline

    pages = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_HO_HTML} as html"
    )
    return heading_outline(pages).selectExpr(
        "doc_id",
        "cast(seq as long) as seq",
        "cast(level as long) as level",
        "heading",
        "cast(parent_seq as long) as parent_seq",
    )


def _o_heading_outline() -> str:
    from .operators.outline import HEADING_BLOCK as hpat_src

    hpat = hpat_src
    lasts = ",\n         ".join(
        f"coalesce(max(CASE WHEN level = {k} THEN seq END) OVER w, -1) AS l{k}"
        for k in range(1, 6)
    )
    parent = (
        "CASE level WHEN 1 THEN -1 "
        + " ".join(
            "WHEN {lvl} THEN greatest({args})".format(
                lvl=lvl,
                args=", ".join(f"l{k}" for k in range(1, lvl)),
            )
            for lvl in range(2, 7)
        )
        + " END"
    )
    return f"""
WITH pages AS MATERIALIZED (
  SELECT doc_id, {_HO_HTML} AS html FROM documents
), hs AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(l, 1) - 1 AS seq, unnest(l) AS cell
  FROM (SELECT doc_id, regexp_extract_all(html, '{hpat}', 0) AS l FROM pages)
), lv AS MATERIALIZED (
  SELECT doc_id, seq,
         CAST(substring(cell, 3, 1) AS BIGINT) AS level,
         {_CLEAN_DUCK} AS heading
  FROM hs
), par AS MATERIALIZED (
  SELECT doc_id, seq, level, heading,
         {lasts}
  FROM lv
  WINDOW w AS (PARTITION BY doc_id ORDER BY seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT doc_id, seq, level, heading,
       nullif({parent}, -1) AS parent_seq
FROM par
"""


O_HEADING_OUTLINE = _o_heading_outline()


# ---------------------------------------------------------------------------
# publish-date harvest (operators/headmeta.with_publish_date)
# ---------------------------------------------------------------------------

# Seven page shapes: og-style meta (property-first), meta with the
# REVERSED attribute order, meta PLUS a <time> tag (meta must win),
# <time datetime> alone (mixed case), JSON-LD datePublished with
# spaced colon, an EMPTY meta content that must fall through to the
# jsonld arm, and a page with no declaration at all (NULL/NULL).

_PD_HTML = """concat('<html><head>',
  CASE doc_id % 7
   WHEN 0 THEN '<meta property="article:published_time" content="2026-01-15T08:30:00Z">'
   WHEN 1 THEN '<meta content=" 2025-12-01 " property="article:published_time">'
   WHEN 2 THEN concat('<meta property="article:published_time" content="2026-02-02">',
                      '<time datetime="2020-01-01">old</time>')
   WHEN 3 THEN '<TIME class="d" DATETIME="2024-07-04T12:00:00">x</TIME>'
   WHEN 4 THEN concat('<script type="application/ld+json">{"@type":"Article", "datePublished" : "2023-11-11"}</script>')
   WHEN 5 THEN concat('<meta property="article:published_time" content="">',
                      '<script type="application/ld+json">{"datePublished":"2022-03-03"}</script>')
   ELSE '<title>plain</title>'
  END, '</head><body><p>b</p></body></html>')"""


def q_publish_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish-date harvest (operators/headmeta.with_publish_date):
    frozen precedence meta > time > jsonld, trimmed strings, empty
    declarations fall through. Three scan-stage regexp probes."""
    from .operators.headmeta import with_publish_date

    pages = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_PD_HTML} as html"
    )
    return with_publish_date(pages).select(
        "doc_id", "published", "published_source"
    )


# oracle restates the three probes with DuckDB regexp_extract; the
# jsonld whitespace class carries REAL tab/newline chars (DuckDB
# literals do not process backslashes)
_PD_META_A = (
    "<[Mm][Ee][Tt][Aa][^>]*"
    '[Pp][Rr][Oo][Pp][Ee][Rr][Tt][Yy]="article:published_time"'
    '[^>]*[Cc][Oo][Nn][Tt][Ee][Nn][Tt]="([^"]*)"'
)
_PD_META_B = (
    '<[Mm][Ee][Tt][Aa][^>]*[Cc][Oo][Nn][Tt][Ee][Nn][Tt]="([^"]*)"'
    '[^>]*[Pp][Rr][Oo][Pp][Ee][Rr][Tt][Yy]="article:published_time"'
)
_PD_TIME = '<[Tt][Ii][Mm][Ee][^>]*[Dd][Aa][Tt][Ee][Tt][Ii][Mm][Ee]="([^"]*)"'
_PD_JSONLD = '"datePublished"[ \t\n\r]*:[ \t\n\r]*"([^"]*)"'


def _o_publish_date() -> str:
    jsonld_real = _PD_JSONLD.replace("\\t", "\t").replace("\\n", "\n").replace("\\r", "\r")
    def x(pat):
        return f"nullif(trim(regexp_extract(h, '{pat}', 1)), '')"
    meta = f"coalesce({x(_PD_META_A)}, {x(_PD_META_B)})"
    t = x(_PD_TIME)
    j = x(jsonld_real)
    return f"""
WITH pages AS MATERIALIZED (
  SELECT doc_id, {_PD_HTML} AS h FROM documents
), probes AS MATERIALIZED (
  SELECT doc_id, {meta} AS m, {t} AS t, {j} AS j FROM pages
)
SELECT doc_id,
       coalesce(m, t, j) AS published,
       CASE WHEN m IS NOT NULL THEN 'meta'
            WHEN t IS NOT NULL THEN 'time'
            WHEN j IS NOT NULL THEN 'jsonld' END AS published_source
FROM probes
"""


O_PUBLISH_DATE = _o_publish_date()


# ---------------------------------------------------------------------------
# list extraction (operators/tables.list_items / lists_markdown)
# ---------------------------------------------------------------------------

# Four page shapes: a plain <ul> with entities and inner markup; a
# MIXED-CASE <OL> with attributes (1-based numbering); a page with no
# lists; and a two-list page (ul then ol) with a pipe char kept
# verbatim (list markdown does not escape pipes — no table grammar).

_LI_HTML = """concat('<html><body>',
  CASE doc_id % 4
   WHEN 0 THEN '<ul><li>alpha &amp; beta</li><li><b>bold</b> item</li></ul>'
   WHEN 1 THEN concat('<OL start="3" class="x"><LI>first ', cast(doc_id as string), '</LI><li>second</li><li>third</li></OL>')
   WHEN 2 THEN '<p>no lists</p>'
   ELSE '<ul><li> padded </li></ul><div>x</div><ol><li>a|b</li></ol>'
  END, '</body></html>')"""


def q_list_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List extraction + markdown bullets (operators/tables
    .list_items/.lists_markdown): frozen <ul>/<ol> regular grammar,
    shared cell-cleanup chain, '- ' vs '1. ' serialization. Scan-stage
    harvest + one id-grain partial-agg group."""
    from .operators.tables import list_items, lists_markdown

    pages = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_LI_HTML} as html"
    )
    return lists_markdown(list_items(pages)).selectExpr(
        "doc_id",
        "cast(list_idx as long) as list_idx",
        "n_items",
        "ordered",
        "markdown",
    )


O_LIST_ITEMS = f"""
WITH pages AS MATERIALIZED (
  SELECT doc_id, {_LI_HTML} AS html FROM documents
), blocks AS (
  SELECT doc_id, generate_subscripts(l, 1) - 1 AS list_idx, unnest(l) AS blk
  FROM (SELECT doc_id, regexp_extract_all(html, '{_LIST_PAT}', 0) AS l FROM pages)
), items AS (
  SELECT doc_id, list_idx,
         lower(substring(blk, 1, 3)) = '<ol' AS ordered,
         generate_subscripts(c, 1) - 1 AS item_idx, unnest(c) AS cell
  FROM (SELECT doc_id, list_idx, blk, regexp_extract_all(blk, '{_ITEM_PAT}', 0) AS c FROM blocks)
), cleaned AS MATERIALIZED (
  SELECT doc_id, list_idx, item_idx, ordered,
         {_CLEAN_DUCK} AS item_text
  FROM items
)
SELECT doc_id, list_idx,
       count(*) AS n_items,
       max(ordered) AS ordered,
       string_agg(
         CASE WHEN ordered
              THEN CAST(item_idx + 1 AS VARCHAR) || '. ' || item_text
              ELSE '- ' || item_text END,
         chr(10) ORDER BY item_idx) AS markdown
FROM cleaned
GROUP BY doc_id, list_idx
"""


# ---------------------------------------------------------------------------
# image-text pair harvest (operators/images.image_pairs)
# ---------------------------------------------------------------------------

# Five page shapes: an absolute-src img with messy alt whitespace; a
# ROOTED src with uppercase attributes (origin rebase); an og:image +
# og:title hero pair; a lazy-loader page (data-src and srcset must not
# match; the one real src has an EMPTY alt -> NULL, and its img_idx
# counts the unmatched tags before it); a page with no images.
# Expected-output oracle (the feed-discovery discipline).

_IP_ORIGIN = "concat('https://h', cast(doc_id % 7 as string), '.example.org')"
_IP_URL = f"concat({_IP_ORIGIN}, '/p/', cast(doc_id as string))"

_IP_HTML = """concat('<html><head>',
  CASE doc_id % 5
   WHEN 2 THEN '<meta property="og:image" content="/hero.jpg"><meta property="og:title" content="Hero Title">'
   ELSE '' END,
  '</head><body>',
  CASE doc_id % 5
   WHEN 0 THEN concat('<img src="https://cdn.example.net/a', cast(doc_id as string), '.png" alt="alpha
  beta">')
   WHEN 1 THEN concat('<IMG ALT="REL" SRC="/i/', cast(doc_id as string), '.gif"/>')
   WHEN 2 THEN '<p>hero only</p>'
   WHEN 3 THEN '<img data-src="lazy.png" alt="lazy"><img src="/ok.png" alt="">'
   ELSE '<p>no images</p>'
  END, '</body></html>')"""


def q_image_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text pair harvest (operators/images.image_pairs): <img>
    src/alt with leading-whitespace attribute guards + the og:image
    hero row, urls resolved under the frozen canonical rule.
    Scan-stage regexp harvest + posexplode, zero Python, zero
    shuffle."""
    from .operators.images import image_pairs

    pages = _t(spark, sf_dir, "documents").selectExpr(
        f"{_IP_URL} as url", f"cast({_IP_HTML} as binary) as html", "doc_id"
    )
    out = image_pairs(pages)
    # join doc_id back deterministically via the url suffix for a
    # stable compare key
    return out.selectExpr(
        "cast(regexp_extract(url, '/p/([0-9]+)$', 1) as bigint) as doc_id",
        "source", "img_idx", "image_url", "alt_text",
    )


O_IMAGE_PAIRS = f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, {_IP_ORIGIN} AS origin FROM documents
)
SELECT doc_id, 'img' AS source, CAST(0 AS INTEGER) AS img_idx,
       'https://cdn.example.net/a' || CAST(doc_id AS VARCHAR) || '.png' AS image_url,
       'alpha beta' AS alt_text
FROM d WHERE doc_id % 5 = 0
UNION ALL
SELECT doc_id, 'img', CAST(0 AS INTEGER),
       origin || '/i/' || CAST(doc_id AS VARCHAR) || '.gif', 'REL'
FROM d WHERE doc_id % 5 = 1
UNION ALL
SELECT doc_id, 'og', CAST(NULL AS INTEGER), origin || '/hero.jpg', 'Hero Title'
FROM d WHERE doc_id % 5 = 2
UNION ALL
SELECT doc_id, 'img', CAST(1 AS INTEGER), origin || '/ok.png', CAST(NULL AS VARCHAR)
FROM d WHERE doc_id % 5 = 3
"""


# ---------------------------------------------------------------------------
# AI-training opt-out (operators/headmeta.with_ai_optout)
# ---------------------------------------------------------------------------

# Six page shapes: plain noai; noai+noimageai in a comma list with
# noindex; a robots content whose token CONTAINS the letters but is
# not the token ('paranoai' must not fire); reversed attribute order
# with mixed case; no robots meta at all; noimageai alone.

_AO_HTML = """concat('<html><head>',
  CASE doc_id % 6
   WHEN 0 THEN '<meta name="robots" content="noai">'
   WHEN 1 THEN '<meta name="robots" content="noindex, noai, noimageai">'
   WHEN 2 THEN '<meta name="robots" content="paranoai,nofollow">'
   WHEN 3 THEN '<META content="NoAI" name="robots">'
   WHEN 4 THEN '<title>no robots</title>'
   ELSE '<meta name="robots" content="index noimageai">'
  END, '</head><body><p>b</p></body></html>')"""


def q_ai_optout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AI-training opt-out flags (operators/headmeta.with_ai_optout):
    token-wise noai/noimageai match on the robots meta content, both
    attribute orders, case-insensitive, absent meta -> false/false.
    Scan-stage column math."""
    from .operators.headmeta import with_ai_optout

    pages = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_AO_HTML} as html",
        "concat('https://x/', cast(doc_id as string)) as url",
    )
    return with_ai_optout(pages).select(
        "doc_id", "ai_optout", "image_ai_optout"
    )


O_AI_OPTOUT = """
SELECT doc_id,
       doc_id % 6 IN (0, 1, 3) AS ai_optout,
       doc_id % 6 IN (1, 5) AS image_ai_optout
FROM documents
"""


# ---------------------------------------------------------------------------
# figure captions + caption quality (operators/images)
# ---------------------------------------------------------------------------

# Six page shapes: a figure whose img ALSO surfaces as a bare img row
# (NULL alt -> screened) while the figcaption row passes; a camera-roll
# alt (IMG_1234 -> screened); a generic alt ('logo' -> screened); a
# filename alt ('photo.jpg' -> screened); a real sentence alt
# (passes); a figure with no figcaption (no fig row, NULL-alt img row
# screened). Expected-output oracle.

_CQ_HTML = """concat('<html><body>',
  CASE doc_id % 6
   WHEN 0 THEN '<figure><img src="/f.png"><figcaption>A <b>scenic</b>  view</figcaption></figure>'
   WHEN 1 THEN '<img src="/a.png" alt="IMG_1234">'
   WHEN 2 THEN '<img src="/b.png" alt="logo">'
   WHEN 3 THEN '<img src="/c.png" alt="photo.jpg">'
   WHEN 4 THEN '<img src="/d.png" alt="A small red boat on the lake">'
   ELSE '<figure><img src="/e.png"></figure>'
  END, '</body></html>')"""


def q_caption_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Figure-caption harvest + LAION-style caption screen
    (operators/images.figure_pairs + with_caption_quality): img and
    figure rows unioned, captions screened for length / generic words
    / filename shapes. Scan-stage column math, zero shuffle."""
    from .operators.images import (
        figure_pairs,
        image_pairs,
        with_caption_quality,
    )

    pages = _t(spark, sf_dir, "documents").selectExpr(
        f"{_IP_URL} as url", f"cast({_CQ_HTML} as binary) as html", "doc_id"
    )
    pairs = image_pairs(pages).unionByName(figure_pairs(pages))
    return with_caption_quality(pairs).selectExpr(
        "cast(regexp_extract(url, '/p/([0-9]+)$', 1) as bigint) as doc_id",
        "source", "img_idx", "image_url", "alt_text", "caption_ok",
    )


O_CAPTION_QUALITY = f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, {_IP_ORIGIN} AS origin FROM documents
)
SELECT doc_id, 'img' AS source, CAST(0 AS INTEGER) AS img_idx,
       origin || '/f.png' AS image_url,
       CAST(NULL AS VARCHAR) AS alt_text, false AS caption_ok
FROM d WHERE doc_id % 6 = 0
UNION ALL
SELECT doc_id, 'fig', CAST(0 AS INTEGER), origin || '/f.png',
       'A scenic view', true
FROM d WHERE doc_id % 6 = 0
UNION ALL
SELECT doc_id, 'img', CAST(0 AS INTEGER), origin || '/a.png',
       'IMG_1234', false
FROM d WHERE doc_id % 6 = 1
UNION ALL
SELECT doc_id, 'img', CAST(0 AS INTEGER), origin || '/b.png', 'logo', false
FROM d WHERE doc_id % 6 = 2
UNION ALL
SELECT doc_id, 'img', CAST(0 AS INTEGER), origin || '/c.png',
       'photo.jpg', false
FROM d WHERE doc_id % 6 = 3
UNION ALL
SELECT doc_id, 'img', CAST(0 AS INTEGER), origin || '/d.png',
       'A small red boat on the lake', true
FROM d WHERE doc_id % 6 = 4
UNION ALL
SELECT doc_id, 'img', CAST(0 AS INTEGER), origin || '/e.png',
       CAST(NULL AS VARCHAR), false
FROM d WHERE doc_id % 6 = 5
"""

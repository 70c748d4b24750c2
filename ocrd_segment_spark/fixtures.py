"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md F1).

Seeded generator, committed with the repo — no external data. Produces
rows of the ``input_hint`` schema ``(url, warc_ts, html, text, lang)``
covering the document classes F1a-F1g, with a Zipf-skewed host pool so
the host-salting / AQE-skew machinery has something real to chew on.

The generator is pure Python (no Spark) so the oracle and tests can use
it without a session; ``pages_pandas`` wraps it for Spark ingestion.
"""

from __future__ import annotations

import datetime as dt
import random

_WORDS = (
    "web page content main article section data text block spark engine "
    "segment region heading extract density token span order kernel batch "
    "arrow column shuffle partition skew salt broadcast join window stream "
    "quality language corpus crawl parse tree node anchor figure caption"
).split()

_LANGS = ("en", "en", "en", "de", "de", "fr", "es", "it")

# Zipf-ish host pool: the first hosts are disproportionately hot.
_HOSTS = tuple(f"host{i:02d}.example.org" for i in range(20))
_HOST_WEIGHTS = tuple(1.0 / (i + 1) for i in range(20))

DOC_CLASSES = (
    "clean", "repair", "validity", "shrink", "boiler", "malformed", "order",
    "struct",   # lists/tables/quotes/pre — the non-paragraph region types
    "unicode",  # multibyte scripts + entities — UTF-8 byte-identity risk zone
)

# bump when generator output changes (cache-busts .bench corpora)
FIXTURES_VERSION = 3

_UNICODE_WORDS = (
    "straße gemütlich naïve fächer übermäßig "
    "документ текст слово страница "
    "网页 内容 提取 文本 分析 "
    "ページ 抽出 テキスト "
    "emoji🙂mix café™ a b"
).split()


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _nav(rng: random.Random) -> str:
    links = "".join(
        f'<a href="/{w}">{w}</a> ' for w in rng.sample(_WORDS, 5)
    )
    return f"<nav><ul><li>{links}</li></ul></nav>"


def _page_html(rng: random.Random, cls: str) -> bytes:
    """One document of the given fixture class (FIXTURES.md F1a-F1g)."""
    title = _sentence(rng, 3)
    paras = [_sentence(rng, rng.randint(8, 40)) for _ in range(rng.randint(2, 6))]
    body: list[str] = [f"<header><h1>{title}</h1>{_nav(rng)}</header>"]

    if cls == "clean":  # F1a — well-formed article
        body.append("<main><article>")
        body.append(f"<h2>{_sentence(rng, 4)}</h2>")
        for p in paras:
            body.append(f"<p>{p}</p>")
        body.append(
            f'<figure><img src="x.png"/><figcaption>{_sentence(rng, 6)}</figcaption></figure>'
        )
        body.append("</article></main>")
    elif cls == "repair":  # F1b — mixed container ⊃ child (containment dedup)
        body.append("<main>")
        body.append(f"<div>{paras[0]} <p>{paras[1]}</p></div>")  # div span ⊃ p span
        for p in paras[2:]:
            body.append(f"<p>{p}</p>")
        body.append("</main>")
    elif cls == "validity":  # F1c — empty/whitespace-only regions
        body.append("<main>")
        body.append("<p>   </p><p></p>")  # token-less → no candidate / dropped
        body.append(f"<p>{paras[0]}</p>")
        body.append("<div>\n\t  </div>")
        body.append(f"<p>x</p>")  # below min_region_chars
        body.append(f"<p>{paras[1]}</p>")
        body.append("</main>")
    elif cls == "shrink":  # F1d — markup extent ≫ text extent
        body.append("<main><div><div><div>")
        body.append(f"<p>    {paras[0]}     \n\n\t </p>")
        body.append("</div></div></div>")
        body.append(f"<div><span></span><p>  {paras[1]}  </p><b></b></div></main>")
    elif cls == "boiler":  # F1e — high link-density blocks must drop
        body.append("<main>")
        linkspam = " ".join(f'<a href="/{w}">{w} {w}</a>' for w in rng.sample(_WORDS, 8))
        body.append(f"<p>{linkspam}</p>")  # link density 1.0 → drop
        for p in paras:
            body.append(f"<p>{p} <a href=\"/x\">{rng.choice(_WORDS)}</a></p>")  # low → keep
        body.append(f"<aside>{_sentence(rng, 10)}</aside>")
        body.append("</main>")
    elif cls == "malformed":  # F1f — must not crash
        kind = rng.randint(0, 3)
        if kind == 0:  # unclosed tags
            body.append(f"<main><p>{paras[0]}<p>{paras[1]}<div>{paras[2] if len(paras) > 2 else ''}")
        elif kind == 1:  # broken entities
            body.append(f"<main><p>{paras[0]} &nosuch; &#xZZ; &amp broken</p></main>")
        elif kind == 2:  # truncated
            body.append(f"<main><p>{paras[0]}</p><p>{paras[1][: max(3, len(paras[1]) // 3)]}")
        else:  # non-UTF-8 → parse failure
            return (f"<html><body><p>{paras[0]}</p>").encode("utf-8") + b"\xff\xfe\x80"
    elif cls == "struct":  # lists, tables, quotes, pre (rtype variety)
        body.append("<main>")
        body.append(f"<p>{paras[0]}</p>")
        items = "".join(f"<li>{_sentence(rng, 4)}</li>" for _ in range(3))
        body.append(f"<ul>{items}</ul>")
        body.append(
            "<table><tr>"
            + "".join(f"<td>{_sentence(rng, 3)}</td>" for _ in range(2))
            + f"</tr><tr><td>{_sentence(rng, 3)}</td><td>{_sentence(rng, 2)}</td></tr></table>"
        )
        body.append(f"<blockquote>{_sentence(rng, 8)}</blockquote>")
        body.append(f"<pre>{_sentence(rng, 5)}</pre>")
        body.append("</main>")
    elif cls == "unicode":  # multibyte scripts, NBSP, entities
        body.append("<main>")
        usent = " ".join(rng.choice(_UNICODE_WORDS) for _ in range(rng.randint(6, 20)))
        body.append(f"<h2>{rng.choice(_UNICODE_WORDS)} {rng.choice(_UNICODE_WORDS)}</h2>")
        body.append(f"<p>{usent}</p>")
        body.append(f"<p>{paras[0]} &auml;&szlig; &amp; &#x4E2D;&#25991;</p>")
        body.append("</main>")
    elif cls == "order":  # F1g — figure before heading in DOM
        body.append("<main>")
        body.append(f"<figure><figcaption>{_sentence(rng, 5)}</figcaption></figure>")
        body.append(f"<h2>{_sentence(rng, 4)}</h2>")
        for p in paras:
            body.append(f"<p>{p}</p>")
        body.append("</main>")
    body.append(f"<footer><p>{_sentence(rng, 6)} copyright</p></footer>")
    html = f"<html><head><title>{title}</title><style>p{{color:#000}}</style></head><body>{''.join(body)}</body></html>"
    return html.encode("utf-8")


def gen_pages(n_pages: int = 200, seed: int = 42) -> list[dict]:
    """Deterministic corpus: ``n_pages`` rows of the F1 schema."""
    rng = random.Random(seed)
    epoch = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    for i in range(n_pages):
        cls = DOC_CLASSES[i % len(DOC_CLASSES)]
        host = rng.choices(_HOSTS, weights=_HOST_WEIGHTS, k=1)[0]
        url = f"https://{host}/{cls}/page{i:06d}.html"
        html = _page_html(rng, cls)
        rows.append(
            {
                "url": url,
                "warc_ts": epoch + dt.timedelta(seconds=i * 37),
                "html": html,
                "text": "",  # plain-text hint intentionally empty
                "lang": rng.choice(_LANGS),
            }
        )
    return rows


def pages_pandas(n_pages: int = 200, seed: int = 42):
    """Corpus as a pandas DataFrame (Arrow-friendly) for Spark ingestion."""
    import pandas as pd

    return pd.DataFrame(gen_pages(n_pages, seed))

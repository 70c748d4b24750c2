"""WARC ingestion: record framing by Content-Length, response
filtering, HTTP splitting, and the gzip member-stream decode."""

import datetime as dt
import gzip

from pyspark.sql import functions as F

from ocrd_segment_spark.sources.warc import (
    decode_warc_gz,
    warc_records,
    warc_response_pages,
)


def _record(
    wtype: str,
    url: str,
    date: str,
    payload: str,
    length: int | str | None = None,
) -> str:
    n = len(payload) if length is None else length
    return (
        "WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {n}\r\n"
        "\r\n" + payload + "\r\n\r\n"
    )


def _http(body: str, status: str = "200 OK", ctype: str = "text/html") -> str:
    return (
        f"HTTP/1.1 {status}\r\n"
        f"Content-Type: {ctype}\r\n"
        "\r\n" + body
    )


BODY_WITH_BLANKS = "<html><p>a</p>\r\n\r\n<p>b</p></html>"

BLOB = (
    _record(
        "response",
        "https://a.example/x",
        "2026-01-02T03:04:05Z",
        _http(BODY_WITH_BLANKS),
    )
    + _record(
        "request",
        "https://a.example/x",
        "2026-01-02T03:04:05Z",
        "GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n",
    )
    + _record(
        "response",
        "https://b.example/y",
        "2026-01-02T03:04:06Z",
        _http("<html>y</html>", status="404 Not Found", ctype="text/plain"),
    )
    + _record(  # non-numeric length -> NULL payload, dropped from pages
        "response",
        "https://c.example/z",
        "2026-01-02T03:04:07Z",
        _http("<html>z</html>"),
        length="oops",
    )
)


def _blob_df(spark, text: str):
    return spark.createDataFrame(
        [("seg0", bytearray(text.encode("utf-8")))], "seg string, data binary"
    )


def test_warc_records_framing(spark):
    rows = warc_records(_blob_df(spark, BLOB), keep_cols=("seg",)).collect()
    assert len(rows) == 4
    by_type = sorted(r["warc_type"] for r in rows)
    assert by_type == ["request", "response", "response", "response"]
    # Content-Length slicing keeps the embedded blank line inside ONE payload
    first = next(r for r in rows if r["target_uri"] == "https://a.example/x"
                 and r["warc_type"] == "response")
    assert first["payload"].endswith(BODY_WITH_BLANKS)
    bad = next(r for r in rows if r["target_uri"] == "https://c.example/z")
    assert bad["content_length"] is None and bad["payload"] is None


def test_warc_response_pages(spark):
    pages = warc_response_pages(_blob_df(spark, BLOB), keep_cols=("seg",))
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {"https://a.example/x", "https://b.example/y"}
    a = rows["https://a.example/x"]
    assert bytes(a["html"]).decode() == BODY_WITH_BLANKS
    assert a["http_status"] == 200
    assert a["content_type"] == "text/html"
    assert a["warc_ts"] == dt.datetime(2026, 1, 2, 3, 4, 5)
    b = rows["https://b.example/y"]
    assert b["http_status"] == 404 and b["content_type"] == "text/plain"


def test_warc_pages_feed_extraction(spark):
    """The parsed pages table composes directly onto the kernel."""
    from ocrd_segment_spark.pipeline import extract_pages

    blob = _record(
        "response",
        "u1",
        "2026-01-01T00:00:00Z",
        _http("<html><body><p>hello warc world</p></body></html>"),
    )
    pages = warc_response_pages(_blob_df(spark, blob))
    out = extract_pages(pages.select("url", "html")).collect()
    assert len(out) == 1
    assert out[0]["extracted_text"] == "hello warc world"


def test_decode_warc_gz_members(spark):
    """Real .warc.gz layout: one gzip member per record, concatenated.
    mtime pinned to 0 so the fixture bytes are deterministic."""
    recs = [
        _record("response", f"https://g.example/{i}",
                "2026-01-01T00:00:00Z", _http(f"<html>{i}</html>"))
        for i in range(3)
    ]
    gz = b"".join(gzip.compress(r.encode(), mtime=0) for r in recs)
    truncated = gz[:-7]  # cut inside the final member's trailer
    df = spark.createDataFrame(
        [("ok", bytearray(gz)), ("cut", bytearray(truncated))],
        "seg string, data binary",
    )
    out = {r["seg"]: r for r in decode_warc_gz(df).collect()}
    assert out["ok"]["decode_ok"] is True
    assert bytes(out["ok"]["data"]).decode() == "".join(recs)
    assert out["cut"]["decode_ok"] is False
    # the intact prefix members survive a truncated tail (the final
    # member's deflate stream may still flush fully — only its gzip
    # trailer is missing, hence decode_ok=False)
    assert bytes(out["cut"]["data"]).decode().startswith("".join(recs[:2]))

    pages = warc_response_pages(
        decode_warc_gz(df).filter(F.col("decode_ok")), keep_cols=("seg",)
    )
    assert pages.count() == 3


def test_run_extract_warc_input_and_resume(spark, tmp_path):
    """extract over WARC blobs end-to-end: the 200+text/html gate
    applies, resume stays url-grain (second run appends nothing)."""
    from ocrd_segment_spark.pipeline import run_extract

    recs = [
        _record("response", f"https://w.example/{i}", "2026-01-01T00:00:00Z",
                _http(f"<html><body><p>warc doc {i} text</p></body></html>"))
        for i in range(4)
    ]
    # one non-html and one 404 response: gated out by default
    recs.append(_record("response", "https://w.example/plain",
                        "2026-01-01T00:00:00Z",
                        _http("plain payload", ctype="text/plain")))
    recs.append(_record("response", "https://w.example/gone",
                        "2026-01-01T00:00:00Z",
                        _http("<html>x</html>", status="404 Not Found")))
    src = str(tmp_path / "warc")
    spark.createDataFrame(
        [("s0", bytearray("".join(recs).encode()))], "seg string, data binary"
    ).write.parquet(src)
    out = str(tmp_path / "out")
    run_extract(spark, src, out, input_format="warc")
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4
    assert {r["url"] for r in rows} == {f"https://w.example/{i}" for i in range(4)}
    run_extract(spark, src, out, input_format="warc")  # resume no-op
    assert spark.read.parquet(out).count() == 4

"""Location header harvest on the WARC pages table — the redirect
feed (operators/redirects consumes it)."""

from ocrd_segment_spark.sources.warc import warc_response_pages
from tests.test_warc import _blob_df, _http, _record


def test_location_header_harvested(spark):
    blob = _record(
        "response",
        "https://a.example/old",
        "2026-01-02T03:04:05Z",
        "HTTP/1.1 301 Moved Permanently\r\n"
        "Location: https://a.example/new\r\n"
        "Content-Type: text/html\r\n"
        "\r\n<html>moved</html>",
    ) + _record(
        "response",
        "https://a.example/plain",
        "2026-01-02T03:04:06Z",
        _http("<html>ok</html>"),
    )
    rows = {r["url"]: r for r in warc_response_pages(_blob_df(spark, blob)).collect()}
    moved = rows["https://a.example/old"]
    assert moved["http_status"] == 301
    assert moved["location"] == "https://a.example/new"
    # absent header -> '' (the _field harvest convention), never NULL
    assert rows["https://a.example/plain"]["location"] == ""


def _gz_record(url: str, body_gz: bytes) -> bytes:
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + body_gz
    )
    return (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        b"Content-Length: %d\r\n\r\n" % len(payload) + payload + b"\r\n\r\n"
    )


def test_byte_walk_matches_string_scan_on_ascii(spark):
    from ocrd_segment_spark.sources.warc import warc_pages_bytes
    from tests.test_warc import BLOB, _blob_df

    df = _blob_df(spark, BLOB)
    s = {
        (r["url"], r["http_status"], r["content_type"],
         bytes(r["html"]).decode())
        for r in warc_response_pages(df).collect()
    }
    b = {
        (r["url"], r["http_status"], r["content_type"],
         bytes(r["html"]).decode())
        for r in warc_pages_bytes(df).collect()
    }
    assert s == b and len(b) == 2


def test_gzip_body_survives_byte_walk_and_decodes(spark):
    import gzip as _gzip

    from ocrd_segment_spark.sources.warc import (
        decode_content_encoding,
        warc_pages_bytes,
    )

    html = "<html><body><p>compressed page éé</p></body></html>"
    blob = _gz_record("https://gz.example/p", _gzip.compress(html.encode()))
    # multibyte body with NO encoding: Content-Length in bytes > chars
    plain = html.encode()
    payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + plain)
    blob += (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://plain.example/p\r\n"
        b"WARC-Date: 2026-01-02T03:04:06Z\r\n"
        b"Content-Length: %d\r\n\r\n" % len(payload) + payload + b"\r\n\r\n"
    )
    df = spark.createDataFrame(
        [("s0", bytearray(blob))], "seg string, data binary"
    )
    pages = decode_content_encoding(warc_pages_bytes(df))
    rows = {r["url"]: r for r in pages.collect()}
    gz = rows["https://gz.example/p"]
    assert bytes(gz["html"]).decode() == html and gz["ce_decode_ok"]
    # byte slicing keeps the multibyte body EXACT (no trailing CRLFs)
    assert bytes(rows["https://plain.example/p"]["html"]).decode() == html


def test_content_encoding_failure_is_flagged_not_silent(spark):
    from ocrd_segment_spark.sources.warc import decode_content_encoding

    df = spark.createDataFrame(
        [
            ("u1", "gzip", bytearray(b"not gzip at all")),
            ("u2", "", bytearray(b"<html>plain</html>")),
            ("u3", "deflate", bytearray(__import__("zlib").compress(b"ok"))),
            ("u4", None, bytearray(b"<html>null enc</html>")),
            ("u5", "br", bytearray(b"brotli bytes")),
        ],
        "url string, content_encoding string, html binary",
    )
    rows = {r["url"]: r for r in decode_content_encoding(df).collect()}
    assert not rows["u1"]["ce_decode_ok"]
    assert bytes(rows["u1"]["html"]) == b"not gzip at all"  # original kept
    assert rows["u2"]["ce_decode_ok"]  # identity lane untouched
    assert bytes(rows["u3"]["html"]) == b"ok" and rows["u3"]["ce_decode_ok"]
    # review findings: NULL encoding is identity, never silently
    # dropped; recognized-but-unsupported encodings flag false with
    # bytes kept instead of flowing compressed bytes as html
    assert rows["u4"]["ce_decode_ok"]
    assert bytes(rows["u4"]["html"]) == b"<html>null enc</html>"
    assert not rows["u5"]["ce_decode_ok"]
    assert bytes(rows["u5"]["html"]) == b"brotli bytes"
    assert len(rows) == 5  # nothing vanished

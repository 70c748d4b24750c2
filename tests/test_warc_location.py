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

"""Golden-file byte-identity: Spark pipeline vs single-process oracle.

The north_rule's core correctness contract: byte-identical
``extracted_text`` per url (BASELINE.json), at more than one
parallelism level so no batch/partition boundary leaks into output
(SURVEY.md §7.2)."""

import pandas as pd
import pytest

from ocrd_segment_spark import KERNEL_VERSION
from ocrd_segment_spark.fixtures import gen_pages, pages_pandas
from ocrd_segment_spark.oracle import extract_corpus
from ocrd_segment_spark.pipeline import extract_pages, host_metrics, partition_metrics

N_PAGES = 140


@pytest.fixture(scope="module")
def golden():
    rows = gen_pages(N_PAGES)
    return {r["url"]: r for r in extract_corpus(rows)}


@pytest.fixture(scope="module")
def pages_df(spark):
    pdf = pages_pandas(N_PAGES)
    return spark.createDataFrame(pdf).cache()


def _check(result_rows, golden):
    assert len(result_rows) == N_PAGES
    for row in result_rows:
        g = golden[row["url"]]
        # byte identity (str equality on str is exact codepoint equality;
        # encode to be explicit about the byte contract)
        assert row["extracted_text"].encode("utf-8") == g["extracted_text"].encode(
            "utf-8"
        ), row["url"]
        spans = [
            (r["region_id"], r["rtype"], r["subtype"], r["start"], r["end"],
             r["parent_id"], r["order"], r["score"])
            for r in row["region_spans"]
        ]
        gspans = [
            (r["region_id"], r["rtype"], r["subtype"], r["start"], r["end"],
             r["parent_id"], r["order"], r["score"])
            for r in g["region_spans"]
        ]
        assert spans == gspans, row["url"]


def test_byte_identity_single_partition(spark, pages_df, golden):
    out = extract_pages(pages_df.repartition(1)).collect()
    _check([r.asDict(recursive=True) for r in out], golden)


def test_byte_identity_many_partitions(spark, pages_df, golden):
    out = extract_pages(pages_df.repartition(13)).collect()
    _check([r.asDict(recursive=True) for r in out], golden)


def test_parse_failures_surface_in_lineage(spark, pages_df):
    out = extract_pages(pages_df)
    failed = out.filter("lineage.parse_failed").count()
    # fixture class 'malformed' kind 3 is non-UTF-8 → some failures exist
    assert failed > 0
    assert out.count() == N_PAGES  # failures are rows, not crashes


def test_partition_and_host_metrics(spark, pages_df):
    out = extract_pages(pages_df.repartition(4)).cache()
    pm = partition_metrics(out).collect()
    assert sum(r["pages"] for r in pm) == N_PAGES
    assert all(r["kernel_version"] == KERNEL_VERSION for r in pm)
    hm = host_metrics(out).collect()
    assert sum(r["pages"] for r in hm) == N_PAGES
    # Zipf skew: hottest host must dominate
    hottest = max(r["pages"] for r in hm)
    assert hottest > N_PAGES / 10
    out.unpersist()

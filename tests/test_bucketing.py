"""Bucketing by url hash (north_star: 'Iceberg table … bucketed by
url hash'): two tables bucketed on the same key join WITHOUT a
shuffle — the co-location contract that makes repeated url-keyed
joins (extract output × metadata, GT × DT) free at 100 TB."""

import pytest
from pyspark.sql import functions as F

from ocrd_segment_spark.fixtures import pages_pandas
from ocrd_segment_spark.pipeline import extract_pages
from ocrd_segment_spark.plans import audit


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable needs a warehouse; session fixture already set one up
    return spark


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    pages = spark.createDataFrame(pages_pandas(80))
    out = extract_pages(pages)
    spark.sql("DROP TABLE IF EXISTS extracted_b")
    spark.sql("DROP TABLE IF EXISTS meta_b")
    (
        out.select("url", "extracted_text")
        .write.bucketBy(8, "url").sortBy("url")
        .mode("overwrite").format("parquet").saveAsTable("extracted_b")
    )
    (
        pages.select("url", "lang", "warc_ts")
        .write.bucketBy(8, "url").sortBy("url")
        .mode("overwrite").format("parquet").saveAsTable("meta_b")
    )
    a = spark.table("extracted_b")
    b = spark.table("meta_b")
    # bucketed scans provide the join's required distribution: the
    # sort-merge join must plan with ZERO Exchange operators
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = a.join(b, "url")
        plan = audit.physical_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:1500]
        assert j.count() == 80
        # equivalent unbucketed join DOES shuffle — the contrast
        ub = out.select("url", "extracted_text").join(
            pages.select("url", "lang"), "url"
        )
        assert "Exchange" in audit.physical_plan(ub)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS extracted_b")
        spark.sql("DROP TABLE IF EXISTS meta_b")

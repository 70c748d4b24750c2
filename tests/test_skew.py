"""Skew handling (north_rule: 'explicit salting of skewed hosts and
AQE skew-join handling'): prove AQE actually splits a skewed partition
at runtime, and that the salted two-phase aggregate equals the plain
aggregate on Zipf-skewed hosts."""

from pyspark.sql import functions as F

from ocrd_segment_spark.fixtures import pages_pandas
from ocrd_segment_spark.pipeline import extract_pages, host_metrics


def test_aqe_splits_skewed_join_partition(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force sort-merge
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 95% of left rows share one key → one fat shuffle partition
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("v"),
        )
        right = spark.range(0, 20_000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k")
        # execute THIS Dataset's plan (count() would build a new one)
        rows = j.collect()
        assert len(rows) > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_host_metrics_equal_plain_agg(spark):
    pages = spark.createDataFrame(pages_pandas(120))
    out = extract_pages(pages).cache()
    salted = {r["host"]: (r["pages"], r["regions_kept"])
              for r in host_metrics(out, n_salts=16).collect()}
    plain = {
        r["host"]: (r["pages"], r["kept"])
        for r in out.withColumn("host", F.parse_url("url", F.lit("HOST")))
        .groupBy("host")
        .agg(F.count("*").alias("pages"),
             F.sum(F.col("lineage.n_kept").cast("long")).alias("kept"))
        .collect()
    }
    assert salted == plain
    out.unpersist()

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


def test_minhash_hot_bucket_cap_bounds_viral_pairs(spark):
    """A viral bucket (40 identical docs) must emit at most
    C(max_bucket, 2) pairs — the quadratic-explosion guard. The capped
    sample is the smallest ids, so it is deterministic and every viral
    doc that IS kept links into one cluster."""
    from pyspark.sql import functions as F
    from ocrd_segment_spark.operators.dedup import minhash_lsh_candidates

    viral_text = "the same viral boilerplate sentence repeated across mirrors " * 3
    docs = spark.createDataFrame(
        [(i, viral_text) for i in range(40)]
        + [(100 + i, f"unique document number {i} with its own words entirely") for i in range(5)],
        "doc_id long, text string",
    )
    capped = minhash_lsh_candidates(docs, max_bucket=8)
    pairs = {(r["doc1"], r["doc2"]) for r in capped.collect()}
    viral_pairs = {p for p in pairs if p[0] < 40 and p[1] < 40}
    assert viral_pairs == {(a, b) for a in range(8) for b in range(8) if a < b}
    # uncapped for contrast: full quadratic
    full = minhash_lsh_candidates(docs, max_bucket=None)
    assert full.filter((F.col("doc1") < 40) & (F.col("doc2") < 40)).count() == 780


# ---------------------------------------------- packed sequences
def test_pack_sequences_tiles_and_splits(spark):
    from ocrd_segment_spark.operators.sampling import pack_sequences
    from ocrd_segment_spark.plans import audit

    L = 100
    d = spark.range(0, 50).selectExpr(
        "id as doc_id", "(id % 7) * 37 + 1 as n_tokens"
    )
    rows = pack_sequences(d, L).collect()
    total = sum(r.n_tokens for r in
                d.selectExpr("doc_id", "n_tokens").collect())
    # slices reassemble each document exactly (contiguous, gap-free)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.doc_from)
        assert rs[0].doc_from == 0
        assert rs[-1].doc_to == rs[0].n_tokens
        for a, b in zip(rs, rs[1:]):
            assert a.doc_to == b.doc_from
            assert b.seq_id == a.seq_id + 1 and b.seq_offset == 0
    # every sequence except the last is exactly full and tiles [0, L)
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r.seq_id, []).append(r)
    last = max(by_seq)
    assert set(by_seq) == set(range(last + 1))
    for s, rs in by_seq.items():
        rs.sort(key=lambda r: r.seq_offset)
        assert rs[0].seq_offset == 0
        for a, b in zip(rs, rs[1:]):
            assert a.seq_offset + (a.doc_to - a.doc_from) == b.seq_offset
        filled = sum(r.doc_to - r.doc_from for r in rs)
        assert filled == (L if s < last else total - last * L)
    # no global (unpartitioned) window in the plan
    assert audit.unpartitioned_window_inputs(pack_sequences(d, L)) == []


def test_pack_sequences_edge_rules(spark):
    import pytest as _pytest

    from ocrd_segment_spark.operators.sampling import pack_sequences

    d = spark.createDataFrame(
        [(1, 5), (2, 0), (None, 9), (3, None)],
        "doc_id long, n_tokens long",
    )
    rows = pack_sequences(d, 4).collect()
    # zero-token, NULL-key and NULL-token (weighs 0) docs are excluded
    assert {r.doc_id for r in rows} == {1}
    assert sorted((r.doc_from, r.doc_to) for r in rows) == [(0, 4), (4, 5)]
    with _pytest.raises(ValueError):
        pack_sequences(d, 0)
    empty = pack_sequences(d.filter("doc_id IS NULL AND FALSE"), 4)
    assert empty.count() == 0


def test_pack_sequences_empty_input_keeps_key_type(spark):
    from ocrd_segment_spark.operators.sampling import pack_sequences

    d = spark.createDataFrame([], "url string, n_tokens long")
    out = pack_sequences(d, 10, key_col="url")
    assert out.count() == 0
    assert dict(out.dtypes)["url"] == "string"

"""Physical-plan audits (SURVEY.md §4.2): the scale properties are
pinned as tests — pushdown, pruning, broadcast, and shuffle-freedom of
the narrow extract path."""

import pytest
from pyspark.sql import functions as F

from ocrd_segment_spark import contract as C
from ocrd_segment_spark.pipeline import extract_pages
from ocrd_segment_spark.plans import audit

SF = "/root/testdata/sf0.01"


def test_extract_path_has_no_exchange(spark, tmp_path):
    from ocrd_segment_spark.fixtures import pages_pandas

    src = str(tmp_path / "pages")
    spark.createDataFrame(pages_pandas(10)).write.parquet(src)
    out = extract_pages(spark.read.parquet(src))
    assert not audit.has_exchange(out)  # scan → project → mapInPandas only


def test_extract_prunes_columns_at_scan(spark, tmp_path):
    from ocrd_segment_spark.fixtures import pages_pandas

    src = str(tmp_path / "pages")
    spark.createDataFrame(pages_pandas(10)).write.parquet(src)
    out = extract_pages(spark.read.parquet(src))
    rs = audit.read_schema(out)
    assert "html" in rs and "url" in rs
    # text/lang/warc_ts never cross the scan
    assert "warc_ts" not in rs and "lang" not in rs


def test_filter_pushdown_reaches_parquet(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("lang") == "en"
    ).select("doc_id")
    pf = audit.pushed_filters(docs)
    assert "lang" in pf  # IsNotNull(lang), EqualTo(lang,en)
    rs = audit.read_schema(docs)
    assert "text" not in rs  # pruned


def test_small_dim_join_is_broadcast(spark):
    j = C.q_j4_key_fallback_join(spark, SF)
    assert audit.broadcast_join_count(j) >= 2  # both nation joins


def test_pricing_two_phase_agg_and_codegen(spark):
    q = C.q_a_pricing_summary(spark, SF)
    plan = audit.physical_plan(q)
    # partial+final hash aggregation around one Exchange (§4.2)
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan and "partial_sum" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in plan


def test_coco_export_has_no_global_sort_of_corpus(spark, tmp_path):
    """S9 scale audit: image/annotation id windows must be partitioned
    (bucketed ranked_ids) — the only unpartitioned windows allowed are
    over bounded sides (category vocabulary, per-bucket counts)."""
    from ocrd_segment_spark.fixtures import pages_pandas
    from ocrd_segment_spark.sources.coco import export_coco

    src = str(tmp_path / "pages")
    spark.createDataFrame(pages_pandas(30)).write.parquet(src)
    out = extract_pages(spark.read.parquet(src))
    images, annotations, _ = export_coco(out)
    for df in (images, annotations):
        for inp in audit.unpartitioned_window_inputs(df):
            # corpus-scale columns never feed a global window
            assert "url#" not in inp and "html" not in inp, inp
            assert "_cnt#" in inp or "cat_name#" in inp or "name#" in inp, inp
    # and the fact-side id windows exist and ARE partitioned
    assert "Window" in audit.physical_plan(annotations)


def test_narrow_query_is_codegen(spark):
    # AQE defers planning behind AdaptiveSparkPlan (codegen reported 0
    # pre-execution), so codegen is pinned on a narrow no-exchange query
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("n_chars") > 100)
        .select("doc_id", (F.col("n_chars") * 2).alias("x"))
    )
    assert audit.whole_stage_codegen_subtrees(docs) >= 1


def test_map_summary_broadcasts_thresholds(spark):
    """eval AP/AR sweep: the thresholds side must broadcast (nested-
    loop on iou > t), never shuffle the pair table against it."""
    from ocrd_segment_spark.contract import _gt_dt_from_documents
    from ocrd_segment_spark.operators.evaluate import map_summary

    gt, dt = _gt_dt_from_documents(spark, SF)
    plan = audit.physical_plan(map_summary(gt, dt))
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_apply_coco_has_no_global_window(spark, tmp_path):
    """from-coco processor scale audit: no unpartitioned window over a
    corpus-scale input; categories side broadcast."""
    from ocrd_segment_spark.fixtures import pages_pandas
    from ocrd_segment_spark.sources.coco import apply_coco_segmentation, export_coco

    src = str(tmp_path / "pages")
    spark.createDataFrame(pages_pandas(30)).write.parquet(src)
    out = extract_pages(spark.read.parquet(src))
    images, annotations, categories = export_coco(out)
    applied = apply_coco_segmentation(out, images, annotations, categories)
    for inp in audit.unpartitioned_window_inputs(applied):
        assert "url#" not in inp and "html" not in inp, inp
        assert "_cnt#" in inp or "cat_name#" in inp or "name#" in inp, inp
    assert audit.broadcast_join_count(applied) >= 1


def test_styled_extract_path_has_no_exchange(spark, tmp_path):
    """TextStyle pipeline is the same narrow plan as plain extraction."""
    from ocrd_segment_spark.fixtures import pages_pandas
    from ocrd_segment_spark.pipeline import extract_pages_styled

    src = str(tmp_path / "pages")
    spark.createDataFrame(pages_pandas(12)).write.parquet(src)
    df = extract_pages_styled(spark.read.parquet(src))
    assert not audit.has_exchange(df), audit.physical_plan(df)


def test_near_duplicates_plan_has_no_theta_join(spark):
    """LSH-then-verify scale audit: every join in the near-dup plan is
    an equi-join (band-bucket collision or doc-id pair attach) — no
    cartesian/nested-loop corpus self-join anywhere, unlike blocked
    ngram_jaccard_pairs whose blocks are quadratic."""
    from ocrd_segment_spark.operators.dedup import near_duplicates

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = audit.physical_plan(near_duplicates(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_jaccard_requires_explicit_blocking(spark):
    """The all-pairs footgun is no longer reachable by default:
    block_cols must be chosen by the caller."""
    from ocrd_segment_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(TypeError):
        ngram_jaccard_pairs(docs)  # no block_cols → refuse


def test_domain_cap_windows_are_partitioned(spark):
    """domain_cap's two windows must both be PARTITIONED (the whole
    point is that no stage sorts a hot domain — or the corpus —
    through one task); scoring is JVM-side."""
    from ocrd_segment_spark.operators.sampling import domain_cap

    d = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "doc_id", "concat('d', cast(doc_id % 7 as string)) as reg_domain"
    )
    out = domain_cap(d, 3)
    assert audit.unpartitioned_window_inputs(out) == []
    plan = audit.physical_plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_budget_has_no_global_window(spark):
    """token_budget_sample: the running sum must be group-partitioned
    (the distributed prefix-sum), never a corpus-wide ORDER BY window;
    the offsets join is broadcast."""
    from ocrd_segment_spark.operators.sampling import token_budget_sample

    d = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "doc_id", "cast(length(text) as bigint) as n_tokens"
    )
    out = token_budget_sample(d, 50000)
    assert audit.unpartitioned_window_inputs(out) == []
    assert audit.broadcast_join_count(out) >= 1


def test_host_and_domain_blocklists_are_broadcast(spark):
    from ocrd_segment_spark.functions.urls import (
        with_domain_blocked,
        with_host_blocked,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "doc_id", "concat('https://h', cast(doc_id % 9 as string),"
        " '.example.org/p') as url"
    )
    bl = spark.createDataFrame([("h1.example.org",)], "domain string")
    assert audit.broadcast_join_count(
        with_host_blocked(d, bl, host_col="domain")
    ) >= 1
    assert audit.broadcast_join_count(with_domain_blocked(d, bl)) >= 1


def test_quality_classifier_is_pure_jvm(spark):
    """The learned classifier must stay inside the scan stage: no
    Python eval nodes, no Exchange."""
    from ocrd_segment_spark.operators.quality_clf import (
        with_quality_classifier,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = with_quality_classifier(d).select("doc_id", "clf_logit")
    plan = audit.physical_plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert not audit.has_exchange(out)

"""Tests for the reusable operator surface: COCO round-trip,
replace-text, repair, dedup, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from ocrd_segment_spark.fixtures import pages_pandas
from ocrd_segment_spark.functions import multimodal as MM
from ocrd_segment_spark.operators import dedup as D
from ocrd_segment_spark.operators import repair as R
from ocrd_segment_spark.pipeline import extract_pages
from ocrd_segment_spark.sources import coco as CC
from ocrd_segment_spark.sources.text_files import (
    replace_region_text,
    update_level_accounting,
)


@pytest.fixture(scope="module")
def extracted(spark):
    pdf = pages_pandas(40)
    return extract_pages(spark.createDataFrame(pdf)).cache()


# ------------------------------------------------------------------ coco
def test_coco_export_import_roundtrip(spark, extracted):
    images, annotations, categories = CC.export_coco(extracted)
    n_imgs = images.count()
    assert n_imgs == 40
    # dense deterministic ids
    ids = [r["image_id"] for r in images.orderBy("image_id").collect()]
    assert ids == list(range(1, n_imgs + 1))
    ann_ids = [r["ann_id"] for r in annotations.orderBy("ann_id").collect()]
    assert ann_ids == list(range(1, len(ann_ids) + 1))
    # category vocabulary covers what the extractor emits
    names = {r["name"] for r in categories.collect()}
    assert "paragraph.p" in names
    grouped = CC.import_coco(images, annotations)
    total = grouped.agg(F.sum("n_regions")).collect()[0][0]
    assert total == annotations.count()


def test_coco_ids_deterministic_across_partitioning(spark, extracted):
    _, a1, _ = CC.export_coco(extracted.repartition(7))
    _, a2, _ = CC.export_coco(extracted.repartition(2))
    assert a1.orderBy("ann_id").collect() == a2.orderBy("ann_id").collect()


# ----------------------------------------------------------- replace text
def test_replace_region_text_suffix_join(spark, extracted):
    one = extracted.limit(1).collect()[0]
    rid = one["region_spans"][0]["region_id"]
    files = spark.createDataFrame(
        [
            (f"/gt/{one['url']}_{rid}.gt.txt", "corrected text"),
            ("/gt/no-such-url_r0001.gt.txt", "orphan"),  # must be ignored
        ],
        "path string, content string",
    )
    rep = replace_region_text(extracted, files)
    rows = rep.collect()
    assert len(rows) == 1
    assert rows[0]["new_text"] == "corrected text"
    assert rows[0]["url"] == one["url"] and rows[0]["region_id"] == rid
    acct = {r["level"]: r["n_updated"] for r in update_level_accounting(rep).collect()}
    assert sum(acct.values()) == 1


# ----------------------------------------------------------------- repair
def test_repair_operator_validity_and_plausibilize(spark):
    spans = spark.createDataFrame(
        [
            ("u1", "a", 0, 100, 1, 100),
            ("u1", "b", 0, 100, 2, 100),    # equal → delete shallower 'a'
            ("u1", "c", 10, 50, 3, 100),    # contained → delete
            ("u1", "d", -5, 250, 1, 100),   # clamped by validity
            ("u1", "e", 40, 40, 1, 100),    # empty → dropped by validity
        ],
        "url string, region_id string, start long, end long, depth long, doc_len long",
    )
    valid = R.validity_filter(spans)
    assert valid.count() == 4  # 'e' dropped
    out = {r["region_id"]: r["action"] for r in R.plausibilize(valid).collect()}
    assert out["a"] == "delete" and out["c"] == "delete"
    assert out["b"] == "keep"


# ------------------------------------------------------------------ dedup
def test_dedup_operators(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup
        (3, "the quick brown fox jumps over a lazy dog today", "en"),  # near dup
        (4, "completely different words entirely here now friends", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    ex = D.exact_duplicates(df)
    dup = [r for r in ex.collect() if r["n_copies"] > 1]
    assert len(dup) == 1 and dup[0]["canonical_doc"] == 1
    cands = {(r["doc1"], r["doc2"]) for r in D.minhash_lsh_candidates(df).collect()}
    assert (1, 2) in cands
    assert (1, 4) not in cands and (2, 4) not in cands
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash_fingerprints(df).collect()}
    assert sh[1] == sh[2] != sh[4]
    jac = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(df).collect()
    }
    assert jac[(1, 2)] == 1.0
    assert jac[(1, 3)] < 1.0 and jac[(1, 3)] > 0.2
    assert jac[(1, 4)] == 0.0


# -------------------------------------------------------------- multimodal
def test_multimodal_stub_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(b"\x00\x01\x02\xff"))],
        "doc_id long, blob binary",
    )
    meta = {r["doc_id"]: r.asDict() for r in MM.binary_meta(df).collect()}
    assert meta[1]["n_bytes"] == 3 and meta[2]["n_bytes"] == 4
    assert meta[1]["content_md5"] == "900150983cd24fb0d6963f7d28e17f72"
    feats = {r["doc_id"]: r.asDict() for r in MM.extract_features(df, dim=8).collect()}
    assert len(feats[1]["feature"]) == 8
    assert all(0 <= v <= 1 for v in feats[1]["feature"])
    # deterministic across runs
    again = {r["doc_id"]: r["feature"] for r in MM.extract_features(df, dim=8).collect()}
    assert again[1] == feats[1]["feature"]
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"xx")


def test_unaccounted_images_audit(spark, extracted):
    images, annotations, _ = CC.export_coco(extracted)
    missing = CC.unaccounted_images(images, annotations)
    grouped = CC.import_coco(images, annotations)
    # audit + grouped partitions the image set exactly
    assert missing.count() + grouped.count() == images.count()

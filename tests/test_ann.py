"""IVF search (operators/ann): correctness vs the exact baseline,
recall behavior of the nprobe dial, and the broadcast plan shape."""

import math
import random

from pyspark.sql import Window as W, functions as F

from ocrd_segment_spark.operators.ann import assign_to_centroids, ivf_search


def _clustered_vectors(spark, n_clusters=4, per_cluster=30, dim=8, seed=7):
    """Well-separated clusters: IVF with enough probes must match the
    exact baseline on them."""
    rng = random.Random(seed)
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = [10.0 * (1 if (c >> b) & 1 else -1) for b in range(dim)]
        for _ in range(per_cluster):
            rows.append((vid, c, [x + rng.uniform(-1, 1) for x in center]))
            vid += 1
    return spark.createDataFrame(rows, "id long, true_c long, v array<double>")


def _brute_topk(vectors, queries, k):
    pairs = vectors.crossJoin(F.broadcast(queries)).filter("id != qid")
    dot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " cast(0.0 as double), (acc, t) -> acc + t)"
    )
    scored = pairs.withColumn(
        "cos",
        F.expr(
            f"{dot.format(a='qv', b='v')} / (sqrt({dot.format(a='qv', b='qv')})"
            f" * sqrt({dot.format(a='v', b='v')}))"
        ),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", F.col("id").alias("nid"), "rnk")
    )


def test_assign_to_centroids_recovers_clusters(spark):
    vecs = _clustered_vectors(spark)
    # centroids = first member of each cluster (good enough: clusters
    # are 20 units apart, jitter is ±1)
    firsts = (
        vecs.withColumn(
            "rn", F.row_number().over(W.partitionBy("true_c").orderBy("id"))
        )
        .filter("rn = 1")
        .selectExpr("true_c as cid", "v as cv")
    )
    assigned = assign_to_centroids(vecs.select("id", "v"), firsts)
    joined = assigned.join(vecs.select("id", "true_c"), "id")
    assert joined.filter("cid != true_c").count() == 0


def test_ivf_search_matches_brute_force_with_full_probe(spark):
    """nprobe = n_centroids degenerates IVF to the exact search."""
    vecs = _clustered_vectors(spark)
    firsts = (
        vecs.withColumn(
            "rn", F.row_number().over(W.partitionBy("true_c").orderBy("id"))
        )
        .filter("rn = 1")
        .selectExpr("true_c as cid", "v as cv")
    )
    queries = vecs.filter("id % 17 = 0").selectExpr("id as qid", "v as qv")
    exact = {
        (r["qid"], r["rnk"]): r["nid"]
        for r in _brute_topk(vecs.select("id", "v"), queries, 3).collect()
    }
    ivf = {
        (r["qid"], r["rnk"]): r["nid"]
        for r in ivf_search(
            vecs.select("id", "v"), queries, firsts, nprobe=4, k=3
        ).collect()
    }
    assert ivf == exact


def test_recall_audit_pins_the_nprobe_trade(spark):
    """recall_audit (round-3 task 9): recall is monotone in nprobe in
    aggregate, per-query recall ∈ [0,1], and probing EVERY list
    degenerates to the exact search → recall exactly 1.0. cosine_topk
    (the exact baseline inside the audit) must agree with this file's
    independent _brute_topk."""
    from ocrd_segment_spark.operators.ann import cosine_topk, recall_audit

    vecs = _clustered_vectors(spark)
    firsts = (
        vecs.withColumn(
            "rn", F.row_number().over(W.partitionBy("true_c").orderBy("id"))
        )
        .filter("rn = 1")
        .selectExpr("true_c as cid", "v as cv")
    )
    queries = vecs.filter("id % 17 = 0").selectExpr("id as qid", "v as qv")
    # library baseline == this file's independent brute force
    lib = {(r["qid"], r["rnk"]): r["nid"]
           for r in cosine_topk(vecs.select("id", "v"), queries, 3).collect()}
    ind = {(r["qid"], r["rnk"]): r["nid"]
           for r in _brute_topk(vecs.select("id", "v"), queries, 3).collect()}
    assert lib == ind
    out = recall_audit(
        vecs.select("id", "v"), queries, firsts, nprobes=(1, 4), k=3
    ).collect()
    assert all(0.0 <= r["recall"] <= 1.0 for r in out)
    by_np = {}
    for r in out:
        by_np.setdefault(r["nprobe"], []).append(r["recall"])
    assert sum(by_np[4]) >= sum(by_np[1])
    assert all(r == 1.0 for r in by_np[4])  # all 4 lists probed = exact


def test_ivf_search_recall_and_plan(spark):
    """nprobe=1 on well-separated clusters still finds the true
    neighbors (they live in the query's own list), and the centroid
    table is broadcast — never shuffled at corpus size."""
    vecs = _clustered_vectors(spark)
    firsts = (
        vecs.withColumn(
            "rn", F.row_number().over(W.partitionBy("true_c").orderBy("id"))
        )
        .filter("rn = 1")
        .selectExpr("true_c as cid", "v as cv")
    )
    queries = vecs.filter("id % 23 = 0").selectExpr("id as qid", "v as qv")
    out = ivf_search(vecs.select("id", "v"), queries, firsts, nprobe=1, k=3)
    exact = {
        (r["qid"], r["rnk"]): r["nid"]
        for r in _brute_topk(vecs.select("id", "v"), queries, 3).collect()
    }
    got = {(r["qid"], r["rnk"]): r["nid"] for r in out.collect()}
    hits = sum(1 for key, nid in exact.items() if got.get(key) == nid)
    assert hits / len(exact) == 1.0  # separated clusters: full recall
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ivf_index_persist_and_add_batch(spark, tmp_path):
    """Round-5 task 7: build_ivf_index persists (assignments ids-only,
    centroid stats as drift baseline); ivf_add_batch assigns new
    vectors to EXISTING centroids, skips already-indexed ids
    (merge_corpus dedup rule), and flags drifted lists."""
    from ocrd_segment_spark.operators.ann import build_ivf_index, ivf_add_batch

    # two tight clusters around (0,0) and (10,10)
    base = spark.createDataFrame(
        [(i, [0.0 + i * 0.1, 0.0]) for i in range(5)]
        + [(10 + i, [10.0 + i * 0.1, 10.0]) for i in range(5)],
        "id long, v array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [0.2, 0.0]), (1, [10.2, 10.0])], "cid long, cv array<double>"
    )
    path = str(tmp_path / "ivf")
    build_ivf_index(base, cents, path)
    c = {r["cid"]: r for r in spark.read.parquet(path + "/centroids").collect()}
    assert c[0]["n_assigned"] == 5 and c[1]["n_assigned"] == 5
    assert c[0]["mean_dist2"] is not None
    a = spark.read.parquet(path + "/assignments")
    assert a.columns == ["id", "cid", "dist2"]  # ids only, no payload
    assert a.count() == 10

    # batch: one in-distribution vector per list, one FAR outlier that
    # still lands in list 0, and a duplicate id (should be skipped)
    batch = spark.createDataFrame(
        [(100, [0.15, 0.0]), (101, [10.15, 10.0]), (102, [4.0, 0.0]),
         (0, [999.0, 999.0])],
        "id long, v array<double>",
    )
    drift = {r["cid"]: r for r in
             ivf_add_batch(spark, path, batch, drift_threshold=1.5).collect()}
    after = spark.read.parquet(path + "/assignments")
    assert after.count() == 13  # duplicate id 0 skipped
    assert after.filter("id = 0").count() == 1
    got = {r["id"]: r["cid"] for r in after.filter("id >= 100").collect()}
    assert got == {100: 0, 101: 1, 102: 0}
    # list 0 got the far outlier → mean batch dist2 explodes → drifted;
    # list 1 got only an in-distribution vector → not drifted
    assert drift[0]["drifted"] and drift[0]["n_new"] == 2
    assert not drift[1]["drifted"] and drift[1]["n_new"] == 1
    assert drift[0]["drift"] > 1.5

    # a second add of the same batch is a full no-op (all ids indexed)
    drift2 = ivf_add_batch(spark, path, batch)
    assert after.count() == 13
    assert all(r["n_new"] == 0 for r in drift2.collect())


def test_ivf_add_batch_dedups_within_batch(spark, tmp_path):
    """A batch repeating an id (union of shards) indexes it ONCE
    (round-5 review finding: only the index-side anti-join existed)."""
    from ocrd_segment_spark.operators.ann import build_ivf_index, ivf_add_batch

    base = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])], "id long, v array<double>"
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])], "cid long, cv array<double>"
    )
    path = str(tmp_path / "ivf")
    build_ivf_index(base, cents, path)
    batch = spark.createDataFrame(
        [(5, [0.1, 0.0]), (5, [0.1, 0.0]), (5, [0.2, 0.0])],
        "id long, v array<double>",
    )
    drift = ivf_add_batch(spark, path, batch).collect()
    a = spark.read.parquet(path + "/assignments")
    assert a.filter("id = 5").count() == 1
    assert sum(r["n_new"] for r in drift) == 1


def test_pq_encode_and_adc_exactness(spark):
    """A vector whose subvectors ARE codebook centroids encodes to
    those codes, and its ADC distance equals the TRUE L2 distance —
    the PQ identity that makes the approximation interpretable."""
    from ocrd_segment_spark.operators.ann import pq_adc_topk, pq_encode

    # 2 subspaces of 2 dims, 2 centroids each
    cb = spark.createDataFrame(
        [
            (0, 0, [0.0, 0.0]), (0, 1, [10.0, 10.0]),
            (1, 0, [0.0, 0.0]), (1, 1, [20.0, 20.0]),
        ],
        "sub int, cid int, cv array<double>",
    )
    vecs = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 20.0, 20.0]),   # centroids (0, 1)
            (2, [10.0, 10.0, 0.0, 0.0]),   # centroids (1, 0)
            (3, [9.0, 9.0, 19.0, 19.0]),   # near (1, 1)
        ],
        "vec_id long, embedding array<double>",
    )
    codes = {r["vec_id"]: r["codes"]
             for r in pq_encode(vecs, cb, 2).collect()}
    assert codes == {1: [0, 1], 2: [1, 0], 3: [1, 1]}

    query = spark.createDataFrame([([0.0, 0.0, 20.0, 20.0],)], "qv array<double>")
    got = [(r["vec_id"], r["adc_dist2"])
           for r in pq_adc_topk(pq_encode(vecs, cb, 2), cb, query, k=3, m=2).collect()]
    # vec 1 sits exactly on its centroids -> ADC == true distance == 0;
    # vec 3 quantizes to (10,10,20,20) -> ADC = 200 + 0
    assert got[0] == (1, 0.0)
    assert dict(got)[3] == 200.0
    # ordering is (dist asc, vec_id asc)
    assert [v for v, _ in got] == sorted(
        [v for v, _ in got], key=lambda v: (dict(got)[v], v)
    )


def test_semantic_dedup_drops_packed_copies(spark):
    """SemDeDup: within a cluster, the copy farthest from the centroid
    survives and everything within tau cosine of an earlier copy
    drops; cross-direction vectors stay."""
    from ocrd_segment_spark.operators.ann import semantic_dedup

    dim = 8
    def v(*pairs):
        out = [0.0] * dim
        for i, x in pairs:
            out[i] = float(x)
        return out

    rows = [
        # cluster around +x: a, b=2a, c=3a are cosine-1 copies
        (0, v((0, 10), (1, 1))),
        (1, v((0, 20), (1, 2))),
        (2, v((0, 30), (1, 3))),
        # same cluster, orthogonal-ish direction: kept
        (3, v((0, 1), (1, 10))),
        # far cluster around -x: no within-tau earlier partner
        (4, v((0, -10))),
        (5, v((0, -10), (2, 10))),
    ]
    vecs = spark.createDataFrame(rows, "id long, v array<double>")
    cents = spark.createDataFrame(
        [(0, v((0, 10))), (1, v((0, -10)))], "cid long, cv array<double>"
    )
    got = {r["id"]: r for r in semantic_dedup(vecs, cents, tau=0.95).collect()}
    assert len(got) == 6
    # retention order in cluster 0 is dist2 desc: 2 (farthest), 1, 0
    assert got[2]["kept"] is True
    assert got[1]["kept"] is False and got[0]["kept"] is False
    assert got[3]["kept"] is True          # cos to the copies ~0.15
    assert got[4]["kept"] is True and got[5]["kept"] is True
    assert got[4]["cid"] == 1 and got[0]["cid"] == 0

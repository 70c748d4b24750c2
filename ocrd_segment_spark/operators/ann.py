"""Approximate-nearest-neighbor search operators over embedding columns.

The engine's similarity-search ladder (SURVEY.md LLM-pipeline table):

- brute-force cosine top-k — the EXACT baseline (contract_ml
  ann_cosine_topk): q × N dot products, broadcast query side;
- LSH buckets / IVF assignment — the bucketing halves;
- :func:`ivf_search` (here) — the full scale path: probe the ``nprobe``
  nearest inverted lists per query, score exactly WITHIN those lists
  only, take per-query top-k. Recall/cost is dialed by ``nprobe``.

Scale shape: centroids are broadcast to both sides (a centroid table
is k·dim doubles — thousands of rows at 100 TB, never corpus-sized).
The only corpus-sized shuffle keys on the centroid id; with the usual
k ≈ √N centroids the lists are balanced by construction (k-means), and
residual hot lists split under AQE. Per-query top-k windows on qid —
fine-grained. All vector math is JVM-side column expressions
(zip_with/aggregate dot products), no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

# dot product of two array<double> columns, bound through zip_with so
# the expression tree is evaluated once per element (HOF-CSE trap)
DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
    " cast(0.0 as double), (acc, t) -> acc + t)"
)
_L2 = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
    " cast(0.0 as double), (acc, t) -> acc + t)"
)


def assign_to_centroids(
    vectors: DataFrame, centroids: DataFrame, out_id: str = "id"
) -> DataFrame:
    """Nearest centroid (L2, ties to the smaller cid) for every vector:
    (id, v, cid). ``vectors``: (id, v); ``centroids``: (cid, cv)."""
    pairs = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "dist2", F.expr(_L2.format(a="v", b="cv"))
    )
    # argmin as a hash aggregate, NOT a row_number window: min over
    # struct(dist2, cid, v) combines map-side, so the shuffle carries
    # one partial row per vector instead of sorting N x n_centroids
    # rows per id. (dist2, cid) is unique per vector — cids are
    # distinct — so v is never reached in the struct comparison and
    # the (dist2 asc, cid asc) tie-break is identical to the window.
    best = pairs.groupBy("id").agg(
        F.min(F.struct("dist2", "cid", "v")).alias("_b")
    )
    return best.select(
        F.col("id").alias(out_id), F.col("_b.v").alias("v"), F.col("_b.cid").alias("cid")
    )


def cosine_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 3
) -> DataFrame:
    """(qid, nid, rnk, cos): EXACT brute-force cosine top-k — the
    recall baseline ivf_search is audited against. Query side
    broadcast (q × N dot products, embarrassingly parallel; the only
    shuffle is the per-query top-k window). Same tie rules and
    norm-once discipline as ivf_search so the two result sets are
    comparable row-for-row."""
    vecs = vectors.withColumn("_vn", F.expr(f"sqrt({DOT.format(a='v', b='v')})"))
    qs = queries.withColumn("_qn", F.expr(f"sqrt({DOT.format(a='qv', b='qv')})"))
    pairs = vecs.crossJoin(F.broadcast(qs)).filter(F.col("id") != F.col("qid"))
    scored = pairs.withColumn(
        "cos", F.expr(f"{DOT.format(a='qv', b='v')} / (_qn * _vn)")
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "qid",
            F.col("id").alias("nid"),
            F.col("rnk").cast("long").alias("rnk"),
            F.round("cos", 6).alias("cos"),
        )
    )


def recall_audit(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    nprobes: tuple[int, ...] = (1, 2),
    k: int = 3,
) -> DataFrame:
    """(nprobe, qid, n_hits, recall): recall@k of :func:`ivf_search`
    against the exact :func:`cosine_topk` baseline, per query and per
    probe width — the operator that pins the nprobe/recall trade
    numerically instead of leaving it folklore. Pure composition of
    the two searches plus a semi-join; at scale the exact side is the
    expensive half (audit it on a query SAMPLE, not the full load)."""
    exact = cosine_topk(vectors, queries, k=k).select("qid", "nid")
    outs = []
    for nprobe in nprobes:
        approx = ivf_search(vectors, queries, centroids, nprobe=nprobe, k=k)
        hits = (
            approx.join(exact, ["qid", "nid"], "left_semi")
            .groupBy("qid")
            .agg(F.count("*").alias("n_hits"))
        )
        outs.append(
            queries.select("qid")
            .join(hits, "qid", "left")
            .select(
                F.lit(nprobe).cast("long").alias("nprobe"),
                "qid",
                F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
                F.round(
                    F.coalesce("n_hits", F.lit(0)) * F.lit(1.0) / F.lit(k), 6
                ).alias("recall"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def ivf_search(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    k: int = 3,
) -> DataFrame:
    """(qid, nid, rnk, cos): exact cosine top-k per query, restricted
    to the ``nprobe`` nearest inverted lists — the IVF search.

    ``vectors``: (id, v array<double>); ``queries``: (qid, qv);
    ``centroids``: (cid, cv). A query never returns itself (nid != qid;
    ids share one space in the contract fixtures). Ties break
    deterministically (dist2/cid on probe, cos desc/nid asc on rank)."""
    lists = assign_to_centroids(vectors, centroids)
    qpairs = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "dist2", F.expr(_L2.format(a="qv", b="cv"))
    )
    qw = W.partitionBy("qid").orderBy(F.asc("dist2"), F.asc("cid"))
    probes = (
        qpairs.withColumn("_rn", F.row_number().over(qw))
        .filter(F.col("_rn") <= nprobe)
        .select("qid", "qv", "cid")
    )
    # norms are per-vector/per-query: computed ONCE on each side and
    # carried as scalar columns, not re-folded per candidate pair
    # (same left-to-right fold, so the doubles are bit-identical and
    # oracle parity is preserved)
    lists_n = lists.withColumn("_vn", F.expr(f"sqrt({DOT.format(a='v', b='v')})"))
    probes_n = probes.withColumn("_qn", F.expr(f"sqrt({DOT.format(a='qv', b='qv')})"))
    cand = lists_n.join(probes_n, "cid").filter(F.col("id") != F.col("qid"))
    scored = cand.withColumn(
        "cos",
        F.expr(f"{DOT.format(a='qv', b='v')} / (_qn * _vn)"),
    )
    rw = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    return (
        scored.withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= k)
        .select(
            "qid",
            F.col("id").alias("nid"),
            F.col("rnk").cast("long").alias("rnk"),
            F.round("cos", 6).alias("cos"),
        )
    )

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
        F.col("id").alias(out_id),
        F.col("_b.v").alias("v"),
        F.col("_b.cid").alias("cid"),
        F.col("_b.dist2").alias("dist2"),
    )


def build_ivf_index(vectors: DataFrame, centroids: DataFrame, path: str) -> None:
    """Persist the IVF index as tables (round-5 task 7) so ANN
    composes with the incremental corpus (operators/dedup.merge_corpus
    appends documents; this gives their embeddings somewhere to go
    without a full recluster):

    - ``<path>/assignments``: (id, cid, dist2) — ids only, never the
      vector payload (embeddings stay in the corpus table; the index
      joins back by id), so the index is a fraction of corpus size;
    - ``<path>/centroids``: (cid, cv, n_assigned, mean_dist2) — the
      per-list population and mean squared distance AT BUILD TIME,
      which becomes the frozen drift baseline ``ivf_add_batch``
      measures against.

    Post-write discipline: centroid stats aggregate over the WRITTEN
    assignments parquet, so the assignment pass evaluates once (the
    ccnet lineage-branch lesson applied here)."""
    assign_to_centroids(vectors, centroids).select(
        "id", "cid", F.round("dist2", 6).alias("dist2")
    ).write.mode("overwrite").parquet(path + "/assignments")
    spark = vectors.sparkSession
    stats = (
        spark.read.parquet(path + "/assignments")
        .groupBy("cid")
        .agg(
            F.count("*").cast("long").alias("n_assigned"),
            F.round(F.avg("dist2"), 6).alias("mean_dist2"),
        )
    )
    centroids.join(stats, "cid", "left").select(
        "cid",
        "cv",
        F.coalesce("n_assigned", F.lit(0).cast("long")).alias("n_assigned"),
        "mean_dist2",
    ).write.mode("overwrite").parquet(path + "/centroids")


def ivf_add_batch(
    spark,
    path: str,
    new_vectors: DataFrame,
    drift_threshold: float = 1.5,
) -> DataFrame:
    """Incrementally extend a persisted IVF index with a new vector
    batch — the merge_corpus discipline applied to ANN: the batch
    joins the INDEX (batch-vs-index, never index-vs-index), existing
    ids are skipped (anti-join on id, same dedup rule as the corpus
    merge), and survivors are assigned to the EXISTING centroids (no
    recluster) and appended to ``<path>/assignments``.

    Returns the per-list drift report — the signal that says WHEN the
    no-recluster shortcut stops being safe: (cid, n_new,
    base_mean_dist2, batch_mean_dist2, drift, drifted) where drift =
    round(batch_mean / base_mean, 6) and ``drifted`` flags lists whose
    new members sit ``drift_threshold``× further from their centroid
    than the build-time population (distribution moved → recluster
    this list). Lists with no build-time baseline (n_assigned 0,
    mean_dist2 NULL) report NULL drift and are flagged whenever they
    receive any vectors at all — a list filling from nothing is drift
    by definition. The baseline is FROZEN at build time; add-batch
    never rewrites the centroids table, so repeated batches measure
    against one reference.

    Scale shape: one broadcast assignment pass over the batch + one
    id-keyed anti-join against the assignments table; the drift report
    groups on ~k centroid keys."""
    centroids = spark.read.parquet(path + "/centroids")
    existing = spark.read.parquet(path + "/assignments")
    # merge_corpus discipline, BOTH halves: dedup within the batch
    # first (a union of shards can repeat an id — one hash aggregate
    # keeping the min-vector copy, deterministic), then anti-join the
    # index so already-indexed ids are skipped
    batch_once = (
        new_vectors.groupBy("id")
        .agg(F.min(F.struct("v")).alias("_m"))
        .select("id", F.col("_m.v").alias("v"))
    )
    fresh = batch_once.join(
        existing.select(F.col("id")), "id", "left_anti"
    )
    assigned = assign_to_centroids(
        fresh, centroids.select("cid", "cv")
    ).select("id", "cid", F.round("dist2", 6).alias("dist2"))
    assigned.write.mode("append").parquet(path + "/assignments")
    # drift over the batch just written (read back: one cheap scan of
    # the appended files' keys would need a batch marker — instead
    # aggregate the assigned frame we still hold; it was just
    # materialized by the write, and re-evaluating the broadcast
    # assignment over one batch is the cheap side by construction)
    batch_stats = assigned.groupBy("cid").agg(
        F.count("*").cast("long").alias("n_new"),
        F.round(F.avg("dist2"), 6).alias("batch_mean_dist2"),
    )
    return (
        centroids.select("cid", F.col("mean_dist2").alias("base_mean_dist2"))
        .join(batch_stats, "cid", "left")
        .select(
            "cid",
            F.coalesce("n_new", F.lit(0).cast("long")).alias("n_new"),
            "base_mean_dist2",
            "batch_mean_dist2",
            # try_divide: a base mean of exactly 0 (every build-time
            # member sat ON the centroid) is a legal baseline and must
            # not raise under ANSI — it reports NULL drift and falls
            # to the degenerate-baseline rule below
            F.round(
                F.expr("try_divide(batch_mean_dist2, base_mean_dist2)"), 6
            ).alias("drift"),
            F.when(
                F.col("base_mean_dist2").isNull()
                | (F.col("base_mean_dist2") == 0.0),
                # no baseline (empty list) or zero baseline: any new
                # member OFF the centroid is drift by definition
                (F.col("n_new") > 0)
                & (F.coalesce("batch_mean_dist2", F.lit(0.0)) > 0.0),
            )
            .otherwise(
                F.coalesce(
                    F.col("batch_mean_dist2") / F.col("base_mean_dist2")
                    > drift_threshold,
                    F.lit(False),
                )
            )
            .alias("drifted"),
        )
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


# ---------------------------------------------------------------------------
# product quantization: encode + asymmetric-distance search
# ---------------------------------------------------------------------------

def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    m: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization encoding (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): the vector
    splits into ``m`` equal subspaces and each subvector is replaced by
    the id of its nearest codebook centroid (L2, ties to the smaller
    cid — the engine's frozen tie-break). ``codebooks`` is
    (sub, cid, cv: array<double>) — train it per subspace with the
    k-means operator; at 100 TB a PQ code table is dim/m × log2(k)
    bits per vector instead of 4·dim bytes (a 64-dim float vector at
    m=4, k=256 compresses 64×).

    Physical shape: one narrow explode to (vector, subspace) grain, a
    BROADCAST join against the codebook (model-sized by definition),
    a per-(id, sub) min — partial-aggregable min(struct), no window —
    and one group back to vector grain. Output: (vec_id,
    codes: array<int>) with codes ordered by subspace."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    d = vectors.selectExpr(
        f"{id_col} as vec_id",
        f"size({vec_col}) as __dim",
        f"{vec_col} as __v",
    )
    sub = d.selectExpr(
        "vec_id",
        f"explode(sequence(0, {m - 1})) as sub",
        # a non-divisible m would silently drop trailing dimensions
        # and dim < m degenerates every code to cid 0 (empty slices) —
        # refuse at runtime instead (review finding)
        f"CASE WHEN __dim % {m} = 0 AND __dim >= {m} THEN __dim div {m}"
        f" ELSE raise_error(concat('pq_encode: vector dim ',"
        f" cast(__dim as string), ' is not a positive multiple of"
        f" m={m}')) END as __w",
        "__v",
    ).selectExpr(
        "vec_id",
        "sub",
        "slice(__v, sub * __w + 1, __w) as __sv",
    )
    scored = sub.join(F.broadcast(codebooks), "sub").selectExpr(
        "vec_id",
        "sub",
        "cid",
        "aggregate(zip_with(__sv, cv, (x, y) -> (cast(x as double) - y)"
        " * (cast(x as double) - y)), cast(0.0 as double),"
        " (a, t) -> a + t) as dist2",
    )
    best = scored.groupBy("vec_id", "sub").agg(
        F.min(F.struct("dist2", "cid"))["cid"].alias("code")
    )
    return best.groupBy("vec_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(sub, code))),"
            " s -> s.code)"
        ).alias("codes")
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    query: DataFrame,
    k: int = 10,
    m: int = 4,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query stays
    UN-quantized, its distance to every codebook centroid is
    precomputed per subspace (the LUT — m·k doubles, broadcast), and a
    vector's approximate distance is the SUM of its codes' LUT
    entries. ``query`` is a 1-row (qv: array<double>) frame. Returns
    the ``k`` nearest (vec_id, adc_dist2), ties to the smaller
    vec_id.

    Physical shape: the LUT build is codebook-grain; scoring explodes
    codes to (vec_id, sub, code), equi-joins the BROADCAST LUT, and
    partial-aggregates the sum — never a corpus×corpus or
    corpus×query shuffle. The final top-k is a TakeOrdered, not a
    global sort."""
    w = f"(size(qv) div {m})"
    lut = codebooks.crossJoin(F.broadcast(query)).selectExpr(
        "sub",
        "cid as code",
        f"aggregate(zip_with(slice(qv, sub * {w} + 1, {w}), cv,"
        " (x, y) -> (x - y) * (x - y)), cast(0.0 as double),"
        " (a, t) -> a + t) as d2",
    )
    per_sub = codes.selectExpr(
        "vec_id", "posexplode(codes) as (sub, code)"
    )
    return (
        per_sub.join(F.broadcast(lut), ["sub", "code"])
        .groupBy("vec_id")
        .agg(F.sum("d2").alias("adc_dist2"))
        .orderBy(F.asc("adc_dist2"), F.asc("vec_id"))
        .limit(k)
    )


def ivfpq_search(
    assignments: DataFrame,
    codes: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    query: DataFrame,
    nprobe: int = 2,
    k: int = 10,
    m: int = 4,
) -> DataFrame:
    """IVF + PQ composed — the FAISS-IVFPQ shape at full 100 TB scale:
    the coarse quantizer (``centroids``) prunes the corpus to the
    ``nprobe`` nearest inverted lists, and only THOSE vectors' PQ
    codes pay the ADC scoring. ``assignments`` is (vec_id, cid) from
    :func:`assign_to_centroids` / the persistent IVF index; ``codes``
    from :func:`pq_encode`. This subset encodes raw vectors (not
    IVF residuals — the residual refinement is a documented delta
    from the paper's IVFADC, traded for one less codebook family).

    Physical shape: the probe set is nprobe rows (broadcast), the
    candidate filter is one broadcast semi-join on the list id, and
    everything after is :func:`pq_adc_topk`'s broadcast-LUT partial
    sum. Recall dials with ``nprobe`` exactly like :func:`ivf_search`
    (recall_audit measures it)."""
    probed = (
        centroids.crossJoin(F.broadcast(query))
        .withColumn("d2", F.expr(_L2.format(a="cv", b="qv")))
        .orderBy(F.asc("d2"), F.asc("cid"))
        .limit(nprobe)
        .select("cid")
    )
    cand = assignments.join(F.broadcast(probed), "cid").select("vec_id")
    return pq_adc_topk(
        codes.join(cand, "vec_id"), codebooks, query, k=k, m=m
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup via centroid-blocked cosine
# ---------------------------------------------------------------------------

def semantic_dedup(
    vectors: DataFrame,
    centroids: DataFrame,
    tau: float = 0.95,
    id_col: str = "id",
) -> DataFrame:
    """(id, cid, kept): SemDeDup (Abbas et al. 2023, arXiv:2303.09540)
    — drop semantic near-duplicates, where "near" is cosine >= ``tau``
    WITHIN a k-means cluster (the clusters are the blocking keys: the
    corpus-size pair explosion of embed_cosine_neardup's LSH buckets,
    but blocked by semantic region instead of random hyperplanes).

    Frozen semantics (the DuckDB oracle restates them):

    - assignment: nearest centroid by L2, ties to the smaller cid
      (:func:`assign_to_centroids` — the IVF coarse quantizer, so a
      persisted IVF index doubles as the SemDeDup clustering);
    - retention order within a cluster: distance-to-centroid
      DESCENDING, then id ASCENDING — the paper's "keep the examples
      farthest from the centroid" rule (they anchor the cluster's
      semantic region; the ones packed near the middle are the
      redundant copies);
    - a vector is dropped iff SOME vector earlier in that order is
      within ``tau`` cosine of it — the published implementation's
      upper-triangular max-similarity test (earlier-vs-it, regardless
      of whether the earlier one itself survived; NOT transitive
      chaining, which is connected_components' job).

    Scale shape (100 TB): the only corpus-sized shuffle keys on cid;
    within-cluster pairing is O(c^2) per cluster, so k is a REQUIRED
    knob — size k ~ N / target_cluster_size exactly as the paper does
    (50k clusters for LAION), and residual hot clusters split under
    AQE. Vector math is JVM column expressions; norms fold once per
    row, never per pair.
    """
    a = assign_to_centroids(vectors, centroids, out_id="id").withColumn(
        "_vn", F.expr(f"sqrt({DOT.format(a='v', b='v')})")
    )
    l = a.select(
        F.col("id").alias("lid"), F.col("cid"),
        F.col("v").alias("lv"), F.col("_vn").alias("_ln"),
        F.col("dist2").alias("ld"),
    )
    r = a.select(
        F.col("id").alias("rid"), F.col("cid"),
        F.col("v").alias("rv"), F.col("_vn").alias("_rn"),
        F.col("dist2").alias("rd"),
    )
    # r strictly earlier than l in the retention order
    earlier = (F.col("rd") > F.col("ld")) | (
        (F.col("rd") == F.col("ld")) & (F.col("rid") < F.col("lid"))
    )
    dropped = (
        l.join(r, "cid")
        .filter(earlier)
        .filter(
            F.expr(f"{DOT.format(a='lv', b='rv')} / (_ln * _rn)")
            >= F.lit(tau)
        )
        .select(F.col("lid").alias("id"))
        .distinct()
    )
    return a.join(dropped.withColumn("_dropped", F.lit(True)), "id", "left").select(
        F.col("id").alias(id_col),
        "cid",
        F.coalesce(~F.col("_dropped"), F.lit(True)).alias("kept"),
    )

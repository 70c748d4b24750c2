"""Reusable deduplication operators over any (id, text) table.

All column math, no Python in the hot path (functions/hashing.py).
The contract queries in contract_ml.py pin these against DuckDB
oracles; these wrappers are the user-facing API.

100 TB notes per operator in the docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import hashing as H


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(content_hash, n_copies, canonical_doc). One shuffle on a
    16-byte key with map-side partial aggregation — the cheapest pass;
    run it before any near-dup stage to shrink the candidate set."""
    return df.groupBy(F.md5(text_col).alias("content_hash")).agg(
        F.count("*").alias("n_copies"),
        F.min(id_col).alias("canonical_doc"),
    )


def _shingle_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(doc_id, sh): DISTINCT word-n-gram shingle hash set per doc —
    the derivation shared by the LSH blocker (signatures are per-lane
    mins over exactly these hashes) and the Jaccard verifier. Factored
    out (round 6) so an LSH-then-verify composition can derive and
    ``localCheckpoint`` it ONCE instead of char-folding the corpus
    once per plan branch (the band-table self-join plus the verify
    join's two sides re-derived it four times — measured ~40% of the
    audit's wall at sf1.0)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .withColumn("toks", H.tokens("text"))
        .filter(F.size("toks") >= n)
        .withColumn("th", H.token_hashes("toks"))
        .select("doc_id", H.shingle_hashes("th", n).alias("sh"))
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    max_bucket: int = 1024,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (doc1, doc2) via MinHash + banded LSH.
    The only shuffle is the equi-join on (band_idx, band_val) —
    colliding docs only.

    Hot buckets (viral boilerplate) are capped at ``max_bucket``
    members BEFORE the self-join: per bucket, the ``max_bucket``
    smallest doc ids are kept (deterministic bounded sample — a
    row_number window partitioned by the bucket key, so the cap is
    parallel across buckets). Without the cap one boilerplate bucket
    at 100 TB is a quadratic pair explosion on a single key; with it
    the worst bucket emits ≤ max_bucket² pairs and every member of a
    capped bucket still links into the cluster through the retained
    sample. Pass ``max_bucket=None`` to disable (exact small-scale
    oracle comparisons).

    Physical shape: shingle hashes are EXPLODED to rows and all k
    signature lanes computed in ONE hash-aggregate pass (map-side
    partial mins). The pure-array form (transform per lane) made
    Catalyst re-evaluate the shingle array once per lane — measured
    4× slower — and explode+agg is also the form that scales: partial
    mins combine, so the shuffle carries k longs per doc. The self-
    join's two aliases share one physical derivation at runtime (the
    window's exchange is reused — A/B-measured identical to an
    explicit checkpoint, so none is taken). ``shingles`` optionally
    supplies a precomputed :func:`_shingle_table` so a composed
    LSH-then-verify pipeline derives it once."""
    bandvals = _band_table(
        df, id_col, text_col, k, bands, max_bucket, shingles=shingles
    )
    b1, b2 = bandvals.alias("b1"), bandvals.alias("b2")
    return (
        b1.join(
            b2,
            (F.col("b1.band_idx") == F.col("b2.band_idx"))
            & (F.col("b1.band_val") == F.col("b2.band_val"))
            & (F.col("b1.doc_id") < F.col("b2.doc_id")),
        )
        .select(F.col("b1.doc_id").alias("doc1"), F.col("b2.doc_id").alias("doc2"))
        .distinct()
    )


def _band_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    bands: int,
    max_bucket: int | None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band_idx, band_val) with the per-bucket cap applied —
    the LSH half shared by the self-join (minhash_lsh_candidates) and
    the two-corpus join (cross_corpus_candidates). Same signature
    math: explode shingles, all k lanes in one hash-aggregate.
    ``shingles`` optionally supplies the precomputed (doc_id, sh)
    table (:func:`_shingle_table`) — identical values, derived once.

    TRAP (round-6, the Generate variant of the CLAUDE.md no-CSE rule):
    ``explode`` over a DERIVED array column re-evaluates the whole
    array expression once per EMITTED element after CollapseProject
    inlines it into the Generate — measured 90 s vs 1.4 s on 5k docs.
    So the expression path below keeps the explode FUSED over the
    inline shingle expression (one evaluation per row), and only a
    MATERIALIZED ``shingles`` table (localCheckpoint/scan — nothing to
    inline) may be exploded column-wise."""
    if shingles is not None:
        hs = shingles.select("doc_id", F.explode("sh").alias("h"))
    else:
        hs = (
            df.select(
                F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
            )
            .withColumn("toks", H.tokens("text"))
            .filter(F.size("toks") >= 3)
            .withColumn("th", H.token_hashes("toks"))
            .select("doc_id", F.explode(H.shingle_hashes("th", 3)).alias("h"))
        )
    sig = hs.groupBy("doc_id").agg(
        *[
            F.min(F.expr(f"((2*{i} + 3) * h + 5*{i} + 7) % {H.P}")).alias(f"s{i}")
            for i in range(k)
        ]
    )
    bandvals = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    (F.col(f"s{2 * j}") * F.lit(H.P) + F.col(f"s{2 * j + 1}"))
                    for j in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    if max_bucket is not None:
        from pyspark.sql import Window as W

        w = W.partitionBy("band_idx", "band_val").orderBy("doc_id")
        bandvals = (
            bandvals.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_bucket)
            .drop("_rn")
        )
    return bandvals


def build_lsh_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    max_bucket: int = 1024,
) -> None:
    """Persist the banded LSH dedup index (round-5, the MinHash twin
    of ann.build_ivf_index): ``<path>/bands`` = (doc_id, band_idx,
    band_val) with the hot-bucket cap applied, ``<path>/params`` pins
    (k, bands, max_bucket) so every later batch bands with the SAME
    signature math — a batch banded under different parameters would
    silently collide with nothing.

    Why persist: :func:`cross_corpus_candidates` re-shingles and
    re-bands the EXISTING corpus on every call — at 100 TB that
    re-scan dominates each increment. The band table is k longs per
    doc (a small fraction of corpus size); with it on disk, each
    incoming crawl batch costs O(batch) banding + one band-keyed
    join."""
    spark = df.sparkSession
    _band_table(df, id_col, text_col, k, bands, max_bucket).write.mode(
        "overwrite"
    ).parquet(path + "/bands")
    spark.createDataFrame(
        [(k, bands, max_bucket)], "k int, bands int, max_bucket int"
    ).write.mode("overwrite").parquet(path + "/params")


def lsh_add_batch(
    spark,
    path: str,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Extend a persisted LSH index with a crawl batch and return the
    batch's near-dup candidate pairs: (new_id, other_id, via) with
    ``via`` = 'index' (candidate already indexed) or 'batch' (both
    sides new). merge_corpus discipline throughout: already-indexed
    ids are skipped (anti-join on the index's doc ids); the batch
    bands ONCE with the index's recorded parameters; candidate
    generation joins batch-vs-index and batch-vs-batch only — the
    indexed corpus never re-shingles and never self-joins.

    Hot buckets: the cap bounds the index build and each batch's band
    table separately, so a viral bucket can exceed the cap ACROSS
    increments; periodic compaction (rebuild via build_lsh_index over
    the merged corpus) re-caps — the LSM discipline, same as the
    drift-triggered recluster in ann.ivf_add_batch."""
    p = spark.read.parquet(path + "/params").collect()[0]
    eb = spark.read.parquet(path + "/bands")
    fresh = new_df.join(
        eb.select(F.col("doc_id").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
    # materialize the batch's band table ONCE (localCheckpoint): the
    # append action, the vs-index join, and the within-batch self-join
    # all read it — without this the batch re-shingles per consumer,
    # the exact waste the persistent index exists to avoid
    nb = _band_table(
        fresh, id_col, text_col, p["k"], p["bands"], p["max_bucket"]
    ).localCheckpoint(eager=True)
    vs_index = (
        nb.alias("n")
        .join(
            eb.alias("e"),
            (F.col("n.band_idx") == F.col("e.band_idx"))
            & (F.col("n.band_val") == F.col("e.band_val")),
        )
        .select(
            F.col("n.doc_id").alias("new_id"),
            F.col("e.doc_id").alias("other_id"),
            F.lit("index").alias("via"),
        )
    )
    within = (
        nb.alias("a")
        .join(
            nb.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("new_id"),
            F.col("b.doc_id").alias("other_id"),
            F.lit("batch").alias("via"),
        )
    )
    pairs = vs_index.unionByName(within).distinct()
    # append AFTER eb's file listing is snapshotted (read above): the
    # lazy `pairs` plan keeps joining the pre-append band set
    nb.write.mode("append").parquet(path + "/bands")
    return pairs


def cross_corpus_candidates(
    new_df: DataFrame,
    existing_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    max_bucket: int = 1024,
) -> DataFrame:
    """(new_id, existing_id): near-dup candidates BETWEEN an incoming
    batch and the existing corpus — the incremental-crawl shape.
    Joining the two band tables (instead of banding their union and
    self-joining) never generates existing×existing pairs, so the
    dominant cost scales with the BATCH, not with the corpus the
    pipeline has already deduplicated. The hot-bucket cap applies per
    side (the existing corpus's viral buckets stay bounded even when
    the batch keeps hitting them)."""
    nb = _band_table(new_df, id_col, text_col, k, bands, max_bucket)
    eb = _band_table(existing_df, id_col, text_col, k, bands, max_bucket)
    return (
        nb.alias("n")
        .join(
            eb.alias("e"),
            (F.col("n.band_idx") == F.col("e.band_idx"))
            & (F.col("n.band_val") == F.col("e.band_val")),
        )
        .select(
            F.col("n.doc_id").alias("new_id"),
            F.col("e.doc_id").alias("existing_id"),
        )
        .distinct()
    )


def merge_corpus(
    existing: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-content incremental merge: (id_col, text_col, origin)
    where origin is 'existing' or 'new'. An incoming document is
    dropped iff its md5(text) already exists in the corpus, or an
    earlier (smaller-id) member of the SAME batch carries it. The
    near-dup layer composes on top: run
    :func:`cross_corpus_candidates` on the survivors and
    :func:`jaccard_verify_pairs` across the union.

    Scale shape: one md5 per document (narrow), a within-batch
    row_number on the content hash (batch-sized), and one anti-join of
    batch hashes against corpus hashes — fine-grained hash keys, both
    sides co-partition; nothing corpus-wide is collected or sorted."""
    from pyspark.sql import Window as W

    known = existing.select(F.md5(text_col).alias("_h")).distinct()
    nh = new.withColumn("_h", F.md5(text_col))
    w = W.partitionBy("_h").orderBy(id_col)
    fresh = (
        nh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .join(known, "_h", "left_anti")
        .select(id_col, text_col)
    )
    return (
        existing.select(id_col, text_col)
        .withColumn("origin", F.lit("existing"))
        .unionByName(fresh.withColumn("origin", F.lit("new")))
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """(doc_id, simhash). Narrow — no shuffle at all; near-dup
    candidates come from grouping on simhash or hamming-ball bands."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .withColumn("toks", H.tokens("text"))
        .withColumn("th", H.token_hashes("toks"))
        .select("doc_id", H.simhash("th", bits).alias("simhash"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    block_cols: tuple[str, ...],
    n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard within EXPLICIT blocking keys — the
    small-block form. ``block_cols`` is deliberately keyword-only with
    no default: each block is an a×b self-join, quadratic in the block
    size, so the caller must choose keys that bound blocks (a coarse
    key like ``lang`` alone is billions of docs per block at 100 TB).
    For corpus-scale near-dup detection use the LSH-then-verify path
    instead: :func:`minhash_lsh_candidates` →
    :func:`jaccard_verify_pairs` (linear in candidate pairs)."""
    sh = (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"), *block_cols)
        .withColumn("toks", H.tokens("text"))
        .filter(F.size("toks") >= n)
        .withColumn("th", H.token_hashes("toks"))
        .withColumn("sh", H.shingle_hashes("th", n))
        .drop("text", "toks", "th")
    )
    a, b = sh.alias("a"), sh.alias("b")
    cond = F.col("a.doc_id") < F.col("b.doc_id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # |A∪B| = |A|+|B|−|A∩B| for the DISTINCT shingle sets — same
    # integers as size(array_union(...)), without allocating the union
    # array per pair (round-6: measured ~2× on the pair projection)
    inter = F.size(F.array_intersect("a.sh", "b.sh"))
    return a.join(b, cond).select(
        F.col("a.doc_id").alias("doc1"),
        F.col("b.doc_id").alias("doc2"),
        F.round(
            inter / (F.size("a.sh") + F.size("b.sh") - inter), 6
        ).alias("jaccard"),
    )


def jaccard_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard scored over a CANDIDATE-PAIR table —
    the verify half of LSH-then-verify, the standard 100 TB near-dup
    shape: a cheap recall-oriented blocker (:func:`minhash_lsh_candidates`)
    proposes pairs, this operator computes the exact similarity for
    just those pairs.

    Physical shape: shingle sets are derived once per document
    (narrow), then the pair table is equi-joined to them twice on the
    doc id — cost is linear in |pairs| + |docs|, never quadratic in
    any block. Both joins key on corpus-sized ids, so at scale they
    co-partition; no self-join of the corpus exists anywhere in the
    plan. Documents with fewer than ``n`` tokens have no shingle set —
    pairs referencing them drop out (inner join), mirroring the
    blocker's own ``size(toks) >= 3`` floor.

    Returns (doc1, doc2, jaccard); filter on a threshold downstream
    (e.g. ``>= 0.8``) to get verified duplicates for
    :func:`connected_components`. ``shingles`` optionally supplies a
    precomputed :func:`_shingle_table` (round 6: composed pipelines
    checkpoint it once; the doc1/doc2 join sides otherwise each
    re-derive it — plan-verified double FileScan)."""
    sh = (
        shingles
        if shingles is not None
        else _shingle_table(df, id_col, text_col, n)
    )
    # shuffle_hash on the doc-grain side (guide §3.1): the pair table
    # is the big side and per-partition shingle sets build a modest
    # hash relation, so skipping the two sorts of the pair table is a
    # measured ~20% win at sf1.0 (A/B smj 50-57 s vs shj 40-42 s);
    # falls back gracefully where AQE prefers otherwise
    sh = sh.hint("shuffle_hash")
    return (
        pairs.select("doc1", "doc2")
        .join(sh.select(F.col("doc_id").alias("doc1"), F.col("sh").alias("sh1")), "doc1")
        .join(sh.select(F.col("doc_id").alias("doc2"), F.col("sh").alias("sh2")), "doc2")
        .select(
            "doc1",
            "doc2",
            # |A∪B| = |A|+|B|−|A∩B| over the distinct shingle sets —
            # identical integers, no per-pair union array (round-6:
            # measured ~2× on the 32M-pair projection at sf1.0)
            F.round(
                F.size(F.array_intersect("sh1", "sh2"))
                / (
                    F.size("sh1") + F.size("sh2")
                    - F.size(F.array_intersect("sh1", "sh2"))
                ),
                6,
            ).alias("jaccard"),
        )
    )


def containment_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Asymmetric CONTAINMENT scored over a candidate-pair table —
    the wrapper-page detector Jaccard misses. A page that embeds
    another document whole (syndication shells, print views, quote
    farms) can sit far below any Jaccard threshold because the
    wrapper's own boilerplate inflates the union; containment of the
    smaller shingle set in the larger is ~1.0 regardless of how much
    chrome the wrapper adds (Broder's resemblance-vs-containment
    distinction, SEQUENCES 1997).

    Frozen rule: same word-n-gram shingle sets as
    :func:`jaccard_verify_pairs`; per pair emit
    ``jaccard = |A∩B| / |A∪B|``, ``containment1 = |A∩B| / |A|``,
    ``containment2 = |A∩B| / |B|``, and
    ``containment = max(containment1, containment2)`` (the decision
    column: it is "the smaller set's coverage" whichever side that
    is). All four rounded to 6.

    Physical shape: identical to the Jaccard verify — shingles derive
    once per doc (narrow), two id-grain equi-joins, cost linear in
    |pairs| + |docs|, no quadratic form anywhere."""
    sh = _shingle_table(df, id_col, text_col, n).hint("shuffle_hash")
    inter = F.size(F.array_intersect("sh1", "sh2"))
    return (
        pairs.select("doc1", "doc2")
        .join(sh.select(F.col("doc_id").alias("doc1"), F.col("sh").alias("sh1")), "doc1")
        .join(sh.select(F.col("doc_id").alias("doc2"), F.col("sh").alias("sh2")), "doc2")
        .select(
            "doc1",
            "doc2",
            # union size via |A|+|B|−|A∩B| (the jaccard_verify note)
            F.round(
                inter / (F.size("sh1") + F.size("sh2") - inter), 6
            ).alias("jaccard"),
            F.round(inter / F.size("sh1"), 6).alias("containment1"),
            F.round(inter / F.size("sh2"), 6).alias("containment2"),
            F.round(
                F.greatest(inter / F.size("sh1"), inter / F.size("sh2")), 6
            ).alias("containment"),
        )
    )


def near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    k: int = 8,
    bands: int = 4,
    max_bucket: int = 1024,
) -> DataFrame:
    """End-to-end LSH-then-verify: MinHash+LSH candidates, exact
    3-gram Jaccard per candidate, thresholded. The one-call corpus
    near-dup operator (doc1, doc2, jaccard). The shingle table is
    derived once and ``localCheckpoint``-ed (round 6) — blocker and
    verifier otherwise each re-derive it per join side."""
    sh = _shingle_table(df, id_col, text_col, 3).localCheckpoint(eager=True)
    cand = minhash_lsh_candidates(
        df, id_col=id_col, text_col=text_col, k=k, bands=bands,
        max_bucket=max_bucket, shingles=sh,
    )
    return jaccard_verify_pairs(
        df, cand, id_col=id_col, text_col=text_col, shingles=sh
    ).filter(F.col("jaccard") >= threshold)


def connected_components(
    pairs: DataFrame, max_iterations: int = 50, strict: bool = True
) -> DataFrame:
    """Duplicate-cluster canonicalization: connected components over a
    candidate-pair graph (doc1, doc2) by iterative min-label
    propagation — each node's label converges to the minimum doc id of
    its component (the canonical document).

    This is the engine's iterative-algorithm shape: a driver-side loop
    of self-joins with an early-exit convergence check. Each round is
    one shuffle on the node id; components of diameter d converge in
    ≤ d rounds (boilerplate dup clusters are near-cliques → 1-2
    rounds). At 100 TB, checkpoint every few rounds to cut lineage.

    Returns (doc_id, component) for every node in the graph. If the
    graph has not converged after ``max_iterations`` (a component of
    diameter > max_iterations), raises RuntimeError when ``strict``
    (default) — silent truncation would split one duplicate cluster
    into several with different canonical docs.
    """
    edges = (
        pairs.select(F.col("doc1").alias("a"), F.col("doc2").alias("b"))
        .unionAll(pairs.select(F.col("doc2").alias("a"), F.col("doc1").alias("b")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .cache()
    )
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        # localCheckpoint truncates lineage each round — without it the
        # plan tree grows multiplicatively per iteration and even plan
        # stringification OOMs the driver by ~30 rounds (observed)
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged and strict:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (component diameter too large); raise "
            "max_iterations or pass strict=False for best-effort labels"
        )
    return labels.select(F.col("node").alias("doc_id"), "component")


def exact_substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    min_occurrences: int = 2,
) -> DataFrame:
    """Exact duplicated-substring removal (the Lee-et-al. "deduplicating
    training data" pass): any k-token window whose exact content occurs
    ``min_occurrences``-or-more times in the corpus (same doc included)
    is removed from every occurrence EXCEPT the canonical one — the
    smallest (doc id, position). Returns
    (id_col, clean_text, n_tokens, n_tokens_removed); surviving tokens
    keep their original order (clean_text is whitespace-normalized:
    tokens joined by single spaces, for touched and untouched docs
    alike).

    Two-level find-then-verify (the engine's LSH-then-verify shape,
    applied to exactness): a cheap polynomial window hash groups ALL
    occurrences (O(tokens·k) integer ops, narrow); only windows whose
    cheap-hash group reaches ``min_occurrences`` are re-keyed by md5 OF
    THE WINDOW TEXT (128 bits, the corpus exact-dedup key discipline)
    — a polynomial collision therefore costs a little wasted md5 work,
    never a false removal, while equal content can never be missed
    (equal text ⇒ equal cheap hash). md5 cost and all downstream
    shuffles track the DUPLICATED volume, not the corpus; the
    token-explode rebuild is left-semi restricted to affected
    documents, and untouched documents pass through as a pure column
    expression.

    Round-6 perf note: the CANDIDATE hash lane uses native
    ``xxhash64(token) pmod P`` instead of the interpreted per-char
    polynomial fold — legal precisely because the cheap hash only
    PROPOSES groups (equal window text ⇒ equal cheap hash under any
    deterministic token-hash function, so every true duplicate still
    groups; collisions only add members) and the md5-of-window-text
    verify alone decides removals. Output is value-identical; the
    frozen polynomial family stays untouched where hashes ARE the
    result (minhash signatures, LSH bands, simhash).

    Span preservation: clean_text here is TOKEN-rebuilt (whitespace
    normalized), so it is not a character-subsequence of the input and
    a char-offset span remap is ill-defined on it by construction. A
    pipeline that needs cleaned text WITH surviving region structure
    should run the region-unit variant
    (operators/paragraphs.remove_frequent_regions, contract key
    span_preserving_cleanup), whose removal granularity aligns with
    span boundaries and remaps offsets exactly."""
    toks = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        .withColumn("toks", H.tokens("text"))
        .withColumn(
            "th", F.expr(f"transform(toks, t -> pmod(xxhash64(t), {H.P}))")
        )
    )
    occ = toks.select(
        "id",
        F.posexplode(F.expr(H.window_hashes_sql("th", k))).alias("pos", "gp"),
    )
    cand_groups = (
        occ.groupBy("gp")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_occurrences)
        .select("gp")
    )
    # md5-verify ONLY candidate occurrences: one toks copy per affected
    # doc (positions grouped first), window text sliced per position
    cand_pos = (
        occ.join(cand_groups, "gp")
        .groupBy("id")
        .agg(F.collect_list("pos").alias("cpos"))
    )
    ver = (
        toks.join(cand_pos, "id")
        .select(
            "id",
            F.explode(
                F.expr(
                    f"transform(cpos, p -> struct(p as pos,"
                    f" md5(array_join(slice(toks, p + 1, {k}), ' ')) as g))"
                )
            ).alias("w"),
        )
        .select("id", F.col("w.pos").alias("pos"), F.col("w.g").alias("g"))
    )
    dup = ver.groupBy("g").agg(
        F.count("*").alias("occ"),
        F.min(F.struct("id", "pos")).alias("canon"),
    ).filter(F.col("occ") >= min_occurrences)
    bad = (
        ver.join(dup, "g")
        .filter(
            (F.col("id") != F.col("canon.id")) | (F.col("pos") != F.col("canon.pos"))
        )
        .select("id", F.explode(F.expr(f"sequence(pos, pos + {k} - 1)")).alias("ti"))
        .distinct()
    )
    affected = bad.select("id").distinct()
    tok_rows = toks.join(affected, "id", "left_semi").select(
        "id", F.posexplode("toks").alias("ti", "tok")
    )
    rebuilt = (
        tok_rows.join(bad, ["id", "ti"], "left_anti")
        .groupBy("id")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(ti, tok))), x -> x.tok)"
                ),
                " ",
            ).alias("clean_text"),
            F.count("*").alias("n_kept"),
        )
    )
    touched = (
        toks.join(affected, "id", "left_semi")
        .select("id", F.size("toks").alias("n_tokens"))
        .join(rebuilt, "id", "left")
        .select(
            "id",
            # a fully-duplicated doc loses every token: no rebuilt row
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
        )
    )
    untouched = toks.join(affected, "id", "left_anti").select(
        "id",
        F.expr("array_join(toks, ' ')").alias("clean_text"),
        F.size("toks").alias("n_tokens"),
        F.lit(0).alias("n_removed"),
    )
    return touched.unionByName(untouched).select(
        F.col("id").alias(id_col),
        "clean_text",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_removed").cast("long").alias("n_tokens_removed"),
    )


def resolve_duplicate_clusters(
    labels: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    label_col: str = "component",
) -> DataFrame:
    """Pick ONE canonical document per duplicate cluster by QUALITY —
    the resolution step after :func:`connected_components`: components
    name clusters but choose the min-id doc as canonical, which is
    arbitrary; corpus curation wants the best-scoring member kept and
    the rest dropped. Frozen rule: every doc's cluster is its
    component label (docs absent from ``labels`` are singletons —
    their own id); the winner per cluster has the MAX ``score_col``,
    ties broken by MIN doc id. Returns (id_col, component, keep) for
    every input doc.

    Scale shape: one left equi-join on the doc id (labels is
    dup-cluster-grain, far smaller than the corpus) + one window
    partitioned by component. Cluster sizes are duplicate-multiplicity
    — bounded in practice; a pathological mega-cluster (boilerplate
    mirror farm) is exactly the AQE-skew case, and the window stays a
    top-1 (rank, not collect), so it never buffers the cluster."""
    from pyspark.sql import Window as W

    lab = labels.select(
        F.col(id_col).alias("__lid"), F.col(label_col).alias("__comp")
    )
    d = docs.select(F.col(id_col), F.col(score_col))
    j = d.join(lab, d[id_col] == F.col("__lid"), "left").select(
        F.col(id_col),
        F.col(score_col),
        F.coalesce(F.col("__comp"), F.col(id_col)).alias("component"),
    )
    w = W.partitionBy("component").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return j.withColumn(
        "keep", F.row_number().over(w) == F.lit(1)
    ).select(id_col, "component", "keep")

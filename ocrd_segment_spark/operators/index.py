"""Inverted index and BM25 retrieval over the extracted corpus.

The reference engine has no retrieval surface — its queries address
documents by file id. A web-scale corpus needs the opposite: "which
documents mention X" is the primitive behind decontamination audits,
targeted quality review, and topical subsetting, and the standard
answer is an inverted index with BM25 ranking (Robertson et al.;
the exact scoring form below is the Lucene/Okapi one, stated frozen
so the DuckDB oracle can restate it).

Three operators:

1. :func:`build_postings` — (term, doc_id, tf) postings from the text
   column under the corpus-wide frozen tokenization (lowercase,
   space-split, empties dropped — the SAME ``_D_TOKS`` discipline the
   token-count and decontamination contracts already pin).
2. :func:`doc_lengths` — (doc_id, dl) token counts derived from the
   postings themselves (an index artifact, so query scoring never
   touches the corpus table).
3. :func:`bm25_topk` — top-k documents for a bag-of-terms query.

Frozen scoring (k1, b are parameters; N = indexed docs, df_t = docs
containing t, dl = doc length, avgdl = mean dl over the index):

  idf(t)       = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
  s(q, d)      = sum over distinct q-terms t of
                 idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
  ties         = score (rounded to 6) desc, then doc_id asc.

Scale shape (100 TB): ``build_postings`` is explode + ONE shuffle with
map-side partial counts — every (doc, term) group lives in one input
row, so partial aggregation collapses it to final size before the
exchange (deliberately NOT a row-local higher-order-function run-length
encode: interpreted lambdas have no codegen and measured worse — see
CLAUDE.md perf traps). ``bm25_topk`` filters postings to the query's
terms FIRST (an IN over a literal handful — pushed to the parquet scan
of a written index), so everything downstream is candidate-sized: the
df_t aggregate, the doc_lengths join, and the final top-k sort all see
only docs sharing a term with the query. N/avgdl ride a broadcast
1-row aggregate. Nothing corpus-sized shuffles at query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# frozen tokenization — identical to the token-count contract's
# space-split discipline (contract_ml._D_TOKS states the DuckDB twin)
_TOKS = "filter(split(lower({col}), ' '), x -> x != '')"


def build_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, tf) inverted postings. One explode + ONE shuffle
    on (term, doc_id); map-side partial counts collapse each group to
    its final row before the exchange (a document's tokens never span
    partitions). Writers wanting a term-clustered on-disk index should
    ``.repartition('term')`` (or bucketBy) at write time — the operator
    stays layout-neutral."""
    return (
        df.selectExpr(
            f"{id_col} as doc_id",
            f"explode({_TOKS.format(col=text_col)}) as term",
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(postings: DataFrame) -> DataFrame:
    """(doc_id, dl) from the postings — dl = sum(tf) = the document's
    token count under the index tokenization. Derived from the index,
    not the corpus: query scoring composes from index artifacts only."""
    return postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))


def bm25_topk(
    postings: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    doclens: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` (doc_id, score) for a bag-of-terms query under the
    frozen BM25 form in the module docstring. Duplicate query terms
    count once (bag-of-DISTINCT-terms — the common web-query form).

    ``doclens`` defaults to :func:`doc_lengths` over ``postings``;
    pass the precomputed table when querying a written index so the
    only corpus-sized scan is the term-pruned postings read. N and
    avgdl are corpus constants derived from ``doclens`` as a 1-row
    broadcast (an index-build artifact in a persisted deployment).

    Scale: the literal IN prunes postings at the scan; df_t, the dl
    join and the top-k sort are all candidate-sized. The final sort is
    a global top-k over candidates — ``orderBy().limit(k)`` which
    Spark executes as per-partition TakeOrdered + single merge, never
    a full sort-shuffle."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t for t in query_terms})
    if doclens is None:
        doclens = doc_lengths(postings)
    consts = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    cand = postings.filter(F.col("term").isin(terms))
    df_t = cand.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df_t")
    )
    scored = (
        cand.join(F.broadcast(df_t), "term")
        .join(doclens, "doc_id")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "_idf",
            F.expr("ln(1.0D + (n_docs - df_t + 0.5D) / (df_t + 0.5D))"),
        )
        .withColumn(
            "_s",
            F.expr(
                f"_idf * tf * ({k1}D + 1.0D)"
                f" / (tf + {k1}D * (1.0D - {b}D + {b}D * dl / avgdl))"
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def index_add_batch(
    postings: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    indexed_ids: DataFrame | None = None,
) -> DataFrame:
    """Incrementally extend a persisted postings index with a new
    crawl batch — the merge_corpus / ivf_add_batch discipline applied
    to retrieval: dedup WITHIN the batch first (a union of shards can
    repeat an id — one hash aggregate keeping the min-text copy,
    deterministic), then anti-join the index so already-indexed ids
    are skipped, then tokenize ONLY the survivors. Returns the
    postings DELTA to append; ``old postings ∪ delta`` equals a from-
    scratch build over ``old corpus ∪ fresh docs`` EXACTLY, because
    postings are document-local — unlike IVF there is no model to
    drift, which is precisely why inverted indexes are the cheap
    incremental structure. (df_t / N / avgdl are derived at query
    time by bm25_topk, so appended deltas need no stats rebuild.)

    ``indexed_ids`` defaults to the distinct ids of ``postings``;
    pass the persisted doc_lengths table instead so the anti-join
    reads an id-per-doc artifact, not the full index."""
    batch_once = (
        new_docs.groupBy(id_col)
        .agg(F.min(F.struct(F.col(text_col).alias("t"))).alias("_m"))
        .select(id_col, F.col("_m.t").alias(text_col))
    )
    ids = (
        postings.select(id_col).distinct()
        if indexed_ids is None
        else indexed_ids.select(id_col)
    )
    fresh = batch_once.join(ids, id_col, "left_anti")
    return build_postings(fresh, id_col=id_col, text_col=text_col)


def build_positional_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, pos) positional postings — one row per token
    OCCURRENCE, ``pos`` the 0-based index in the FILTERED token
    sequence (same frozen tokenization as :func:`build_postings`;
    :func:`doc_lengths` equals ``count(*)`` per doc over this table,
    so the two index forms stay consistent). The phrase-query
    primitive: tf-only postings cannot distinguish "new york" from
    "york new".

    Scale shape: posexplode is scan-stage; the table is token-grain
    (≈ corpus token count — the standard positional-index size trade,
    ~2-3× the tf-only postings). Layout-neutral like build_postings;
    repartition('term') at write."""
    return df.selectExpr(
        f"{id_col} as doc_id",
        f"posexplode({_TOKS.format(col=text_col)}) as (pos, term)",
    ).select("term", "doc_id", F.col("pos").cast("long").alias("pos"))


def phrase_topk(
    positional: DataFrame, phrase: list[str], k: int = 10
) -> DataFrame:
    """Top-k documents for an EXACT phrase → (doc_id, n_matches):
    docs where the phrase's terms occur at consecutive positions,
    ranked by occurrence count desc, doc_id asc. Terms are matched
    verbatim against the index's tokenization (callers lowercase, as
    the tokenizer does).

    Frozen: a match at position p requires term_i at p + i for every
    i; overlapping matches each count (a phrase can overlap itself
    only with a repeated prefix — counting them is the simple stated
    rule). Single-term phrases degenerate to tf ranking.

    Scale shape: the index scan filters to the phrase's terms FIRST
    (an IN over a literal handful — pushed to a written index's
    parquet scan), so every join is candidate-sized: anchor = the
    first term's occurrences, then one equi-join per remaining term
    on (doc_id, pos + i) — m-1 joins for an m-term phrase, each on a
    compound equi-key (no theta join anywhere), AQE-planned. The
    final top-k is a TakeOrdered, never a full sort."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cand = positional.filter(F.col("term").isin(list(set(phrase))))
    anchor = cand.filter(F.col("term") == phrase[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    for i, t in enumerate(phrase[1:], start=1):
        nxt = cand.filter(F.col("term") == t).select(
            "doc_id", (F.col("pos") - i).alias("p0")
        )
        anchor = anchor.join(nxt, ["doc_id", "p0"])
    matches = anchor.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matches")
    )
    return matches.orderBy(F.desc("n_matches"), F.asc("doc_id")).limit(k)


def delete_docs(
    postings: DataFrame, tombstones: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Remove documents from a postings index (tf-only or positional)
    — the other half of the index_add_batch lifecycle: takedowns,
    dedup-cluster losers, and recrawled-then-changed pages all retire
    ids. One anti-join; the result equals a from-scratch build over
    the surviving corpus EXACTLY (postings are document-local — the
    same property that makes appends exact), and because bm25_topk
    derives N / avgdl / df_t from whatever postings+doclens it is
    handed, deleting BEFORE scoring keeps every corpus statistic
    consistent with the surviving set: no stale-idf poisoning, which
    is the classic tombstone bug in incremental search stacks (the
    contract key proves score parity against an oracle that never
    indexed the deleted docs at all).

    Deployment shapes, both served by this one operator: query-time
    masking (apply to the scan, cheap, keeps the written index) or
    compaction (apply + rewrite, amortized). ``tombstones`` is an
    id-grain table — broadcast when takedown-sized; a mass delete
    (a whole snapshot) is an AQE-planned shuffle anti-join on the
    id key."""
    return postings.join(
        tombstones.select(id_col).distinct(), id_col, "left_anti"
    ).select(*postings.columns)  # joins front the key; keep input order

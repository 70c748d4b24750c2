"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
distribution looks like a TARGET corpus (the quality_clf operator
learns keep/drop from labels; DSIR needs only an unlabeled target
sample — the "make CommonCrawl look like Wikipedia" selector).

Frozen semantics (the DuckDB oracles restate them):

- words: lowercased text split on ' ', empties dropped (the TOKENS
  discipline); grams = unigrams + adjacent-pair bigrams joined by a
  single space, in document order, OCCURRENCES not distinct;
- bucket(gram) = STR_HASH(gram) % n_buckets — the shared frozen
  polynomial fold, so any engine replicates it bit-for-bit;
- bag-of-grams models with add-alpha smoothing over the bucket space:
  p[b] = (c_b + alpha) / (N + alpha * B);
- per-bucket log importance ratio quantized to MICRO-UNITS:
  r_b = round((ln(ct_b + a) - ln(cr_b + a) + ln(Nr + aB) - ln(Nt + aB))
  * 1e6) as a BIGINT — the quantization is what makes the per-document
  SUM order-independent (bigint addition is associative; raw double
  sums would depend on partition order and could not be oracle-gated);
- logw(doc) = sum of r_b over the doc's gram occurrences / 1e6;
  zero-gram documents score 0.0;
- Gumbel resampling key: u = ((STR_HASH(id || ':' || salt) % 1000003)
  + 0.5) / 1000003, g = -ln(-ln(u)); selection = top-n by
  (logw + g) DESC, id ASC — the paper's Gumbel-top-k trick with the
  randomness pinned to a content-addressed hash (same discipline as
  operators/sampling).

Scale shape (100 TB): model fitting is explode → groupBy(bucket) —
B-bounded output, partial-aggregable; scoring joins the B-row model
tables BROADCAST onto the doc-gram stream and reduces with one
partial-agg sum per doc; selection is sort-limit (TakeOrdered — a
per-partition top-n then a driver merge of n-row heads, never a global
sort). Nothing shuffles on a corpus-sized key except the per-doc sum,
which partial-aggregates map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import P, STR_HASH  # noqa: F401  (P cited in docs)

MICRO = 1_000_000


def _with_gram_buckets(
    df: DataFrame, text_col: str, n_buckets: int
) -> DataFrame:
    """Append ``_buckets``: array<bigint> of hashed gram buckets
    (unigrams + bigrams, occurrence multiset). Intermediates bind
    through columns — a lambda referencing the split() tree would
    re-evaluate it per element (the measured no-CSE trap)."""
    return _with_grams(df, text_col).withColumn(
        "_buckets",
        F.expr(
            f"transform(_grams, g -> {STR_HASH.format(s='g')} % {n_buckets})"
        ),
    ).drop("_toks", "_grams")


def _with_grams(df: DataFrame, text_col: str) -> DataFrame:
    """Append ``_toks``/``_grams`` (unigrams + adjacent bigrams)."""
    d = df.withColumn(
        "_toks", F.expr(f"filter(split(lower({text_col}), ' '), x -> x != '')")
    )
    return d.withColumn(
        "_grams",
        F.expr(
            "concat(_toks, IF(size(_toks) >= 2,"
            " transform(sequence(0, size(_toks) - 2),"
            "           i -> concat(_toks[i], ' ', _toks[i+1])),"
            " cast(array() as array<string>)))"
        ),
    )


def fit_dsir_model(
    sample: DataFrame, text_col: str = "text", n_buckets: int = 1024
) -> DataFrame:
    """(bucket, c): gram-occurrence counts over the bucket space for a
    corpus sample. B-bounded (<= n_buckets rows) — broadcastable by
    construction; totals derive at scoring time so a model is just its
    counts."""
    # explode stays FUSED over the transform (CLAUDE.md Generate trap:
    # exploding the derived _buckets ATTRIBUTE makes
    # InferFiltersFromGenerate push a size()>0 filter that inlines the
    # whole gram chain — with _toks indexed inside the _grams lambda
    # that inlining is quadratic); _grams stays a bound column here
    return (
        _with_grams(sample, text_col)
        .select(
            F.explode(
                F.expr(
                    f"transform(_grams, g -> {STR_HASH.format(s='g')}"
                    f" % {n_buckets})"
                )
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )


def _ratio_table(
    target_model: DataFrame,
    raw_model: DataFrame,
    n_buckets: int,
    alpha: float,
) -> DataFrame:
    """(bucket, r): micro-quantized log importance ratio for EVERY
    bucket 0..B-1 — materializing the full B-row table (B is a knob,
    never corpus-sized) means a scored gram always finds its row, so
    unobserved-in-both buckets take the smoothing constant instead of
    silently dropping out of the sum (review-found: a ratio-side
    default column is NULL for exactly the buckets that need it)."""
    t = target_model.select("bucket", F.col("c").alias("ct"))
    r = raw_model.select("bucket", F.col("c").alias("cr"))
    tot_t = target_model.agg(F.sum("c").alias("nt"))
    tot_r = raw_model.agg(F.sum("c").alias("nr"))
    all_b = (
        tot_t.crossJoin(tot_r)
        .select(
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(n_buckets - 1))
            ).alias("bucket"),
            "nt",
            "nr",
        )
    )
    both = all_b.join(t, "bucket", "left").join(r, "bucket", "left")
    aB = alpha * n_buckets
    return both.select(
        "bucket",
        F.expr(
            f"cast(round((ln(coalesce(ct, 0) + {alpha}D)"
            f" - ln(coalesce(cr, 0) + {alpha}D)"
            f" + ln(nr + {aB}D) - ln(nt + {aB}D)) * {MICRO}) as bigint)"
        ).alias("r"),
    )


def dsir_logweights(
    docs: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """(id, n_grams, logw): per-document DSIR log importance weight.
    Models come from :func:`fit_dsir_model` with the SAME n_buckets.
    The ratio table is <= 2B rows → broadcast; the only corpus-grain
    reduce is the per-doc bigint sum (partial-aggregable)."""
    ratios = _ratio_table(target_model, raw_model, n_buckets, alpha)
    grams = _with_gram_buckets(docs, text_col, n_buckets).select(
        F.col(id_col).alias("id"), F.explode_outer("_buckets").alias("bucket")
    )
    joined = grams.join(F.broadcast(ratios), "bucket", "left")
    # explode_outer keeps zero-gram docs as a NULL-bucket row: scores 0
    # (every real bucket finds a ratio row — the table is full-range)
    per_doc = joined.groupBy("id").agg(
        F.sum(
            F.when(F.col("bucket").isNull(), F.lit(0)).otherwise(F.col("r"))
        ).alias("_micro"),
        F.count(F.col("bucket")).alias("n_grams"),
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_grams",
        (F.col("_micro").cast("double") / MICRO).alias("logw"),
    )


def dsir_select(
    weights: DataFrame,
    n: int,
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """(id, logw, score): the Gumbel-top-n resample over
    :func:`dsir_logweights` output — score = logw + Gumbel(hash(id)),
    top n by (score DESC, id ASC). sort+limit plans as TakeOrdered
    (per-partition heads, driver merge), never a global sort."""
    key = f"concat(cast({id_col} as string), ':{salt}')"
    u = f"(({STR_HASH.format(s=key)} % 1000003) + 0.5D) / 1000003.0D"
    scored = weights.withColumn(
        "score", F.round(F.col("logw") + F.expr(f"-ln(-ln({u}))"), 6)
    )
    return (
        scored.orderBy(F.desc("score"), F.asc(id_col))
        .limit(n)
        .select(id_col, "logw", "score")
    )

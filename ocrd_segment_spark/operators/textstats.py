"""Reusable text-analysis operators for the training-data pipeline:
tokenization, quality scoring, language-id — the library form of the
contract queries (quality_score / lang_id_heuristic / token_count),
so jobs can compose them without re-writing the expressions. All pure
JVM-side column math; one tokenize pass per row.

Frozen semantics (must stay in lockstep with the contract oracles):
- tokens: whitespace split, empties dropped;
- quality = 0.4·min(n_tokens/100, 1) + 0.6·(1 − short_ratio), where
  short tokens have length ≤ 3, rounded to 6 — double literals only
  (bare ``1.0`` in selectExpr parses as DECIMAL, the round-1 typed-
  hash lesson);
- lang-id: 'th' vs 'er' digram frequency → en/de (an honest toy — the
  regexp_count + argmax STRUCTURE is the operator; swap the digram
  table for a real corpus model on a cluster).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def tokens_col(text_col: str = "text") -> Column:
    """Whitespace tokens, empties dropped. Splits on the ``\\s`` CLASS,
    not the space char — extraction output joins regions with '\\n'
    (config.region_separator), so a space-only split would merge the
    last token of one region with the first of the next and skew every
    downstream count."""
    return F.expr(f"filter(split({text_col}, '\\\\s'), x -> x != '')")


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add (n_tokens, short_ratio, quality) columns. Tokenizes once
    per row (interpreted HOFs have no CSE — materialize, then derive)."""
    toked = df.withColumn("_toks", tokens_col(text_col))
    stats = toked.withColumn(
        "n_tokens", F.expr("cast(size(_toks) as bigint)")
    ).withColumn(
        "_n_short", F.expr("size(filter(_toks, t -> length(t) <= 3))")
    )
    # empty documents (parse failures, media-only pages): short_ratio
    # 1.0 / quality 0.0 rather than an ANSI divide-by-zero — a no-op
    # for non-empty rows, so the contract oracle values are unchanged
    return (
        stats.withColumn(
            "short_ratio",
            F.expr(
                "CASE WHEN n_tokens = 0 THEN 1.0D"
                " ELSE round(_n_short * 1.0D / n_tokens, 6) END"
            ),
        )
        .withColumn(
            "quality",
            F.expr(
                "CASE WHEN n_tokens = 0 THEN 0.0D"
                " ELSE round(0.4D * least(n_tokens / 100.0D, 1.0D)"
                " + 0.6D * (1.0D - _n_short * 1.0D / n_tokens), 6) END"
            ),
        )
        .drop("_toks", "_n_short")
    )


def lang_id_col(text_col: str = "text") -> Column:
    """Digram-frequency language id (en/de toy classifier)."""
    return F.when(
        F.expr(f"regexp_count({text_col}, 'th') >= regexp_count({text_col}, 'er')"),
        F.lit("en"),
    ).otherwise(F.lit("de"))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("pred_lang", lang_id_col(text_col))

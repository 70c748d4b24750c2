"""Benchmark decontamination: flag corpus documents that share word
n-gram shingles with an evaluation/benchmark set.

The standard pre-training hygiene pass (published with GPT-3 / PaLM /
Gopher appendices): any training document containing an n-gram that
also occurs in a held-out benchmark is flagged (and usually dropped)
so eval numbers are not inflated by memorization.

Scale shape: the benchmark side is SMALL by construction (eval sets
are thousands of documents, the corpus is billions) — its distinct
shingle-hash set is broadcast, so the corpus pass is a narrow scan +
broadcast semi-join + one doc-keyed aggregation. No corpus-wide
shuffle key exists; a 100 TB corpus streams through unchanged. The
shingle hash is the engine's frozen polynomial compose
(functions/hashing), so a DuckDB oracle states the identical math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import hashing as H


def _shingle_table(
    df: DataFrame, id_col: str | None, text_col: str, n: int
) -> DataFrame:
    """(id, sh): one row per distinct n-gram shingle hash per document.
    ``id_col=None`` derives shingles without any id (the benchmark
    side, which only contributes its shingle SET) — one derivation of
    the frozen hashing chain for both sides."""
    idc = F.col(id_col) if id_col is not None else F.lit(0)
    return (
        df.select(idc.alias("id"), F.col(text_col).alias("text"))
        .withColumn("toks", H.tokens("text"))
        .withColumn("th", H.token_hashes("toks"))
        .select("id", F.explode(H.shingle_hashes("th", n)).alias("sh"))
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark_text_col: str | None = None,
    n: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """(id_col, n_overlap, contaminated): per corpus document, the
    number of distinct n-gram shingles shared with ANY benchmark
    document, and the flag ``n_overlap >= min_overlap``.

    Every corpus document keeps its row (overlap 0 when clean), so the
    output is a drop-mask joinable back by id."""
    # the benchmark side needs no id — only its distinct shingle set
    bench_sh = (
        _shingle_table(benchmark, None, benchmark_text_col or text_col, n)
        .select("sh")
        .distinct()
    )
    doc_sh = _shingle_table(docs, id_col, text_col, n)
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("id")
        .agg(F.countDistinct("sh").alias("n_overlap"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )

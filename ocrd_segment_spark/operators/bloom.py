"""Distributed Bloom-filter seen-set over urls.

A 10^12-document crawl cannot answer "have we already fetched this
url" with a join against the full corpus on every frontier batch — the
standard primitive is a Bloom filter: a fixed-size bit table with k
deterministic hash positions per key, no false negatives, and a
bounded false-positive rate (~(1 - e^{-kn/m})^k). The corpus side is
built ONCE as a tiny (word_id, bits) table; each frontier batch then
probes it with a broadcast join — the anti-join against the corpus
happens only for the (maybe_seen AND actually-new) false positives,
which is the point.

Frozen hash family (shared with the repo's minhash discipline so any
SQL engine can restate it): h = the polynomial char fold of the url
mod P (functions/hashing.STR_HASH), position_i = ((2i+3)*h + 5i+7)
mod P mod m for i in 0..k-1. Bits pack into 32-bit words stored in
BIGINTs (word_id = pos div 32, mask = 1 << (pos mod 32)) — bit 31 at
most, so masks never touch the sign bit in ANY engine.

Scale shape (100 TB): :func:`build_bloom` is scan-stage position math
+ explode + ONE shuffle with map-side partial ``bit_or`` — at most
m/32 rows reach the reduce side per map partition, so the shuffle is
filter-sized (MBs), not corpus-sized. The built table is ≤ m/32 rows
(m = 2^27 bits → 4 M rows / 32 MB serialized) — broadcastable.
:func:`bloom_maybe_seen` therefore does k broadcast lookups per probe
and folds them back with a partial-aggregable ``min`` — the only
shuffles are PROBE-batch-sized (one row per key after map-side
combine), never filter- or corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import P, STR_HASH

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 4


def bloom_positions_sql(hash_col: str, m_bits: int, k: int) -> str:
    """SQL fragment: array<bigint> of the k bit positions from a
    PRE-BOUND key-hash column — the ONE home of the frozen position
    rule (build and probe share it, so the family can never drift
    between the two sides). The hash must be bound to a column FIRST
    (``STR_HASH`` projected once per row): inlining the per-character
    fold here would re-run it per lambda element — k× the dominant
    scan cost, the CLAUDE.md interpreted-HOF trap."""
    return (
        f"transform(sequence(0, {k - 1}),"
        f" i -> ((2*i + 3) * {hash_col} + 5*i + 7) % {P} % {m_bits}L)"
    )


def build_bloom(
    df: DataFrame,
    url_col: str = "url",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """(word_id, bits): the Bloom bit table over ``df``'s keys. At most
    ``m_bits / 32`` rows. Persist this next to the corpus and hand it
    to :func:`bloom_maybe_seen` with the SAME (m_bits, k) — the
    parameters are part of the filter's identity, exactly like the
    persisted LSH index pins its band parameters."""
    pos = bloom_positions_sql("__h", m_bits, k)
    return (
        df.selectExpr(f"{STR_HASH.format(s=url_col)} as __h")
        .selectExpr(f"explode({pos}) as pos")
        .selectExpr(
            "pos div 32 as word_id",
            "shiftleft(1L, cast(pos % 32 as int)) as mask",
        )
        .groupBy("word_id")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_maybe_seen(
    bloom: DataFrame,
    probes: DataFrame,
    url_col: str = "url",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """``probes`` + ``maybe_seen``: true iff ALL k positions are set in
    ``bloom`` (no false negatives; false positives at the configured
    rate). The filter table is broadcast; a position whose word is
    absent from the table is unset (left join → null bits → miss), so
    a sparse filter needs no dense materialization.

    Shape: explode k positions, broadcast-lookup each, fold back with
    a partial-aggregable ``min`` grouped by the probe key (a key's k
    rows are partition-local, so map-side combine ships ONE row per
    probe), then a key join re-attaches the probe's other columns —
    every exchange is probe-batch-sized."""
    pos = bloom_positions_sql("__h", m_bits, k)
    hits = (
        probes.select(
            F.col(url_col),
            F.expr(STR_HASH.format(s=url_col)).alias("__h"),
        )
        .select(F.col(url_col), F.expr(f"explode({pos})").alias("pos"))
        .selectExpr(
            url_col,
            "pos div 32 as word_id",
            "shiftleft(1L, cast(pos % 32 as int)) as mask",
        )
        .join(F.broadcast(bloom), "word_id", "left")
        .selectExpr(
            url_col,
            "cast(coalesce(bits & mask, 0L) != 0L as int) as hit",
        )
        .groupBy(url_col)
        .agg((F.min("hit") == 1).alias("maybe_seen"))
    )
    return probes.join(hits, url_col, "left")


# ---------------------------------------------------------------------------
# unit-grain seen-set: Dolma-style paragraph Bloom dedup
# ---------------------------------------------------------------------------


def build_unit_bloom(
    df: DataFrame,
    text_col: str = "text",
    sep: str = "\n",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Bloom filter over the corpus's text UNITS (paragraphs/lines on
    the literal ``sep``, empty units dropped) — the Dolma dedupe
    approach: cross-document paragraph dedup WITHOUT materializing a
    corpus-sized paragraph table, at the price of a bounded
    false-positive rate. Same (word_id, bits) artifact and frozen
    position family as the url filter; the (m_bits, k) pair is part of
    the filter's identity."""
    import re as _re

    units = df.select(
        F.explode(
            F.split(F.col(text_col), _re.escape(sep))
        ).alias("unit")
    ).filter(F.col("unit") != "")
    return build_bloom(units, url_col="unit", m_bits=m_bits, k=k)


def unit_seen_stats(
    bloom: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """(id, n_units, n_units_seen, seen_unit_frac) per probe document:
    how much of the document is made of units already in the corpus
    filter. No false negatives per unit (a really-seen paragraph
    always counts); false positives at the configured rate. Dolma-
    style policy composes on top: drop documents whose fraction
    crosses a threshold, or route them to span-preserving removal
    (operators/paragraphs) for unit-level surgery.

    Shape: explode units with position, k broadcast lookups per unit,
    fold to per-unit hits then per-doc counts — both aggregates are
    partial-combinable and keyed by (doc, pos) / doc, so every
    exchange is probe-batch-sized."""
    import re as _re

    pos = bloom_positions_sql("__h", m_bits, k)
    units = (
        docs.select(
            F.col(id_col).alias("__id"),
            F.posexplode(
                F.split(F.col(text_col), _re.escape(sep))
            ).alias("__pos", "unit"),
        )
        .filter(F.col("unit") != "")
        .withColumn("__h", F.expr(STR_HASH.format(s="unit")))
    )
    per_unit = (
        units.select(
            "__id", "__pos", F.expr(f"explode({pos})").alias("p")
        )
        .selectExpr(
            "__id",
            "__pos",
            "p div 32 as word_id",
            "shiftleft(1L, cast(p % 32 as int)) as mask",
        )
        .join(F.broadcast(bloom), "word_id", "left")
        .selectExpr(
            "__id",
            "__pos",
            "cast(coalesce(bits & mask, 0L) != 0L as int) as hit",
        )
        .groupBy("__id", "__pos")
        .agg((F.min("hit") == 1).alias("seen"))
    )
    return (
        per_unit.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_units"),
            F.sum(F.col("seen").cast("long")).alias("n_units_seen"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_units",
            "n_units_seen",
            F.expr(
                "round(n_units_seen / (n_units * 1.0D), 6)"
            ).alias("seen_unit_frac"),
        )
    )

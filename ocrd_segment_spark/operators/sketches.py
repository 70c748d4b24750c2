"""Mergeable cardinality / frequency sketches: HyperLogLog, count-min.

At 10^12 documents the questions "how many DISTINCT urls per host" and
"which tokens are globally frequent" cannot be answered by exact
distinct/count aggregates on every reporting cadence — the standard
primitives are sketches whose STATE is tiny and MERGEABLE, so
per-shard sketches built where the data lives combine into a corpus
answer without re-touching the corpus (the same incremental-artifact
discipline as the persisted LSH/IVF indexes and the Bloom seen-set):

- **HyperLogLog** (Flajolet et al. 2007): r registers, each holding
  the max "rho" (position of the lowest set bit, 1-based) seen among
  keys routed to it; distinct-count estimate from the harmonic mean.
  Register tables merge by register-wise MAX — union of key sets.
- **count-min** (Cormode & Muthukrishnan 2005): d×w counter matrix,
  each occurrence increments one counter per row; a point estimate is
  the MIN over its d counters — always >= the true count, so a
  threshold scan has NO false negatives and a find-then-verify pass
  (the LSH discipline, operators/dedup.py) removes the false
  positives with exact counts on the candidate set only.

Frozen hash family (shared with the Bloom filter / minhash so any SQL
engine can restate it): h = polynomial char fold mod P
(functions/hashing.STR_HASH, range [0, P) ~ 30 bits);
row-i position = ((2i+3)*h + 5i+7) mod P mod w (count-min — the
textbook Carter-Wegman affine family, which is all a CMS bucket
needs). HLL needs more: its rho statistic reads BIT structure, and
the polynomial fold's low bits are visibly non-uniform on real key
sets (measured: sequential-suffix urls skewed the trailing-zero
distribution enough to bias estimates 2×). So HLL first finalizes h
through the Mueller 32-bit integer mix — two rounds of
x = ((x >> 16) XOR x) * 0x45d9f3b mod 2^32 and a closing shift-xor —
chosen over murmur3's finalizer because every intermediate product
stays under 2^63 (0x45d9f3b < 2^27), which keeps the arithmetic legal
BIGINT math in ANY engine (Spark ANSI mode throws on overflow; the
DuckDB oracle restates the identical chain). Then, the standard HLL
split on the mixed 32-bit word: register = top p bits (r = 2^p), w =
low 32-p bits, rho = (32-p) - floor(log2(w + 0.5)) — the +0.5 makes
the float ilog2 EXACT for every integer below 2^52 (a power of two
rounds up past itself, its predecessor rounds down) — and w = 0 →
rho = 32-p+1. Measured over ten adversarial key shapes: RMS error
14.4% at r=64 vs the 13.0% theoretical — unbiased. The 32-bit mixed
word bounds HLL at ~10^8 distinct per register set before
saturation; a production deployment would widen fold + mix to 64-bit,
which changes no shape here — the width is pinned so the DuckDB
oracles can restate the arithmetic bit-for-bit.

alpha(r) is frozen to the asymptotic 0.7213 / (1 + 1.079/r) for ALL r
(the paper's small-r constants 0.673/0.697/0.709 are NOT special-cased
— a deliberate simplification shared by both engines; the small-range
linear-counting branch dominates exactly where those constants would
matter). Small-range correction: raw estimate <= 2.5*r with V empty
registers > 0 → r * ln(r / V).

Scale shape (100 TB): register building is scan-stage column math +
ONE shuffle keyed (group, register) with map-side partial MAX — at
most r rows per group reach the reduce side per map partition.
count-min building explodes each occurrence to d (row, col) pairs and
partial-SUMS them — the shuffle is bounded by d*w rows per map
partition regardless of corpus size. Estimation joins are against
sketch-sized tables (broadcast). Candidate ENUMERATION for heavy
hitters is distinct-term-grain (documented on the function): the
sketch bounds counter memory, not the candidate scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import P, STR_HASH, TOKENS

DEFAULT_R = 64  # registers: std error ~ 1.04/sqrt(r) = 13%
DEFAULT_D = 4  # count-min rows
DEFAULT_W = 1 << 12  # count-min columns

MIX_C = 0x45D9F3B  # Mueller multiplier; < 2^27 so products < 2^59
MIX_MOD = 1 << 32


def hll_mix_steps(hash_col: str) -> tuple[str, str, str]:
    """The three chained Mueller-mix projections over a PRE-BOUND
    hash column (module docstring) — returned as separate fragments
    so callers bind each to its own column (re-inlining the chain
    would evaluate the early rounds 4×; binding also sidesteps the
    interpreted-HOF/CSE trap, CLAUDE.md). Apply in order, each over
    the previous step's column."""
    s1 = f"((shiftright({hash_col}, 16) ^ {hash_col}) * {MIX_C}) % {MIX_MOD}"
    s2 = "((shiftright({c}, 16) ^ {c}) * %d) %% %d" % (MIX_C, MIX_MOD)
    s3 = "shiftright({c}, 16) ^ {c}"
    return s1, s2, s3


def _wbits(r: int) -> int:
    p = r.bit_length() - 1
    if r < 2 or (1 << p) != r:
        raise ValueError(f"r must be a power of two >= 2, got {r}")
    return 32 - p


def hll_rho_sql(mixed_col: str, r: int) -> str:
    """SQL fragment: rho of the PRE-BOUND mixed-hash column's low
    32-p bits — the ONE home of the frozen rho rule so build and
    oracle restatements can never drift. floor(log2(w + 0.5)) is the
    exact integer ilog2 (module docstring)."""
    wb = _wbits(r)
    w = f"({mixed_col} % {1 << wb})"
    return (
        f"IF({w} = 0, {wb + 1}, "
        f"{wb} - cast(floor(log2({w} + 0.5D)) as int))"
    )


def hll_registers(
    df: DataFrame,
    key_col: str = "url",
    r: int = DEFAULT_R,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(group..., reg, rho): the HLL register table over ``df``'s keys
    — at most ``r`` rows per group, NULL keys ignored. This is the
    persistable, MERGEABLE artifact: build one per shard/snapshot,
    :func:`hll_merge` them, estimate whenever asked. ``r`` (a power
    of two) is part of the sketch's identity (the Bloom (m, k)
    discipline)."""
    wb = _wbits(r)
    s1, s2, s3 = hll_mix_steps("__h")
    cols = [F.col(c) for c in group_cols]
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*cols, F.expr(STR_HASH.format(s=key_col)).alias("__h"))
        .select(*cols, F.expr(s1).alias("__m1"))
        .select(*cols, F.expr(s2.format(c="__m1")).alias("__m2"))
        .select(*cols, F.expr(s3.format(c="__m2")).alias("__mx"))
        .select(
            *cols,
            F.expr(f"__mx div {1 << wb}").alias("reg"),
            F.expr(hll_rho_sql("__mx", r)).alias("rho"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    a: DataFrame, b: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Register-wise MAX of two register tables built with the SAME
    (key rule, r): estimates the distinct count of the UNION of their
    key sets. Associative and idempotent — fold any number of shard
    sketches in any order; re-merging a shard changes nothing."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    r: int = DEFAULT_R,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(group..., est_distinct): the frozen HLL estimate (module
    docstring: asymptotic alpha, linear-counting small-range branch,
    absent registers count as rho 0). est_distinct rounds to 6
    decimals (pure double math — both engines agree to ~1e-15, the
    BM25 precedent)."""
    alpha = f"(0.7213D / (1.0D + 1.079D / {r}))"
    denom = f"(({r} - cnt) * 1.0D + sum_pow)"  # absent regs: 2^-0 = 1
    raw = f"({alpha} * {r}D * {r}D / {denom})"
    v = f"({r} - cnt)"  # present regs always have rho >= 1
    est = (
        f"IF({raw} <= 2.5D * {r} AND {v} > 0, "
        f"{r}D * ln({r}D / {v}), {raw})"
    )
    return (
        registers.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.expr("power(0.5D, rho)")).alias("sum_pow"),
        )
        .selectExpr(
            *group_cols,
            f"round({est}, 6) as est_distinct",
        )
    )


def hll_distinct_by(
    df: DataFrame,
    group_cols: tuple[str, ...],
    key_col: str = "url",
    r: int = DEFAULT_R,
) -> DataFrame:
    """Convenience: registers + estimate in one call → (group...,
    est_distinct). One (group, reg) shuffle with map-side partial max,
    one group-grain aggregate — never a distinct over the key column."""
    return hll_estimate(
        hll_registers(df, key_col=key_col, r=r, group_cols=group_cols),
        r=r,
        group_cols=group_cols,
    )


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def cms_positions_sql(hash_col: str, d: int, w: int) -> str:
    """SQL fragment: array<struct<i,col>> of the d counter positions
    from a PRE-BOUND term-hash column — the one home of the frozen
    affine family (same (2i+3, 5i+7) coefficients as the Bloom/minhash
    positions)."""
    return (
        f"transform(sequence(0, {d - 1}), i -> struct(i as i,"
        f" ((2*i + 3) * {hash_col} + 5*i + 7) % {P} % {w} as col))"
    )


def cms_build(
    df: DataFrame,
    term_col: str = "term",
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame:
    """(i, col, cnt): the count-min counter table over one row per
    OCCURRENCE in ``df`` (pre-aggregated inputs can pass a weight by
    exploding upstream; the frozen form counts rows). At most d*w rows
    — broadcastable. (d, w) are part of the sketch's identity. Merge
    across shards = same-key SUM (not implemented as a helper because
    it is literally ``unionByName().groupBy("i","col").sum``)."""
    pos = cms_positions_sql("__h", d, w)
    return (
        df.filter(F.col(term_col).isNotNull())
        .selectExpr(f"{STR_HASH.format(s=term_col)} as __h")
        .select(F.explode(F.expr(pos)).alias("p"))
        .select(F.col("p.i").alias("i"), F.col("p.col").alias("col"))
        .groupBy("i", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame:
    """``terms`` + ``cms_count``: min over the d counters (0 when a
    counter row is absent — sparse sketches need no densification,
    the Bloom left-join discipline). Always >= the true occurrence
    count for the (d, w) the sketch was built with."""
    pos = cms_positions_sql("__h", d, w)
    looked = (
        terms.select(
            F.col(term_col),
            F.expr(STR_HASH.format(s=term_col)).alias("__h"),
        )
        .select(term_col, F.explode(F.expr(pos)).alias("p"))
        .select(term_col, F.col("p.i").alias("i"), F.col("p.col").alias("col"))
        .join(F.broadcast(sketch), ["i", "col"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_count"))
    )
    return terms.join(looked, term_col, "left")


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    threshold: int = 100,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame:
    """(term, cms_count, exact_count): space-split tokens whose TRUE
    corpus frequency reaches ``threshold``, surfaced sketch-first:

    1. build the d×w sketch over all token occurrences (bounded
       shuffle: partial-sum caps it at d*w rows per map partition);
    2. candidates = DISTINCT terms with sketch estimate >= threshold —
       no false negatives (min-of-counters >= truth);
    3. verify candidates with EXACT counts (occurrence scan filtered
       by an isin/broadcast semi-join on the candidate set) and drop
       the sketch's false positives.

    Candidate enumeration is distinct-term-grain (one additional
    shuffle); the sketch bounds COUNTER memory and makes the exact
    pass candidate-sized instead of vocabulary-sized. cms_count >=
    exact_count always; pytest pins the containment property.

    Physical shape (round-6): ONE explode pass pre-aggregates term
    frequencies (map-side-combinable groupBy on the term), and every
    downstream step — sketch counters (sum of tf per (i, col) == count
    of occurrences), candidate estimates, exact verification (tf IS
    the exact count) — runs over the vocabulary-sized tf table. The
    per-occurrence polynomial char-fold hash of the previous form
    (three separate explode scans, one hashing every occurrence) is
    now paid once per DISTINCT term; results are value-identical."""
    tf = (
        df.select(
            F.explode(F.expr(TOKENS.format(col=text_col))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    ).localCheckpoint(eager=True)
    pos = cms_positions_sql("__h", d, w)
    sketch = (
        tf.selectExpr(f"{STR_HASH.format(s='term')} as __h", "__tf")
        .select(F.explode(F.expr(pos)).alias("p"), "__tf")
        .select(
            F.col("p.i").alias("i"), F.col("p.col").alias("col"), "__tf"
        )
        .groupBy("i", "col")
        .agg(F.sum("__tf").alias("cnt"))
    )
    cand = cms_estimate(
        sketch, tf.select("term"), d=d, w=w
    ).filter(F.col("cms_count") >= threshold)
    return (
        cand.join(tf, "term", "left")
        .filter(F.col("__tf") >= threshold)
        .select(
            "term", "cms_count", F.col("__tf").alias("exact_count")
        )
    )


# ---------------------------------------------------------------------------
# log-histogram quantile sketch — mergeable quantiles in O(bins) state
# ---------------------------------------------------------------------------

HIST_K = 8  # sub-bins per octave; MUST be a power of two (exactness)

# Frozen bin rule for a non-negative integer value v (doc lengths,
# token counts, latencies): octave o = ilog2(v+1) via the BINARY
# STRING LENGTH (length(bin(v+1)) - 1 — exact integer arithmetic, no
# libm), sub-bin s = floor(((v+1)/2^o - 1) * K). With K a power of
# two every step is EXACT double arithmetic ((v+1)/2^o is an exact
# division by a power of two for v+1 <= 2^53; (x-1)*K is exact), so
# Spark and DuckDB agree bit-for-bit — log2()-based binning would NOT
# (Spark computes log(x)/log(2), which misrounds at exact powers of
# two; DuckDB's std::log2 does not).
_HIST_BIN = (
    "cast((length(bin({v} + 1)) - 1) * {k}"
    " + floor(((cast({v} + 1 as double)"
    "          / power(cast(2 as double), length(bin({v} + 1)) - 1)) - 1.0)"
    "         * cast({k} as double)) as int)"
)

# bin edges: lo(b) = 2^(b div K) * (1 + (b mod K)/K) - 1, hi = lo of b+1.
_HIST_LO = (
    "(power(cast(2 as double), cast({b} as int) div {k})"
    " * (1.0 + cast(cast({b} as int) % {k} as double) / cast({k} as double))"
    " - 1.0)"
)


def hist_bin_sql(value_col: str, k: int = HIST_K) -> str:
    return _HIST_BIN.format(v=value_col, k=k)


def hist_lo_sql(bin_col: str, k: int = HIST_K) -> str:
    return _HIST_LO.format(b=bin_col, k=k)


def hist_build(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    k: int = HIST_K,
) -> DataFrame:
    """Per-group log-histogram: (group..., bin, cnt). One shuffle with
    map-side partial counts; state is O(octaves * k) rows per group
    (~500 bins covers 0..2^60), so a 100 TB corpus's length
    distribution per language is a few thousand rows total. Negative
    or NULL values are excluded (counted by the caller if needed)."""
    if k & (k - 1):
        raise ValueError(f"k must be a power of two, got {k}")
    return (
        df.filter(F.col(value_col).isNotNull() & (F.col(value_col) >= 0))
        .select(*group_cols, F.expr(hist_bin_sql(value_col, k)).alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").alias("cnt"))
    )


def hist_merge(*hists: DataFrame) -> DataFrame:
    """Union-merge histograms built with the same (group, k): counts
    add per (group, bin) — the mergeability that lets shards/epochs
    sketch independently and combine."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    hist: DataFrame,
    group_cols: tuple[str, ...],
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    k: int = HIST_K,
) -> DataFrame:
    """Quantile estimates from a log-histogram: (group..., q, est).

    Frozen rule: rank = floor(q * (N - 1)) + 1 (1-based nearest-rank
    over N values); the estimate interpolates linearly inside the
    first bin whose cumulative count reaches the rank:
    est = round(lo + (hi - lo) * (rank - cum_before) / cnt, 6).
    Relative error is bounded by the bin width (2^(1/k) - 1 ≈ 9% at
    k=8) — the usual log-histogram guarantee (HdrHistogram's design),
    and unlike percentile_approx the state is mergeable and the
    answer is REPRODUCIBLE (no sampling, no compaction races).

    Shape: one per-group window over bin-grain rows (bounded state),
    then a groupBy per q — group-grain frames throughout."""
    from pyspark.sql import Window as W

    cum = F.sum("cnt").over(
        W.partitionBy(*group_cols).orderBy("bin").rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
    )
    tot = F.sum("cnt").over(W.partitionBy(*group_cols))
    base = hist.select(
        *group_cols, "bin", "cnt", cum.alias("cum"), tot.alias("n")
    )
    qdf = base.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    ranked = (
        base.crossJoin(F.broadcast(qdf))
        .withColumn("rank", F.floor(F.col("q") * (F.col("n") - 1)) + 1)
        .filter(F.col("cum") >= F.col("rank"))
        .groupBy(*group_cols, "q")
        .agg(F.min(F.struct("bin", "cnt", "cum", "rank")).alias("s"))
    )
    slo = F.expr(hist_lo_sql("s.bin", k))
    shi = F.expr(hist_lo_sql("s.bin + 1", k))
    return ranked.select(
        *group_cols,
        "q",
        F.round(
            slo
            + (shi - slo)
            * (F.col("s.rank") - (F.col("s.cum") - F.col("s.cnt")))
            / F.col("s.cnt"),
            6,
        ).alias("est"),
    )


def hist_quantiles_by(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    k: int = HIST_K,
) -> DataFrame:
    """Convenience: build + quantiles in one call."""
    return hist_quantiles(
        hist_build(df, group_cols, value_col, k), group_cols, qs, k
    )

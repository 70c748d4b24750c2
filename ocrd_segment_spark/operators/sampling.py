"""Deterministic corpus sampling / splitting for training-data curation.

Spark's ``df.sample``/``sampleBy`` are seeded-RNG per partition — the
selected set changes with partitioning and engine, which is poison for
reproducible corpus curation and for the engine's DuckDB oracle gate.
These operators are CONTENT-ADDRESSED instead: membership is a pure
function of the row's key (the polynomial hash from functions/hashing,
the same one the dedup operators use), so

- the same key always lands in the same sample/split, on any engine,
  any partitioning, any run — no RNG state anywhere;
- the predicate is plain column arithmetic evaluated inside the
  scan stage's codegen (narrow — no shuffle, no sample-then-filter
  pass; being a higher-order expression it does not reach parquet
  PushedFilters, unlike a simple comparison);
- a DuckDB oracle can state the identical computation bit-for-bit.

The reference processors have no sampling (they run page-complete),
but a 100 TB training pipeline needs it constantly: dev subsets,
train/val/test splits, per-language rebalancing. Leakage control:
pass ``group_col`` (e.g. the url host) and whole groups move together,
so near-duplicate pages from one site cannot straddle train and test
(the standard contamination guard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import hashing as H

# hash-space resolution: fractions are quantized to 1/BUCKETS
BUCKETS = 1_000_000


# post-fold scramble: the polynomial fold of a SHORT key (numeric ids
# are 1-10 chars) lands in a narrow range, so taking % BUCKETS directly
# is badly non-uniform (measured 5% kept at a 20% threshold). One LCG
# step (MINSTD multiplier) wraps that range around the modulus dozens
# of times — measured 400/2000 at 20%, 10024/100k at 10%. Same integer
# arithmetic on any SQL engine (fits in int64: h < 1e9+7, ×48271 < 2^63).
_SCRAMBLE_A, _SCRAMBLE_B = 48271, 11


def _bucket(key_expr: str, salt: str) -> Column:
    """Deterministic bucket in [0, BUCKETS) from a key column: the
    frozen polynomial char fold (portable to any SQL engine) over
    salt+key, LCG-scrambled. The salt decorrelates independent samples
    — two 10% samples with different salts overlap ~1%, same salt →
    identical."""
    if "'" in salt:
        raise ValueError("salt must not contain single quotes")
    fold = H.STR_HASH.format(s=f"concat('{salt}', cast({key_expr} as string))")
    return F.expr(
        f"(({fold}) * {_SCRAMBLE_A} + {_SCRAMBLE_B}) % {H.P} % {BUCKETS}"
    )


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep rows whose key hashes below ``fraction`` of the bucket
    space. Deterministic, partition-independent, shuffle-free."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * BUCKETS)
    out = df.withColumn("__sample_key", F.col(key_col))
    return (
        out.filter(_bucket("__sample_key", salt) < threshold)
        .drop("__sample_key")
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (the rebalancing pass of a
    corpus pipeline: e.g. keep 100% of low-resource languages, 5% of
    English). Strata absent from ``fractions`` get
    ``default_fraction``. One narrow predicate, zero shuffle."""
    thr = F.lit(int(default_fraction * BUCKETS))
    for stratum, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0, 1]")
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(int(frac * BUCKETS))
        ).otherwise(thr)
    out = df.withColumn("__sample_key", F.col(key_col))
    return out.filter(_bucket("__sample_key", salt) < thr).drop(
        "__sample_key"
    )


def train_val_test_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    group_col: str | None = None,
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column ('train' | 'val' | 'test') by hashed key.
    With ``group_col``, the GROUP's value is hashed instead, so every
    row of a group lands in the same split — the leakage guard that
    keeps one site's near-duplicate pages out of both train and test.

    Weights are quantized to 1/BUCKETS and need not sum exactly to 1
    (the remainder goes to 'test')."""
    if len(weights) != 3 or any(w < 0 for w in weights) or sum(weights) > 1 + 1e-9:
        raise ValueError(f"weights must be 3 non-negatives summing <= 1: {weights}")
    t_train = int(weights[0] * BUCKETS)
    t_val = t_train + int(weights[1] * BUCKETS)
    keysrc = group_col if group_col is not None else key_col
    out = df.withColumn("__sample_key", F.col(keysrc))
    b = _bucket("__sample_key", salt)
    return out.withColumn(
        "split",
        F.when(b < t_train, F.lit("train"))
        .when(b < t_val, F.lit("val"))
        .otherwise(F.lit("test")),
    ).drop("__sample_key")


def domain_cap(
    df: DataFrame,
    cap: int,
    domain_col: str = "reg_domain",
    key_col: str = "doc_id",
    salt: str = "domcap",
    n_salts: int = 16,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain (the RefinedWeb-style
    anti-domination pass: without it, a handful of template-heavy
    sites own a disproportionate share of a web corpus). Survivors are
    chosen DETERMINISTICALLY — ranked by (hashed key, key), so the
    same docs survive on any engine or partitioning, and re-runs are
    reproducible (no RNG, no 'first seen' order dependence).

    Scale shape — the hot domains are EXACTLY why this operator exists,
    so a single row_number window per domain (all of cnn.com's 100M
    pages sorted in one task) would be self-defeating. Two-phase
    top-k instead: rank within (domain, salt-of-key) first — each
    sub-window holds ~1/``n_salts`` of a domain — keep each sub-top
    ``cap``, then rank the surviving ≤ cap·n_salts rows per domain.
    Both phases are row_number windows on fine keys; the second
    phase's input is bounded per domain regardless of how hot it is.
    The two-phase result is EXACTLY the global top-cap (every global
    top-cap row is in its salt's top-cap)."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window as W

    d = df.withColumn("__sample_key", F.col(key_col)).withColumn(
        "__b", _bucket("__sample_key", salt)
    )
    d = d.withColumn("__s", F.pmod(F.col("__b"), F.lit(n_salts)))
    w1 = W.partitionBy(domain_col, "__s").orderBy(
        F.asc("__b"), F.asc("__sample_key")
    )
    part = d.withColumn("__r1", F.row_number().over(w1)).filter(
        F.col("__r1") <= cap
    )
    w2 = W.partitionBy(domain_col).orderBy(F.asc("__b"), F.asc("__sample_key"))
    return (
        part.withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= cap)
        .drop("__sample_key", "__b", "__s", "__r1", "__r2")
    )


def _prep_budget_frame(
    df: DataFrame, token_col: str, key_col: str, salt: str, n_groups: int
) -> DataFrame:
    """Shared prep for the token-budget operators: (__sample_key,
    __nt, __b, __g) appended, frozen edge rules applied — a NULL key
    cannot be ordered deterministically → the row is EXCLUDED; NULL
    token counts weigh 0 — and the frame localCheckpoints so the
    upstream evaluates ONCE (the ccnet lineage-branch discipline:
    without it an expensive or nondeterministic upstream runs twice
    and the offsets can disagree with the window sums). Group ranges
    are CONTIGUOUS in the bucket space, so (group asc, bucket asc,
    key asc) equals global (bucket, key) order."""
    return (
        df.filter(F.col(key_col).isNotNull())
        .withColumn("__sample_key", F.col(key_col))
        .withColumn(
            "__nt", F.coalesce(F.col(token_col).cast("long"), F.lit(0))
        )
        .withColumn("__b", _bucket("__sample_key", salt))
        .withColumn(
            "__g", F.expr(f"(cast(__b as bigint) * {n_groups}) div {BUCKETS}")
        )
        .localCheckpoint(eager=True)
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    salt: str = "budget",
    n_groups: int = 1024,
) -> DataFrame:
    """Keep a deterministic subset of documents whose token counts sum
    to (at most) ``budget`` — the "give me 50B tokens of this corpus"
    operation every training run starts with. Frozen rule: order
    documents by (hashed key, key); keep a document iff the running
    INCLUSIVE token total up to it is <= budget (the document that
    would cross the budget is excluded, as is everything after it).

    Scale shape — the rule is a global prefix sum, and a naive global
    window (`ORDER BY` with no partition) serializes the corpus
    through ONE task. Distributed prefix-sum instead: the hash space
    splits into ``n_groups`` CONTIGUOUS bucket ranges; per-group token
    totals (one tiny aggregate) are prefix-summed on the driver
    (n_groups rows — model-sized, the documented collect) and
    broadcast back as per-group offsets; each group then needs only a
    WITHIN-group running sum (window bounded by group size, ~1/1024 of
    the corpus). offset + within-group cumsum == the global cumsum
    exactly, so the result is identical to the one-task form the
    DuckDB oracle states."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    d = _prep_budget_frame(df, token_col, key_col, salt, n_groups)
    c = _with_global_cumsum(d)
    if c is None:
        return df.filter(F.lit(False))
    return c.filter(F.col("__cum") <= budget).drop(
        "__sample_key", "__nt", "__b", "__g", "__off", "__cum"
    )


def _with_global_cumsum(d: DataFrame) -> DataFrame | None:
    """``__cum`` (the INCLUSIVE global running token total in
    (bucket, key) order) appended to a :func:`_prep_budget_frame`
    output — the distributed prefix-sum both the budget and the shard
    operators share: per-group totals collect driver-side
    (model-sized), prefix-sum into per-group offsets, broadcast back;
    offset + bounded within-group window == the one-task global cumsum
    exactly. Returns None for an empty frame."""
    from pyspark.sql import Window as W

    totals = (
        d.groupBy("__g").agg(F.sum("__nt").alias("__t")).collect()
    )
    by_g = {r["__g"]: r["__t"] for r in totals}
    offsets, acc = [], 0
    for g in sorted(by_g):
        offsets.append((g, acc))
        acc += by_g[g]
    if not offsets:
        return None
    odf = d.sparkSession.createDataFrame(offsets, "__g long, __off long")
    w = W.partitionBy("__g").orderBy(F.asc("__b"), F.asc("__sample_key"))
    cum = F.sum("__nt").over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return d.join(F.broadcast(odf), "__g").withColumn(
        "__cum", F.col("__off") + cum
    )


def shard_by_tokens(
    df: DataFrame,
    shard_tokens: int,
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    salt: str = "shard",
    n_groups: int = 1024,
) -> DataFrame:
    """Token-balanced shard assignment — pack the corpus into
    fixed-token output shards (the layout every training run wants:
    "~1B tokens per file, any order, but DETERMINISTIC"). Frozen rule:
    documents order by (hashed key, key) — the token_budget_sample
    order at the same salt — and a document's shard is the shard its
    STARTING offset falls in: ``shard_id = (inclusive running total −
    own tokens) div shard_tokens``. A document straddling a boundary
    stays in the shard it started in, so a shard overshoots its budget
    by at most one document. All rows are kept (NULL keys excluded,
    NULL token counts weigh 0 — the _prep_budget_frame edge rules);
    returns the input columns + ``shard_id``.

    Scale shape: identical to token_budget_sample — the shared
    distributed prefix-sum (:func:`_with_global_cumsum`), so no global
    window and no one-task serialization; downstream writes partition
    by ``shard_id``, giving size-uniform files regardless of document
    length skew."""
    if shard_tokens < 1:
        raise ValueError(f"shard_tokens must be >= 1, got {shard_tokens}")
    d = _prep_budget_frame(df, token_col, key_col, salt, n_groups)
    c = _with_global_cumsum(d)
    if c is None:
        return df.withColumn("shard_id", F.lit(0).cast("long")).filter(
            F.lit(False)
        )
    return c.withColumn(
        "shard_id", F.expr(f"(__cum - __nt) div {int(shard_tokens)}")
    ).drop("__sample_key", "__nt", "__b", "__g", "__off", "__cum")


def token_budget_stratified(
    df: DataFrame,
    budgets: dict[str, int],
    strata_col: str = "lang",
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    salt: str = "budget",
    n_groups: int = 1024,
    default_budget: int = 0,
) -> DataFrame:
    """Per-stratum token budgets — the DATA-MIXTURE operation every
    multilingual training run specifies ('30B en + 10B de + 5B fr
    tokens'): within each stratum, documents order by (hashed key,
    key) and survive while the stratum's inclusive running total fits
    its budget. Strata absent from ``budgets`` get
    ``default_budget`` (0 = excluded — mixtures are explicit); rows
    with a NULL stratum or NULL key are excluded (neither can be
    deterministically ordered/binned).

    Scale shape: the same distributed prefix-sum as
    :func:`token_budget_sample`, one dimension wider — totals
    aggregate on (stratum, hash-range group), offsets prefix-sum per
    stratum on the driver (n_strata × n_groups rows, model-sized),
    and the running sum windows on (stratum, group): bounded
    partitions regardless of corpus size or stratum skew. Within each
    stratum the result is EXACTLY token_budget_sample at that
    stratum's budget (same salt ⇒ same order; pytest pins it)."""
    for stratum, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for {stratum!r} must be >= 0, got {b}")
    if default_budget < 0:
        raise ValueError(f"default_budget must be >= 0, got {default_budget}")
    from pyspark.sql import Window as W

    d = _prep_budget_frame(
        df.filter(F.col(strata_col).isNotNull()),
        token_col,
        key_col,
        salt,
        n_groups,
    ).withColumn("__st", F.col(strata_col))
    totals = (
        d.groupBy("__st", "__g").agg(F.sum("__nt").alias("__t")).collect()
    )
    by_stratum: dict[str, dict[int, int]] = {}
    for r in totals:
        by_stratum.setdefault(r["__st"], {})[r["__g"]] = r["__t"]
    offsets = []
    for st in sorted(by_stratum):
        acc = 0
        for g in sorted(by_stratum[st]):
            offsets.append((st, g, acc))
            acc += by_stratum[st][g]
    if not offsets:
        return df.filter(F.lit(False))
    odf = df.sparkSession.createDataFrame(
        offsets, "__st string, __g long, __off long"
    )
    budget_expr = F.lit(int(default_budget))
    for stratum, b in sorted(budgets.items()):
        budget_expr = F.when(
            F.col("__st") == stratum, F.lit(int(b))
        ).otherwise(budget_expr)
    w = W.partitionBy("__st", "__g").orderBy(
        F.asc("__b"), F.asc("__sample_key")
    )
    cum = F.sum("__nt").over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        d.join(F.broadcast(odf), ["__st", "__g"])
        .withColumn("__cum", F.col("__off") + cum)
        .filter(F.col("__cum") <= budget_expr)
        .drop("__sample_key", "__nt", "__b", "__g", "__st", "__off", "__cum")
    )


def pack_sequences(
    df: DataFrame,
    seq_tokens: int,
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    salt: str = "pack",
    n_groups: int = 1024,
) -> DataFrame:
    """Packed-training-sequence manifest — the GPT-style layout a
    pretraining run feeds: all documents concatenate (in the frozen
    (hashed key, key) order the budget/shard family shares) into one
    virtual token stream, and sequence ``s`` is the slice
    ``[s*L, (s+1)*L)`` of that stream. Documents split AT sequence
    boundaries (the concatenation convention — boundaries are EOS
    markers, not padding), so every sequence except the last is
    exactly full. One manifest row per (document, sequence) overlap:

      (key, n_tokens, seq_id, doc_from, doc_to, seq_offset)

    where ``[doc_from, doc_to)`` is the document's token slice and
    ``seq_offset`` its start inside the sequence; per sequence the
    slices tile [0, L) exactly. Zero-token and NULL-key documents are
    excluded (nothing to place / no deterministic order).

    Scale shape: the SAME distributed prefix-sum as
    token_budget_sample / shard_by_tokens (no global window), then a
    ROW-LOCAL explode over each document's overlapped sequence range
    (ceil(nt/L)+1 bounded). Writers wanting sequence-clustered files
    partition the manifest by ``seq_id div sequences_per_file``."""
    if seq_tokens < 1:
        raise ValueError(f"seq_tokens must be >= 1, got {seq_tokens}")
    L = int(seq_tokens)
    # the manifest only needs (key, tokens) — select BEFORE prep so
    # the frame's localCheckpoint materializes two columns, not the
    # whole corpus row (the job passes the full written corpus here)
    d = _prep_budget_frame(
        df.select(key_col, token_col), token_col, key_col, salt, n_groups
    )
    out_cols = [
        F.col(key_col),
        F.col("__nt").alias("n_tokens"),
        F.col("seq_id"),
        F.expr(f"greatest(0L, seq_id * {L} - __start)").alias("doc_from"),
        F.expr(f"least(__nt, (seq_id + 1) * {L} - __start)").alias(
            "doc_to"
        ),
        F.expr(f"greatest(0L, __start - seq_id * {L})").alias(
            "seq_offset"
        ),
    ]
    c = _with_global_cumsum(d)
    if c is None:
        # schema-preserving empty manifest: the key keeps its real
        # type (a bigint-null stand-in would fork the parquet schema
        # between empty and non-empty runs)
        return (
            d.withColumn("__start", F.lit(0).cast("long"))
            .withColumn("seq_id", F.lit(0).cast("long"))
            .select(*out_cols)
        )
    return (
        c.filter(F.col("__nt") > 0)
        .withColumn("__start", F.col("__cum") - F.col("__nt"))
        .withColumn(
            "seq_id",
            F.expr(
                f"explode(sequence(__start div {L}, (__cum - 1) div {L}))"
            ),
        )
        .select(*out_cols)
    )


def lang_mixture_weights(
    df, lang_col: str = "lang", tokens_col: str = "n_tokens",
    alpha: float = 0.5,
) -> "DataFrame":
    """Temperature-based multilingual sampling weights (the XLM /
    mT5-style alpha rule, public practice): per language,
    ``q_l = p_l^alpha / Σ_m p_m^alpha`` with ``p_l`` the language's
    token share — alpha < 1 up-weights low-resource languages, alpha
    = 1 is proportional sampling. Output (lang, n_tokens, weight),
    weight rounded to 6 decimals; languages with zero tokens get
    weight 0 (they cannot be up-sampled from nothing).

    ``alpha=0.5`` (the default) is computed as ``sqrt`` — exactly
    rounded per IEEE-754 in every engine, so the DuckDB oracle
    matches bit-for-bit. Other alphas go through ``pow``, which is
    transcendental and NOT guaranteed identically rounded across
    libm implementations — fine for production, but contract keys
    must pin alpha=0.5 (the repo's no-transcendentals-cross-engine
    rule).

    Scale shape: ONE partial-aggregable groupBy on the language (the
    output is languages-grain, tens of rows) + the 1-row total
    crossJoined back broadcast-style (the textstats pattern)."""
    from pyspark.sql import functions as F

    per = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.sum(tokens_col).alias("n_tokens")
    )
    raised = (
        F.sqrt(F.col("n_tokens").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    )
    per = per.withColumn("__r", raised)
    total = per.agg(F.sum("__r").alias("__tot"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n_tokens",
            F.round(
                F.when(F.col("__tot") > 0, F.col("__r") / F.col("__tot"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("weight"),
        )
    )


def shuffle_assignment(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "",
    n_shards: int = 64,
) -> DataFrame:
    """``df`` + (shard, pos): a deterministic training-order
    assignment — the "global shuffle" a training pipeline needs
    before sequence packing, WITHOUT a global sort. Frozen rule:
    shard = scrambled-hash(seed:id) mod n_shards; pos = rank within
    the shard by (scrambled hash asc, id asc — the tiebreak makes
    hash collisions deterministic). Reading shards in order and each
    shard by pos is a reproducible pseudo-random permutation of the
    corpus; a different seed is a different permutation (epoch 2 =
    seed 'e2'), and NOTHING re-shuffles the data at rest — the
    assignment is columns, the consumer's reader does shard-local
    sorted reads.

    Scale shape: one shuffle keyed by shard (n_shards partitions,
    ~uniform by construction) + a per-shard row_number window — a
    shard is corpus/n_shards rows, the knob that keeps any single
    sort partition-sized. A 100 TB corpus at n_shards = 2^16 sorts
    ~1.5 GB per shard. The global-sort alternative is one giant
    range-exchange; this is the same data moved ONCE with bounded
    sort buffers."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql import Window as W

    out = df.withColumn("__sample_key", F.col(id_col)).withColumn(
        "__sh", _bucket("__sample_key", seed)
    )
    w = W.partitionBy(F.col("__sh") % n_shards).orderBy(
        F.col("__sh").asc(), F.col(id_col).asc()
    )
    return (
        out.withColumn("shard", (F.col("__sh") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__sample_key", "__sh")
    )


def mixture_keep_probs(weights: DataFrame) -> DataFrame:
    """(lang, keep_prob) from :func:`lang_mixture_weights` output:
    turn target SHARES into per-document keep PROBABILITIES with
    maximal data retention. q_l is the target share, p_l = n_tokens /
    Σ n_tokens the corpus share; keeping lang l with probability
    r_l = c·q_l/p_l yields exactly the target mixture for any c, and
    c = min_l(p_l/q_l) is the largest c with every r_l <= 1 — the
    argmin language (the most up-weighted one) keeps everything,
    everything else downsamples proportionally. Pure double
    arithmetic (+,·,/,min — identically rounded in every IEEE engine;
    the no-transcendentals contract rule), languages-grain frames
    throughout, the min a 1-row broadcast."""
    per = weights.select(
        "lang",
        F.col("n_tokens").cast("double").alias("__n"),
        F.col("weight").cast("double").alias("__q"),
    )
    tot = per.agg(F.sum("__n").alias("__tot"))
    ratio = per.crossJoin(F.broadcast(tot)).select(
        "lang",
        (F.col("__n") / F.col("__tot")).alias("__p"),
        "__q",
    )
    c = ratio.filter(F.col("__q") > 0).agg(
        F.min(F.col("__p") / F.col("__q")).alias("__c")
    )
    return ratio.crossJoin(F.broadcast(c)).select(
        "lang",
        F.when(F.col("__q") <= 0, F.lit(0.0))
        .otherwise(
            F.least(F.lit(1.0), F.col("__c") * F.col("__q") / F.col("__p"))
        )
        .alias("keep_prob"),
    )


def weighted_sample(
    df: DataFrame,
    prob_col: str,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep each row with its OWN probability (a column — joined
    keep_probs, quality-derived weights, decay schedules), decided by
    the same content-addressed bucket as :func:`hash_sample`:
    deterministic, partition-independent, resumable. A row is kept
    iff bucket(salt:key) < floor(prob · BUCKETS) — probabilities
    quantize to 1/BUCKETS (10^-6), stated rather than hidden. Zero
    shuffle beyond whatever join produced ``prob_col``."""
    out = df.withColumn("__sample_key", F.col(key_col))
    return out.filter(
        _bucket("__sample_key", salt)
        < F.floor(F.col(prob_col) * F.lit(float(BUCKETS))).cast("long")
    ).drop("__sample_key")


def apply_mixture(
    df: DataFrame,
    weights: DataFrame,
    lang_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Resample ``df`` to the target language mixture: broadcast-join
    :func:`mixture_keep_probs` of the weights and apply
    :func:`weighted_sample`. Languages missing from the weights table
    are DROPPED (keep_prob absent → 0 — an unweighted language has no
    place in the declared mixture; pass an explicit weight row to
    keep it). The join is languages-grain broadcast; the filter is
    row-local."""
    probs = mixture_keep_probs(weights)
    joined = df.join(
        F.broadcast(probs.withColumnRenamed("lang", lang_col)),
        lang_col,
        "left",
    ).withColumn("keep_prob", F.coalesce("keep_prob", F.lit(0.0)))
    return weighted_sample(
        joined, "keep_prob", key_col=key_col, salt=salt
    ).drop("keep_prob")

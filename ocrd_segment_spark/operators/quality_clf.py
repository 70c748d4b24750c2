"""Learned document-quality classifier — hashed bag-of-tokens logistic
model in the fastText supervised shape (public knowledge: Joulin et
al. 2016 "Bag of Tricks for Efficient Text Classification": tokens →
hashed features → linear model; we drop the embedding layer so the
scorer is pure integer/float column math both engines can state).

Heuristic quality scores (operators/textstats.with_quality) rank by
surface statistics; production pipelines (CCNet, GPT-3's WebText
filter, fastText-based curation) LEARN the keep/drop boundary from
labeled seeds instead. This module pins a frozen, trained-once model:

Frozen semantics (the quality_classifier oracle restates every step;
tests pin the weight digest like langid's MODEL_SHA256):

1. normalize: the SAME ASCII fold + whitespace collapse as
   operators/langid.normalize (one normalization discipline repo-wide);
2. tokens: split on single spaces of the normalized text, empties
   dropped;
3. feature bucket per token: the repo's frozen polynomial char fold
   (functions/hashing.STR_HASH — the dedup/sampling hash) mod
   ``N_BUCKETS``;
4. logit = round(bias + (sum over tokens, in TOKEN ORDER, of
   weight[bucket]) / n_tokens, 6) — the left-to-right fold is frozen
   (float addition is not associative); zero-token documents score
   NULL and keep=false is NOT implied: clf_keep is NULL too (no
   evidence, never silently binned — the bits_per_bigram rule);
5. clf_keep = logit >= 0. The model reports the LOGIT, not the
   sigmoid: exp() is transcendental and engines disagree in the last
   ulp, so the probability squashing stays OUT of the frozen contract
   (monotone in the logit anyway — thresholds translate).

Training is pure deterministic Python over the committed seed corpus
(logistic regression, fixed epochs/learning rate, no RNG — weights
start at zero and the data order is sorted), run once per process and
rounded to 8 decimals; the rounded literals ARE the model, consumed
identically by the Spark scorer and the DuckDB oracle. Swap in a
bigger labeled set the same way langid grows SEED_CORPUS: edit, retrain
(automatic), re-pin the digest.

Scale shape: ONE narrow column expression — the weight table inlines
as an array literal indexed by bucket (N_BUCKETS doubles, a closure
constant), evaluated inside the scan stage; zero shuffle, zero Python.

COVERAGE CAVEAT (the langid-model honesty rule): with the committed
~24-seed corpus, most of the hash space carries zero weight, so text
sharing no vocabulary with the seeds scores ≈ bias (negative → drop).
That is the right default for a KEEP classifier — unknown-looking
text is unvetted — but it means the toy model is aggressive outside
its seed distribution (measured: the synthetic bench fixtures drop
almost entirely). The machinery is the deliverable; production use
swaps a real labeled set into SEED_KEEP/SEED_DROP (or loads exported
weights the same literal way) and re-pins the digest.
"""

from __future__ import annotations

import math
from functools import lru_cache

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import hashing as H
from .langid import normalize

N_BUCKETS = 128
EPOCHS = 300
LR = 0.5

# Committed seed labels, composed for this module: keep = natural
# prose (the kind of page a training corpus wants); drop = the classic
# web-junk modes — keyword stuffing, listicles of anchors, SEO word
# salads, template crumbs, lorem filler.
SEED_KEEP: tuple[str, ...] = (
    "the children were playing in the garden while their parents cooked dinner",
    "she opened the window and watched the rain fall on the quiet street",
    "a long journey begins with a single step and a good pair of shoes",
    "the library closes early on sundays so bring the books back tomorrow",
    "he could not remember where he had left the keys to the old house",
    "the weather forecast says it will be sunny with a light breeze all week",
    "we should have finished the report before the meeting this morning",
    "there is nothing better than a warm cup of tea on a cold winter evening",
    "the committee reviewed the proposal and suggested several small changes",
    "after the storm passed the fishermen returned to the harbor at dawn",
    "historians still debate what caused the sudden collapse of the empire",
    "the recipe calls for two eggs a cup of flour and a pinch of salt",
)
SEED_DROP: tuple[str, ...] = (
    "cheap deals best price buy now discount offer sale cheap deals best price",
    "click here click here subscribe newsletter follow like share click here",
    "casino poker slots bonus jackpot casino poker slots bonus win win win",
    "home about contact privacy terms sitemap login register home about contact",
    "seo ranking backlinks traffic seo ranking backlinks traffic keywords seo",
    "lorem ipsum dolor sit amet lorem ipsum dolor sit amet lorem ipsum",
    "free download free download crack keygen serial free download full version",
    "top 10 best cheap buy online shop store deals top 10 best cheap buy",
    "viagra cialis pills pharmacy cheap meds online no prescription pills",
    "copyright all rights reserved powered by theme designed by template",
    "next page previous page page 1 page 2 page 3 page 4 next page",
    "advertisement sponsored content advertisement sponsored links advertisement",
)


def _hash_bucket(token: str) -> int:
    """Python twin of the frozen polynomial char fold mod N_BUCKETS
    (functions/hashing.STR_HASH semantics: codepoint fold, a*31+c mod
    P, left to right)."""
    a = 0
    for ch in token:
        a = (a * 31 + ord(ch)) % H.P
    return a % N_BUCKETS


def _features(text: str) -> list[int]:
    toks = [t for t in normalize(text).split(" ") if t]
    return [_hash_bucket(t) for t in toks]


@lru_cache(maxsize=1)
def train_weights() -> tuple[tuple[float, ...], float]:
    """(weights[N_BUCKETS], bias) — deterministic logistic regression
    over the committed seeds: zero init, sorted data order, full-batch
    gradient, fixed epochs/LR, weights rounded to 8 decimals (the
    rounded literals are THE model; the digest is pytest-pinned)."""
    data = sorted([(s, 1.0) for s in SEED_KEEP] + [(s, 0.0) for s in SEED_DROP])
    feats = [(_features(s), y) for s, y in data]
    w = [0.0] * N_BUCKETS
    b = 0.0
    for _ in range(EPOCHS):
        gw = [0.0] * N_BUCKETS
        gb = 0.0
        for bks, y in feats:
            x = sum(w[k] for k in bks) / len(bks)
            p = 1.0 / (1.0 + math.exp(-(b + x)))
            err = p - y
            gb += err
            for k in bks:
                gw[k] += err / len(bks)
        for k in range(N_BUCKETS):
            w[k] -= LR * gw[k] / len(feats)
        b -= LR * gb / len(feats)
    return tuple(round(v, 8) for v in w), round(b, 8)


def score_text(text: str) -> float | None:
    """Python reference scorer (frozen rule 4) — pytest pins the Spark
    column against it; returns the round-6 logit or None."""
    from .langid import _round6

    w, b = train_weights()
    bks = _features(text)
    if not bks:
        return None
    acc = 0.0
    for k in bks:  # token order — the frozen left-to-right fold
        acc += w[k]
    return _round6(b + acc / len(bks))


def clf_cols(text_col: str = "text") -> Column:
    """The round-6 ``clf_logit`` column (NULL when zero tokens) as one
    narrow JVM expression; ``clf_keep`` is derived by the caller as
    ``clf_logit >= 0`` (NULL-propagating) — emitting the comparison
    inside this expression would duplicate the whole tokenize+hash
    fold per row (review round-5: interpreted plans have no CSE)."""
    w, b = train_weights()
    weights = ", ".join(repr(v) for v in w)
    fold = H.STR_HASH.format(s="t")
    # normalize: ASCII fold + whitespace-class collapse + trim — the
    # SQL twin of langid.normalize (same frozen class, \x0B spelling)
    from .bpe import WS_CLASS_SPARK

    norm = (
        f"trim(BOTH ' ' FROM regexp_replace(translate(coalesce({text_col}, ''),"
        f" 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),"
        f" '{WS_CLASS_SPARK}', ' '))"
    )
    toks = f"filter(split({norm}, ' '), x -> x != '')"
    # bind the token array once; the weight lookup rides transform so
    # the per-token fold expression is evaluated once per token
    # (interpreted-HOF no-CSE discipline)
    vals = (
        f"transform({toks}, t -> element_at(array({weights}),"
        f" cast(({fold}) % {N_BUCKETS} + 1 as int)))"
    )
    logit = (
        f"round({b!r} + aggregate({vals}, cast(0.0 as double),"
        f" (a, v) -> a + v) / size({toks}), 6)"
    )
    # NOTE: the divisor uses size(toks) — same length as the weight
    # array (transform preserves size) without re-running the lookups
    return F.expr(
        f"CASE WHEN size({toks}) = 0 THEN cast(null as double)"
        f" ELSE {logit} END"
    )


def with_quality_classifier(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append (clf_logit, clf_keep): clf_keep = clf_logit >= 0, NULL
    when the logit is NULL (zero-token doc — no evidence)."""
    d = df.withColumn("clf_logit", clf_cols(text_col))
    return d.withColumn("clf_keep", F.col("clf_logit") >= 0.0)


def weights_sql_array() -> str:
    """The weight table as a SQL array literal (oracle twin)."""
    w, _ = train_weights()
    return "[" + ", ".join(repr(v) for v in w) + "]"

"""Deterministic hashing expressions for dedup / fingerprinting.

All hashes are explicit integer arithmetic (polynomial folds mod
1e9+7) rather than engine builtins, so any SQL engine can replicate
them bit-for-bit (the DuckDB oracles do). Everything stays JVM-side
(Catalyst higher-order functions); per-token hashes are computed once
and shingle hashes composed from them — re-folding characters per
shingle measured ~20× slower.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

P = 1_000_000_007

# tokens of a text column (empty strings from consecutive spaces dropped)
TOKENS = "filter(split({col}, ' '), x -> x != '')"

# polynomial char fold of one string value {s}
STR_HASH = f"aggregate(split({{s}}, ''), 0L, (a, c) -> (a * 31 + ascii(c)) % {P})"


def tokens(col: str = "text") -> Column:
    return F.expr(TOKENS.format(col=col))


def token_hashes(tokens_col: str) -> Column:
    """array<long>: polynomial hash per token."""
    return F.expr(f"transform({tokens_col}, t -> {STR_HASH.format(s='t')})")


def window_hashes_sql(token_hash_col: str, n: int) -> str:
    """SQL fragment: position-ordered composed n-gram hashes over token
    hashes (one entry per window start; NOT distinct). The single home
    of the '(h * 131 + next) % P' compose — shingle_hashes and the
    exact-substring dedup both build on it, so the polynomial can never
    drift between call sites. Documents with fewer than n tokens yield
    an EMPTY array (without the guard, sequence(0, size-n) is
    descending for negative bounds and th[i+k] raises
    INVALID_ARRAY_INDEX under ANSI mode)."""
    parts = "th[i]"
    for k in range(1, n):
        parts = f"({parts} * 131 + th[i+{k}]) % {P}"
    body = (
        f"IF(size(th) >= {n},"
        f" transform(sequence(0, size(th) - {n}), i -> {parts}),"
        " cast(array() as array<bigint>))"
    )
    return body.replace("th", token_hash_col)


def shingle_hashes(token_hash_col: str, n: int = 3) -> Column:
    """array<long>: DISTINCT composed n-gram hashes (set semantics for
    Jaccard/minhash; use window_hashes_sql where positions matter)."""
    return F.expr(f"array_distinct({window_hashes_sql(token_hash_col, n)})")


def minhash_signature(hashes_col: str, k: int = 8) -> Column:
    """array<long> length k: sig_i = min((2i+3)*h + 5i+7 mod P)."""
    return F.expr(
        f"transform(sequence(0, {k - 1}), i -> array_min(transform({hashes_col},"
        f" h -> ((2*i + 3) * h + 5*i + 7) % {P})))"
    )


def minhash_signature_fold(hashes_col: str, k: int = 8) -> Column:
    """Same values as :func:`minhash_signature` (for non-empty input)
    computed in a SINGLE pass over the hash array: fold with a k-length
    accumulator instead of k per-lane re-scans, so no n-sized
    per-lane intermediate arrays are materialized. Used where the
    row-wise form is forced (streaming plans may not aggregate before
    the stateful operator). Empty input yields k sentinel values (P)
    rather than k NULLs — callers filter empties upstream."""
    return F.expr(
        f"aggregate({hashes_col}, array_repeat({P}L, {k}),"
        f" (acc, h) -> transform(acc,"
        f" (m, i) -> least(m, ((2*i + 3) * h + 5*i + 7) % {P})))"
    )


def lsh_bands(sig_col: str, bands: int, rows: int = 2) -> Column:
    """array<long>: band values packing ``rows`` signature entries."""
    assert rows == 2, "frozen at 2 rows/band (band packing is P-ary)"
    return F.expr(
        f"transform(sequence(0, {bands - 1}),"
        f" j -> {sig_col}[2*j] * {P}L + {sig_col}[2*j+1])"
    )


def simhash(token_hash_col: str, bits: int = 16) -> Column:
    """long: bit-majority simhash over token hashes."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, b) -> acc +"
        f" IF(aggregate({token_hash_col}, 0L,"
        " (a, h) -> a + (shiftright(h, b) % 2) * 2 - 1) > 0,"
        " shiftleft(1L, b), 0L))"
    )

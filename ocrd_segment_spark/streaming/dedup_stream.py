"""Incremental (streaming) near-duplicate detection.

A continuously-ingesting crawl needs dedup against EVERYTHING seen so
far, not just the current microbatch. State: per LSH band-value, the
doc ids already seen in that bucket (applyInPandasWithState keyed by
(band_idx, band_val)). Each arriving doc emits candidate pairs against
both in-batch and in-state members of its buckets.

At scale, state is sharded by the band value across the cluster's
state store; hot buckets (boilerplate) are capped by ``max_bucket``
(emitting pairs against a bounded sample, the standard LSH guard).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions import hashing as H

PAIR_SCHEMA = "doc1 long, doc2 long, band_idx int"
_STATE_SCHEMA = "seen array<long>"


def _band_values(df: DataFrame, id_col: str, text_col: str, k: int, bands: int) -> DataFrame:
    # Row-wise (narrow) signature: a streaming plan may not contain an
    # unwatermarked aggregation before the stateful operator, so the
    # batch operator's explode+groupBy form is NOT usable here. The
    # per-row array fold is fine — the stateful bucket shuffle is the
    # plan's only exchange.
    sig = (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .withColumn("toks", H.tokens("text"))
        .filter(F.size("toks") >= 3)
        .withColumn("th", H.token_hashes("toks"))
        .withColumn("hs", H.shingle_hashes("th", 3))
        # single-pass fold: one scan of hs with a k-length accumulator
        # (the per-lane array_min form re-scans hs k times)
        .select("doc_id", H.minhash_signature_fold("hs", k).alias("sig"))
    )
    return sig.select(
        "doc_id",
        F.posexplode(H.lsh_bands("sig", bands)).alias("band_idx", "band_val"),
    )


def _bucket_fn(max_bucket: int):
    def fn(key, pdfs, state: GroupState):
        band_idx = int(key[0])
        seen: list[int] = list(state.get[0]) if state.exists else []
        seen_set = set(seen)
        rows = pd.concat(list(pdfs)).reset_index(drop=True)
        new_ids = sorted(int(x) for x in rows["doc_id"].unique())
        pairs = []
        for nid in new_ids:
            # a doc re-arriving in a later microbatch already emitted
            # its pairs on first sight — skip it so state holds
            # DISTINCT members and the max_bucket cap counts real docs
            if nid in seen_set:
                continue
            for old in seen:
                pairs.append((min(old, nid), max(old, nid)))
            if len(seen) < max_bucket:
                seen.append(nid)
                seen_set.add(nid)
        state.update((seen,))
        if pairs:
            yield pd.DataFrame(
                {
                    "doc1": [a for a, _ in pairs],
                    "doc2": [b for _, b in pairs],
                    "band_idx": band_idx,
                }
            )

    return fn


def streaming_minhash_dedup(
    docs: DataFrame, k: int = 8, bands: int = 4, max_bucket: int = 64
) -> DataFrame:
    """docs: a STREAMING DataFrame with (doc_id, text). Returns a
    streaming DataFrame of candidate pairs (doc1, doc2, band_idx) —
    deduplicate per band downstream (or distinct() in the sink batch).
    Watermark-free: dedup state is by design unbounded history (capped
    per bucket)."""
    bv = _band_values(docs, "doc_id", "text", k, bands)
    return bv.groupBy("band_idx", "band_val").applyInPandasWithState(
        _bucket_fn(max_bucket),
        PAIR_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

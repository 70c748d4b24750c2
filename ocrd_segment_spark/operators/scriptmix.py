"""Unicode script-mix statistics + homoglyph (confusable) signals.

Language ID (operators/langid) answers "which language"; this module
answers the orthogonal crawl-hygiene questions: what SCRIPTS does the
text actually use, is it a mixed-script document (a strong spam /
SEO-cloaking / wrong-decode signal at crawl scale), and does it
contain Latin–Cyrillic confusable adjacencies — the classic homoglyph
spoof ('pаypаl' with U+0430 CYRILLIC SMALL A) that phishing pages and
blocklist-evading spam use (Unicode TR#39 describes the attack; this
is the cheap per-document screen, not a full confusable-skeleton
implementation).

Frozen rule (stated so the DuckDB oracle restates it 1:1 — both
engines count matches of the SAME literal code-point classes; ranges
are explicit BMP blocks, not engine-specific ``\\p{script=}`` names,
because Java and RE2 disagree on script-property spellings and
coverage):

  - eight script classes, in the frozen DECLARATION ORDER that also
    breaks argmax ties: latin [A-Za-z U+00C0-U+024F], cyrillic
    [U+0400-U+04FF], greek [U+0370-U+03FF], arabic [U+0600-U+06FF],
    hebrew [U+0590-U+05FF], han [U+4E00-U+9FFF], kana
    [U+3040-U+30FF], hangul [U+AC00-U+D7AF];
  - ``n_letters`` = the sum of the eight counts (digits, punctuation
    and unlisted scripts are not letters for this purpose);
  - ``main_script`` = the class with the max count, first-declared
    wins ties; NULL when ``n_letters`` = 0;
  - ``main_fraction`` = max count / n_letters, round-6 double, NULL
    when n_letters = 0;
  - ``mixed_script`` = n_letters >= MIN_LETTERS (20) AND
    main_fraction < 0.95 — tiny fragments are never flagged;
  - ``confusable_pairs`` = count of immediate Latin–Cyrillic letter
    adjacencies (either order), the homoglyph-word signal; counted
    on the raw text with one alternation pattern, non-overlapping
    (both engines scan left-to-right).

Scale shape (100 TB): pure scan-stage column math — nine
``regexp_count`` probes per row, zero Python, zero shuffle.
Reference analog: the script screen is the web twin of the
reference's per-region script/orientation plausibility metadata
(/root/reference/ocrd_segment/extract_regions.py keeps
``primaryScript`` on its region records).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (name, regex char class) — frozen declaration order IS the tie order
SCRIPT_CLASSES = (
    ("latin", "[A-Za-zÀ-ɏ]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("greek", "[Ͱ-Ͽ]"),
    ("arabic", "[؀-ۿ]"),
    ("hebrew", "[֐-׿]"),
    ("han", "[一-鿿]"),
    ("kana", "[぀-ヿ]"),
    ("hangul", "[가-힯]"),
)

MIN_LETTERS = 20
MIXED_MAX_MAIN = 0.95

CONFUSABLE_PAIR = (
    "[A-Za-z][Ѐ-ӿ]|[Ѐ-ӿ][A-Za-z]"
)


def _counts(text: Column) -> dict[str, Column]:
    return {
        name: F.regexp_count(text, F.lit(cls))
        for name, cls in SCRIPT_CLASSES
    }


def with_script_mix(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-script counts (``n_<script>``) plus the summary
    columns (n_letters, main_script, main_fraction, mixed_script,
    confusable_pairs) per the frozen rule above."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    cnt = _counts(text)
    out = df
    for name in cnt:
        out = out.withColumn(f"n_{name}", cnt[name].cast("long"))
    letters = None
    for name in cnt:
        c = F.col(f"n_{name}")
        letters = c if letters is None else letters + c
    out = out.withColumn("n_letters", letters)
    mx = F.greatest(*[F.col(f"n_{n}") for n, _ in SCRIPT_CLASSES])
    # first-declared wins ties: build the CASE in declaration order
    chain = F.when(F.col("n_letters") == 0, F.lit(None).cast("string"))
    for name, _ in SCRIPT_CLASSES:
        chain = chain.when(F.col(f"n_{name}") == mx, F.lit(name))
    out = (
        out.withColumn("main_script", chain)
        .withColumn(
            "main_fraction",
            F.when(
                F.col("n_letters") > 0,
                F.round(mx * F.lit(1.0) / F.col("n_letters"), 6),
            ),
        )
        .withColumn(
            # UNROUNDED fraction here — the rounded main_fraction could
            # cross the 0.95 threshold from below (round6 of 0.9499996
            # is 0.95) and flip the flag vs the stated rule
            "mixed_script",
            (F.col("n_letters") >= MIN_LETTERS)
            & (mx * F.lit(1.0) / F.col("n_letters") < MIXED_MAX_MAIN),
        )
        .withColumn(
            "confusable_pairs",
            F.regexp_count(text, F.lit(CONFUSABLE_PAIR)).cast("long"),
        )
    )
    return out


def script_mix_summary(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The contract-shaped projection: one row per document with the
    summary columns only."""
    return with_script_mix(df, text_col=text_col).select(
        id_col,
        "n_letters",
        "main_script",
        "main_fraction",
        "mixed_script",
        "confusable_pairs",
    )

"""Unicode NFC normalization — crawl-corpus hygiene.

Web crawls mix encodings and editors: the same visible text arrives
both precomposed (``é`` U+00E9) and decomposed (``e`` + U+0301), which
splinters every content-keyed operation downstream — exact dedup,
substring dedup windows, shingle sets, LM bigrams. Public practice
(C4/ftfy-adjacent cleanup) normalizes to NFC once, early.

Frozen semantics: NFC exactly as defined by Unicode (normalization is
STABILITY-GUARANTEED across Unicode versions for assigned code
points, which is what makes a cross-engine oracle possible at all):
the Spark side maps Python ``unicodedata.normalize('NFC', …)`` over
Arrow batches; the DuckDB oracle states ``nfc_normalize(…)``
(utf8proc) — both implement the same canonical composition.

Shape: one narrow mapInPandas pass (no SQL builtin exists in Spark),
routed through the central python-task cap; zero shuffle.

Placement caveat: NFC changes character COUNTS (é as two code points
becomes one), so normalizing ``extracted_text`` in place would orphan
``region_spans`` offsets and break the byte-identity contract with the
extraction oracle. Apply it to content-keyed DERIVATIONS (dedup keys,
shingles, LM inputs) or to span-free text tables — never between
extraction and a span consumer. (The span-preserving cleanup pattern
in operators/paragraphs shows what a span-correct rewrite requires.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def with_nfc(
    df: DataFrame,
    text_col: str = "text",
    python_parallelism: int | None = None,
) -> DataFrame:
    """Append (text_nfc, nfc_changed): the NFC form and whether it
    differs from the input. NULL text yields '' (changed = false) —
    the repo's empty-document convention."""
    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("text_nfc", T.StringType(), False),
            T.StructField("nfc_changed", T.BooleanType(), False),
        ]
    )

    def batches(it):
        import unicodedata

        for pdf in it:
            out, changed = [], []
            for t in pdf[text_col]:
                t = t if isinstance(t, str) else ""
                n = unicodedata.normalize("NFC", t)
                out.append(n)
                changed.append(n != t)
            yield pdf.assign(
                text_nfc=out, nfc_changed=pd.array(changed, dtype="bool")
            )

    from ..pipeline import _cap_python_tasks

    return _cap_python_tasks(df, python_parallelism).mapInPandas(batches, schema)

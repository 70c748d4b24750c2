"""PII redaction for training-text hygiene.

A web corpus ships emails, phone numbers, and IP addresses that a
training pipeline must scrub (public practice: C4's blocklist pass,
BigScience/ROOTS PII filtering). This module pins a FROZEN three-step
regexp chain, written in the Java-regex/RE2 common subset (no
lookaround, no backreferences) so the DuckDB oracle can state the
identical computation:

1. emails  → ``<EMAIL>``   (local@domain.tld, tld >= 2 alpha chars)
2. IPv4    → ``<IP>``      (four 1-3 digit octets — syntactic match;
                            range-checking octets needs lookahead,
                            which RE2 lacks, so 999.0.0.1 also
                            redacts: over-redaction is the safe side)
3. phones  → ``<PHONE>``   (optional ``+``, then >= 8 of digits,
                            spaces, parens, dashes, ending in a digit)

Order is load-bearing: emails first (their digits must not feed the
phone matcher), IPs before phones (the phone class excludes dots, but
the order is pinned anyway so the semantics never depend on that).

All three are narrow column expressions — the scrub runs inside the
scan stage, zero shuffle at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\\\.[A-Za-z][A-Za-z]+"
IPV4_RE = "\\\\b[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}\\\\b"
PHONE_RE = "\\\\+?[0-9][0-9() -]{6,}[0-9]"


def redact_pii_sql(col: str) -> str:
    """The Spark-SQL expression string for the frozen chain — the
    single source the operator AND the contract query both build from
    (same pattern as urls.canonicalize_url_sql), so a chain change
    cannot leave the oracle checking a stale order."""
    return (
        f"regexp_replace(regexp_replace(regexp_replace({col},"
        f" '{EMAIL_RE}', '<EMAIL>'),"
        f" '{IPV4_RE}', '<IP>'),"
        f" '{PHONE_RE}', '<PHONE>')"
    )


def redact_pii(col: str) -> Column:
    """Apply the frozen email → IPv4 → phone redaction chain."""
    return F.expr(redact_pii_sql(col))


def redact_pii_spans(
    df,
    id_col: str = "url",
    text_col: str = "extracted_text",
    spans_col: str = "region_spans",
    sep: str = "\n",
):
    """SPAN-PRESERVING PII redaction (round-5 task 5): emit
    (clean_text, REMAPPED spans) so scrubbing can touch the
    span-aligned main table — ``redact_pii`` alone rewrites text and
    orphans every offset.

    Frozen semantics (the pii_redaction_spans oracle restates each
    step; same separator-position discipline as
    operators/paragraphs.remove_frequent_regions):

    - positive spans (end > start) sort by (start, end, region_id);
      each region's substring of ``text_col`` is redacted by the
      frozen email → IPv4 → phone chain INDEPENDENTLY — sound because
      no pattern can match across a region boundary: every character
      class excludes the separator (\\n), so per-region redaction
      equals whole-text redaction wherever spans tile the text (the
      kernel's output shape);
    - clean_text = redacted region texts joined by ``sep``; new
      offsets derive O(n) from separator positions (zip_with — never
      the O(n²) prefix-scan trap), so
      substring(clean_text, new start, new end) == redact(original
      region text) BY CONSTRUCTION;
    - every span keeps every input field (withField rewrite); a
      zero-length span re-anchors to the new start of the first
      positive span at-or-after its original position (end of
      clean_text if none) — media anchors survive scrubbing;
    - output spans order by (new start, new end, region_id);
    - ``n_pii_regions`` counts regions whose text changed (the scrub's
      per-doc audit signal).

    Scale shape: ZERO shuffle — sort, redact, rebuild, and remap are
    all per-document column math inside the scan stage; the operator
    composes after extraction or over a written corpus at any size."""
    from ..operators.paragraphs import rebuild_with_spans

    red = redact_pii_sql("w.raw")
    d = df.withColumn(
        "_units",
        F.expr(
            f"""transform(
              array_sort(transform(
                filter({spans_col}, s -> s.end > s.start),
                s -> struct(s.start as k1, s.end as k2,
                            s.region_id as k3, s as span,
                            substring({text_col},
                                      cast(s.start + 1 as int),
                                      cast(s.end - s.start as int)) as raw))),
              w -> struct(w.span as span, w.k1 as orig_start,
                          w.raw as raw, {red} as red))"""
        ),
    )
    d = (
        d.withColumn(
            "n_pii_regions",
            F.expr(
                "cast(size(filter(_units, u -> u.raw != u.red)) as bigint)"
            ),
        )
        .withColumn(
            "_arr",
            F.transform(
                "_units",
                lambda u: F.struct(
                    u["orig_start"].alias("orig_start"),
                    u["span"].alias("r"),
                    u["red"].alias("rtext"),
                ),
            ),
        )
        .withColumn("_zeros", F.expr(f"filter({spans_col}, s -> s.end = s.start)"))
        .drop("_units")
    )
    out = rebuild_with_spans(d, sep, spans_col)
    return out.select(
        F.col(id_col), "clean_text", F.col(spans_col), "n_pii_regions"
    )


def pii_counts(col: str) -> Column:
    """struct(n_emails, n_ips, n_phones): per-type occurrence counts,
    each measured at its position in the redaction chain — emails on
    the raw text, IPs after the email step, phones after email+IP
    (same staging as redact_pii, so counts and redactions always
    agree)."""
    after_email = f"regexp_replace({col}, '{EMAIL_RE}', '<EMAIL>')"
    after_ip = f"regexp_replace({after_email}, '{IPV4_RE}', '<IP>')"
    return F.expr(
        f"struct(cast(regexp_count({col}, '{EMAIL_RE}') as bigint) as n_emails,"
        f" cast(regexp_count({after_email}, '{IPV4_RE}') as bigint) as n_ips,"
        f" cast(regexp_count({after_ip}, '{PHONE_RE}') as bigint) as n_phones)"
    )

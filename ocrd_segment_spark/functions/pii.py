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

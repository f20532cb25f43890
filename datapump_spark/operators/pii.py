"""PII detection and redaction for training-data pipelines.

Regex-based detectors for the four classic pre-training scrub targets
(emails, phone numbers, IPv4 addresses, SSN-shaped ids). Detection and
redaction are single ``regexp_count`` / ``regexp_replace`` expressions —
JVM-side, vectorized, no shuffle; at 100 TB they run at scan speed like
every other per-row text operator here.

Patterns deliberately use only the regex subset Java (Spark) and RE2
(DuckDB, the oracle engine) share: no lookaround, no backreferences —
so the correctness gate can replay them verbatim.

Extends the reference (no data-column functions there, SURVEY §2.9) per
the build plan's training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# category → (pattern, replacement token); insertion order = redaction order
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    "phone": (r"\b[0-9]{2,3}[- .][0-9]{3}[- .][0-9]{3,4}[- .][0-9]{4}\b",
              "[PHONE]"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
}


def pii_stats(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-row match counts: (id, n_email, n_ssn, n_phone, n_ipv4).

    SSN is counted before phone: the patterns overlap (an SSN is a valid
    phone shape) and redaction applies them in the same order, so counts
    and redaction agree on which category claimed a span.
    """
    c = F.col(text_col)
    counts = []
    for cat, (pat, _) in PII_PATTERNS.items():
        counts.append(F.regexp_count(c, F.lit(pat)).cast("bigint")
                      .alias(f"n_{cat}"))
        c = F.regexp_replace(c, pat, "")
    return df.select(F.col(id_col), *counts)


def pii_redact(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", out_col: str = "clean_text") -> DataFrame:
    """Replace every match with its category token, category order as in
    :data:`PII_PATTERNS` (email before phone before ip, SSN before the
    overlapping phone pattern)."""
    c = F.col(text_col)
    for _, (pat, token) in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, token)
    return df.select(F.col(id_col), c.alias(out_col))


def pii_stats_sql(id_expr: str, text_expr: str, table: str) -> str:
    """DuckDB twin of :func:`pii_stats` (RE2 shares the pattern subset)."""
    c = text_expr
    cols = []
    for cat, (pat, _) in PII_PATTERNS.items():
        p = pat.replace("'", "''")
        cols.append(
            f"CAST(len(regexp_extract_all({c}, '{p}')) AS BIGINT) AS n_{cat}")
        c = f"regexp_replace({c}, '{p}', '', 'g')"
    return f"SELECT {id_expr}, {', '.join(cols)} FROM {table}"


def pii_redact_sql(id_expr: str, text_expr: str, table: str,
                   out_col: str = "clean_text") -> str:
    """DuckDB twin of :func:`pii_redact` (global-flag regexp_replace)."""
    c = text_expr
    for _, (pat, token) in PII_PATTERNS.items():
        p = pat.replace("'", "''")
        c = f"regexp_replace({c}, '{p}', '{token}', 'g')"
    return f"SELECT {id_expr}, {c} AS {out_col} FROM {table}"


# Candidate payment-card shape: 13-19 digits with optional single
# space/dash separators. RE2 ∩ Java (no lookaround); validity is decided
# by the Luhn check below, not the regex.
CARD_CANDIDATE_RE = r"[0-9](?:[ -]?[0-9]){12,18}"


def _luhn_ok(digits):
    """Luhn checksum as a pure column expression over a digits-only
    string: reversed digit stream, every second digit doubled (−9 past
    9), sum ≡ 0 (mod 10). Zero Python — runs inside higher-order
    lambdas, so one text row validates all its candidates in place."""
    n = F.length(digits)
    vals = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.ascii(F.substring(digits, (n - i + 1).cast("int"), 1))
        - 48)
    summed = F.aggregate(
        F.zip_with(vals,
                   F.sequence(F.lit(1), n),
                   lambda d, i: F.when(i % 2 == 0,
                                       F.when(d * 2 > 9, d * 2 - 9)
                                       .otherwise(d * 2)).otherwise(d)),
        F.lit(0),
        lambda acc, x: acc + x)
    return (n >= 13) & (summed % 10 == 0)


def redact_cards(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 out_col: str = "clean_text") -> DataFrame:
    """Payment-card redaction with LUHN VALIDATION — the scrub the plain
    regex patterns above can't do: a 16-digit order id must survive
    while a real card number (spaced, dashed, or bare) becomes
    ``[CARD]``. Candidates come from one ``regexp_extract_all``, the
    Luhn check runs per candidate inside a codegen ``filter`` lambda,
    and redaction is an ``aggregate`` fold replacing each VALID
    candidate — still zero Python, scan-speed, shuffle-free.

    Returns ``(id, out_col, n_cards)``."""
    c = F.col(text_col)
    cands = F.array_distinct(
        F.regexp_extract_all(c, F.lit(CARD_CANDIDATE_RE), F.lit(0)))
    valid = F.filter(
        cands,
        lambda s: _luhn_ok(F.regexp_replace(s, "[^0-9]", "")))
    redacted = F.aggregate(
        valid, c, lambda acc, s: F.replace(acc, s, F.lit("[CARD]")))
    return df.select(
        F.col(id_col),
        redacted.alias(out_col),
        F.size(valid).cast("bigint").alias("n_cards"),
    )

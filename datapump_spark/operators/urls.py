"""URL hygiene + domain analytics — the web-crawl conditioning stage.

Crawl-derived corpora key nearly everything on URLs: exact-URL dedup needs
canonical forms (tracking params, fragments, and case noise make raw URLs
useless as keys), per-domain caps need a domain column, and blocklist
filtering needs both. All of it is string surgery, so the whole module is
pure Catalyst expressions — codegen-side, shuffle-free, oracle-twinnable.

Canonicalization policy (deterministic, documented, applied in order):
lowercase scheme+host; strip a leading ``www.``; drop default ports
(``:80``/``:443``); drop the fragment; drop ``utm_*`` tracking params;
drop a then-empty query; strip one trailing slash from non-root paths.
This is the common-denominator policy of crawl pipelines (the same one
URL-frontier dedup uses); anything stricter (param sorting, percent
decoding) is corpus-specific and composes on top.

``registered_domain`` is the last two host labels — the naive
approximation, correct for com/org/net-style TLDs. The exact answer needs
the Public Suffix List (a data file, not an algorithm); the seam takes a
``two_level_tlds`` set for the co.uk-style cases a deployment cares about.

Reference parity: the reference (datapump.py) has no URL handling; this
implements the web-corpus slice of SURVEY §7's extended pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING_RE = r"(^|&)utm_[a-z]+=[^&]*"


def canonicalize_url(col: Column | str) -> Column:
    """The canonical form of a URL column (see module policy).

    Returns NULL when the host does not parse (``parse_url`` implements
    java.net.URI, which rejects RFC-invalid hostnames like labels ending
    in '-') — at crawl scale those are data-quality rows; a null canon
    key routes them to quarantine instead of silently keying dedup on
    garbage."""
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    hostport = F.lower(F.parse_url(c, F.lit("HOST")))
    host = F.regexp_replace(hostport, r"^www\.", "")
    path = F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit(""))
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    query = F.parse_url(c, F.lit("QUERY"))
    query = F.regexp_replace(query, _TRACKING_RE, "")
    query = F.regexp_replace(query, r"^&", "")
    # two-step port extraction: isolate the authority first, then anchor
    # the port at its END — a one-shot '://[^/?#]*:(\d+)' would backtrack
    # into the userinfo and fabricate a port from 'user:123pass@host'
    authority = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = F.when(
        (port != "") & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443")),
        F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    return F.concat(
        scheme, F.lit("://"), host, keep_port, path,
        F.when(F.coalesce(query, F.lit("")) != "",
               F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


def registered_domain(host: Column | str,
                      two_level_tlds: frozenset[str] = frozenset()) -> Column:
    """Last-two-labels registered domain (naive PSL; see module note).
    ``two_level_tlds`` lists suffixes like 'co.uk' that need three."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    n = F.size(parts)
    two = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    need3 = two.isin(*two_level_tlds) if two_level_tlds else F.lit(False)
    return (
        F.when(n <= 2, h)
        .when(need3, F.concat_ws(".", F.element_at(parts, -3), two))
        .otherwise(two)
    )


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``canon_url``, ``host``, ``domain`` — the columns URL dedup,
    per-domain caps, and blocklists key on. Pure projection."""
    canon = canonicalize_url(url_col)
    host = F.regexp_replace(
        F.lower(F.parse_url(F.col(url_col), F.lit("HOST"))), r"^www\.", "")
    return (
        df.withColumn("canon_url", canon)
        .withColumn("host", host)
        .withColumn("domain", registered_domain(host))
    )


def domain_volume(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(domain, n_urls, n_canon_urls): per-domain raw vs canonical-distinct
    volume — the table a per-domain cap or crawl-frontier budget reads.
    One aggregation; the dedup ratio (n_urls / n_canon_urls) is the
    tracking-parameter noise measure."""
    return (
        with_url_parts(df, url_col)
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_urls"),
             F.countDistinct("canon_url").alias("n_canon_urls"))
    )


def blocklist_hit_stats(
    df: DataFrame, words: list[str], id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, n_hits, hit_frac): per-document blocklisted-token
    stats — the adult/spam wordlist gate (C4 used exactly this shape).
    The wordlist is a codegen literal set (wordlists are hundreds of
    entries, far below broadcast scale); the scan is one shuffle-free
    projection. Filtering is the caller's ``where`` on ``hit_frac`` so
    thresholds stay visible at the pipeline level."""
    from datapump_spark.functions.hashing import tokens

    wl = [w.lower() for w in words]
    toks = tokens(F.col(text_col))
    hits = F.size(F.filter(toks, lambda t: t.isin(wl)))
    n = F.size(toks)
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        hits.cast("long").alias("n_hits"),
        F.round(F.when(n > 0, hits / n).otherwise(F.lit(0.0)), 6)
        .alias("hit_frac"),
    )

"""PII redaction and URL normalization — expression-level scrubbing
operators for training-data curation.

Beyond the reference surface (its ingest is trusted local text,
``server.js:23-40``), but a mandatory stage in any web-scale corpus
pipeline: strip personally-identifying strings and kill tracking/blocked
URLs BEFORE text reaches dedup/tokenize stages.

Everything here is built from ``pyspark.sql.functions`` column
expressions only — no UDFs, no shuffle; the whole scrub runs inside one
WholeStageCodegen span per partition, so at 100 TB it is a pure map over
the scan with filter/projection pushdown fully preserved.

The regex dialect is the intersection of Java (Spark) and RE2 (DuckDB):
character classes, bounded repetition, alternation, word boundaries —
no backreferences or lookaround — so the DuckDB oracles match exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Patterns (Java & RE2 compatible). Redaction order matters: EMAIL first
# (own alphabet), then SSN before PHONE (both digit-hyphen shapes; SSN is
# the longer, more specific one), then IPv4, then bare PHONE.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{4}\b"

REDACTIONS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ssn", SSN_RE, "<SSN>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def redact(col: Column) -> Column:
    """Apply every redaction pattern in canonical order."""
    out = col
    for _, pat, repl in REDACTIONS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column) -> list[Column]:
    """Per-pattern match counts on the ORIGINAL text (each pattern counted
    independently — the patterns are mutually non-overlapping by
    construction: SSN's 3-2-4 digit shape can't contain a 3-4 PHONE and
    IPv4's dots exclude both)."""
    return [
        F.regexp_count(col, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in REDACTIONS
    ]


# --- URL normalization -----------------------------------------------------

# Registrable-domain blocklist (ad/tracking hosts a curation pipeline
# drops). Declared here so query + oracle share one source of truth.
URL_BLOCKLIST: tuple[str, ...] = ("tracker.net", "spam.io")

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"
_DOMAIN_RE = r"([^.]+\.[^.]+)$"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_parts(url: Column) -> dict[str, Column]:
    """Decompose a URL into (host, registrable domain, path, query) with
    RFC-3986-lite semantics: host lowercased, default-port stripped by the
    host charset, trailing slash dropped from the path, and ``utm_*``
    tracking parameters removed from the query."""
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    # strip an explicit port — the host charset above stops at ':' already
    domain = F.regexp_extract(host, _DOMAIN_RE, 1)
    # trailing slash dropped (root '/' collapses to '' — canonical form
    # always re-renders from components, so this is lossless for compare)
    path = F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), "/$", "")
    query = F.regexp_extract(url, _QUERY_RE, 1)
    kept = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda p: (~p.startswith("utm_")) & (p != ""),
        ),
        "&",
    )
    return {"host": host, "domain": domain, "path": path, "query_kept": kept}


def normalize_url(url: Column) -> Column:
    """Canonical form: https://<lower-host><path-no-trailing-slash>
    [?<query minus utm_*>]."""
    p = url_parts(url)
    base = F.concat(F.lit("https://"), p["host"], p["path"])
    return F.when(
        p["query_kept"] != "", F.concat(base, F.lit("?"), p["query_kept"])
    ).otherwise(base)

"""URL hygiene for webtext pipelines: normalization, domain extraction,
blocklist filtering (engine addition — standard crawl-curation stages).

All column expressions (scan-fused, zero shuffle); the blocklist is
metadata-scale and broadcasts. Regexes stay in the RE2-safe subset so
DuckDB oracles evaluate them identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME = r"^[a-zA-Z][a-zA-Z0-9+.-]*://"


def normalize_url(col: Column) -> Column:
    """Lowercase scheme+host, strip the fragment, drop a trailing slash on
    a path-less url. Query strings are KEPT (they can be content-bearing);
    drop them upstream if a source warrants it."""
    no_frag = F.regexp_replace(col, r"#.*$", "")
    # lowercase only scheme://host, preserve path case
    head = F.regexp_extract(no_frag, _SCHEME + r"[^/]*", 0)
    tail = F.substr(no_frag, F.length(head) + 1)
    lowered = F.concat(F.lower(head), tail)
    return F.regexp_replace(lowered, r"^([a-z][a-z0-9+.-]*://[^/]+)/$", r"$1")


def url_domain(col: Column) -> Column:
    """Registrable host (port stripped, lowercased); empty string when the
    value is not a scheme://host url."""
    return F.regexp_extract(F.lower(col), r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)


def filter_blocked_domains(
    df: DataFrame,
    url_col: str,
    blocklist: DataFrame,
    match_subdomains: bool = True,
) -> DataFrame:
    """Drop rows whose url's domain is on the blocklist
    (``blocklist``: one ``domain`` column, metadata-scale -> broadcast).
    With ``match_subdomains`` a blocked ``example.com`` also blocks
    ``a.b.example.com`` (suffix match on dot boundary)."""
    host = url_domain(F.col(url_col))
    b = F.broadcast(blocklist.select(F.lower("domain").alias("__blocked")).distinct())
    if match_subdomains:
        cond = (host == F.col("__blocked")) | host.endswith(
            F.concat(F.lit("."), F.col("__blocked"))
        )
    else:
        cond = host == F.col("__blocked")
    return df.join(b, cond, "left_anti")

"""URL canonicalization for crawl dedup.

Recrawls and syndication hand the pipeline the same page under many URL
spellings (scheme/host case, ``www.``, tracking params, fragments,
trailing slash).  Canonicalizing BEFORE content dedup collapses those
groups with pure string work — no content hashing, no shuffle beyond the
final group.

Pure Catalyst ``regexp_replace``/``regexp_extract`` chain (codegen'd,
map-only); :func:`canonicalize_url_sql` is the DuckDB spelling of the
identical steps (with the ``'g'`` flag — DuckDB replaces first-match by
default where Spark replaces all).

Normalization steps, in order:
1. strip the fragment (``#...``)
2. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``)
3. drop a dangling ``?``/``&`` left by step 2
4. lowercase the scheme+authority (path/query stay case-sensitive)
5. drop a ``www.`` host prefix
6. drop a trailing slash
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking-param excision, anchored to a [?&] param boundary so substrings
# like '?q=utm_a=b' (tracking text inside another param's VALUE) or a param
# NAMED 'myutm_x' survive.  One match eats a whole RUN of consecutive
# tracking params (replaceAll resumes after the consumed delimiter, so
# '?utm_a=1&utm_b=2' must fall in a single match).  The preserved delimiter
# is re-inserted via capture group 1; no lookbehind (RE2/DuckDB has none).
_TRACKING = (
    r"([?&])(?:(?:utm_[a-z]+|fbclid|gclid)=[^&#]*&)*"
    r"(?:utm_[a-z]+|fbclid|gclid)=[^&#]*&?"
)
_AUTHORITY = r"^[a-zA-Z]+://[^/]*"


def canonicalize_url(url: Column) -> Column:
    u = F.regexp_replace(url, r"#.*$", "")
    u = F.regexp_replace(u, _TRACKING, "$1")
    u = F.regexp_replace(u, r"[?&]$", "")
    u = F.concat(
        F.lower(F.regexp_extract(u, _AUTHORITY, 0)),
        F.regexp_replace(u, _AUTHORITY, ""),
    )
    u = F.regexp_replace(u, r"://www\.", "://")
    return F.regexp_replace(u, r"/$", "")


def canonicalize_url_sql(url_sql: str) -> str:
    u = f"regexp_replace({url_sql}, '#.*$', '', 'g')"
    # same PATTERN as the Spark side; the group-1 backreference is spelled
    # \1 in DuckDB where Java spells $1 — behavior identical
    u = f"regexp_replace({u}, '{_TRACKING}', '\\1', 'g')"
    u = f"regexp_replace({u}, '[?&]$', '', 'g')"
    u = (
        f"concat(lower(regexp_extract({u}, '{_AUTHORITY}', 0)), "
        f"regexp_replace({u}, '{_AUTHORITY}', '', 'g'))"
    )
    u = f"regexp_replace({u}, '://www\\.', '://', 'g')"
    return f"regexp_replace({u}, '/$', '', 'g')"

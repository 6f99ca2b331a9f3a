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

_TRACKING = r"(utm_[a-z]+|fbclid|gclid)=[^&#]*&?"
_AUTHORITY = r"^[a-zA-Z]+://[^/]*"


def canonicalize_url(url: Column) -> Column:
    u = F.regexp_replace(url, r"#.*$", "")
    u = F.regexp_replace(u, _TRACKING, "")
    u = F.regexp_replace(u, r"[?&]$", "")
    u = F.concat(
        F.lower(F.regexp_extract(u, _AUTHORITY, 0)),
        F.regexp_replace(u, _AUTHORITY, ""),
    )
    u = F.regexp_replace(u, r"://www\.", "://")
    return F.regexp_replace(u, r"/$", "")


def canonicalize_url_sql(url_sql: str) -> str:
    u = f"regexp_replace({url_sql}, '#.*$', '', 'g')"
    u = f"regexp_replace({u}, '{_TRACKING}', '', 'g')"
    u = f"regexp_replace({u}, '[?&]$', '', 'g')"
    u = (
        f"concat(lower(regexp_extract({u}, '{_AUTHORITY}', 0)), "
        f"regexp_replace({u}, '{_AUTHORITY}', '', 'g'))"
    )
    u = f"regexp_replace({u}, '://www\\.', '://', 'g')"
    return f"regexp_replace({u}, '/$', '', 'g')"

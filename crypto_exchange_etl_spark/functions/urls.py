"""URL canonicalization — merge-key hygiene for a web-page CDC table.

The lake is keyed on ``url`` (BASELINE.json input_hint); feeds that spell
one page several ways (``HTTP://WWW.Ex.com:80/a/?utm_source=x#frag`` vs
``http://ex.com/a``) fragment the key space, so LWW keeps several "current"
rows for one page and dedup undercounts. Canonicalizing BEFORE the merge
is the fix; these are the standard normalizations (RFC 3986 §6 +
common-crawl practice: scheme/host case, default ports, fragments,
tracking params, sorted query, trailing slash).

Reference analogue: the per-exchange symbol normalizers that map every
provider spelling onto one canonical symbol before load
(/root/reference/fintick/providers/*/constants.py — e.g. BTCUSD vs
XBTUSD); the url is this engine's "symbol".

Everything here is a composition of built-in column expressions —
regexp + higher-order array functions, JVM-evaluated, no Python in the
hot path — so it can sit in front of the merge's narrow LWW aggregation
at full scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Query parameters that identify a campaign/click, not a document.
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "ref", "referrer",
)

_SCHEME = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"


def url_scheme(url: Column) -> Column:
    """Lower-cased scheme, '' when the value has none."""
    return F.lower(F.regexp_extract(url, _SCHEME, 1))


def url_host(url: Column) -> Column:
    """Lower-cased host without port/userinfo, '' when unparseable."""
    host = F.regexp_extract(url, _SCHEME + r"(?:[^/@?#]*@)?([^/:?#]+)", 2)
    return F.lower(host)


def url_registered_domain(url: Column) -> Column:
    """Last two host labels (``news.bbc.co.uk`` → ``co.uk`` caveat: a real
    implementation consults the public-suffix list, unavailable offline —
    this is the declared two-label stand-in, exact for generic TLDs)."""
    h = url_host(url)
    return F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)


def url_path(url: Column) -> Column:
    """Path component ('' → '/'), query/fragment stripped."""
    p = F.regexp_extract(url, _SCHEME + r"[^/?#]*(/[^?#]*)?", 2)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query(url: Column) -> Column:
    """Raw query string without the leading '?' ('' when absent)."""
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def canonicalize_url(
    url: Column,
    strip_www: bool = True,
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
) -> Column:
    """Canonical form of ``url``:

    - scheme + host lower-cased; userinfo and default ports (:80 http,
      :443 https) dropped; optional leading ``www.`` dropped;
    - fragment dropped (never sent to the server);
    - tracking query params dropped; remaining params byte-sorted so
      param order cannot fork the key; empty query drops its ``?``;
    - trailing slash trimmed off non-root paths; empty path → ``/``.

    Values without a scheme (non-URLs) pass through unchanged — a
    canonicalizer must never manufacture collisions out of garbage.
    """
    scheme = url_scheme(url)
    host = url_host(url)
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(url, _SCHEME + r"[^/@?#]*?:(\d+)(?:[/?#]|$)", 2)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))

    raw_path = url_path(url)
    path = F.when(raw_path == "/", raw_path).otherwise(
        F.regexp_replace(raw_path, "/$", "")
    )

    drop = F.array(*[F.lit(p) for p in tracking_params])
    params = F.filter(
        F.split(url_query(url), "&"),
        lambda kv: (kv != "")
        & ~F.array_contains(drop, F.lower(F.regexp_extract(kv, r"^([^=]*)", 1))),
    )
    query = F.array_join(F.array_sort(params), "&")
    query_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), query)
    )

    canon = F.concat(scheme, F.lit("://"), host, port_part, path, query_part)
    return F.when(scheme == "", url).otherwise(canon)

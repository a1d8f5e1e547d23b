"""URL canonicalization kernels — the web analogue of DOI normalization.

Reference parity: the reference lower-cases and strips DOI prefixes before
using the DOI as a dedup key (``data_pipeline/deduplicator.py`` /
``enricher.py`` normalize-then-key pattern, see functions/scalars.py
``normalize_doi``). Web corpora key on URLs, which need the same treatment
before any URL-level dedup or join: scheme/host case, default ports,
tracking query parameters, fragments and trailing slashes are all
presentation noise.

Everything here is pure Column expressions (JVM-side, whole-stage codegen;
no UDF) with a byte-identical pure-Python twin for oracle checks — the
same frozen-twin discipline as functions/text.py.

Canonical form:
  * scheme and host lower-cased; a leading ``www.`` label dropped;
  * default ports stripped (``:80`` for http, ``:443`` for https), other
    ports kept;
  * fragment dropped;
  * tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
    ``msclkid``, ``ref``), the rest sorted byte-wise and re-joined — query
    semantics are order-independent, so sorting makes equal resources
    compare equal;
  * trailing slash stripped from the path (a bare host keeps no slash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PREFIXES = ("utm_",)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref")

# multi-label public suffixes for the registered-domain heuristic (compact
# built-in list; swap for the full Public Suffix List in deployments that
# need exactness on exotic ccTLDs)
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOSTPORT_RE = r"^(?:[A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)"
_PATH_RE = r"^(?:[A-Za-z][A-Za-z0-9+.\-]*)://[^/?#]*([^?#]*)"


def _is_tracking(p: Column) -> Column:
    name = F.substring_index(p, "=", 1)
    cond = F.lit(False)
    for pre in TRACKING_PREFIXES:
        cond = cond | name.startswith(pre)
    for full in TRACKING_PARAMS:
        cond = cond | (name == full)
    return cond


def url_scheme_col(url: Column) -> Column:
    return F.lower(F.regexp_extract(F.trim(url), _SCHEME_RE, 1))


def url_host_col(url: Column) -> Column:
    """Lower-cased host with any port and a leading ``www.`` removed."""
    hostport = F.lower(F.regexp_extract(F.trim(url), _HOSTPORT_RE, 1))
    host = F.regexp_replace(hostport, r":[0-9]*$", "")
    return F.regexp_replace(host, r"^www\.", "")


def registered_domain_col(url: Column) -> Column:
    """Registrable domain: last two labels, or three over a known
    multi-label public suffix (e.g. ``example.co.uk``)."""
    host = url_host_col(url)
    arr = F.split(host, r"\.")
    n = F.size(arr)
    # F.get is null out-of-bounds (ANSI-safe; element_at(-k) throws on
    # hosts with fewer labels), and concat_ws skips nulls
    last2 = F.concat_ws(".", F.get(arr, n - 2), F.get(arr, n - 1))
    last3 = F.concat_ws(".", F.get(arr, n - 3), F.get(arr, n - 2), F.get(arr, n - 1))
    is_multi = F.lit(False)
    for suf in MULTI_SUFFIXES:
        is_multi = is_multi | (last2 == F.lit(suf))
    n_labels = F.size(F.split(host, r"\."))
    return F.when(host == "", F.lit("")).when(
        is_multi & (n_labels >= 3), last3
    ).when(n_labels >= 2, last2).otherwise(host)


def canonical_url_col(url: Column) -> Column:
    """Canonical URL as a pure Column expression (see module contract)."""
    u = F.trim(url)
    scheme = url_scheme_col(u)
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, r":[0-9]*$", ""), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when((port == "") | default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"), lambda p: (p != "") & ~_is_tracking(p)
    )
    qs = F.array_join(F.sort_array(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        portpart,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    # non-URL input (no scheme) canonicalizes to '' — same as the twin
    return F.when(scheme == "", F.lit("")).otherwise(canon)


# --- pure-Python twins (oracle / property tests) -----------------------------

def _is_tracking_py(param: str) -> bool:
    name = param.split("=", 1)[0]
    return name.startswith(TRACKING_PREFIXES) or name in TRACKING_PARAMS


def canonical_url_py(url: str) -> str:
    import re

    u = (url or "").strip()
    m = re.match(_SCHEME_RE, u)
    if not m:
        return ""
    scheme = m.group(1).lower()
    rest = u[m.end():]
    hostport = re.split(r"[/?#]", rest, 1)[0].lower()
    host = re.sub(r"^www\.", "", re.sub(r":[0-9]*$", "", hostport))
    pm = re.search(r":([0-9]+)$", hostport)
    port = pm.group(1) if pm else ""
    if (scheme, port) in (("http", "80"), ("https", "443")):
        port = ""
    after_host = rest[len(re.split(r"[/?#]", rest, 1)[0]):]
    path = re.split(r"[?#]", after_host, 1)[0]
    path = re.sub(r"/+$", "", path)
    qm = re.search(r"\?([^#]*)", after_host)
    params = [p for p in (qm.group(1).split("&") if qm else []) if p and not _is_tracking_py(p)]
    qs = "&".join(sorted(params))
    return f"{scheme}://{host}" + (f":{port}" if port else "") + path + (f"?{qs}" if qs else "")


def url_host_py(url: str) -> str:
    import re

    u = (url or "").strip()
    m = re.match(_SCHEME_RE, u)
    if not m:
        return ""
    hostport = re.split(r"[/?#]", u[m.end():], 1)[0].lower()
    return re.sub(r"^www\.", "", re.sub(r":[0-9]*$", "", hostport))


def registered_domain_py(url: str) -> str:
    host = url_host_py(url)
    if not host:
        return ""
    labels = host.split(".")
    if len(labels) >= 3 and ".".join(labels[-2:]) in MULTI_SUFFIXES:
        return ".".join(labels[-3:])
    if len(labels) >= 2:
        return ".".join(labels[-2:])
    return host

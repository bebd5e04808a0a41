"""URL canonicalization — crawl-frontier normalization for the webtext axis.

RFC 3986 syntax-based normalization (§6.2.2) plus the standard crawl-dedup
extensions, as a batched Arrow kernel:

1. scheme and host lowercase (§6.2.2.1);
2. percent-encoding: decode unreserved octets (ALPHA / DIGIT / ``-._~``),
   uppercase the hex of everything else (§6.2.2.2 — ``%2f`` → ``%2F``,
   ``%7E`` → ``~``);
3. default-port elision (http:80, https:443);
4. path ``remove_dot_segments`` (§5.2.4, the exact buffer algorithm);
5. empty path → ``/``;
6. fragment stripped (crawl identity ignores fragments);
7. tracking query parameters dropped (``utm_*``, ``fbclid``, ``gclid``),
   remaining parameter order preserved; an emptied query loses its ``?``.

Everything is deterministic string rewriting — the paired oracle (q56)
CONSTRUCTS the expected canonical URL directly from the row id instead of
normalizing, so the hash match checks this algorithm against the spec, not
against itself.

Reference parity: no reference twin (the reference keys rows by station
ids); this is the graft's webtext identity surface (north_star: per-url
invariants over the Common-Crawl-style table).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")
_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")
_TRACKING_RE = re.compile(r"^(utm_[a-z0-9]+|fbclid|gclid)$")
_DEFAULT_PORT = {"http": "80", "https": "443"}


def _norm_pct(s: str) -> str:
    def repl(m):
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()
    return _PCT_RE.sub(repl, s)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4, verbatim buffer algorithm."""
    inp, out = path, ""
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            out = out[:out.rfind("/")] if "/" in out else ""
        elif inp == "/..":
            inp = "/"
            out = out[:out.rfind("/")] if "/" in out else ""
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1)
            if i > 0:
                out, inp = out + inp[:i], inp[i:]
            else:
                out, inp = out + inp, ""
    return out


def _filter_query(query: str) -> str:
    kept = []
    for part in query.split("&"):
        if not part:
            continue
        name = part.split("=", 1)[0]
        if _TRACKING_RE.match(name.lower()):
            continue
        kept.append(part)
    return "&".join(kept)


def canonicalize_url(url: str) -> tuple[str, str]:
    """→ (canonical_url, host). Non-http(s) or unparsable input is returned
    fragment-stripped with an empty host (never raises — crawl inputs are
    hostile)."""
    u = url.split("#", 1)[0]
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?]*)([^?]*)(?:\?(.*))?$",
                 u)
    if not m:
        return u, ""
    scheme = m.group(1).lower()
    authority = m.group(2)
    path = m.group(3) or ""
    query = m.group(4)
    host, port = authority, None
    if not authority.startswith("["):
        h, sep, p = authority.rpartition(":")
        if sep and p.isdigit():    # not a port: userinfo colon, IPv6, etc.
            host, port = h, p
    host = host.lower()
    if port is not None and port == _DEFAULT_PORT.get(scheme):
        port = None
    path = remove_dot_segments(_norm_pct(path)) or "/"
    out = scheme + "://" + host + (f":{port}" if port else "") + path
    if query is not None:
        q = _filter_query(_norm_pct(query))
        if q:
            out += "?" + q
    return out, host


_SCHEMA = T.StructType([T.StructField("url_norm", T.StringType()),
                        T.StructField("host", T.StringType())])


@F.pandas_udf(_SCHEMA)
def canonicalize_url_udf(url: pd.Series) -> pd.DataFrame:
    pairs = [(None, None) if u is None else canonicalize_url(u)
             for u in url]
    return pd.DataFrame(pairs, columns=["url_norm", "host"])

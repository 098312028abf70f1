"""URL canonicalization (RFC 3986 §6 normalization) for crawl pipelines.

Role in the engine: the same page hides behind many URL spellings
(``HTTP://EX.COM:80/a/../b`` vs ``http://ex.com/b``); the link graph
(operators/webgraph.py), exact dedup, and frontier dedup all need one
canonical form per resource or they over-count nodes and re-crawl
duplicates.

Implemented (the RFC's semantics-preserving set):
- scheme and host lowercased; IDN hosts → punycode (stdlib idna codec);
- default ports dropped (http:80, https:443);
- percent-encoding: unreserved octets decoded (%41→A), every other
  escape's hex uppercased (%3a→%3A), lone '%' left alone;
- dot-segment removal on the path (RFC 3986 §5.2.4 algorithm);
- empty path → '/' when an authority is present;
- fragments dropped (the crawl-canonical form: fragments never reach
  the server).
Query strings are preserved byte-for-byte apart from percent-case —
reordering or dropping parameters changes semantics and is left to the
opt-in ``drop_params`` (utm_*-style tracking junk).

Scale note: genuinely procedural (dot segments, idna), so the Spark
surface is a vectorized pandas UDF (``normalize_urls_udf``) — an
Arrow-batched projection, not a per-row Python UDF.
"""

from __future__ import annotations

import re

__all__ = ["normalize_url", "normalize_urls_udf"]

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_DEFAULT_PORTS = {"http": "80", "https": "443"}
_URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<auth>[^/?#]*)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")


def _norm_pct(s: str) -> str:
    """Decode unreserved %-escapes, uppercase the rest (RFC 3986 §6.2.2)."""

    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
        else:
            out.append(seg)
    # a trailing "." or ".." keeps the directory form (trailing slash)
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    norm = "/".join(out)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm


def normalize_url(url: str, drop_params: tuple[str, ...] = ()) -> str:
    """One canonical spelling per resource; non-URL strings (relative
    references, junk) return unchanged — the crawl-hostile default."""
    m = _URL_RE.match(url or "")
    if not m:
        return url
    scheme = m.group("scheme").lower()
    auth = m.group("auth")
    userinfo, host = "", auth
    if "@" in auth:
        userinfo, host = auth.rsplit("@", 1)
        userinfo += "@"
    port = ""
    # IPv6 literals keep their brackets; port follows the bracket
    if host.startswith("["):
        br = host.find("]")
        if br != -1 and host.find(":", br) != -1:
            host, port = host[: br + 1], host[br + 2 :]
    elif ":" in host:
        host, port = host.split(":", 1)
    host = host.lower()
    if any(ord(c) > 127 for c in host):
        try:
            host = host.encode("idna").decode("ascii")
        except UnicodeError:
            pass  # keep the original spelling rather than drop the URL
    if port and port != _DEFAULT_PORTS.get(scheme):
        host = f"{host}:{port}"
    path = _remove_dot_segments(_norm_pct(m.group("path") or ""))
    if not path:
        path = "/"
    query = m.group("query")
    if query is not None:
        query = _norm_pct(query)
        if drop_params:
            kept = [
                kv
                for kv in query.split("&")
                if kv.split("=", 1)[0] not in drop_params
            ]
            query = "&".join(kept)
        query = "?" + query if query else ""
    else:
        query = ""
    return f"{scheme}://{userinfo}{host}{path}{query}"


def normalize_urls_udf(drop_params: tuple[str, ...] = ()):
    """pandas UDF column transform: url -> canonical url (Arrow-batched)."""
    import pandas as pd  # local: keep module import-light for the driver
    from pyspark.sql.functions import pandas_udf

    def norm(s: pd.Series) -> pd.Series:
        return s.map(lambda u: normalize_url(u, drop_params) if u else u)

    # annotate explicitly: string type hints can't resolve the local pd
    norm.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(norm, "string")

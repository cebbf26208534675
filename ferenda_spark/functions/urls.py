"""Crawl-grade URL canonicalization, SURT keys, and registrable-domain
extraction — the URL-level identity layer for web-corpus dedup.

Why this exists (north_rule: Common-Crawl-style pages at 10^12-doc scale):
the same page is crawled under dozens of byte-distinct URLs — tracking
parameters, shuffled query order, default ports, ``www.`` aliases, dot
segments, fragments. URL-level dedup (keep one fetch per canonical URL,
usually latest ``warc_ts``) removes the cheapest ~10-30% of duplicates
before any text is shingled, so the canonical key must be computable scan-
side at full corpus width. Everything here is therefore pure Column
expressions — regexp capture groups plus higher-order array functions
(``filter``/``aggregate``/``array_sort``), all inside whole-stage codegen;
no Python on the hot path, no shuffle. ``uris.normalize_url`` stays the
conservative byte-preserving form for URI identity inside the KG;
``canonicalize_url`` here is the aggressive crawl-dedup form (lossy by
design: it deliberately merges URLs that *usually* serve the same page).

Canonicalization steps (pinned, oracle-replayable — see
``__spark_entry__._URL_CANON_ORACLE``):
  1. lowercase scheme and host; strip a single trailing '.' from the host
  2. strip the scheme's default port (:80 http, :443 https)
  3. strip one leading ``www.`` label
  4. drop the fragment
  5. resolve path dot segments per RFC 3986 remove_dot_segments
     ('/a/./b/../c' → '/a/c'), collapse duplicate '/', empty path → '/'
  6. drop tracking parameters (utm_*, gclid, fbclid, msclkid, mc_cid,
     mc_eid, igshid, _ga, yclid, wbraid, gbraid), drop valueless empty
     params, sort the survivors bytewise, drop a now-empty '?'
Out of scope (documented, not silently wrong): percent-encoding
normalization (%7E → ~ needs a decode table regexp can't express
JVM-side; CDX tools disagree on it too) and IDN/punycode folding.

SURT (Sort-friendly URI Reordering Transform) is the web-archive key
format (Internet Archive / Common Crawl CDX indexes): host labels
reversed and comma-joined, then ')' and the path+query —
``https://www.example.co.uk/a?b=1`` → ``uk,co,example)/a?b=1``. Sorting a
SURT-keyed table clusters every host under its registrable domain and
every domain under its TLD, which is exactly the locality a range-
partitioned 10^12-row CDX index wants: per-domain scans become contiguous
file ranges instead of hash-scattered probes.

``registrable_domain`` (eTLD+1) carries an embedded SNAPSHOT of the
multi-label public-suffix rules actually hit by crawl-scale corpora
(co.uk-style second-level registries). The real Public Suffix List is
~9k rules and changes monthly; production swaps ``MULTI_SUFFIXES`` for a
broadcast of the full list — the lookup shape (last-2 vs last-3 labels)
is identical.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme :// host [path+query] — fragment excluded by the third group
_SPLIT_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^#]*)"

TRACKING_PARAMS = (
    "utm_[^=&]*", "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid",
    "igshid", "_ga", "yclid", "wbraid", "gbraid",
)
_TRACK_RE = "^(" + "|".join(TRACKING_PARAMS) + ")(=.*)?$"

# Second-level public suffixes (snapshot — see module docstring).
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in",
    "co.nz", "net.nz", "org.nz",
    "co.za", "org.za", "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.tw", "com.hk",
)


def _host(url: Column) -> Column:
    h = F.lower(F.regexp_extract(url, _SPLIT_RE, 2))
    return F.regexp_replace(h, r"\.$", "")


def url_host(url: Column) -> Column:
    """Public host extractor: lowercased authority of the URL, trailing
    dot stripped (no port normalization — use :func:`canonicalize_url`
    for the full canon form). The identity the pipeline's fusion stage
    and the crawl-loop operators key trust/politeness on."""
    return _host(url)


def _strip_port(scheme: Column, host: Column) -> Column:
    return (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )


def _resolve_path(path: Column) -> Column:
    """RFC 3986 remove_dot_segments as a codegen'd HOF fold: split on
    '/', run the segment stack ('' and '.' skip, '..' pops, else push)
    with F.aggregate, rejoin. A trailing '.'/'..' keeps the directory
    slash (RFC output buffer semantics: '/a/b/..' → '/a/')."""
    segs = F.split(path, "/")
    stack = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, x: (
            F.when((x == "") | (x == "."), acc)
            .when(
                x == "..",
                F.slice(acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))),
            )
            .otherwise(F.concat(acc, F.array(x)))
        ),
    )
    joined = F.concat(F.lit("/"), F.array_join(stack, "/"))
    trailing = F.regexp_extract(path, r"(/|/\.|/\.\.)$", 0) != ""
    return F.when(
        trailing & ~joined.endswith("/"), F.concat(joined, F.lit("/"))
    ).otherwise(joined)


def _canon_query(query: Column) -> Column:
    """query WITHOUT the leading '?': drop tracking + empty params, sort
    bytewise. Returns '' when nothing survives."""
    pairs = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(_TRACK_RE),
    )
    return F.array_join(F.array_sort(pairs), "&")


def canonicalize_url(url: Column) -> Column:
    """Aggressive crawl-dedup canonical form (steps pinned in the module
    docstring). Strings without scheme://authority pass through unchanged
    — errors-as-data: the caller sees its input, never NULL."""
    scheme = F.lower(F.regexp_extract(url, _SPLIT_RE, 1))
    host = F.regexp_replace(
        _strip_port(scheme, _host(url)), r"^www\.", ""
    )
    rest = F.regexp_extract(url, _SPLIT_RE, 3)
    path = _resolve_path(F.regexp_extract(rest, r"^([^?]*)", 1))
    q = _canon_query(F.regexp_extract(rest, r"\?(.*)$", 1))
    return F.when(scheme == "", url).otherwise(
        F.concat(
            scheme, F.lit("://"), host, path,
            F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
        )
    )


def surt_key(url: Column) -> Column:
    """SURT form of the CANONICAL url: ``labels-reversed,comma-joined`` +
    ')' + path[?query]. Scheme dropped (http/https collapse — archive
    convention). Non-URLs pass through unchanged."""
    c = canonicalize_url(url)
    scheme = F.regexp_extract(c, _SPLIT_RE, 1)
    host = F.regexp_extract(c, _SPLIT_RE, 2)
    port = F.regexp_extract(host, r"(:\d+)$", 1)
    hostname = F.regexp_replace(host, r":\d+$", "")
    rest = F.regexp_extract(c, _SPLIT_RE, 3)
    return F.when(scheme == "", url).otherwise(
        F.concat(F.array_join(F.reverse(F.split(hostname, r"\.")), ","),
                 port, F.lit(")"), rest)
    )


def registrable_domain(host_or_url: Column) -> Column:
    """eTLD+1 from a host or a full URL: last 3 labels when the last 2
    form a second-level public suffix (MULTI_SUFFIXES snapshot), else
    last 2; single-label hosts (localhost, intranet names) pass through.
    Pure slicing on the split-label array — broadcast-free, codegen'd."""
    h = F.lower(host_or_url)
    h = F.when(h.rlike("^[a-z][a-z0-9+.-]*://"), _host(host_or_url)).otherwise(h)
    h = F.regexp_replace(F.regexp_replace(h, r":\d+$", ""), r"\.$", "")
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    last3 = F.array_join(F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), ".")
    return (
        F.when(n <= 1, h)
        .when((n >= 3) & last2.isin(*MULTI_SUFFIXES), last3)
        .otherwise(last2)
    )


# --------------------------------------------------------- python twins
# (used by the property tests' reference implementation; MUST agree with
# the Column forms — tests/test_urls.py cross-checks on adversarial and
# random inputs)

_SPLIT_PAT = re.compile(_SPLIT_RE)
_TRACK_PAT = re.compile(_TRACK_RE)


def _resolve_path_py(path: str) -> str:
    stack: list[str] = []
    for seg in path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if stack:
                stack.pop()
            continue
        stack.append(seg)
    out = "/" + "/".join(stack)
    if re.search(r"(/|/\.|/\.\.)$", path) and not out.endswith("/"):
        out += "/"
    return out


def canonicalize_url_py(url: str) -> str:
    m = _SPLIT_PAT.match(url)
    if not m:
        return url
    scheme = m.group(1).lower()
    host = m.group(2).lower().rstrip(".")
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    if host.startswith("www."):
        host = host[4:]
    rest = m.group(3)
    path, _, query = rest.partition("?")
    path = _resolve_path_py(path)
    pairs = sorted(
        x for x in query.split("&") if x and not _TRACK_PAT.match(x)
    )
    q = "&".join(pairs)
    return f"{scheme}://{host}{path}" + (f"?{q}" if q else "")


def surt_key_py(url: str) -> str:
    c = canonicalize_url_py(url)
    m = _SPLIT_PAT.match(c)
    if not m:
        return url
    host = m.group(2)
    pm = re.search(r"(:\d+)$", host)
    port = pm.group(1) if pm else ""
    hostname = re.sub(r":\d+$", "", host)
    return ",".join(reversed(hostname.split("."))) + port + ")" + m.group(3)


def registrable_domain_py(host_or_url: str) -> str:
    h = host_or_url.lower()
    m = _SPLIT_PAT.match(host_or_url)
    if m and re.match(r"^[a-z][a-z0-9+.-]*://", h):
        h = m.group(2).lower().rstrip(".")
    h = re.sub(r":\d+$", "", h).rstrip(".")
    labels = h.split(".")
    if len(labels) <= 1:
        return h
    if len(labels) >= 3 and ".".join(labels[-2:]) in MULTI_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


# --- URL template mining -----------------------------------------------
# Order matters: hex-ids first (else their digit runs decay to '{d}'
# fragments), then digit runs. Both patterns are in the RE2 ∩ java.util
# .regex common subset so the DuckDB oracle replays them verbatim.
_TEMPLATE_HEX_RE = r"[0-9a-fA-F]{8,}"
_TEMPLATE_NUM_RE = r"[0-9]+"


def url_template(url: Column) -> Column:
    """URL → structural template: the path+query with opaque identifiers
    abstracted — long hex runs (content hashes, UUIDs with dashes decay
    to hex+'-'+hex) → ``{x}``, digit runs → ``{d}``.

    The crawl-frontier use (no ferenda analog — a curated corpus has a
    known URL space): at 10^12 docs a frontier cannot score URLs
    individually; it scores TEMPLATES. ``/news/{d}/page`` having 10^7
    members with stable quality tells the scheduler everything the
    individual URLs would, in 10^-7 the state — and a template whose
    member count explodes combinatorially (``/cal/{d}/{d}/{d}``) is the
    classic spider-trap signature to de-prioritize. Pure Column regexps,
    codegen'd, map-only."""
    path = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", "")
    path = F.regexp_replace(path, r"#.*$", "")
    t = F.regexp_replace(path, _TEMPLATE_HEX_RE, "{x}")
    t = F.regexp_replace(t, _TEMPLATE_NUM_RE, "{d}")
    return F.when(t == "", F.lit("/")).otherwise(t)


def mine_url_templates(
    df,
    url_col: str = "url",
    min_urls: int = 2,
):
    """Per-host template inventory → (host, template, n_urls, host_share).

    host_share is the template's fraction of its host's URLs — the
    quantity a scheduler thresholds ("this one template is 60% of the
    host's known space"). One distinct on (host, url) is deliberately
    NOT applied (callers dedupe upstream via canonicalize_url; re-crawls
    of one URL legitimately re-weight its template here). Shape: map-only
    template derivation, one (host, template) map-side-combined count,
    one host-keyed window for the share — two exchanges total, both on
    keys that AQE can split if one host dominates the crawl (it will:
    the corpus generator's Zipf head is 30% of pages)."""
    from pyspark.sql import Window

    host = F.lower(
        F.regexp_extract(F.col(url_col), _SPLIT_RE, 2)
    )
    host = F.regexp_replace(host, r":\d+$", "")
    per = (
        df.select(
            host.alias("host"),
            url_template(F.col(url_col)).alias("template"),
        )
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).alias("n_urls"))
    )
    w = Window.partitionBy("host")
    return (
        per.withColumn(
            "host_share", F.col("n_urls") / F.sum("n_urls").over(w)
        )
        .where(F.col("n_urls") >= min_urls)
    )

"""URI minting + domain hashing (ports of [ref: ferenda/thirdparty/coin.py ::
URISpace] and the north_rule's domain-hashed partition keys).

All functions here exist in two forms where needed: a pure-Python form (used
inside pandas UDF stages and the corpus generator's ground truth) and a
Column-expression form (used in DataFrame plans so the work stays JVM-side).
The two MUST agree; tests/test_uris.py cross-checks them.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

from ferenda_spark.schemas import KG_BASE

_SLUG_RE = re.compile(r"[^a-z0-9]+")


def slugify(text: str) -> str:
    """COIN-style slug: lowercase, non-alnum runs → '-', trimmed."""
    return _SLUG_RE.sub("-", text.lower()).strip("-")


def entity_uri(slug: str) -> str:
    return f"{KG_BASE}/entity/{slug}"


def eu_act_uri(act_type: str, year: str, number: str) -> str:
    """'Directive 95/46/EC' → https://kg.example.org/eu/directive/1995/46.
    Two-digit years are 19xx (EU legislation numbering convention)."""
    y = int(year)
    if y < 100:
        y += 1900
    return f"{KG_BASE}/eu/{act_type.lower()}/{y}/{int(number)}"


def article_uri(act_uri: str, article: str, paragraph: str | None) -> str:
    frag = f"art{int(article)}"
    if paragraph:
        frag += f".{int(paragraph)}"
    return f"{act_uri}#{frag}"


def section_uri(page_uri: str, ordinal: int) -> str:
    return f"{page_uri}#S{ordinal}"


def normalize_alias(alias: str) -> str:
    """Join key for exact-tier entity linking: casefold + collapse ws."""
    return " ".join(alias.split()).lower()


def domain_of(url: str) -> str:
    try:
        return urlsplit(url).netloc.lower()
    except ValueError:
        return ""


def part_key_py(url: str, n_parts: int) -> int:
    """Python twin of ``part_key_col`` — MUST match Spark's xxhash64.

    Spark's xxhash64(string) = XXH64(utf8 bytes, seed=42). We avoid a
    Python reimplementation drift by computing it only on the JVM side in
    plans; in-UDF we get part_key passed in as a column. This helper exists
    for the corpus generator's ground truth, where we instead use a simple
    deterministic residue (see corpus.py) — ground truth never needs to
    match Spark's hash, only to be stable.
    """
    import zlib

    return zlib.crc32(domain_of(url).encode("utf-8")) % n_parts


def domain_col(url: Column) -> Column:
    # strip scheme:// then take up to first '/' — JVM-side, codegen-friendly
    return F.lower(F.regexp_extract(url, r"^[a-z][a-z0-9+.\-]*://([^/]+)", 1))


def part_key_col(url: Column, n_parts: int) -> Column:
    """Skew-aware domain-hashed partition key (north_rule). Using the domain
    (not the url) keeps one domain's pages co-located so per-domain ops
    (dedup, rollups) avoid a shuffle; xxhash64+pmod spreads domains evenly.
    """
    return F.pmod(F.xxhash64(domain_col(url)), F.lit(n_parts)).cast("int")


# ------------------------------------------------------- URL normalization

_URL_SPLIT_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^#]*)"


def normalize_url(url: Column) -> Column:
    """Crawl-grade URL canonicalization (the key for URL-level dedup and
    per-domain grouping): lowercase scheme and host, strip the scheme's
    default port (:80 http / :443 https), drop the fragment, drop a bare
    trailing '?'. Path and query are otherwise preserved byte-for-byte —
    their case and parameter order are semantically significant. A string
    with no scheme://authority passes through unchanged.

    Pure column expressions (regexp over three capture groups) — the
    python twin below MUST agree (tests/test_uris.py cross-checks)."""
    scheme = F.lower(F.regexp_extract(url, _URL_SPLIT_RE, 1))
    host = F.lower(F.regexp_extract(url, _URL_SPLIT_RE, 2))
    rest = F.regexp_replace(
        F.regexp_extract(url, _URL_SPLIT_RE, 3), r"\?$", ""
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    return F.when(scheme == "", url).otherwise(
        F.concat(scheme, F.lit("://"), host, rest)
    )


def normalize_url_py(url: str) -> str:
    """Python twin of ``normalize_url`` for UDF-side use."""
    m = re.match(_URL_SPLIT_RE, url)
    if not m:
        return url
    scheme = m.group(1).lower()
    host = m.group(2).lower()
    rest = m.group(3)
    if rest.endswith("?"):
        rest = rest[:-1]
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    return f"{scheme}://{host}{rest}"


def skolemize_col(term: Column, base: str = "https://kg.example/") -> Column:
    """Blank-node skolemization (RDF 1.1 §3.5): replace ``_:label`` terms
    with well-known genid IRIs so bnodes survive cross-dataset union,
    dictionary encoding, and SPARQL joins (a bnode label is only scoped
    to its source graph — two harvests both emitting ``_:b0`` MUST NOT
    merge, which is why the genid hashes the full doc-scoped label the
    structured-data harvest mints, operators/structured.py). Pure column
    expression; the md5 form replays in any engine:

        _:x → <base>.well-known/genid/md5(label)
    """
    return F.when(
        term.startswith("_:"),
        F.concat(
            F.lit(base + ".well-known/genid/"),
            F.md5(term),
        ),
    ).otherwise(term)

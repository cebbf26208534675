"""Deterministic synthetic web-page corpus + ground truth (FIXTURES.md §1–4).

Everything derives from fixed string seeds via ``random.Random`` (CPython
guarantees Mersenne-Twister + version-2 string seeding stability across
versions/platforms), **per document id** — so generation is embarrassingly
parallel and identical regardless of partitioning, executor count, or batch
composition. That is the property that lets the same generator produce the
unit corpus (500 docs), the correctness corpus (5 000) and the bench corpus
(50 000+) bit-identically.

The generator knows where it planted citations and entity mentions, so it
also emits the GROUND-TRUTH triples and links ("reference RDF" in
BASELINE.md): the pipeline's P/R ≥ 0.95 is measured against these, porting
the shape of the reference's ``assertEqualGraphs`` golden comparison
[ref: ferenda/testutil.py :: RepoTester.distill_test].

Scale note: ``generate_corpus`` builds via ``spark.range(n).mapInPandas`` —
no driver-side materialization, no collect; at 10^12 docs this is the same
code with a bigger range.
"""

from __future__ import annotations

import datetime as dt
import random
import re
from typing import Iterator

import pandas as pd

from ferenda_spark.functions.extract import extract_text
from ferenda_spark.functions.uris import (
    article_uri,
    entity_uri,
    eu_act_uri,
    normalize_alias,
    slugify,
)
from ferenda_spark.schemas import (
    P_IS_PART_OF,
    P_ISSUED,
    P_LANGUAGE,
    P_REFERENCES,
    P_TITLE,
    P_TYPE,
    T_DOCPART,
    T_DOCUMENT,
)

SEED = 42
# bump when the HTML template grammar changes: cached materialized corpora
# (bench/scaling /tmp parquet) are keyed on this so a template change can
# never silently reuse a stale corpus
TEMPLATE_VERSION = 2
N_DOMAINS = 20
N_ENTITIES = 2000
EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0)

# Zipf-skewed domain weights: hottest domain ~30% of pages (FIXTURES §1) —
# exercises salting + skew-aware repartition downstream.
_DOMAIN_WEIGHTS = [0.30, 0.12, 0.08, 0.06, 0.05] + [0.39 / 15] * 15
_DOMAIN_CUM = [sum(_DOMAIN_WEIGHTS[: i + 1]) for i in range(N_DOMAINS)]
DOMAINS = [f"d{i:02d}.example.com" for i in range(N_DOMAINS)]
SECTIONS_PATHS = ["news", "docs", "legal", "blog", "wiki"]
LANG_WHEEL = (["en"] * 8) + (["de"] * 3) + (["fr"] * 3) + (["es"] * 3) + (["zh"] * 3)

WORDS = (
    "data table query scan filter join group sort merge hash batch stream "
    "window column row value key index shuffle spark engine plan stage task "
    "graph node edge triple entity corpus page text token parser grammar "
    "citation reference section title domain record schema field café "
    "résumé naïve result metric ledger lineage —"
).split()

_ADJS = (
    "acme global united nordic apex solar lunar amber cobalt crimson delta "
    "echo falcon granite harbor ionic jade kinetic laurel matrix nebula "
    "onyx prism quartz radial sierra titan umbra vertex willow zenith astra "
    "borea cedar doral ember fjord gamma helix iris juno"
).split()
_NOUNS = (
    "vector tensor summit anchor bridge circuit beacon canyon dynamo engine "
    "forge garden harbor island junction kernel lattice meadow network orbit "
    "pillar quarry reactor spire tunnel valley works exchange foundry grid "
    "haven institute lab mill outpost plaza ridge station tower union"
).split()
_KINDS = ["org", "law", "person", "topic"]
_KINDWORDS = {
    "org": ["Corp", "Group", "Holdings", "Labs"],
    "law": ["Act", "Code", "Statute", "Treaty"],
    "person": ["Fellow", "Scholar", "Chair", "Laureate"],
    "topic": ["Forum", "Digest", "Review", "Atlas"],
}

# ---------------------------------------------------------------------------
# entity dictionary
# ---------------------------------------------------------------------------


def _entity_name(i: int) -> tuple[str, str]:
    rng = random.Random(f"{SEED}:ent:{i}")
    kind = _KINDS[i % 4]
    adj = _ADJS[rng.randrange(len(_ADJS))].capitalize()
    noun = _NOUNS[rng.randrange(len(_NOUNS))].capitalize()
    kw = _KINDWORDS[kind][rng.randrange(4)]
    return f"{adj} {noun} {kw} E{i:04d}", kind


def _corrupt(word_part: str, rng: random.Random) -> str:
    """Edit-distance-1 corruption of one word (keeps the E#### tail intact
    so char-3-gram Jaccard stays high — the MinHash-tier contract)."""
    words = word_part.split()
    wi = rng.randrange(len(words))
    w = words[wi]
    if len(w) >= 4:
        op = rng.randrange(3)
        pos = rng.randrange(1, len(w) - 2)
        if op == 0:  # drop
            w = w[:pos] + w[pos + 1 :]
        elif op == 1:  # swap
            w = w[:pos] + w[pos + 1] + w[pos] + w[pos + 2 :]
        else:  # duplicate
            w = w[:pos] + w[pos] + w[pos:]
    else:
        w = w + w[-1]
    words[wi] = w
    return " ".join(words)


def build_dictionary() -> list[dict]:
    """uri_dictionary rows (FIXTURES §3): ~2k canonical entities, ~6k aliases.
    is_exact=True rows feed the broadcast exact tier; is_exact=False rows are
    near-duplicate corruptions reachable only via the MinHash-LSH tier."""
    rows: list[dict] = []
    seen_keys: set[str] = set()
    for i in range(N_ENTITIES):
        name, kind = _entity_name(i)
        rng = random.Random(f"{SEED}:alias:{i}")
        uri = entity_uri(slugify(name))
        words = name.split()
        abbrev = "".join(w[0] for w in words[:-1]).upper() + " " + words[-1]
        cands = [(name, True), (abbrev, True)]
        body = " ".join(words[:-1])
        tail = words[-1]
        cands.append((_corrupt(body, rng) + " " + tail, False))
        if rng.random() < 0.5:
            cands.append((_corrupt(body, rng) + " " + tail, False))
        for alias, is_exact in cands:
            key = normalize_alias(alias)
            if key in seen_keys:
                continue
            seen_keys.add(key)
            rows.append(
                {
                    "alias": alias,
                    "alias_key": key,
                    "canonical_uri": uri,
                    "kind": kind,
                    "is_exact": is_exact,
                }
            )
    return rows


def canonical_uri_of(i: int) -> str:
    name, _ = _entity_name(i)
    return entity_uri(slugify(name))


# ---------------------------------------------------------------------------
# per-document generation
# ---------------------------------------------------------------------------


def doc_url(doc_id: int) -> str:
    """Standalone so citing documents can reconstruct any target's url
    without generating the target (pure function of doc_id)."""
    rng = random.Random(f"{SEED}:url:{doc_id}")
    r = rng.random()
    di = next(i for i, c in enumerate(_DOMAIN_CUM) if r <= c)
    sect = SECTIONS_PATHS[rng.randrange(len(SECTIONS_PATHS))]
    return f"https://{DOMAINS[di]}/{sect}/{doc_id:08d}.html"


def _title_words(rng: random.Random, lo: int, hi: int) -> str:
    n = rng.randint(lo, hi)
    return " ".join(WORDS[rng.randrange(len(WORDS))] for _ in range(n)).capitalize()


_ESCAPES = [("&", "&amp;"), ("é", "&eacute;"), ("—", "&#8212;")]


def _htmlify(plain: str, rng: random.Random) -> str:
    """plain chunk text → html inline markup whose extraction == plain.

    Invariant-preserving ops only: entity-escape specials, wrap word spans in
    inline tags, inject comments + extra whitespace (extraction collapses)."""
    words = plain.split(" ")
    out = []
    for w in words:
        for ch, ent in _ESCAPES:
            # em-dash MUST be escaped (it is not latin-1-encodable); the
            # others are escaped probabilistically to exercise both paths.
            if ch in w and (ch == "—" or rng.random() < 0.7):
                w = w.replace(ch, ent)
        r = rng.random()
        if r < 0.04:
            w = f"<b>{w}</b>"
        elif r < 0.07:
            w = f"<i>{w}</i>"
        elif r < 0.09:
            w = f'<a href="#x{rng.randrange(999)}">{w}</a>'
        out.append(w)
        if rng.random() < 0.02:
            out.append("<!-- c%d -->" % rng.randrange(99))
    return " ".join(out)


def gen_doc(doc_id: int, n_docs: int) -> dict:
    """Generate one page: documents row + ground-truth triples/links.

    Returns dict with keys url, warc_ts, html(bytes), text, lang, title,
    truth_triples(list[tuple]), truth_links(list[tuple]),
    struct(list[section dicts]).
    """
    rng = random.Random(f"{SEED}:doc:{doc_id}")
    url = doc_url(doc_id)
    warc_ts = EPOCH + dt.timedelta(seconds=17 * doc_id)
    lang = LANG_WHEEL[doc_id % len(LANG_WHEEL)]
    use_latin1 = rng.random() < 0.05
    charset = "iso-8859-1" if use_latin1 else "utf-8"

    title = _title_words(rng, 3, 6)
    triples: list[tuple] = [
        (url, P_TITLE, title, False),
        (url, P_ISSUED, warc_ts.strftime("%Y-%m-%d"), False),
        (url, P_LANGUAGE, lang, False),
        (url, P_TYPE, T_DOCUMENT, True),
    ]
    links: list[tuple] = []
    struct: list[dict] = []

    body_parts: list[str] = []
    # refparser contextual state (SURVEY T6) — flows in DOCUMENT ORDER
    # across sections and subsections, exactly as the parse stage reads it
    ref_state = {"act": None}

    def gen_paras(suri: str) -> list[dict]:
        """Generate 1–8 paragraphs attributed to ``suri``, appending their
        HTML to body_parts and their citation/mention truth rows."""
        paras: list[dict] = []
        n_paras = rng.randint(1, 8)
        for pi in range(n_paras):
            sent_parts: list[str] = []
            for _ in range(rng.randint(1, 4)):
                toks = [WORDS[rng.randrange(len(WORDS))] for _ in range(rng.randint(5, 12))]
                r = rng.random()
                if r < 0.15:  # url citation
                    tgt = doc_url(rng.randrange(n_docs))
                    pos = rng.randrange(1, len(toks))
                    toks.insert(pos, f"see {tgt}")
                    triples.append((suri, P_REFERENCES, tgt, True))
                elif r < 0.27:  # eulaw act citation
                    if rng.random() < 0.5:
                        y, n = rng.randint(70, 99), rng.randint(1, 120)
                        cite = f"Directive {y}/{n}/EC"
                        act = eu_act_uri("directive", str(y), str(n))
                    else:
                        y, n = rng.randint(2000, 2025), rng.randint(1, 999)
                        cite = f"Regulation (EU) {y}/{n}"
                        act = eu_act_uri("regulation", str(y), str(n))
                    toks.insert(rng.randrange(1, len(toks)), cite)
                    triples.append((suri, P_REFERENCES, act, True))
                    ref_state["act"] = act
                elif r < 0.37 and ref_state["act"] is not None:  # article, contextual
                    a = rng.randint(1, 30)
                    if rng.random() < 0.5:
                        p = rng.randint(1, 9)
                        cite, tgt = f"Article {a}({p})", article_uri(ref_state["act"], str(a), str(p))
                    else:
                        cite, tgt = f"Article {a}", article_uri(ref_state["act"], str(a), None)
                    toks.insert(rng.randrange(1, len(toks)), cite)
                    triples.append((suri, P_REFERENCES, tgt, True))
                elif r < 0.57:  # entity mention
                    ei = rng.randrange(N_ENTITIES)
                    name, _ = _entity_name(ei)
                    can = canonical_uri_of(ei)
                    form = rng.random()
                    words_ = name.split()
                    if form < 0.55:
                        mention = name
                    elif form < 0.75:
                        mention = "".join(w[0] for w in words_[:-1]).upper() + " " + words_[-1]
                    elif form < 0.92:  # dict corruption (reuse alias rng stream)
                        arng = random.Random(f"{SEED}:alias:{ei}")
                        mention = _corrupt(" ".join(words_[:-1]), arng) + " " + words_[-1]
                    else:  # fresh corruption, NOT in dictionary — pure LSH tier
                        mention = _corrupt(" ".join(words_[:-1]), rng) + " " + words_[-1]
                    toks.insert(rng.randrange(1, len(toks)), mention)
                    triples.append((suri, P_REFERENCES, can, True))
                    links.append((url, mention, can))
                sent_parts.append(" ".join(toks) + ".")
            plain = " ".join(sent_parts)
            paras.append({"idx": pi, "text": plain})
            body_parts.append(f"<p>{_htmlify(plain, rng)}</p>")
            if rng.random() < 0.08:
                body_parts.append(f"<script>var x={rng.randrange(1000000)};</script>")
            if rng.random() < 0.05:
                body_parts.append("<style>.c%d{color:red}</style>" % rng.randrange(99))
        return paras

    def add_node(path: str, parent_uri: str, header: str, tag: str) -> None:
        """One Section/Subsection node: truth triples (isPartOf → PARENT,
        the nested-tree semantics), heading HTML, paragraphs, struct row."""
        stitle = header.split(". ", 1)[1]
        suri = f"{url}#S{path}"
        triples.extend(
            [
                (suri, P_TYPE, T_DOCPART, True),
                (suri, P_IS_PART_OF, parent_uri, True),
                (suri, P_TITLE, stitle, False),
            ]
        )
        body_parts.append(f"<{tag}>{_htmlify(header, rng)}</{tag}>")
        paras = gen_paras(suri)
        struct.append(
            {
                "ordinal": int(path.split(".", 1)[0]),
                "ordinal_path": path,
                "title": stitle,
                "paras": paras,
            }
        )

    n_sections = rng.randint(1, 6)
    for k in range(1, n_sections + 1):
        stitle = _title_words(rng, 2, 4)
        add_node(str(k), url, f"Section {k}. {stitle}", "h2")
        # nested subsections (SURVEY §7.4 depth-3): ~40% of sections carry
        # 1–3 subsections; headers alternate dotted ("Section 2.1.") and
        # the reference's lettered style ("Section 2 a.") — the FSM
        # canonicalizes both to the dotted ordinal_path
        if rng.random() < 0.40:
            suri = f"{url}#S{k}"
            for j in range(1, rng.randint(1, 3) + 1):
                sub_title = _title_words(rng, 2, 4)
                sub_path = f"{k}.{j}"
                hdr = (
                    f"Section {k} {chr(ord('a') + j - 1)}. {sub_title}"
                    if rng.random() < 0.5
                    else f"Section {sub_path}. {sub_title}"
                )
                add_node(sub_path, suri, hdr, "h3")
                if rng.random() < 0.15:  # depth-3 sub-subsection
                    d3_title = _title_words(rng, 2, 3)
                    add_node(
                        f"{sub_path}.1",
                        f"{url}#S{sub_path}",
                        f"Section {sub_path}.1. {d3_title}",
                        "h4",
                    )

    html_str = (
        f'<html><head><title>{_htmlify(title, rng)}</title>'
        f'<meta charset="{charset}"></head>\n<body>\n'
        + "\n".join(body_parts)
        + "\n</body></html>"
    )
    html = html_str.encode(charset, errors="replace")
    text = extract_text(html)
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": html,
        "text": text,
        "lang": lang,
        "title": title,
        "truth_triples": triples,
        "truth_links": links,
        "struct": struct,
    }


# ---------------------------------------------------------------------------
# Spark-facing constructors (distributed, no driver materialization)
# ---------------------------------------------------------------------------


def _corpus_batches(n_docs: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_doc(int(i), n_docs) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "url": [r["url"] for r in rows],
                    "warc_ts": [r["warc_ts"] for r in rows],
                    "html": [r["html"] for r in rows],
                    "text": [r["text"] for r in rows],
                    "lang": [r["lang"] for r in rows],
                }
            )

    return fn


def generate_corpus(spark, n_docs: int, n_slices: int | None = None):
    """documents DataFrame (input_hint schema), generated in parallel."""
    from ferenda_spark.schemas import CORPUS

    n_slices = n_slices or min(max(n_docs // 256, 8), 256)
    return (
        spark.range(0, n_docs, 1, n_slices)
        .mapInPandas(_corpus_batches(n_docs), schema=CORPUS)
    )


def _truth_batches(n_docs: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"subj": [], "pred": [], "obj": [], "obj_is_uri": []}
            for i in pdf["id"]:
                for s, p, o, u in gen_doc(int(i), n_docs)["truth_triples"]:
                    out["subj"].append(s)
                    out["pred"].append(p)
                    out["obj"].append(o)
                    out["obj_is_uri"].append(u)
            yield pd.DataFrame(out)

    return fn


def generate_truth_triples(spark, n_docs: int, n_slices: int | None = None):
    from ferenda_spark.schemas import GOLDEN_TRIPLES

    n_slices = n_slices or min(max(n_docs // 256, 8), 256)
    return (
        spark.range(0, n_docs, 1, n_slices)
        .mapInPandas(_truth_batches(n_docs), schema=GOLDEN_TRIPLES)
        .dropDuplicates(["subj", "pred", "obj"])
    )


def dictionary_df(spark):
    from ferenda_spark.schemas import URI_DICTIONARY

    # Arrow path: createDataFrame from a pandas frame converts columnar in
    # one shot; the row-of-dicts path re-verifies ~7k rows field-by-field on
    # the driver (~4 s, serial) EVERY time the local relation is evaluated —
    # measurable against the whole pipeline since linking evaluates the
    # dictionary for each of its broadcast tiers.
    pdf = pd.DataFrame(build_dictionary())
    return spark.createDataFrame(
        pdf[[f.name for f in URI_DICTIONARY.fields]], schema=URI_DICTIONARY
    )

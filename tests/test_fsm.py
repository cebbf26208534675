"""FSM structure recovery — micro-grammar unit tests in the style of the
reference's testFSMParser (chunk lists → expected tree), plus golden-struct
comparison for the webpage grammar (FIXTURES §2)."""

import json
import re

from ferenda_spark.operators.fsm import FSMParser, parse_structure
from ferenda_spark.sources.corpus import gen_doc


def test_micro_grammar():
    """A tiny two-state grammar, exercising recognizer order + transitions."""
    num = re.compile(r"^\d+$")

    def h_num(ctx, chunk, m):
        ctx.setdefault("nums", []).append(int(chunk))

    def h_word(ctx, chunk, m):
        ctx.setdefault("words", []).append(chunk)

    p = FSMParser(initial_state="s")
    p.set_recognizers(("num", lambda c: num.match(c)), ("any", lambda c: True))
    p.set_transitions(
        {
            ("s", "num"): (h_num, "after_num"),
            ("s", "any"): (h_word, None),
            ("after_num", "num"): (h_num, None),
            ("after_num", "any"): (h_word, "s"),
        }
    )
    ctx = p.parse(["a", "1", "2", "b", "c", "3"])
    assert ctx == {"words": ["a", "b", "c"], "nums": [1, 2, 3]}


def test_webpage_grammar_shapes():
    text = "Doc Title\n\nSection 1. Alpha\n\npara one\n\npara two\n\nSection 2. Beta\n\nlast"
    ctx = parse_structure(text)
    assert ctx["title"] == "Doc Title"
    assert [s["ordinal"] for s in ctx["sections"]] == [1, 2]
    assert ctx["sections"][0]["title"] == "Alpha"
    assert [p["text"] for p in ctx["sections"][0]["paras"]] == ["para one", "para two"]
    assert ctx["sections"][1]["paras"][0]["idx"] == 0


def test_para_before_section_gets_implicit_section():
    ctx = parse_structure("Title\n\norphan para\n\nSection 1. S\n\np")
    assert ctx["sections"][0]["ordinal"] == 0
    assert ctx["sections"][0]["paras"][0]["text"] == "orphan para"


def test_state_never_leaks_between_parses():
    a = parse_structure("T\n\nSection 1. A\n\np1")
    b = parse_structure("U\n\nq1")
    assert len(b["sections"]) == 1 and b["sections"][0]["ordinal"] == 0
    assert a["sections"][0]["ordinal"] == 1


def test_golden_struct():
    """FSM output over extracted text must equal the generator's planted
    structure — an independent-path check (generator never runs the FSM)."""
    with open("fixtures/golden_struct.jsonl") as f:
        goldens = [json.loads(line) for line in f]
    assert len(goldens) == 25
    for g in goldens:
        doc_id = int(g["url"].rsplit("/", 1)[1].split(".")[0])
        d = gen_doc(doc_id, 500)
        ctx = parse_structure(d["text"])
        assert ctx["title"] == g["title"]
        got = [
            {
                "ordinal": s["ordinal"],
                "ordinal_path": s["ordinal_path"],
                "title": s["title"],
                "paras": [{"idx": p["idx"], "text": p["text"]} for p in s["paras"]],
            }
            for s in ctx["sections"]
        ]
        assert got == g["sections"], g["url"]


def test_parse_one_compact_dedup_on_repeated_ordinals():
    """Malformed docs can repeat a section ordinal; the compact triple list
    must stay a set (structural rows dedup'd, distinct titles both kept)."""
    from ferenda_spark.operators.parse import _parse_one

    html = (
        b"<html><head><title>T</title><meta charset=\"utf-8\"></head><body>"
        b"<h2>Section 2. Alpha</h2><p>one para</p>"
        b"<h2>Section 2. Beta</h2><p>another para</p>"
        b"</body></html>"
    )
    row = _parse_one("https://d00.example.com/x/1.html", "2024-01-01", html, "en", 0)
    keys = [(t["s"], t["p"], t["obj"]) for t in row["triples"]]
    assert len(keys) == len(set(keys))
    titles = {t["obj"] for t in row["triples"] if t["p"] == "t" and t["s"] == "2"}
    assert titles == {"Alpha", "Beta"}
    assert sum(1 for t in row["triples"] if t["p"] == "y" and t["s"] == "2") == 1


def test_nested_subsections_tree():
    """testFSMParser-style nested case: dotted AND lettered subsection
    ordinals ("2.1", "2 a") canonicalize to one path space; nest_sections
    rebuilds the recursive tree from the flat path-ordered list."""
    from ferenda_spark.operators.fsm import nest_sections

    text = (
        "Doc Title\n\n"
        "Section 1. Top\n\np1\n\n"
        "Section 1 a. Sub lettered\n\np2\n\n"
        "Section 1.2. Sub dotted\n\np3\n\n"
        "Section 1.2.1. Deep\n\np4\n\n"
        "Section 2. Next top\n\np5"
    )
    ctx = parse_structure(text)
    assert [(s["ordinal_path"], s["ordinal"]) for s in ctx["sections"]] == [
        ("1", 1), ("1.1", 1), ("1.2", 1), ("1.2.1", 1), ("2", 2),
    ]
    assert ctx["sections"][1]["title"] == "Sub lettered"
    tree = nest_sections(ctx["sections"])
    assert [n["ordinal_path"] for n in tree] == ["1", "2"]
    s1 = tree[0]
    assert [n["ordinal_path"] for n in s1["subsections"]] == ["1.1", "1.2"]
    assert [n["ordinal_path"] for n in s1["subsections"][1]["subsections"]] == [
        "1.2.1"
    ]
    assert s1["subsections"][1]["subsections"][0]["paras"][0]["text"] == "p4"


def test_nested_isparof_triples():
    """_parse_one emits isPartOf pointing at the PARENT node for every
    nesting level (the extra-level triples VERDICT item 6 asks for)."""
    from ferenda_spark.operators.parse import _parse_one

    html = (
        b"<html><head><title>T</title></head><body>"
        b"<h2>Section 2. Top</h2><p>a</p>"
        b"<h3>Section 2 a. Mid</h3><p>b</p>"
        b"<h4>Section 2.1.1. Leaf</h4><p>c</p>"
        b"</body></html>"
    )
    row = _parse_one("https://d00.example.com/x/9.html", "2024-01-01", html, "en", 0)
    parts = {t["s"] for t in row["triples"] if t["p"] == "y" and t["s"]}
    assert parts == {"2", "2.1", "2.1.1"}
    ip = {t["s"] for t in row["triples"] if t["p"] == "i"}
    assert ip == {"2", "2.1", "2.1.1"}


def test_orphan_subsection_attaches_top_level():
    from ferenda_spark.operators.fsm import nest_sections

    ctx = parse_structure("T\n\nSection 3.1. Orphan\n\np")
    tree = nest_sections(ctx["sections"])
    assert [n["ordinal_path"] for n in tree] == ["3.1"]


def test_nesting_property_random_trees():
    """Property: for random trees (depth ≤3, mixed dotted/lettered header
    style), text → parse_structure recovers exactly the planted flat list,
    and nest_sections is the inverse of flattening."""
    import random

    from ferenda_spark.operators.fsm import nest_sections

    for seed in range(25):
        rng = random.Random(f"fsmprop:{seed}")
        chunks = ["Doc title"]
        want = []  # (ordinal_path, title, n_paras)

        def paras(path):
            n = rng.randint(0, 3)
            for i in range(n):
                chunks.append(f"para {path} {i} words")
            return n

        for k in range(1, rng.randint(1, 5) + 1):
            t = f"Top {k}"
            chunks.append(f"Section {k}. {t}")
            want.append((str(k), t, paras(str(k))))
            for j in range(1, rng.randint(0, 3) + 1):
                t2 = f"Mid {k}.{j}"
                hdr = (
                    f"Section {k} {chr(ord('a') + j - 1)}. {t2}"
                    if rng.random() < 0.5
                    else f"Section {k}.{j}. {t2}"
                )
                chunks.append(hdr)
                want.append((f"{k}.{j}", t2, paras(f"{k}.{j}")))
                if rng.random() < 0.3:
                    t3 = f"Leaf {k}.{j}.1"
                    chunks.append(f"Section {k}.{j}.1. {t3}")
                    want.append((f"{k}.{j}.1", t3, paras(f"{k}.{j}.1")))

        ctx = parse_structure("\n\n".join(chunks))
        got = [
            (s["ordinal_path"], s["title"], len(s["paras"]))
            for s in ctx["sections"]
        ]
        assert got == want, seed

        # flatten(nest(flat)) == flat (pre-order)
        def flatten(nodes):
            out = []
            for n in nodes:
                out.append((n["ordinal_path"], n["title"], len(n["paras"])))
                out.extend(flatten(n["subsections"]))
            return out

        assert flatten(nest_sections(ctx["sections"])) == got, seed

"""SparkTripleStore facade tests ([ref: ferenda/triplestore.py ::
TripleStore] — upstream test/testTripleStore.py exercises add/select/
construct/triple_count/clear per context; same surface here over the
SPO/POS tables)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ferenda_spark.schemas import DCTERMS
from ferenda_spark.triplestore import SparkTripleStore

P_TITLE = DCTERMS + "title"
P_REFS = DCTERMS + "references"


def _row(subj, pred, obj, is_uri, src, pk):
    return (subj, pred, obj, is_uri, None, None, src, pk)

SCHEMA = (
    "subj string, pred string, obj string, obj_is_uri boolean, "
    "obj_lang string, obj_dtype string, src_url string, part_key int"
)


@pytest.fixture()
def store(spark, tmp_path):
    rows = [
        _row("https://a.example/1", P_TITLE, "One", False, "https://a.example/1", 1),
        _row("https://a.example/1", P_REFS, "https://b.example/2", True,
             "https://a.example/1", 1),
        _row("https://b.example/2", P_TITLE, "Two", False, "https://b.example/2", 2),
    ]
    st = SparkTripleStore(
        spark, str(tmp_path / "spo"), str(tmp_path / "pos")
    )
    st.rewrite(spark.createDataFrame(rows, SCHEMA))
    return st


def test_counts_and_select(store):
    assert store.triple_count() == 3
    assert store.triple_count(context="a.example") == 2
    got = store.select(
        f'SELECT ?t WHERE {{ ?d <{P_REFS}> ?r . ?r <{P_TITLE}> ?t }}'
    ).collect()
    assert [r["t"] for r in got] == ["Two"]
    # context filter scopes the pattern source
    assert store.select(
        f'SELECT ?t WHERE {{ ?s <{P_TITLE}> ?t }}', context="b.example"
    ).count() == 1


def test_construct(store):
    g = store.construct(
        f"CONSTRUCT {{ ?r <urn:citedBy> ?d }} WHERE {{ ?d <{P_REFS}> ?r }}"
    ).collect()
    assert [(r["subj"], r["obj"]) for r in g] == [
        ("https://b.example/2", "https://a.example/1")
    ]


def test_add_appends_both_layouts(store, spark):
    new = spark.createDataFrame(
        [_row("https://c.example/3", P_TITLE, "Three", False,
              "https://c.example/3", 3)],
        SCHEMA,
    )
    store.add(new)
    assert store.triple_count() == 4
    # POS layout sees the appended predicate rows too (pruned scan path)
    pos = store._pos(None)
    assert pos.filter(F.col("subj") == "https://c.example/3").count() == 1


def test_clear_context_drops_exclusive_partition(store):
    # part_key 1 holds ONLY a.example rows — clear must drop the whole
    # partition, which dynamic overwrite would leave behind
    store.clear("a.example")
    assert store.triple_count() == 1
    left = store.triples().collect()
    assert left[0]["subj"] == "https://b.example/2"
    assert store.select(
        f'SELECT ?s WHERE {{ ?s <{P_TITLE}> "One" }}'
    ).count() == 0


def test_ask_and_describe(store):
    assert store.ask(f"ASK {{ ?s <{P_REFS}> ?o }}") is True
    assert store.ask(f'ASK {{ ?s <{P_TITLE}> "Three" }}') is False
    # context scoping applies to ASK like select
    assert store.ask(f"ASK {{ ?s <{P_REFS}> ?o }}", context="b.example") is False
    got = store.describe(
        f"DESCRIBE ?d WHERE {{ ?d <{P_REFS}> <https://b.example/2> }}"
    ).collect()
    assert len(got) == 2 and {r.subj for r in got} == {"https://a.example/1"}
    got2 = store.describe("DESCRIBE <https://b.example/2>").collect()
    assert [(r.subj, r.obj) for r in got2] == [("https://b.example/2", "Two")]


def test_clear_leaves_no_sibling_and_pos_consistent(store, spark, tmp_path):
    """clear() stages survivors at a durable .clearing sibling then swaps —
    after success the sibling is gone and both layouts agree."""
    import os

    store.clear("a.example")
    assert not os.path.exists(store.spo_path + ".clearing")
    assert not os.path.exists(store.pos_path + ".clearing")
    spo = {tuple(r) for r in store.triples().select("subj", "pred", "obj").collect()}
    pos = {
        tuple(r)
        for r in spark.read.parquet(store.pos_path)
        .select("subj", "pred", "obj")
        .collect()
    }
    assert spo == pos and len(spo) == 1


# ------------------------------------------------------- snapshot_mode


@pytest.fixture()
def snap_store(spark, tmp_path):
    rows = [
        _row("https://a.example/1", P_TITLE, "One", False, "https://a.example/1", 1),
        _row("https://a.example/1", P_REFS, "https://b.example/2", True,
             "https://a.example/1", 1),
        _row("https://b.example/2", P_TITLE, "Two", False, "https://b.example/2", 2),
    ]
    st = SparkTripleStore(
        spark, str(tmp_path / "spo"), str(tmp_path / "pos"),
        snapshot_mode=True,
    )
    st.rewrite(spark.createDataFrame(rows, SCHEMA))
    return st


def test_snapshot_add_and_time_travel(snap_store, spark):
    assert snap_store.triple_count() == 3
    snap_store.add(
        spark.createDataFrame(
            [_row("https://c.example/3", P_TITLE, "Three", False,
                  "https://c.example/3", 3)],
            SCHEMA,
        )
    )
    assert snap_store.triple_count() == 4
    # version 1 still answers with the pre-add graph
    assert snap_store.triples(version=1).count() == 3
    got = snap_store.select(
        "SELECT ?t WHERE { <https://c.example/3> "
        f"<{P_TITLE}> ?t . }}",
    )
    assert [r.t for r in got.collect()] == ["Three"]
    # pinned-version query: the new subject is invisible at v1
    got_v1 = snap_store.select(
        "SELECT ?t WHERE { <https://c.example/3> "
        f"<{P_TITLE}> ?t . }}",
        version=1,
    )
    assert got_v1.count() == 0


def test_snapshot_clear_keeps_history(snap_store):
    snap_store.clear("a.example")
    assert snap_store.triple_count() == 1
    # pre-clear version intact
    assert snap_store.triples(version=1).count() == 3


def test_plain_store_rejects_version(store):
    with pytest.raises(ValueError, match="snapshot_mode"):
        store.triples(version=1)


# ------------------------------------------------------------ SPARQL UPDATE


def _update_store(spark, tmp_path, rows):
    from ferenda_spark.triplestore import SparkTripleStore

    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "obj_lang string, obj_dtype string, src_url string, part_key int",
    )
    store = SparkTripleStore(spark, str(tmp_path / "spo_upd"))
    store.rewrite(df)
    return store


BASE = [
    ("e:1", "p:a", "e:2", True, None, None, "u:1", 0),
    ("e:1", "p:label", "one", False, "en", None, "u:1", 0),
    ("e:2", "p:a", "e:3", True, None, None, "u:2", 1),
]


def test_insert_data(spark, tmp_path):
    store = _update_store(spark, tmp_path, BASE)
    store.update('INSERT DATA { <e:9> <p:a> <e:1> .\n<e:9> <p:label> "nine" . }')
    got = {(r["subj"], r["pred"], r["obj"]) for r in store.triples().collect()}
    assert ("e:9", "p:a", "e:1") in got
    assert ("e:9", "p:label", "nine") in got
    assert len(got) == 5


def test_delete_data_exact_only(spark, tmp_path):
    store = _update_store(spark, tmp_path, BASE)
    store.update('DELETE DATA { <e:1> <p:label> "one"@en . }')
    got = {(r["subj"], r["pred"], r["obj"]) for r in store.triples().collect()}
    assert ("e:1", "p:label", "one") not in got
    assert len(got) == 2
    # wrong lang tag deletes nothing
    store.update('DELETE DATA { <e:1> <p:a> "e:2" . }')  # literal, not uri
    assert store.triples().count() == 2


def test_delete_where_pattern(spark, tmp_path):
    store = _update_store(spark, tmp_path, BASE)
    store.update("DELETE WHERE { ?s <p:a> ?o . }")
    got = {(r["subj"], r["pred"]) for r in store.triples().collect()}
    assert got == {("e:1", "p:label")}


def test_delete_where_constant_object(spark, tmp_path):
    store = _update_store(spark, tmp_path, BASE)
    store.update("DELETE WHERE { ?s ?p <e:3> . }")
    got = {(r["subj"], r["obj"]) for r in store.triples().collect()}
    assert ("e:2", "e:3") not in got
    assert len(got) == 2


def test_update_guards(spark, tmp_path):
    import pytest as _pytest

    store = _update_store(spark, tmp_path, BASE)
    with _pytest.raises(ValueError, match="unsupported update form"):
        store.update("INSERT { ?s ?p ?o } WHERE { ?s ?p ?o }")
    with _pytest.raises(ValueError, match="exactly one triple pattern"):
        store.update("DELETE WHERE { ?s <p:a> ?o . ?o <p:a> ?x . }")
    with _pytest.raises(ValueError, match="malformed"):
        store.update("INSERT DATA { garbage }")


def test_delete_data_tagged_literal_spares_plain(spark, tmp_path):
    """Three-valued logic guard: deleting "one"@en must NOT delete the
    NULL-lang plain literal "one" (a NULL conjunct used to nuke it)."""
    rows = BASE + [("e:3", "p:label", "one", False, None, None, "u:3", 2)]
    store = _update_store(spark, tmp_path, rows)
    store.update('DELETE WHERE { ?s <p:label> "one"@en . }')
    got = {(r["subj"], r["obj"], r["obj_lang"])
           for r in store.triples().collect()}
    assert ("e:3", "one", None) in got  # plain literal survives
    assert ("e:1", "one", "en") not in got  # tagged one deleted


def test_delete_where_plain_literal_spares_tagged(spark, tmp_path):
    """SPARQL term equality: a simple literal pattern matches neither
    @tagged nor ^^typed terms."""
    rows = BASE + [
        ("e:3", "p:label", "one", False, None, None, "u:3", 2),
        ("e:4", "p:label", "one", False, None, "xsd:token", "u:4", 3),
    ]
    store = _update_store(spark, tmp_path, rows)
    store.update('DELETE WHERE { ?s ?p "one" . }')
    got = {(r["subj"], r["obj_lang"], r["obj_dtype"])
           for r in store.triples().filter("obj = 'one'").collect()}
    assert got == {("e:1", "en", None), ("e:4", None, "xsd:token")}

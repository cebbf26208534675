"""rdf:List flattening, crawl scheduling, skolemization, as-of view."""

from __future__ import annotations

from pyspark.sql import functions as F

from ferenda_spark.operators.rdflists import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    flatten_rdf_lists,
)
from ferenda_spark.operators.scheduler import schedule_fetches


def _tri(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, u) for s, p, o, u in rows],
        "subj string, pred string, obj string, obj_is_uri boolean",
    )


def _list_rows(name, members):
    rows = []
    cells = [f"{name}:c{i}" for i in range(len(members))]
    for i, m in enumerate(members):
        rows.append((cells[i], RDF_FIRST, m, False))
        nxt = cells[i + 1] if i + 1 < len(cells) else RDF_NIL
        rows.append((cells[i], RDF_REST, nxt, True))
    return rows


def test_flatten_two_lists(spark):
    rows = _list_rows("A", ["x", "y", "z"]) + _list_rows("B", ["q"])
    got = {
        (r["head"], r["idx"], r["member"])
        for r in flatten_rdf_lists(_tri(spark, rows)).collect()
    }
    assert got == {
        ("A:c0", 0, "x"), ("A:c0", 1, "y"), ("A:c0", 2, "z"),
        ("B:c0", 0, "q"),
    }


def test_flatten_long_list_order(spark):
    members = [f"m{i}" for i in range(40)]
    rows = _list_rows("L", members)
    got = flatten_rdf_lists(_tri(spark, rows))
    ordered = [
        r["member"] for r in got.orderBy("idx").collect()
    ]
    assert ordered == members
    assert got.filter("NOT ok").count() == 0


def test_flatten_cycle_is_error_row(spark):
    rows = [
        ("c0", RDF_FIRST, "x", False),
        ("c0", RDF_REST, "c1", True),
        ("c1", RDF_FIRST, "y", False),
        ("c1", RDF_REST, "c0", True),  # cycle
    ]
    got = flatten_rdf_lists(_tri(spark, rows)).collect()
    assert all(not r["ok"] and r["head"] is None for r in got)
    assert {r["member"] for r in got} == {"x", "y"}


def test_schedule_fetches_politeness(spark):
    urls = [
        ("https://a.com/1",), ("https://a.com/2",), ("https://a.com/3",),
        ("https://b.org/x",),
    ]
    df = spark.createDataFrame(urls, "url string")
    got = schedule_fetches(df, delay_ms=500, n_workers=8).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], []).append(r)
    a = sorted(by_host["a.com"], key=lambda r: r["seq"])
    assert [r["seq"] for r in a] == [0, 1, 2]
    assert [r["not_before_ms"] for r in a] == [0, 500, 1000]
    # single worker per host
    assert len({r["worker"] for r in a}) == 1
    assert by_host["b.org"][0]["seq"] == 0


def test_schedule_deterministic_across_partitionings(spark):
    df = spark.range(0, 100).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 5).cast("string"),
            F.lit(".com/p"), F.col("id").cast("string"),
        ).alias("url")
    )
    g1 = {(r["url"], r["seq"], r["worker"])
          for r in schedule_fetches(df).collect()}
    g2 = {(r["url"], r["seq"], r["worker"])
          for r in schedule_fetches(df.repartition(7)).collect()}
    assert g1 == g2


def test_skolemize(spark):
    import hashlib

    from ferenda_spark.functions.uris import skolemize_col

    df = spark.createDataFrame(
        [("_:doc7/b0",), ("https://x.example/a",)], "t string"
    )
    got = {r["t"]: r["s"] for r in df.select(
        "t", skolemize_col(F.col("t")).alias("s")).collect()}
    assert got["https://x.example/a"] == "https://x.example/a"
    h = hashlib.md5(b"_:doc7/b0").hexdigest()
    assert got["_:doc7/b0"] == f"https://kg.example/.well-known/genid/{h}"


def test_as_of_view(spark):
    from ferenda_spark.operators.temporal import as_of, fact_versions

    rows = [
        ("e1", "p", "v1", "2026-01-01 00:00:00"),
        ("e1", "p", "v2", "2026-03-01 00:00:00"),
        ("e2", "p", "w", "2026-02-01 00:00:00"),
    ]
    a = spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    v = fact_versions(a)
    feb = as_of(v, "2026-02-15 00:00:00")
    got = {(r["subj"], r["value"]) for r in feb.collect()}
    assert got == {("e1", "v1"), ("e2", "w")}
    apr = as_of(v, "2026-04-01 00:00:00")
    assert {(r["subj"], r["value"]) for r in apr.collect()} == {
        ("e1", "v2"), ("e2", "w"),
    }


# --- crawl budget allocation --------------------------------------------

def test_allocate_crawl_budget(spark):
    import pytest
    from pyspark.sql import functions as F

    from ferenda_spark.operators.scheduler import allocate_crawl_budget

    ranks = spark.createDataFrame(
        [("h1", 0.5), ("h2", 0.3), ("h3", 0.2), ("h4", 0.9)],
        "host string, rank double")
    quality = spark.createDataFrame(
        [("h1", 0.8), ("h2", 0.5), ("h3", 0.0), ("h5", 1.0)],
        "host string, mean_quality double")
    out = {r.host: (r.score, r.share, r.budget)
           for r in allocate_crawl_budget(
               ranks, quality, 10000, max_share=0.6).collect()}
    # h4 (no quality) and h5 (no rank) get nothing; h3 scores 0
    assert set(out) == {"h1", "h2", "h3"}
    tot = 0.5 * 0.8 + 0.3 * 0.5 + 0.0
    assert out["h1"][0] == pytest.approx(0.4)
    assert out["h1"][1] == pytest.approx(min(0.4 / tot, 0.6))
    assert out["h1"][2] == int((min(0.4 / tot, 0.6)) * 10000)
    # the cap binds for h1 (raw share 0.727 > 0.6)
    assert out["h1"][1] == pytest.approx(0.6)
    # budgets never exceed total even with the head host capped
    assert sum(b for _, _, b in out.values()) <= 10000


def test_allocate_crawl_budget_degenerate_scores(spark):
    """All-zero scores → shares/budgets 0 (not NULL); negative inputs
    are clamped to score 0 rather than eating other hosts' shares."""
    import pytest

    from ferenda_spark.operators.scheduler import allocate_crawl_budget

    ranks = spark.createDataFrame(
        [("h1", 0.0), ("h2", 0.0)], "host string, rank double")
    quality = spark.createDataFrame(
        [("h1", 1.0), ("h2", 0.5)], "host string, mean_quality double")
    out = {r.host: (r.score, r.share, r.budget)
           for r in allocate_crawl_budget(ranks, quality, 1000).collect()}
    assert out == {"h1": (0.0, 0.0, 0), "h2": (0.0, 0.0, 0)}

    ranks2 = spark.createDataFrame(
        [("h1", -0.4), ("h2", 0.6)], "host string, rank double")
    out2 = {r.host: (r.score, r.share, r.budget)
            for r in allocate_crawl_budget(
                ranks2, quality, 1000, max_share=1.0).collect()}
    assert out2["h1"] == (0.0, 0.0, 0)          # clamped, not negative
    assert out2["h2"][0] == pytest.approx(0.3)
    assert out2["h2"][1] == pytest.approx(1.0)  # sole positive host
    assert out2["h2"][2] == 1000

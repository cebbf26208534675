"""Entity-linking tiers (SURVEY §5.2(5)): exact broadcast, salted-shuffle
equivalence, MinHash-LSH must-link / must-not-link."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.linking import link_mentions, _exact_broadcast, _exact_salted
from ferenda_spark.sources.corpus import build_dictionary, canonical_uri_of, _entity_name
from ferenda_spark.schemas import URI_DICTIONARY


@pytest.fixture(scope="module")
def dict_df(spark):
    return spark.createDataFrame(build_dictionary(), schema=URI_DICTIONARY).cache()


def _mentions_df(spark, rows):
    return spark.createDataFrame(
        [
            {
                "url": f"https://d00.example.com/x/{i}.html",
                "part_key": 0,
                "section_ordinal": 1,
                "mention": m,
                "alias_key": m.lower(),
            }
            for i, m in enumerate(rows)
        ]
    )


def test_exact_tier(spark, dict_df):
    name0, _ = _entity_name(0)
    m = _mentions_df(spark, [name0, "ZZZ No Such E9999x"])
    out = _exact_broadcast(m, dict_df).collect()
    assert len(out) == 1
    assert out[0]["canonical_uri"] == canonical_uri_of(0)


def test_salted_equals_broadcast(spark, dict_df):
    names = [_entity_name(i)[0] for i in range(30)]
    m = _mentions_df(spark, names)
    b = {(r["mention"], r["canonical_uri"]) for r in _exact_broadcast(m, dict_df).collect()}
    s = {(r["mention"], r["canonical_uri"]) for r in _exact_salted(m, dict_df, salt=4).collect()}
    assert b == s and len(b) == 30


def test_lsh_must_link_typos(spark, dict_df):
    # fresh corruptions (not in dictionary): drop/duplicate a letter
    name5, _ = _entity_name(5)
    words = name5.split()
    typo1 = words[0][:2] + words[0][3:] + " " + " ".join(words[1:])  # drop a char
    typo2 = words[0] + " " + words[1] + words[1][-1] + " " + " ".join(words[2:])
    m = _mentions_df(spark, [typo1, typo2])
    out = link_mentions(m, dict_df, fuzzy_strategy="lsh")
    got = {r["mention"]: r["canonical_uri"] for r in out.collect()}
    assert got.get(typo1) == canonical_uri_of(5)
    assert got.get(typo2) == canonical_uri_of(5)
    assert all(r["tier"] == "lsh" for r in out.collect())


def test_ngram_tier_matches_lsh_on_typos(spark, dict_df):
    """The exact-Jaccard broadcast fuzzy tier resolves the same typos to the
    same canonical URIs as the MinHash-LSH scale path."""
    names = [_entity_name(i)[0] for i in range(8)]
    typos = [n.split()[0][:2] + n.split()[0][3:] + " " + " ".join(n.split()[1:])
             for n in names]
    m = _mentions_df(spark, typos)
    ng = {r["mention"]: r["canonical_uri"]
          for r in link_mentions(m, dict_df, fuzzy_strategy="ngram").collect()}
    ls = {r["mention"]: r["canonical_uri"]
          for r in link_mentions(m, dict_df, fuzzy_strategy="lsh").collect()}
    assert ng == ls and len(ng) == len(typos)


def test_lsh_must_not_link_garbage(spark, dict_df):
    m = _mentions_df(spark, ["Qqqq Wwww Xxxx E8888"])
    # E8888 tail may weakly overlap; threshold must reject unrelated names
    out = link_mentions(m, dict_df, lsh_threshold=0.35).collect()
    assert out == []


def test_full_cascade_tiers(spark, dict_df):
    name1, _ = _entity_name(1)
    words = name1.split()
    abbrev = "".join(w[0] for w in words[:-1]).upper() + " " + words[-1]
    typo = words[0][:2] + words[0][3:] + " " + " ".join(words[1:])
    m = _mentions_df(spark, [name1, abbrev, typo])
    out = link_mentions(m, dict_df)
    rows = {r["mention"]: (r["canonical_uri"], r["tier"]) for r in out.collect()}
    assert rows[name1] == (canonical_uri_of(1), "exact")
    assert rows[abbrev] == (canonical_uri_of(1), "exact")
    # auto strategy: small dictionary → exact-ngram fuzzy tier
    assert rows[typo][0] == canonical_uri_of(1) and rows[typo][1] == "ngram"


def test_onepass_equals_tiered_cascade(spark, dict_df):
    """link_mentions_onepass (the kg_job deployment path) is row-identical —
    including tier labels — to the tiered broadcast+ngram cascade."""
    from ferenda_spark.operators.linking import link_mentions_onepass

    names = [_entity_name(i)[0] for i in range(12)]
    abbrevs = [
        "".join(w[0] for w in n.split()[:-1]).upper() + " " + n.split()[-1]
        for n in names[:4]
    ]
    typos = [
        n.split()[0][:2] + n.split()[0][3:] + " " + " ".join(n.split()[1:])
        for n in names[4:8]
    ]
    garbage = ["Qqqq Wwww Xxxx Zzzz", "mmmmm nnnnn"]
    m = _mentions_df(spark, names + abbrevs + typos + garbage)
    key = lambda r: (r["url"], r["mention"], r["canonical_uri"], r["tier"])
    tiered = sorted(
        map(key, link_mentions(m, dict_df, fuzzy_strategy="ngram").collect())
    )
    onepass = sorted(map(key, link_mentions_onepass(m, dict_df).collect()))
    assert tiered == onepass and len(onepass) >= len(names)


def test_onepass_duplicate_alias_keys_match_broadcast(spark, dict_df):
    """An ambiguous alias (one alias_key → several canonical URIs) must
    produce one link row per dictionary match in the onepass path, exactly
    like _exact_broadcast's inner join — not silently collapse to one
    partition-order-dependent row."""
    from ferenda_spark.operators.linking import link_mentions_onepass
    from ferenda_spark.schemas import URI_DICTIONARY

    dup = spark.createDataFrame(
        [
            ("Acme Corp", "acme corp", "uri://a", "org", True),
            ("Acme Corp", "acme corp", "uri://b", "org", True),
            ("Zed Inc", "zed inc", "uri://z", "org", True),
        ],
        schema=URI_DICTIONARY,
    )
    m = _mentions_df(spark, ["Acme Corp", "Zed Inc"])
    key = lambda r: (r["url"], r["mention"], r["canonical_uri"])
    want = sorted(map(key, _exact_broadcast(m, dup).collect()))
    got = sorted(map(key, link_mentions_onepass(m, dup).collect()))
    assert got == want
    assert len([k for k in got if k[1] == "Acme Corp"]) == 2


def test_tuned_salt_tracks_hottest_key(spark, dict_df):
    """Stats-driven salting (SURVEY §4.3): S follows the hottest key's row
    count and the salted join stays value-identical to broadcast on a
    Zipf-skewed mention set."""
    from ferenda_spark.operators.linking import tuned_salt

    name0, _ = _entity_name(0)
    name1, _ = _entity_name(1)
    # Zipf-ish: one scorching key, one warm, a cold tail
    rows = [name0] * 900 + [name1] * 90 + [_entity_name(i)[0] for i in range(2, 11)]
    m = spark.createDataFrame(
        [
            {
                "url": f"https://d{i % 7:02d}.example.com/x/{i}.html",
                "part_key": i % 7,
                "section_ordinal": 1,
                "mention": name,
                "alias_key": name.lower(),
            }
            for i, name in enumerate(rows)
        ]
    )
    assert tuned_salt(m, target_rows_per_reducer=100) == 9  # ceil(900/100)
    assert tuned_salt(m, target_rows_per_reducer=100, max_salt=4) == 4
    assert tuned_salt(m, target_rows_per_reducer=10**6) == 1  # no hot key

    b = {(r["url"], r["canonical_uri"]) for r in _exact_broadcast(m, dict_df).collect()}
    s = {(r["url"], r["canonical_uri"]) for r in _exact_salted(m, dict_df, None).collect()}
    assert b == s and len(b) == len(rows)

    # the hottest reducer's share actually drops: with S=9, the hot key's
    # rows spread over 9 salt buckets, none holding more than ~1/4 of them
    salted = m.withColumn(
        "salt", F.pmod(F.xxhash64(F.col("url")), F.lit(9)).cast("int")
    )
    per_bucket = (
        salted.filter(F.col("alias_key") == name0.lower())
        .groupBy("salt")
        .count()
        .collect()
    )
    assert len(per_bucket) == 9
    assert max(r["count"] for r in per_bucket) < 900 / 4

"""Robots-exclusion operator (operators/robots.py): RFC 9309 group
selection, longest-match precedence, wildcard/$ patterns, defaults."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.robots import (
    parse_robots_rules,
    robots_allowed,
)

ROBOTS = """
User-agent: ferenda-bot
Disallow: /tmp/
Allow: /tmp/keep$
Disallow: /*.pdf$

User-agent: *
Disallow: /all
"""


@pytest.fixture()
def rules(spark):
    robots = spark.createDataFrame(
        [("a.example", ROBOTS), ("b.example", "User-agent: *\nDisallow: /x")],
        "host string, robots_txt string",
    )
    return parse_robots_rules(robots, agent="ferenda-bot")


def test_group_selection_and_patterns(rules):
    got = {(r.host, r.is_allow, r.pattern) for r in rules.collect()}
    # a.example uses the ferenda-bot group, NOT the * group
    assert ("a.example", 0, "^/tmp/") in got
    assert ("a.example", 1, "^/tmp/keep$") in got
    assert ("a.example", 0, "^/.*\\.pdf$") in got
    assert all("all" not in p for _, _, p in got if _ == "a.example")
    # b.example only has the * group
    assert ("b.example", 0, "^/x") in got


def test_allowed_longest_match_wins(spark, rules):
    urls = spark.createDataFrame(
        [
            ("https://a.example/tmp/x", False),
            ("https://a.example/tmp/keep", True),   # allow wins (longer)
            ("https://a.example/tmp/keepx", False),  # $ anchor broke
            ("https://a.example/doc.pdf", False),    # wildcard rule
            ("https://a.example/ok", True),
            ("https://a.example/all", True),         # * group not selected
            ("https://b.example/x/deep", False),
            ("https://b.example/y", True),
            ("https://unknown.example/anything", True),  # no rules → allow
            ("https://a.example", True),             # bare host → path "/"
        ],
        "url string, expected boolean",
    )
    out = {r.url: r.allowed for r in robots_allowed(urls, rules).collect()}
    for r in urls.collect():
        assert out[r.url] == r.expected, r.url


def test_plan_uses_broadcast_join(spark, rules):
    urls = spark.createDataFrame(
        [(f"https://a.example/p{i}",) for i in range(50)], "url string"
    )
    plan = (
        robots_allowed(urls, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

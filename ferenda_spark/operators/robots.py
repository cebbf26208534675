"""Robots-exclusion (RFC 9309) URL filtering — the crawl-politeness gate a
Common-Crawl-style pipeline applies before fetching or before using cached
pages whose robots policy changed.

Public spec (RFC 9309 / the REP Google open-sourced): rules are grouped by
user-agent; the group whose agent token LONGEST-matches the crawler's
product token applies (fallback ``*``); within the group, the matching
rule with the LONGEST pattern wins, allow beating disallow on ties; no
match → allowed. Patterns support ``*`` (any run) and a trailing ``$``
(end anchor).

Scale split — parse small, match big:

* ``parse_robots_rules`` runs over the ROBOTS table (one row per host —
  vocabulary-sized next to the URL corpus) with a pandas UDF that
  implements the grouping/agent-selection quirks in plain Python and
  emits one row per rule, with the pattern pre-compiled to an anchored
  Java-regex string and its octet length for precedence.
* ``robots_allowed`` does the URL-sized work entirely JVM-side: extract
  (host, path) with codegen'd regexes, BROADCAST-join the rules (host
  rules are tiny by construction), match with ``regexp_like`` on the
  per-rule pattern column, and pick the winner with ONE max-of-struct
  aggregation (rule_len, is_allow) — longest-then-allow is exactly the
  struct's lexicographic max. Unmatched URLs and unknown hosts coalesce
  to allowed. One broadcast join + one url-keyed aggregate; the URL
  corpus never shuffles on anything but its own id.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_RULES_SCHEMA = (
    "array<struct<is_allow:int,pattern:string,rule_len:int>>"
)


def _translate(path_pattern: str) -> str:
    """REP pattern → anchored Java/RE2-safe regex: ``*`` → ``.*``,
    trailing ``$`` → end anchor, everything else literal."""
    anchored_end = path_pattern.endswith("$")
    body = path_pattern[:-1] if anchored_end else path_pattern
    out = []
    for ch in body:
        out.append(".*" if ch == "*" else re.escape(ch))
    return "^" + "".join(out) + ("$" if anchored_end else "")


def _parse_one(text: str, agent: str) -> list[tuple[int, str, int]]:
    """RFC 9309 group selection + rule extraction for one robots.txt."""
    if not text:
        return []
    groups: list[tuple[list[str], list[tuple[int, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[int, str]] = []
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules and cur_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_rules = False
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_rules = True
            if value:  # empty value = no restriction, per spec
                cur_rules.append((1 if field == "allow" else 0, value))
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    agent_l = agent.lower()
    best_len, best_rules = -1, None
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if best_len < 0:
                    best_len, best_rules = 0, rules
            elif agent_l.startswith(a) and len(a) > best_len:
                best_len, best_rules = len(a), rules
    if not best_rules:
        return []
    return [
        (is_allow, _translate(p), len(p.encode("utf-8")))
        for is_allow, p in best_rules
    ]


def parse_robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, is_allow, pattern, rule_len) — one row per applicable rule
    for ``agent``. Hosts whose robots.txt yields no applicable rules emit
    nothing (their URLs default to allowed)."""

    @pandas_udf(_RULES_SCHEMA)
    def _rules(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _parse_one(t, agent))

    return (
        robots.select(
            F.col(host_col).alias("host"), _rules(F.col(text_col)).alias("_r")
        )
        .select("host", F.explode("_r").alias("r"))
        .select(
            "host",
            F.col("r.is_allow").alias("is_allow"),
            F.col("r.pattern").alias("pattern"),
            F.col("r.rule_len").alias("rule_len"),
        )
    )


def robots_allowed(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """urls + ``allowed`` boolean. ``rules`` is parse_robots_rules output
    (host-sized → broadcast). Longest-match-wins, allow beats disallow on
    ties, no match / unknown host → allowed."""
    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.\-]*://([^/]+)", 1)
    )
    path_raw = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.\-]*://[^/]*(/.*)?$", 1)
    path = F.when(F.length(path_raw) > 0, path_raw).otherwise(F.lit("/"))
    u = urls.withColumn("_host", host).withColumn("_path", path)

    matched = (
        u.join(F.broadcast(rules), u["_host"] == rules["host"], "inner")
        .filter(F.regexp_like(F.col("_path"), F.col("pattern")))
        .groupBy(url_col)
        .agg(
            F.max(
                F.struct(F.col("rule_len"), F.col("is_allow"))
            ).alias("_win")
        )
        .select(
            F.col(url_col).alias("_murl"),
            (F.col("_win.is_allow") == 1).alias("_allow"),
        )
    )
    out = u.join(matched, u[url_col] == matched["_murl"], "left")
    return out.select(
        *[F.col(c) for c in urls.columns],
        F.coalesce(F.col("_allow"), F.lit(True)).alias("allowed"),
    )

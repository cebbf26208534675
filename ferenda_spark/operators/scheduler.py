"""Crawl politeness scheduling: frontier URLs → per-host fetch slots.

Reference analog: ferenda throttles downloads per source repo
([ref: ferenda/documentrepository.py — download_throttle config]); a
Common-Crawl-scale frontier needs the distributed version: every host's
fetches serialized with a politeness delay, hosts spread across fetcher
workers, and the assignment DETERMINISTIC so a re-run (or a second
scheduler instance on another cluster) produces the identical plan —
which is why the per-host ordering is the md5 of the URL (stable, fair,
engine-replayable), never a random number or arrival order.

Output per URL: ``worker`` (= hash(host) mod n_workers — all of a host's
fetches land on ONE worker, the invariant politeness actually requires),
``seq`` (0-based position in the host's queue), ``not_before_ms`` (= seq
× delay; the worker may fetch the URL once this offset has elapsed).

Scale shape: ONE window shuffle keyed on host. Skew note: a 10^7-URL
host produces a 10^7-row window partition — but that host's schedule is
inherently sequential (politeness!), so the skew is the PROBLEM DOMAIN's,
not the plan's; the window computes a row_number, which streams without
buffering the partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def schedule_fetches(
    urls: DataFrame,
    url_col: str = "url",
    *,
    delay_ms: int = 1000,
    n_workers: int = 64,
) -> DataFrame:
    """→ input columns + ``host, worker, seq, not_before_ms``."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    with_host = urls.withColumn("host", F.lower(F.coalesce(host, F.lit(""))))
    w = Window.partitionBy("host").orderBy(
        F.md5(F.col(url_col)), F.col(url_col)
    )
    seq = F.row_number().over(w) - F.lit(1)
    from ..functions.sketches import hash60

    return (
        with_host.withColumn(
            # md5-60bit, not xxhash64: worker assignment is part of the
            # replayable contract (a second engine must compute the same
            # plan), same idiom as splits/sketches
            "worker",
            F.pmod(hash60(F.col("host")), F.lit(n_workers)).cast("int"),
        )
        .withColumn("seq", seq.cast("int"))
        .withColumn(
            "not_before_ms", F.col("seq").cast("bigint") * F.lit(delay_ms)
        )
    )


def allocate_crawl_budget(
    ranks: DataFrame,
    quality: DataFrame,
    total_budget: int,
    host_col: str = "host",
    rank_col: str = "rank",
    quality_col: str = "mean_quality",
    *,
    max_share: float = 0.10,
) -> DataFrame:
    """Turn the two host-level priors this repo computes — link-graph
    rank (pagerank/trustrank) and content quality (host_report) — into
    per-host crawl budgets → ``(host, score, share, budget)``.

    The allocation rule (deterministic, one pass, oracle-replayable):

        score(h) = rank(h) · quality(h)          (inner join; a host
                                                  missing either prior
                                                  gets no budget — both
                                                  signals are cheap and
                                                  a host without them
                                                  is a host not yet
                                                  worth budget)
        share(h) = round(min(score / Σ score, max_share), 6)
        budget(h) = floor(share · total_budget)

    The share is rounded to the repo-wide 6-decimal grain BEFORE the
    floor so budgets are bit-identical across engines, re-runs and
    cluster sizes (an unrounded share differs at ~1e-15 between
    aggregation orders, which a floor at an integer boundary would
    amplify into a whole budget unit).

    ``max_share`` caps any single host (the Zipf head would otherwise
    absorb the crawl); the clipped excess is deliberately NOT
    redistributed — re-normalizing would re-concentrate it on the next
    head host, and the conservative under-allocation (Σ budget ≤ total)
    is the behavior a polite crawler wants anyway. Shape: one equi-join
    + one scalar total broadcast + map-only arithmetic; the output is
    host-sized. Pairs with crawl_schedule (which orders WITHIN a host);
    this decides HOW MUCH each host gets.
    """
    j = ranks.select(
        F.col(host_col).alias("host"), F.col(rank_col).alias("rank")
    ).join(
        quality.select(
            F.col(host_col).alias("host"),
            F.col(quality_col).alias("q"),
        ),
        "host",
    ).select(
        "host",
        # clamp: a negative rank or quality (caller bug / adversarial
        # input) must not produce a negative score that silently eats
        # other hosts' shares through the total
        F.greatest(F.lit(0.0), F.col("rank") * F.col("q")).alias("score"),
    )
    tot = j.agg(F.sum("score").alias("t"))
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            "host",
            "score",
            # guard the division: all-zero scores (empty crawl, quality
            # floor) → every share 0, not NULL/NaN propagating into floor()
            F.when(
                F.col("t") > 0,
                F.round(
                    F.least(F.col("score") / F.col("t"), F.lit(max_share)),
                    6,
                ),
            ).otherwise(F.lit(0.0)).alias("share"),
        )
        .select(
            "host", "score", "share",
            F.floor(F.col("share") * total_budget).cast("bigint")
            .alias("budget"),
        )
    )

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

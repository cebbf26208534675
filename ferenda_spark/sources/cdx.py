"""Common-Crawl CDX-JSON index source: fetch planning without touching WARCs.

A crawl's CDX index has one line per capture: ``<urlkey> <timestamp14>
<json>`` where the JSON names the capture's WARC file and byte range. At
100 TB you never scan archives to decide what to read — you query the
index (a ~1/1000-size table) and derive a fetch plan of exact byte ranges
per WARC file. This module turns index files into that plan:

- ``read_cdx_index``: text source → one row per capture with a DECLARED
  json schema (``split(value, ' ', 3)`` keeps the JSON intact — only the
  first two space-separated fields are structural). Malformed JSON yields
  NULL fields, not failures (errors-as-data, filter on ``url IS NULL``).
- ``cdx_fetch_plan``: the scheduling shape — successful text/html captures
  grouped per WARC file with their (offset, length, url) ranges sorted by
  offset, so one task streams one archive with forward-only seeks. The
  groupBy shuffles only index rows (tiny); ranges per file are bounded by
  the archive's own record count.

Reference analog: ``download_get_basefiles`` enumerates what to fetch
before fetching ([ref: ferenda/documentrepository.py ::
download_get_basefiles]) — the CDX index is that enumeration at crawl
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CDX_JSON_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string"
)


def read_cdx_index(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of cdx(.gz) files → (urlkey, capture_ts, url, status,
    mime, digest, warc_filename, warc_offset, warc_length)."""
    # try_* variants throughout: under ANSI Spark, element_at on a short
    # line or a cast of a non-numeric status ('-' in revisit records) would
    # abort the job; the contract here is errors-as-NULL
    parts = F.split(F.col("value"), " ", 3)
    js = F.from_json(F.try_element_at(parts, F.lit(3)), _CDX_JSON_SCHEMA)
    return (
        spark.read.text(path)
        .filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.try_element_at(parts, F.lit(1)).alias("urlkey"),
            F.try_to_timestamp(
                F.try_element_at(parts, F.lit(2)), F.lit("yyyyMMddHHmmss")
            ).alias("capture_ts"),
            js["url"].alias("url"),
            js["status"].try_cast("int").alias("status"),
            js["mime"].alias("mime"),
            js["digest"].alias("digest"),
            js["filename"].alias("warc_filename"),
            js["offset"].try_cast("bigint").alias("warc_offset"),
            js["length"].try_cast("bigint").alias("warc_length"),
        )
    )


def cdx_fetch_plan(
    cdx: DataFrame, mimes: tuple[str, ...] = ("text/html",)
) -> DataFrame:
    """(warc_filename, n_records, total_bytes, ranges) — one row per WARC
    file listing the byte ranges of its successful captures of the wanted
    mime types, sorted by offset (forward-only streaming within a file)."""
    wanted = cdx.filter(
        (F.col("status") == 200)
        & F.col("mime").isin(*mimes)
        & F.col("warc_filename").isNotNull()
    )
    rng = F.struct(
        F.col("warc_offset").alias("offset"),
        F.col("warc_length").alias("length"),
        F.col("url").alias("url"),
    )
    return wanted.groupBy("warc_filename").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum("warc_length").alias("total_bytes"),
        F.sort_array(F.collect_list(rng)).alias("ranges"),
    )

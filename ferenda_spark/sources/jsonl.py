"""JSON-lines corpus source: web-dump `.jsonl` files → the corpus table.

Crawl dumps commonly ship as JSON lines with one page per record (url,
fetch timestamp, page content). This reader maps configurable field names
onto the input_hint corpus schema. Schema is DECLARED, never inferred —
inference reads the data twice and drifts with content ([SURVEY §1.2:
fixed explicit schemas everywhere]).

Caveat (documented, not a bug): JSON is text, so ``html`` is the UTF-8
re-encoding of the stored string — byte-identity with the original crawl
bytes holds only if the dump preserved them losslessly. For byte-exact
ingest use the WARC source (sources/warc.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    url_field: str = "url",
    ts_field: str = "timestamp",
    html_field: str = "content",
    lang_field: str = "lang",
) -> DataFrame:
    """Directory/glob of .jsonl(.gz) files → (url, warc_ts, html, text,
    lang). Missing fields are NULL; ``text`` is left for the extract
    stage. Compressed files are handled by Spark's text source natively."""
    schema = ", ".join(
        f"`{f}` string"
        for f in dict.fromkeys((url_field, ts_field, html_field, lang_field))
    )
    raw = spark.read.schema(schema).json(path)
    return raw.select(
        F.col(url_field).alias("url"),
        F.to_timestamp(F.col(ts_field)).alias("warc_ts"),
        F.encode(F.col(html_field), "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col(lang_field).alias("lang"),
    )

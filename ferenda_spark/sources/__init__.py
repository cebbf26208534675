from ferenda_spark.sources.cdx import (  # noqa: F401
    cdx_fetch_plan,
    read_cdx_index,
)
from ferenda_spark.sources.jsonl import read_jsonl_corpus  # noqa: F401
from ferenda_spark.sources.warc import (  # noqa: F401
    read_warc,
    read_warc_ranges,
)

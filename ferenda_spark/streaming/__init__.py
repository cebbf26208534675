from ferenda_spark.streaming.dedup import (  # noqa: F401
    dedup_stream,
    run_dedup_stream,
)
from ferenda_spark.streaming.entries import (  # noqa: F401
    track_document_entries,
)
from ferenda_spark.streaming.ingest import (  # noqa: F401
    run_streaming_ingest,
    stream_corpus,
    streaming_feed_counts,
)
